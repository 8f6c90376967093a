package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench stdout lines are the harness's ONLY per-round perf
  * artifact, captured from a fixed-size log tail — these tests pin the
  * guarantee that the telemetry line always fits that window, always
  * parses, and carries EVERY query's wall time (positional, in the
  * deterministic name order) plus the instrument series (CPU probes,
  * Spark brackets, repeat samples), no matter how many queries the
  * surface grows to. (Jackson is the JSON parser Spark itself ships,
  * so no extra dependency.) */
class BenchSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def parse(s: String) = mapper.readTree(s)

  private val probes8 =
    (0 to 7).map(i => (i * 80.0 + 3.7, 0.5 + i * 0.003))
  private val spark3 = Seq(2.235, 0.875, 0.789)
  private val rpt10 = (0 until 10).map(i => (i * 31, 1.0 + i * 0.85))

  test("renderCompact fits the byte budget and stays valid JSON at any surface size") {
    for (n <- Seq(1, 10, 86, 331, 500)) {
      val results = (1 to n).map(i => (f"family_query_with_a_long_name_$i%03d", i * 0.137))
      val line = Bench.renderCompact(results, probes8, spark3,
        rpt10.filter(_._1 < n), Nil, Nil, "/root/testdata/sf0.1")
      // the budget is honored at every realistic surface size; past
      // the point where even the fully-degraded candidate can't fit,
      // COVERAGE wins by contract — the line is still emitted, still
      // complete, still valid JSON
      if (n <= 400) assert(line.length <= 1550, s"n=$n line=${line.length}B")
      val node = parse(line)
      assert(node.get("metric").asText() == "qtimes")
      assert(node.get("n").asInt() == n)
      assert(node.get("order").asText() == "name")
      // COMPLETE coverage: one positional entry per query, always
      assert(node.get("t").size() == n)
      // the instrument series ride at every realistic surface size
      // (they are only shed by the late degradation stages)
      if (n <= 400) {
        assert(node.get("cpu").size() == 8, s"n=$n")
        assert(node.get("spk").size() == 3, s"n=$n")
      }
    }
  }

  test("renderCompact: positional times decode to the measurements at the declared unit") {
    val results = Seq(("a_q", 0.314), ("b_q", 2.501), ("c_q", 22.543))
    val node = parse(Bench.renderCompact(results, probes8, spark3, Nil, Nil, Nil, "/sf"))
    val scale = node.get("t_unit").asText() match {
      case "cs" => 100.0
      case "ds" => 10.0
      case "s" => 1.0
    }
    assert(scale == 100.0) // a small surface never degrades below cs
    val t = node.get("t")
    assert(math.abs(t.get(0).asLong() / scale - 0.314) < 1.0 / scale)
    assert(math.abs(t.get(2).asLong() / scale - 22.543) < 1.0 / scale)
    // total is the 3-decimal sum of non-failed measurements
    assert(node.get("value").asDouble() == 25.358)
  }

  test("renderCompact degrades the unit, never the coverage, when cs overflows the budget") {
    // pathological: 400 queries all in the 4-digit-cs band
    val results = (1 to 400).map(i => (f"q_$i%03d", 60.0 + i * 0.01))
    val line = Bench.renderCompact(results, probes8, spark3, rpt10, Nil, Nil, "/sf")
    assert(line.length <= 1550, s"line=${line.length}B")
    val node = parse(line)
    assert(node.get("t").size() == 400) // every query still present
    assert(node.get("t_unit").asText() != "cs") // resolution paid, not coverage
    // the repeat samples degrade WITH the unit — rpt shares t_unit by
    // contract (decode divides both by the same scale)
    val scale = node.get("t_unit").asText() match {
      case "ds" => 10.0
      case "s" => 1.0
      case u => fail(s"unexpected unit $u")
    }
    val rpt = node.get("rpt")
    assert(rpt.get(0).asInt() == rpt10.head._1)
    assert(math.abs(rpt.get(1).asLong() / scale - rpt10.head._2) <= 0.5 / scale + 1e-9)
  }

  test("renderCompact: instrument series ride as centisecond ints, repeats as [idx,t] pairs") {
    val node = parse(Bench.renderCompact(
      (1 to 100).map(i => (f"q_$i%03d", i * 0.1)), probes8, spark3,
      Seq((99, 10.03), (42, 4.27)), Nil, Nil, "/sf"))
    // the CPU probe series: one positional centisecond int per probe —
    // a slow box mid-run shows as an inflated entry at that position
    // (offsets reconstruct from cumsum(t) at ProbeEvery boundaries)
    val cpu = node.get("cpu")
    assert(cpu.size() == 8)
    assert(cpu.get(0).asInt() == 50)
    assert(cpu.get(7).asInt() == 52)
    // the Spark-path brackets (start/mid/end), previously headline-only
    val spk = node.get("spk")
    assert(spk.get(0).asInt() == 224 && spk.get(1).asInt() == 88 &&
      spk.get(2).asInt() == 79)
    // repeats: flat [idx, t, idx, t] pairs in the SAME unit as t
    assert(node.get("t_unit").asText() == "cs")
    val rpt = node.get("rpt")
    assert(rpt.size() == 4)
    assert(rpt.get(0).asInt() == 99 && rpt.get(1).asInt() == 1003)
    assert(rpt.get(2).asInt() == 42 && rpt.get(3).asInt() == 427)
  }

  test("renderCompact carries errors as -1 entries plus messages, truncated not dropped") {
    val results = (1 to 100).map(i => (f"q_$i%03d", if (i <= 8) -1.0 else i * 0.5))
    val errors = (1 to 8).map(i => (f"q_$i%03d", "x" * 500))
    val line = Bench.renderCompact(results, probes8, spark3, Nil,
      (0 until 8).map(i => (i, 33.3)), errors, "/sf")
    assert(line.length <= 1550)
    val node = parse(line)
    assert(node.get("errors").size() == 3) // first 3 shown
    assert(node.get("n_errors").asInt() == 8) // true count always present
    assert(node.get("errors").get("q_001").asText().length == 60)
    assert(node.get("t").get(0).asInt() == -1) // never a plausible time
    // total never counts failed queries
    assert(node.get("value").asDouble() == (9 to 100).map(_ * 0.5).sum)
    // the errored queries' REAL elapsed rides as errt [idx, t] pairs
    // (t_unit scaled), so offset reconstruction conserves their wall
    val et = node.get("errt")
    assert(et.size() == 16)
    assert(et.get(0).asInt() == 0 && et.get(1).asInt() == 3330)
  }

  test("the fully-degraded line still fits the capture window up to the surface the window can hold") {
    // the graded tail is ~2000 bytes; after the ~80 B sbt trailer and
    // the ~330 B worst-case headline that must BOTH survive around
    // the qtimes line, ~1590 B remain for the fully-degraded
    // candidate (2000 - 80 - 330 = 1590). This boundary is where the
    // r4/r5 artifacts died — assert it HOLDS for every surface size
    // the window can actually fit, so growth past it fails in CI
    // instead of at grading time (r17 ADVICE). Pathological
    // distribution: every query in the 2-digit-seconds band (worst
    // realistic s-unit width), capacity ≈ 450 queries.
    for (n <- Seq(341, 400, 450)) {
      val results = (1 to n).map(i => (f"q_$i%03d", 60.0 + i * 0.01))
      val line = Bench.renderCompact(results, probes8, spark3, rpt10,
        Nil, Nil, "/root/testdata/sf0.1")
      assert(line.length <= 1590,
        s"n=$n fully-degraded line=${line.length}B exceeds the capture " +
          "window: the compact format needs a new degradation stage " +
          "BEFORE the surface grows this far")
      assert(parse(line).get("t").size() == n)
    }
    // and the REAL registry, with an r17-shaped time distribution plus
    // repeats and an error, stays within the primary budget's ladder
    val n = SparkEntry.queries.size
    val real = (1 to n).map(i =>
      (f"q_$i%03d", if (i % 97 == 0) 9.5 + i * 0.01 else 0.2 + (i % 30) * 0.11))
    val line = Bench.renderCompact(real, probes8, spark3, rpt10,
      Seq((0, 12.7)), Seq(("q_001", "boom")), "/root/testdata/sf0.1")
    assert(line.length <= 1550,
      s"real surface n=$n no longer fits the 1550 B budget at any " +
        s"resolution (line=${line.length}B)")
  }

  test("the calibration loop returns a sane positive duration") {
    val dt = Bench.calibrateCpu()
    assert(dt > 0.0 && dt < 60.0, s"calibrateCpu $dt s")
  }
}
