package graft

import org.scalatest.funsuite.AnyFunSuite
import com.fasterxml.jackson.databind.ObjectMapper

/** The bench stdout line is the harness's ONLY per-round perf artifact,
  * captured from a fixed-size log tail — these tests pin the guarantee
  * that the line always fits that window and always parses, no matter
  * how many queries the surface grows to. (Jackson is the JSON parser
  * Spark itself ships, so no extra dependency.) */
class BenchSpec extends AnyFunSuite {
  private val mapper = new ObjectMapper()

  private def parse(s: String) = mapper.readTree(s)

  test("renderLine fits the byte budget and stays valid JSON at any surface size") {
    for (n <- Seq(1, 10, 86, 300)) {
      val results = (1 to n).map(i => (f"family_query_with_a_long_name_$i%03d", i * 0.137))
      val line = Bench.renderLine(results, Nil, "/root/testdata/sf0.1")
      assert(line.length <= 1600, s"n=$n line=${line.length}B")
      val node = parse(line)
      assert(node.get("metric").asText() == "total")
      assert(node.get("n_queries").asInt() == n)
      assert(node.get("unit").asText() == "sec")
      assert(node.get("queries").size() + node.path("omitted").asInt(0) == n)
    }
  }

  test("renderLine keeps the slowest queries when trimming") {
    val results = (1 to 200).map(i => (f"q_$i%03d", i.toDouble))
    val line = Bench.renderLine(results, Nil, "/sf")
    val node = parse(line)
    val kept = {
      val it = node.get("queries").fieldNames()
      val b = scala.collection.mutable.Set.empty[String]
      while (it.hasNext) b += it.next()
      b
    }
    assert(node.get("omitted").asInt() > 0)
    // the slowest 20 must all survive the trim
    for (i <- 181 to 200) assert(kept.contains(f"q_$i%03d"), s"q_$i missing")
    // and values are the 3-decimal rounding of the measurement
    assert(node.get("queries").get("q_200").asDouble() == 200.0)
  }

  test("renderLine carries errors even when long, truncated not dropped") {
    val results = (1 to 100).map(i => (f"q_$i%03d", if (i <= 8) -1.0 else i * 0.5))
    val errors = (1 to 8).map(i => (f"q_$i%03d", "x" * 500))
    val line = Bench.renderLine(results, errors, "/sf")
    assert(line.length <= 1600)
    val node = parse(line)
    assert(node.get("errors").size() == 5) // first 5 shown
    assert(node.get("n_errors").asInt() == 8) // true count always present
    assert(node.get("errors").get("q_001").asText().length == 80)
    // total never counts failed queries
    assert(node.get("value").asDouble() == (9 to 100).map(_ * 0.5).sum)
  }

  test("renderLine emits the full map untrimmed when it fits") {
    val results = (1 to 20).map(i => (s"q$i", i * 0.1))
    val node = parse(Bench.renderLine(results, Nil, "/sf"))
    assert(node.get("queries").size() == 20)
    assert(!node.has("omitted"))
  }

  test("calibration metrics ride the line (and the budget) when provided") {
    val calib = """"calib_cpu_sec":0.412,"calib_spark_sec":1.873,"calib_cpu_end_sec":0.399"""
    // small surface: calib fields present and parseable
    val small = parse(Bench.renderLine(
      (1 to 5).map(i => (s"q$i", i * 0.1)), Nil, "/sf", calib = calib))
    assert(small.get("calib_cpu_sec").asDouble() == 0.412)
    assert(small.get("calib_spark_sec").asDouble() == 1.873)
    assert(small.get("calib_cpu_end_sec").asDouble() == 0.399)
    // large surface: the budget still holds with the calib payload
    val results = (1 to 300).map(i => (f"family_query_with_a_long_name_$i%03d", i * 0.137))
    val line = Bench.renderLine(results, Nil, "/sf", calib = calib)
    assert(line.length <= 1600, s"line=${line.length}B")
    val node = parse(line)
    assert(node.get("calib_cpu_sec").asDouble() == 0.412)
    assert(node.get("queries").size() + node.path("omitted").asInt(0) == 300)
    // the calibration loop itself returns a sane positive duration
    val dt = Bench.calibrateCpu()
    assert(dt > 0.0 && dt < 60.0, s"calibrateCpu $dt s")
  }
}
