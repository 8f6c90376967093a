package graft

import org.apache.spark.sql.functions._

import graft.ops.{Anonymize, Kmv}

/** KMV bottom-k sketch: bound, merge exactness, estimator branches,
  * pair overlap — and the t-closeness audit's hand-checked arithmetic. */
class KmvSpec extends SparkSpec {

  private def items(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("g", "v")
  }

  test("sketch keeps at most k rows per group; below k it IS the distinct hash set") {
    val df = items((1 to 50).map(i => ("a", s"w$i")) ++
      (1 to 5).map(i => ("b", s"w$i")): _*)
    val sk = Kmv.sketch(df, Seq("g"), col("v"), 16)
    val counts = sk.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("a") == 16)
    assert(counts("b") == 5)
  }

  test("shard-merge equals the direct sketch exactly (min-k associative + idempotent)") {
    val df = items((1 to 80).map(i => ("a", s"w$i")): _*)
    val s1 = Kmv.sketch(df.filter(length(col("v")) === 2), Seq("g"), col("v"), 16)
    val s2 = Kmv.sketch(df.filter(length(col("v")) === 3), Seq("g"), col("v"), 16)
    val merged = Kmv.merge(Seq(s1, s2), Seq("g"), 16)
      .orderBy("hv").collect().map(_.getLong(1)).toSeq
    val direct = Kmv.sketch(df, Seq("g"), col("v"), 16)
      .orderBy("hv").collect().map(_.getLong(1)).toSeq
    assert(merged == direct)
  }

  test("estimate is exact below k and within 30% above it (k=64, n=2000)") {
    val small = items((1 to 40).map(i => ("s", s"w$i")): _*)
    val est = Kmv.estimateDistinct(Kmv.sketch(small, Seq("g"), col("v"), 64), Seq("g"), 64)
      .collect().head.getDouble(1)
    assert(est == 40.0)
    val big = items((1 to 2000).map(i => ("b", s"word$i")): _*)
    val estBig = Kmv.estimateDistinct(Kmv.sketch(big, Seq("g"), col("v"), 64), Seq("g"), 64)
      .collect().head.getDouble(1)
    assert(math.abs(estBig - 2000) / 2000.0 < 0.3, s"estimate $estBig")
  }

  test("pair overlap: identical sets → Jaccard 1, disjoint sets → 0") {
    val df = items(
      (1 to 300).map(i => ("a", s"w$i")) ++
        (1 to 300).map(i => ("b", s"w$i")) ++          // b ≡ a
        (1 to 300).map(i => ("c", s"zzz$i")): _*)       // c disjoint
    val sk = Kmv.sketch(df, Seq("g"), col("v"), 64)
    val rows = Kmv.pairOverlap(sk, "g", 64).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))).toMap
    val (jAb, _, aOnlyAb, bOnlyAb) = rows(("a", "b"))
    assert(jAb == 1.0 && aOnlyAb == 0.0 && bOnlyAb == 0.0)
    val (jAc, interAc, aOnlyAc, _) = rows(("a", "c"))
    assert(jAc == 0.0 && interAc == 0.0)
    // disjoint: the a-side difference estimate recovers ~|A| = 300
    assert(aOnlyAc > 150 && aOnlyAc < 600, s"a_only_est $aOnlyAc")
    assert(rows(("b", "c"))._1 == 0.0)
  }

  test("t-closeness: uniform group → 0, single-valued group → hand-checked TVD") {
    import spark.implicits._
    // global {A:2, B:2}; g1 = {A,A} → TVD ½(|1−½|+|0−½|) = 0.5;
    // g2 = {B,B} symmetric
    val df = Seq(("g1", "A"), ("g1", "A"), ("g2", "B"), ("g2", "B"))
      .toDF("q", "sens")
    val t = Anonymize.tCloseness(df, Seq("q"), "sens").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(t("g1") == 0.5 && t("g2") == 0.5)
    // a group mirroring the global distribution scores 0
    val df2 = Seq(("g1", "A"), ("g1", "B"), ("g2", "A"), ("g2", "B"))
      .toDF("q", "sens")
    val t2 = Anonymize.tCloseness(df2, Seq("q"), "sens").collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(t2("g1") == 0.0 && t2("g2") == 0.0)
  }
}
