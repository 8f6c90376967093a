package graft

import org.apache.spark.sql.functions._

import graft.ops.{Classifier, Drift, EventWindows, TextOps}

/** Evaluation + statistics operators: exact AUC branches, exact KS
  * endpoints, G² vs PMI discrimination, frequent-path counts. */
class EvalSpec extends SparkSpec {

  test("AUC: perfect separation → 1, reversed → 0, constant score → 0.5") {
    import spark.implicits._
    val perfect = Seq((0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0))
      .toDF("prob", "rule_label")
    assert(Classifier.auc(perfect).collect().head.getDouble(2) == 1.0)
    val reversed = Seq((0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0))
      .toDF("prob", "rule_label")
    assert(Classifier.auc(reversed).collect().head.getDouble(2) == 0.0)
    val ties = Seq((0.5, 1), (0.5, 1), (0.5, 0), (0.5, 0))
      .toDF("prob", "rule_label")
    assert(Classifier.auc(ties).collect().head.getDouble(2) == 0.5)
  }

  test("KS: identical samples → 0, disjoint supports → 1, hand-checked middle") {
    import spark.implicits._
    val a = Seq(1, 2, 3, 4).toDF("v")
    val same = Drift.ksStatistic(a, col("v"), a, col("v"), parts = 2)
      .collect().head
    assert(same.getDouble(0) == 0.0 && same.getLong(1) == 4 && same.getLong(2) == 4)
    val b = Seq(11, 12, 13, 14).toDF("v")
    assert(Drift.ksStatistic(a, col("v"), b, col("v"), parts = 2)
      .collect().head.getDouble(0) == 1.0)
    // A={1,2,3,4}, B={3,4,5,6}: max |F_a - F_b| at v=2 → |2/4 - 0/4| = 0.5
    val c = Seq(3, 4, 5, 6).toDF("v")
    assert(Drift.ksStatistic(a, col("v"), c, col("v"), parts = 2)
      .collect().head.getDouble(0) == 0.5)
  }

  test("G² ranks a frequent collocation above a hapax pair (PMI's failure mode)") {
    import spark.implicits._
    // "new york" 8×; "qq zz" once; filler tokens keep marginals honest
    val texts = (1 to 8).map(i => (i.toLong, s"new york f$i g$i h$i")) :+
      (9L, "qq zz f1 g2 h3") :+ (10L, "f4 f5 f6 f7 g8 g9")
    val docs = texts.toDF("doc_id", "text")
    val out = TextOps.llrBigrams(docs, minCount = 1, k = 100)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(3)).toMap
    assert(out(("new", "york")) > out(("qq", "zz")),
      s"G² new york ${out(("new", "york"))} vs qq zz ${out(("qq", "zz"))}")
  }

  test("ShingleGenerator ≡ the composed array-explode shingles, plans as Generate") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "one two"), (3L, "x y z w v"),
      (4L, ""), (5L, "a a a a a a a")).toDF("doc_id", "text")
    val gen = docs.select(col("doc_id"),
        graft.functions.ShingleGenerator.shingles(col("text"), 5)
          .as(Seq("pos", "shingle")))
      .select(col("doc_id"), col("shingle"))
    val composed = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), explode(when(size(col("w")) >= 5,
        transform(sequence(lit(0), size(col("w")) - 5),
          i => array_join(slice(col("w"), i + 1, lit(5)), " ")))
        .otherwise(array())).as("shingle"))
    val a = gen.orderBy("doc_id", "shingle").collect().toSeq
    val b = composed.orderBy("doc_id", "shingle").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // and it plans through GenerateExec like any built-in generator
    val hasGenerate = gen.queryExecution.executedPlan.toString.contains("Generate")
    assert(hasGenerate, gen.queryExecution.executedPlan.toString)
  }

  test("BFS hop distances: chain graph layers, cap, unreachable absent") {
    import spark.implicits._
    // undirected chain a-b-c-d plus isolated e: seeds {a}, cap 2
    val edges = Seq(("a", "b"), ("b", "a"), ("b", "c"), ("c", "b"),
      ("c", "d"), ("d", "c")).toDF("src", "dst")
    val seeds = Seq("a").toDF("id")
    val out = graft.ops.Bfs.hopDistances(edges, seeds, 2).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out == Map("a" -> 0, "b" -> 1, "c" -> 2))
    // min-hop on a diamond: two paths of different length, first touch wins
    val dia = Seq(("s", "x"), ("s", "y"), ("x", "t"), ("y", "z"), ("z", "t"))
      .toDF("src", "dst")
    val out2 = graft.ops.Bfs.hopDistances(dia, Seq("s").toDF("id"), 4).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out2("t") == 2) // via x, not the 3-hop path via y,z
  }

  test("frequentPaths counts consecutive trigrams per user in time order") {
    import spark.implicits._
    val ev = Seq(
      ("u1", 1L, 1L, "a"), ("u1", 2L, 2L, "b"), ("u1", 3L, 3L, "c"),
      ("u1", 4L, 4L, "b"), ("u1", 5L, 5L, "c"),
      ("u2", 1L, 6L, "a"), ("u2", 2L, 7L, "b"), ("u2", 3L, 8L, "c"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = EventWindows.frequentPaths(ev, 10).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // u1: a>b>c, b>c>b, c>b>c ; u2: a>b>c
    assert(out("a>b>c") == 2 && out("b>c>b") == 1 && out("c>b>c") == 1)
  }
}
