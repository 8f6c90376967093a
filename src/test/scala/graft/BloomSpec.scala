package graft

import org.apache.spark.sql.functions._

import graft.ops.Bloom

/** Runtime bloom-filter join pruning: no false negatives (the join-
  * equivalence contract), real pruning power near the configured fpp,
  * and pruned join ≡ plain join on real tables. */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("mightContain has zero false negatives over the build set") {
    val keys = spark.range(0, 5000).select((col("id") * 7 + 3).as("k"))
    val f = Bloom.build(keys, "k", 5000)
    // every true key passes — prefilter + join == join depends on this
    assert(keys.filter(!Bloom.mightContain(f, col("k"))).count() === 0)
  }

  test("pruning removes almost all non-members at the configured fpp") {
    val keys = spark.range(0, 2000).select(col("id").as("k"))
    val f = Bloom.build(keys, "k", 2000, fpp = 0.01)
    // disjoint probe keys: the pass rate IS the false-positive rate
    val probe = spark.range(100000, 140000).select(col("id").as("k"))
    val passed = probe.filter(Bloom.mightContain(f, col("k"))).count()
    assert(passed < 40000 * 0.03, s"fpp too high: $passed of 40000 passed")
  }

  test("prunedJoin equals the plain join on real tables") {
    val sf = "/root/testdata/sf0.001"
    val cust = graft.sources.Tables.customer(spark, sf)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("o_custkey"))
    val orders = graft.sources.Tables.orders(spark, sf)
      .select(col("o_custkey"), col("o_orderkey"))
    val pruned = Bloom.prunedJoin(orders, cust, "o_custkey", cust.count())
      .select(col("o_orderkey"))
    val plain = orders.join(cust, Seq("o_custkey")).select(col("o_orderkey"))
    assert(pruned.exceptAll(plain).isEmpty && plain.exceptAll(pruned).isEmpty)
  }

  test("the filter literal stays broadcast-sized and geometry is sane") {
    val f = Bloom.build(spark.range(10).toDF("k"), "k", 1000000, fpp = 0.01)
    assert(f.sizeBytes < 2 * 1024 * 1024) // ~1.2 MiB for 1M keys at 1%
    assert(f.k >= 5 && f.k <= 10)
    val huge = Bloom.optimalBits(1L << 40, 0.01)
    assert(math.min(huge, 1L << 27) === (1L << 27)) // the 16 MiB cap binds
  }
}
