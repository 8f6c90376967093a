package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys.
  *
  * When a join key's distribution is heavily skewed (one product in 30%
  * of lines), the shuffle partition holding the hot key becomes the
  * straggler. Salting splits each hot key into `salts` sub-keys: the
  * fact side gets a random-but-deterministic salt from its row identity,
  * the dimension side is replicated once per salt value, and the join
  * runs on (key, salt) — same result set, `salts`× the parallelism on
  * the hot key at the cost of replicating the (small) dimension side.
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
  * on by default) handles sort-merge skew at runtime; explicit salting
  * remains the tool for skewed *aggregations* and for joins where the
  * dim side must broadcast anyway.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, salted `salts` ways. The salt is
    * derived by hashing the fact row's own key + partition-stable id —
    * uniform enough to split hot keys, and irrelevant to the result
    * (every fact row still meets its dim row exactly once). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int): DataFrame = {
    val saltedFact = fact.withColumn(
      "__salt", pmod(hash(col(key), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact
      .join(replicatedDim, Seq(key, "__salt"))
      .drop("__salt")
  }
}
