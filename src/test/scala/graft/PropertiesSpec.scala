package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ingest.Ingest
import graft.model.Model
import graft.streaming.CheckoutStream

/** Property-based invariants (SURVEY.md §5.2.3): key idempotency,
  * conservation, all-or-nothing. Drives ScalaCheck generators directly
  * with fixed seeds (the scalatest-scalacheck bridge isn't on the
  * offline classpath) — deterministic, bounded Spark-job count. */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("K1 idempotency: duplicated payload stream yields exactly one key per payload") {
    samples(Gen.listOfN(8, Gen.choose(1, 4)), 5).foreach { custIds =>
      val df = (custIds ++ custIds).map(c => (s"cust-$c", s"payload-$c"))
        .toDF("cust", "payload")
        .select(Ingest.idempotencyKey(col("cust"), col("payload")).as("k"))
      assert(df.distinct().count() === custIds.distinct.size)
    }
  }

  test("conservation + all-or-nothing: admitted orders never oversell") {
    val orderGen = for {
      n <- Gen.choose(1, 6)
      rows <- Gen.listOfN(n, for {
        o <- Gen.choose(1, 4)
        p <- Gen.oneOf("prod-101", "prod-105")
        q <- Gen.choose(1, 6)
      } yield (s"o-$o", p, q))
    } yield rows

    samples(orderGen, 5).foreach { rows =>
      val stock = Map("prod-101" -> 10, "prod-105" -> 4)
      val lines = rows.toDF("order_id", "product_id", "quantity")
        .groupBy($"order_id", $"product_id").agg(sum($"quantity").as("quantity"))
      val inv = stock.toSeq.toDF("product_id", "stock")
      val verdicts = CheckoutStream.admitOrders(lines, inv)
      val admitted = verdicts.filter($"status" === Model.StatusProcessed).select($"order_id")
      val demand = lines.join(admitted, Seq("order_id"))
        .groupBy($"product_id").agg(sum($"quantity").as("d"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // conservation: total admitted demand never exceeds stock per product
      demand.foreach { case (p, d) => assert(d <= stock(p), s"oversold $p") }
      // all-or-nothing: every order has exactly one verdict
      assert(verdicts.count() === lines.select($"order_id").distinct().count())
    }
  }
}
