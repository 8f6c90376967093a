package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S7 — DDL/seed script loader (reference src/order_processor/init_db.py:40-54):
  * split a SQL script on ';', execute each statement. The reference seeds
  * its 5-row inventory this way (db/init_schema.sql:1-24); here the DDL
  * targets temp views / `USING parquet` tables through `spark.sql`. */
object Seeds {

  /** The reference's exact inventory seed — db/init_schema.sql:9-14. */
  val inventorySeedScript: String =
    """CREATE OR REPLACE TEMPORARY VIEW inventory_seed AS
      |SELECT * FROM VALUES
      |  ('prod-101', 'Wireless Headphones', 50),
      |  ('prod-102', 'Mechanical Keyboard', 20),
      |  ('prod-103', 'Gaming Mouse', 35),
      |  ('prod-104', 'USB-C Monitor', 10),
      |  ('prod-105', 'Ergonomic Chair', 5)
      |  AS t(product_id, product_name, quantity_available)
      |""".stripMargin

  /** Execute a multi-statement SQL script (';'-separated), mirroring the
    * reference's init_db loader. Statements run in order; empty segments
    * are skipped. */
  def runScript(spark: SparkSession, script: String): Unit =
    script.split(";").map(_.trim).filter(_.nonEmpty).foreach(spark.sql)

  /** Seed and return the reference inventory table. */
  def referenceInventory(spark: SparkSession): DataFrame = {
    runScript(spark, inventorySeedScript)
    spark.table("inventory_seed")
  }
}
