package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.connector.catalog.{CatalogV2Util, Column, ColumnDefaultValue}
import org.apache.spark.sql.types.StructField

/** Bridge to Spark's `private[sql]` v2-Column ↔ StructType conversion
  * (org.apache.spark.sql.connector.catalog.CatalogV2Util) — the one
  * home of the CURRENT_DEFAULT / EXISTS_DEFAULT metadata encoding, so
  * a connector persisting column defaults writes byte-for-byte what
  * the built-in catalogs write. */
object DefaultsBridge {
  /** Encode an ADD COLUMN default into the field's metadata. */
  def withDefault(f: StructField, d: ColumnDefaultValue): StructField =
    CatalogV2Util.v2ColumnsToStructType(
      Array(Column.create(f.name, f.dataType, f.nullable, null, d, null))).head

  /** v2 Columns → StructType, PRESERVING `GENERATED ALWAYS AS`
    * expressions as the same metadata key the built-in catalogs use
    * (the stock conversion drops them — generation is a first-class
    * v2-Column attribute, not metadata). Identity columns refused. */
  def structTypeWithGeneration(
      cols: Array[Column]): org.apache.spark.sql.types.StructType = {
    cols.foreach(c => require(c.identityColumnSpec() == null,
      s"identity columns are not supported (column ${c.name()})"))
    val base = CatalogV2Util.v2ColumnsToStructType(cols.toSeq)
    org.apache.spark.sql.types.StructType(base.fields.zip(cols).map {
      case (f, c) => Option(c.generationExpression()) match {
        case Some(g) => f.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putString(org.apache.spark.sql.catalyst.util.GeneratedColumn
              .GENERATION_EXPRESSION_METADATA_KEY, g)
            .build())
        case None => f
      }
    })
  }
}
