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
}
