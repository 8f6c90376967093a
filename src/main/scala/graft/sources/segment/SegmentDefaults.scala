package graft.sources.segment

import org.apache.spark.sql.catalyst.util.ResolveDefaultColumns
import org.apache.spark.sql.connector.catalog.ColumnDefaultValue
import org.apache.spark.sql.graftbridge.DefaultsBridge
import org.apache.spark.sql.types._

/** DEFAULT column values on the graft-segment format (the Delta/
  * Iceberg "add a column with a default, never rewrite" shape, and
  * SQL's standard CURRENT/EXISTS split):
  *
  *   - `CREATE TABLE t (c INT DEFAULT 5)` / `ALTER TABLE t ADD COLUMN
  *     c INT DEFAULT 5` — ONE metadata-only manifest commit. The
  *     field's metadata carries Spark's own two keys:
  *     `CURRENT_DEFAULT` (the SQL text the analyzer substitutes into
  *     future INSERTs that omit the column) and `EXISTS_DEFAULT` (the
  *     constant-folded literal rows written BEFORE the column existed
  *     read back) — encoded by Spark's `Column` → `StructType`
  *     conversion, so the wire format is exactly what the built-in
  *     catalogs persist.
  *   - `ALTER COLUMN c SET DEFAULT v` / `DROP DEFAULT` — updates
  *     `CURRENT_DEFAULT` only: future inserts change, existing rows
  *     keep reading the add-time `EXISTS_DEFAULT` (the SQL-standard
  *     semantics; a column added WITHOUT a default — e.g. mergeSchema
  *     evolution — stays null-backfilled forever, SET DEFAULT cannot
  *     retroactively paint it).
  *
  * Read side: [[GraftReaderFactory]] evaluates `EXISTS_DEFAULT` once
  * on the DRIVER (`ResolveDefaultColumns.existenceDefaultValues` —
  * parse, fold, cast to the CURRENT field type, so a later type widen
  * re-coerces for free) and serves the constant for required columns
  * a segment does NOT store — stored-but-null values stay null. Both
  * the row and vectorized paths fill it; the change feed inherits the
  * fill through the shared factory.
  *
  * At 100 TB this is the only sane ADD COLUMN: a backfill rewrite of
  * a petabyte table to materialize a constant is pure waste — the
  * constant lives in ONE manifest field and is materialized per
  * BATCH, not per byte on disk. Scale guard: defaults are restricted
  * to the codec's atomic types (no array/struct constants), refused
  * at DDL time with the UPDATE-backfill recipe.
  *
  * Reference anchor: the reference system's order records carry
  * server-side defaulted fields (status/timestamps filled by the
  * service, not the client payload — app/checkout_service.py's event
  * construction); DEFAULT pushes that fill into the table contract.
  */
object SegmentDefaults {

  val CurrentKey: String = ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY
  val ExistsKey: String = ResolveDefaultColumns.EXISTS_DEFAULT_COLUMN_METADATA_KEY

  /** Types a default constant can be served for: the codec's atomic
    * set — every one has a row-path slot and a vectorized
    * constant-fill. Array/struct defaults are refused (fill cost and
    * vector plumbing for repeated variable-width constants buy nothing
    * a post-add `UPDATE t SET c = array(...)` backfill doesn't). */
  def fillable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | BooleanType | StringType | BinaryType | DateType |
         TimestampType | TimestampNTZType => true
    case _: DecimalType => true
    case _ => false
  }

  private def hasDefault(f: StructField): Boolean =
    f.metadata.contains(CurrentKey) || f.metadata.contains(ExistsKey)

  /** DDL validation: a declared default must be servable. */
  def validate(schema: StructType): Unit =
    schema.fields.filter(hasDefault).foreach(f =>
      require(fillable(f.dataType),
        s"column ${f.name}: DEFAULT is supported for atomic column types " +
          s"only, not ${f.dataType.simpleString} — add the column without " +
          "a default, then backfill with UPDATE"))

  /** Encode an ADD COLUMN default into the field's metadata through
    * Spark's OWN `Column` → `StructType` conversion — byte-for-byte
    * the encoding the built-in catalogs persist (both keys: the SQL
    * text and the folded literal). */
  def withDefault(f: StructField, d: ColumnDefaultValue): StructField = {
    require(fillable(f.dataType),
      s"column ${f.name}: DEFAULT is supported for atomic column types " +
        s"only, not ${f.dataType.simpleString} — add the column without " +
        "a default, then backfill with UPDATE")
    DefaultsBridge.withDefault(f, d)
  }

  /** `ALTER COLUMN … SET DEFAULT sql` / `DROP DEFAULT` as a manifest
    * transform: CURRENT_DEFAULT only — EXISTS_DEFAULT is frozen at ADD
    * time (or absent forever for columns that never had one). */
  def setCurrentTransform(name: String, sql: Option[String]): Manifest => Manifest = { m =>
    val f = m.schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name to alter"))
    sql.foreach(_ => require(fillable(f.dataType),
      s"column $name: DEFAULT is supported for atomic column types only, " +
        s"not ${f.dataType.simpleString}"))
    val mb = new MetadataBuilder().withMetadata(f.metadata)
    val meta = sql match {
      case Some(s) => mb.putString(CurrentKey, s).build()
      case None => mb.remove(CurrentKey).build()
    }
    m.copy(schema = StructType(m.schema.fields.map(x =>
      if (x.name == name) x.copy(metadata = meta) else x)))
  }

  /** Existence defaults for a scan, aligned to `required`'s indices:
    * the evaluated catalyst constant for every required column whose
    * TABLE field carries `EXISTS_DEFAULT`, null elsewhere (including
    * `_segment`/`_pos` and never-defaulted columns). Evaluated once on
    * the driver at factory construction; the common no-defaults table
    * returns the shared empty marker so readers pay nothing. */
  def existenceDefaults(tableSchema: StructType, required: StructType): Array[Any] = {
    if (!tableSchema.fields.exists(f => f.metadata.contains(ExistsKey)))
      return None.orNull
    val byName = tableSchema.fields.zip(
      ResolveDefaultColumns.existenceDefaultValues(tableSchema))
      .collect { case (f, v) if v != null => f.name -> v }.toMap
    if (byName.isEmpty) return None.orNull
    val out = required.fields.map(f => byName.getOrElse(f.name, null: Any))
    if (out.exists(_ != null)) out else None.orNull
  }
}
