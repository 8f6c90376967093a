package graft.sources.segment

import java.io.{DataInputStream, DataOutputStream, EOFException}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Row codec for the graft segment format — the byte layout under the
  * [[GraftSegmentSource]] DataSource V2 connector.
  *
  * A segment is a self-describing stream of rows in the table schema's
  * column order: per row, one marker byte per column (0 = null,
  * 1 = present) followed by the non-null values — fixed width for
  * numeric/boolean/timestamp columns, length-prefixed UTF-8 for
  * strings, length-prefixed element runs for primitive arrays. The
  * format is row-major ON PURPOSE: segments are the connector's unit
  * of parallelism AND of skipping (one input partition each, zone-map
  * pruned via the manifest), so the scan never seeks within a segment;
  * it either streams the whole file or never opens it. Columnar
  * encodings pay off via intra-file skipping, which zone-map pruning
  * at segment granularity already provides a coarser version of.
  *
  * Column pruning still avoids per-value WORK at read time: [[skip]]
  * advances the stream over an unneeded value without materializing a
  * UTF8String / boxed value / array copy, so a 2-column projection of
  * a 10-column table allocates 2 values per row, not 10. (The bytes
  * still stream past — the honest limit of row-major storage; the
  * 100 TB answer for projection-heavy workloads is the parquet path,
  * which this connector deliberately does not replicate.)
  *
  * Supported Spark types (closed set, validated at write-build time):
  * Int, Long, Double, Float, Boolean, String, Binary (length-prefixed
  * bytes — the multimodal blob column), Decimal (unscaled long for
  * precision ≤ 18, length-prefixed unscaled big-integer bytes above —
  * the exact-money column), Timestamp (stored as epoch micros), Date
  * (stored as epoch days), arrays of Int/Long/Float/Double/String
  * (embeddings and tokenized text), structs/maps of atomics, and
  * arrays of structs of atomics (order item lists, per-doc span
  * annotations). Everything the driver test tables use, plus the
  * format's own multimodal and money stories.
  */
object SegmentCodec {
  val Magic: Int = 0x47524654 // "GRFT"
  val Version: Int = 1

  /** Decimals at or below this precision store as one unscaled long
    * (Spark's own compact-decimal boundary); wider ones store
    * length-prefixed unscaled big-integer bytes. */
  val MaxCompactDecimal: Int = 18

  /** The scalar leaf set — what a top-level column, an array element
    * (minus a few), a struct field, or a map key/value may be. */
  def atomic(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DoubleType |
        FloatType | BooleanType | StringType | BinaryType | TimestampType |
        TimestampNTZType | DateType => true
    case _: DecimalType => true
    case _ => false
  }

  /** The array shapes a top-level column may take — also what a
    * struct FIELD or array<struct> ELEMENT FIELD may carry (r14): the
    * span-annotation shape `array<struct<start, end, tokens
    * array<int>>>` is the LLM-pipeline column (per-span token-offset
    * lists) that used to hit the one-level refusal. The row codec's
    * write/read/skip recursion over SpecializedGetters is shape-
    * generic, so admitting the field form is purely a gate change;
    * stats stay honest automatically (array-typed children collect no
    * zone maps — `sound = false` — so nothing over-claims pruning),
    * and the columnar reader serves the shape too (appendArray
    * windows / positional window puts — see [[vectorizable]]). */
  private def scalarArray(dt: DataType): Boolean = dt match {
    case ArrayType(IntegerType | LongType | FloatType | DoubleType | StringType, _) => true
    case _ => false
  }

  /** The FULL nested-type algebra (r14): any composition of atomics,
    * arrays, structs, and maps — `array<array<int>>` token grids,
    * `struct<inner struct<…>>` annotation records,
    * `map<string, array<struct<…>>>` keyed span lists. Sound at any
    * depth because every layer reuses the same three byte disciplines
    * (dense non-null array elements, per-field/value presence bytes,
    * length-prefixed variable values) and the write/read/skip
    * recursion over SpecializedGetters is shape-generic. Map KEYS stay
    * atomic — the Spark map contract keeps keys dense non-null, and
    * atomic keys are what the equality/lookup semantics are defined
    * over. Honesty at depth is automatic: zone maps exist for atomic
    * leaves down ONE struct level (deeper carriers emit no bounds, so
    * nothing over-claims pruning), and [[vectorizable]] admits exactly
    * the shapes with columnar arms — everything deeper takes the row
    * reader. */
  private def nestedOk(dt: DataType): Boolean = dt match {
    case t if atomic(t) => true
    case ArrayType(et, _) => nestedOk(et)
    case StructType(fields) =>
      fields.nonEmpty && fields.forall(f => nestedOk(f.dataType))
    case MapType(k, v, _) => atomic(k) && nestedOk(v)
    case _ => false // variant below top level, UDTs, intervals
  }

  def supported(dt: DataType): Boolean = dt match {
    // Spark 4 Variant stores as the (value, metadata) binary pair it
    // already is — semi-structured props/sidecar columns land on the
    // format without a schema-inference pass. TOP-LEVEL columns only
    // (variant inside struct/array/map stays refused); no zone maps or
    // blooms (the sound binary-like default), no DEFAULT, no widening,
    // row reader only.
    case VariantType => true
    case t => nestedOk(t)
  }

  /** Resolve a statistics-declaration column name against a schema:
    * an exact TOP-LEVEL match wins outright (even for a literal-dotted
    * column name), else ONE dotted struct-field level. None when
    * nothing resolves. The single resolution rule shared by
    * bloomFor / ndvFor / histFor — one place to evolve (quoted names,
    * deeper nesting), three declaration gates on top. */
  def resolveStatsColumn(sc: StructType, c: String): Option[DataType] =
    sc.fields.find(_.name == c).map(_.dataType).orElse {
      val dot = c.indexOf('.')
      if (dot <= 0) None
      else sc.fields.find(_.name == c.substring(0, dot)).map(_.dataType) match {
        case Some(st: StructType) =>
          st.fields.find(_.name == c.substring(dot + 1)).map(_.dataType)
        case _ => None
      }
    }

  def validateSchema(schema: StructType): Unit = {
    val bad = schema.fields.filterNot(f => supported(f.dataType))
    require(bad.isEmpty,
      s"graft-segment supports any composition of the atomic types " +
        s"(Byte/Short/Int/Long/Double/Float/Boolean/String/Binary/Decimal/" +
        s"Timestamp/Date) under arrays, structs, and atomic-keyed maps, " +
        s"plus top-level Variant columns; unsupported: " +
        s"${bad.map(f => s"${f.name}: ${f.dataType.sql}").mkString(", ")}")
  }

  /** Header version 2: the body after the 12-byte raw header is one
    * DEFLATE stream (java.util.zip — level 1, the speed point). Text
    * tables shrink ~3-4×, which at 100 TB is the difference between
    * storing (and scanning) 100 TB and 30 TB; the row codec's
    * sequential-stream discipline (no intra-file seeks by design) is
    * exactly the access pattern stream compression supports. Opt-in
    * per write (`option("compress", "deflate")`) or per table
    * (`TBLPROPERTIES('compress'='deflate')` — every later INSERT,
    * stream epoch, CoW rewrite, and compaction output inherits it);
    * readers dispatch on each segment's own header, so mixed tables
    * read seamlessly. */
  val VersionDeflate: Int = 2

  def writeHeader(out: DataOutputStream, nCols: Int,
      deflate: Boolean = false): Unit = {
    out.writeInt(Magic)
    out.writeInt(if (deflate) VersionDeflate else Version)
    out.writeInt(nCols)
  }

  /** Validate the 12-byte header and return the format version (1 =
    * raw body, 2 = deflate body — wrap with [[bodyIn]]). */
  def readHeader(in: DataInputStream, nCols: Int): Int = {
    val m = in.readInt(); val v = in.readInt(); val n = in.readInt()
    require(m == Magic && (v == Version || v == VersionDeflate) && n == nCols,
      s"bad segment header (magic=$m version=$v cols=$n, expected cols=$nCols)")
    v
  }

  /** The decode stream for a segment body, given its header version. */
  def bodyIn(in: DataInputStream, version: Int): DataInputStream =
    if (version == VersionDeflate)
      new DataInputStream(new java.io.BufferedInputStream(
        new java.util.zip.InflaterInputStream(in), 1 << 16))
    else in

  /** Write one value of `dt` at `row(ordinal)` (non-null). `row` is
    * any [[org.apache.spark.sql.catalyst.expressions.SpecializedGetters]]
    * — an InternalRow for top-level columns and struct fields, an
    * ArrayData for map keys/values — so nested shapes recurse through
    * the same arms. */
  def writeValue(out: DataOutputStream, dt: DataType,
      row: org.apache.spark.sql.catalyst.expressions.SpecializedGetters,
      ordinal: Int): Unit = dt match {
    case IntegerType | DateType => out.writeInt(row.getInt(ordinal))
    case LongType | TimestampType | TimestampNTZType => out.writeLong(row.getLong(ordinal))
    case DoubleType => out.writeDouble(row.getDouble(ordinal))
    case FloatType => out.writeFloat(row.getFloat(ordinal))
    case BooleanType => out.writeBoolean(row.getBoolean(ordinal))
    case ByteType => out.writeByte(row.getByte(ordinal).toInt)
    case ShortType => out.writeShort(row.getShort(ordinal).toInt)
    case StringType =>
      val b = row.getUTF8String(ordinal).getBytes
      out.writeInt(b.length); out.write(b)
    case BinaryType =>
      val b = row.getBinary(ordinal)
      out.writeInt(b.length); out.write(b)
    case VariantType =>
      val vv = row.getVariant(ordinal)
      val v = vv.getValue; val m = vv.getMetadata
      out.writeInt(v.length); out.write(v)
      out.writeInt(m.length); out.write(m)
    case d: DecimalType =>
      val dec = row.getDecimal(ordinal, d.precision, d.scale)
      if (d.precision <= MaxCompactDecimal) out.writeLong(dec.toUnscaledLong)
      else {
        val b = dec.toJavaBigDecimal.unscaledValue().toByteArray
        out.writeInt(b.length); out.write(b)
      }
    case st: StructType =>
      // presence byte per field, values in declared order (whole-struct
      // null takes the COLUMN's null marker, one level up)
      val s = row.getStruct(ordinal, st.length)
      var i = 0
      while (i < st.length) {
        if (s.isNullAt(i)) out.writeBoolean(false)
        else { out.writeBoolean(true); writeValue(out, st.fields(i).dataType, s, i) }
        i += 1
      }
    case mt: MapType =>
      // n, then n dense keys (non-null by the Spark map contract),
      // then n presence-marked values
      val m = row.getMap(ordinal)
      val n = m.numElements()
      val ks = m.keyArray(); val vs = m.valueArray()
      out.writeInt(n)
      var i = 0
      while (i < n) { writeValue(out, mt.keyType, ks, i); i += 1 }
      i = 0
      while (i < n) {
        if (vs.isNullAt(i)) out.writeBoolean(false)
        else { out.writeBoolean(true); writeValue(out, mt.valueType, vs, i) }
        i += 1
      }
    case ArrayType(et, _) =>
      val arr = row.getArray(ordinal)
      val n = arr.numElements()
      // elements store DENSELY non-null: an UnsafeArrayData null slot
      // reads as 0 on the primitive getters, so writing one through
      // would be SILENT corruption — refuse loudly instead (whole-array
      // null is fine; it takes the column's null marker). Checked
      // inside the write loop: an exception mid-file aborts the
      // uncommitted segment either way (invisible until the manifest
      // references it), so no pre-pass is needed.
      def nullElement(i: Int): Nothing = throw new IllegalArgumentException(
        s"graft-segment stores array elements densely non-null; " +
          s"null element at index $i — filter or coalesce array " +
          "elements before writing (a NULL array as a whole is fine)")
      out.writeInt(n)
      var i = 0
      et match {
        case IntegerType => while (i < n) {
          if (arr.isNullAt(i)) nullElement(i); out.writeInt(arr.getInt(i)); i += 1 }
        case LongType => while (i < n) {
          if (arr.isNullAt(i)) nullElement(i); out.writeLong(arr.getLong(i)); i += 1 }
        case FloatType => while (i < n) {
          if (arr.isNullAt(i)) nullElement(i); out.writeFloat(arr.getFloat(i)); i += 1 }
        case DoubleType => while (i < n) {
          if (arr.isNullAt(i)) nullElement(i); out.writeDouble(arr.getDouble(i)); i += 1 }
        case StringType => while (i < n) {
          if (arr.isNullAt(i)) nullElement(i)
          val b = arr.getUTF8String(i).getBytes
          out.writeInt(b.length); out.write(b); i += 1 }
        // every other element — structs, nested arrays, maps, the
        // remaining atomics — recurses through its own writeValue arm
        // (ArrayData is a SpecializedGetters). Elements stay densely
        // non-null at EVERY depth — one discipline for the whole
        // format. The scalar arms above are just the monomorphic fast
        // paths for the hot shapes (embeddings, token lists).
        case other => while (i < n) {
          if (arr.isNullAt(i)) nullElement(i); writeValue(out, other, arr, i); i += 1 }
      }
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** Up-cast discipline for decoding a column whose STORED type
    * pre-dates a type widening ([[SegmentLog.widenTransform]]) into
    * the current REQUIRED type: 0 = identical, 1 = int→long,
    * 2 = float→double, 3/4 = the array element forms, 5 = int→double,
    * 6 = decimal precision growth (same scale — the value is
    * unchanged, only the container widens). Any other pair is a
    * decode-time contract violation (the read path refuses it before
    * the codec runs) — fail loudly, never mis-read bytes. */
  /** Strip nullability flags recursively — nullability is NOT part of
    * the byte contract (per-value presence markers carry it), so type
    * comparisons on the decode path must not fork on `containsNull` /
    * field `nullable` differences between a write-time schema (e.g.
    * `transform()` output, whose nested arrays are containsNull=false)
    * and Spark's pruned read schema (normalized nullable). */
  def shape(dt: DataType): DataType = dt match {
    case ArrayType(et, _) => ArrayType(shape(et), containsNull = true)
    case st: StructType => StructType(st.fields.map(f =>
      StructField(f.name, shape(f.dataType), nullable = true)))
    case MapType(k, v, _) => MapType(shape(k), shape(v), valueContainsNull = true)
    case other => other
  }

  def upcast(stored: DataType, required: DataType): Int = (stored, required) match {
    case (s, r) if s == r || shape(s) == shape(r) => 0
    case (IntegerType, LongType) => 1
    case (FloatType, DoubleType) => 2
    case (ArrayType(IntegerType, _), ArrayType(LongType, _)) => 3
    case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => 4
    case (IntegerType, DoubleType) => 5
    case (s: DecimalType, r: DecimalType)
        if s.scale == r.scale && r.precision > s.precision => 6
    // 7 = byte/short widened into any larger integer-family type (or
    // double) — the target is read from `to` at promote time
    case (ByteType, ShortType | IntegerType | LongType | DoubleType) => 7
    case (ShortType, IntegerType | LongType | DoubleType) => 7
    // 8 = NESTED COLUMN PRUNING: the required struct is a subsequence
    // of the stored struct's fields (Spark's nested schema pruning —
    // `SELECT st.a` plans a one-field struct); unneeded fields SKIP
    // without materializing, the same discipline as top-level pruning
    case (s: StructType, r: StructType)
        if isPrunedStruct(s, r) => 8
    // 9 = nested pruning THROUGH an array: `SELECT items.quantity`
    // plans array<struct<quantity>> over a stored array<struct<...>>
    // (Spark's GetArrayStructFields + nested schema pruning); unneeded
    // element fields skip per element, same discipline as code 8
    case (ArrayType(s: StructType, _), ArrayType(r: StructType, _))
        if isPrunedStruct(s, r) => 9
    // 10 = nested pruning THROUGH a map's VALUE struct:
    // `SELECT m['t0'].n` plans map<string, struct<n>> over a stored
    // map<string, struct<...>> — keys decode whole (they are the
    // lookup), unneeded value fields skip per entry (code 8's
    // discipline). Until r15 this shape widened back to the stored
    // carrier and decoded every value field.
    case (MapType(sk, s: StructType, _), MapType(rk, r: StructType, _))
        if shape(sk) == shape(rk) && isPrunedStruct(s, r) => 10
    // 8 (generalized): any remaining RECURSIVELY-pruned composition —
    // `array<array<struct<subset>>>`, `map<string, array<struct<…>>>`
    // — served by the row reader's shared pruned decode
    // ([[readStructPruned]]/readPrunedValue); such shapes are never
    // vectorizable, so the columnar arms only ever see the flat
    // prunes above
    case (s, r) if isPrunedType(s, r) => 8
    case _ => throw new IllegalArgumentException(
      s"cannot decode a ${stored.simpleString} column as ${required.simpleString}")
  }

  /** Is `r` a (proper or improper) order-preserving field subset of
    * `s` with identical field names and RECURSIVELY-PRUNED types
    * (`SELECT rec.inner.x` plans struct<inner: struct<x>> over a
    * stored struct<inner: struct<x, ys>, w> — r15; shape-identical
    * before)? Nullability is not part of the byte contract. */
  private def isPrunedStruct(s: StructType, r: StructType): Boolean = {
    var si = 0
    var ri = 0
    while (ri < r.length) {
      while (si < s.length && s(si).name != r(ri).name) si += 1
      if (si >= s.length ||
          !isPrunedType(s(si).dataType, r(ri).dataType)) return false
      si += 1; ri += 1
    }
    true
  }

  /** Can a stored `s` decode as required `r` by pruning alone —
    * identical shape, or a (possibly nested) struct-field subset at
    * any depth, through array elements and map values? */
  private def isPrunedType(s: DataType, r: DataType): Boolean = (s, r) match {
    case (s, r) if shape(s) == shape(r) => true
    case (s: StructType, r: StructType) => isPrunedStruct(s, r)
    case (ArrayType(se, _), ArrayType(re, _)) => isPrunedType(se, re)
    case (MapType(sk, sv, _), MapType(rk, rv, _)) =>
      shape(sk) == shape(rk) && isPrunedType(sv, rv)
    case _ => false
  }

  /** Apply an [[upcast]] code to a decoded catalyst value; `to` is the
    * required (current) type, consulted by the codes whose target
    * carries parameters (decimal precision). */
  def promote(v: Any, code: Int, to: DataType): Any = code match {
    case 0 => v
    case 1 => v.asInstanceOf[Int].toLong
    case 2 => v.asInstanceOf[Float].toDouble
    case 3 => new GenericArrayData(
      v.asInstanceOf[GenericArrayData].array.map(x => x.asInstanceOf[Int].toLong: Any))
    case 4 => new GenericArrayData(
      v.asInstanceOf[GenericArrayData].array.map(x => x.asInstanceOf[Float].toDouble: Any))
    case 5 => v.asInstanceOf[Int].toDouble
    case 6 =>
      val d = to.asInstanceOf[DecimalType]
      org.apache.spark.sql.types.Decimal(
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal,
        d.precision, d.scale)
    case 7 =>
      val l = v match {
        case b: Byte => b.toLong
        case s: Short => s.toLong
      }
      to match {
        case ShortType => l.toShort
        case IntegerType => l.toInt
        case LongType => l
        case DoubleType => l.toDouble
      }
    case 8 => v // pruned structs project at decode ([[readStructPruned]]
                // — skipped fields never materialize); nothing to promote
    case 9 => v // likewise per array element ([[readArrayStructPruned]])
    case 10 => v // likewise per map value ([[readMapStructPruned]])
  }

  /** Decode a stored struct keeping only the `required` fields (an
    * order-preserving subset — [[upcast]] code 8); the others skip
    * byte-exactly without materializing. Kept fields may themselves be
    * pruned shapes (struct-in-struct, array/map carriers — r15):
    * decode recurses, so `rec.inner.x` never materializes `inner`'s
    * other fields either. */
  def readStructPruned(in: DataInputStream, stored: StructType,
      required: StructType): GenericInternalRow = {
    val vals = new Array[Any](required.length)
    var si = 0
    var ri = 0
    while (si < stored.length) {
      val present = in.readBoolean()
      if (ri < required.length && stored(si).name == required(ri).name) {
        if (present) vals(ri) =
          readPrunedValue(in, stored(si).dataType, required(ri).dataType)
        ri += 1
      } else if (present) skip(in, stored(si).dataType)
      si += 1
    }
    new GenericInternalRow(vals)
  }

  /** Decode one non-null value of stored type `s` as required type `r`
    * — [[readValue]] when the shapes coincide, the matching pruned
    * reader when `r` is a (nested) field subset of `s` (the shared
    * decode behind upcast codes 8/9/10). */
  def readPrunedValue(in: DataInputStream, s: DataType, r: DataType): Any =
    if (shape(s) == shape(r)) readValue(in, s)
    else (s, r) match {
      case (s: StructType, r: StructType) => readStructPruned(in, s, r)
      case (ArrayType(se, _), ArrayType(re, _)) =>
        val n = in.readInt()
        val vals = new Array[Any](n)
        var i = 0
        while (i < n) { vals(i) = readPrunedValue(in, se, re); i += 1 }
        new GenericArrayData(vals)
      case (MapType(sk, sv, _), MapType(_, rv, _)) =>
        val n = in.readInt()
        val ks = new Array[Any](n); val vs = new Array[Any](n)
        var i = 0
        while (i < n) { ks(i) = readValue(in, sk); i += 1 }
        i = 0
        while (i < n) {
          if (in.readBoolean()) vs(i) = readPrunedValue(in, sv, rv)
          i += 1
        }
        new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
          new GenericArrayData(ks), new GenericArrayData(vs))
      case other => throw new IllegalArgumentException(
        s"no pruned decode from ${s.simpleString} to ${r.simpleString}")
    }


  /** Read one non-null value of `dt` as the catalyst-internal value. */
  def readValue(in: DataInputStream, dt: DataType): Any = dt match {
    case IntegerType | DateType => in.readInt()
    case LongType | TimestampType | TimestampNTZType => in.readLong()
    case DoubleType => in.readDouble()
    case FloatType => in.readFloat()
    case BooleanType => in.readBoolean()
    case ByteType => in.readByte()
    case ShortType => in.readShort()
    case st: StructType =>
      val vals = new Array[Any](st.length)
      var i = 0
      while (i < st.length) {
        if (in.readBoolean()) vals(i) = readValue(in, st.fields(i).dataType)
        i += 1
      }
      new GenericInternalRow(vals)
    case mt: MapType =>
      val n = in.readInt()
      val ks = new Array[Any](n); val vs = new Array[Any](n)
      var i = 0
      while (i < n) { ks(i) = readValue(in, mt.keyType); i += 1 }
      i = 0
      while (i < n) {
        if (in.readBoolean()) vs(i) = readValue(in, mt.valueType)
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
        new GenericArrayData(ks), new GenericArrayData(vs))
    case StringType =>
      val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
      UTF8String.fromBytes(b)
    case BinaryType =>
      val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
      b
    case VariantType =>
      val nv = in.readInt(); val v = new Array[Byte](nv); in.readFully(v)
      val nm = in.readInt(); val m = new Array[Byte](nm); in.readFully(m)
      new org.apache.spark.unsafe.types.VariantVal(v, m)
    case d: DecimalType =>
      if (d.precision <= MaxCompactDecimal)
        Decimal(in.readLong(), d.precision, d.scale)
      else {
        val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
        Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(b), d.scale), d.precision, d.scale)
      }
    case ArrayType(et, _) =>
      val n = in.readInt()
      val vals = new Array[Any](n)
      var i = 0
      et match {
        case IntegerType => while (i < n) { vals(i) = in.readInt(); i += 1 }
        case LongType => while (i < n) { vals(i) = in.readLong(); i += 1 }
        case FloatType => while (i < n) { vals(i) = in.readFloat(); i += 1 }
        case DoubleType => while (i < n) { vals(i) = in.readDouble(); i += 1 }
        case StringType => while (i < n) {
          val m = in.readInt(); val b = new Array[Byte](m); in.readFully(b)
          vals(i) = UTF8String.fromBytes(b); i += 1 }
        // structs, nested arrays, maps, remaining atomics: recurse
        case other => while (i < n) { vals(i) = readValue(in, other); i += 1 }
      }
      new GenericArrayData(vals)
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  /** Advance the stream past one non-null value WITHOUT materializing
    * it — the column-pruning fast path. */
  def skip(in: DataInputStream, dt: DataType): Unit = dt match {
    case IntegerType | DateType | FloatType => skipFully(in, 4)
    case LongType | TimestampType | TimestampNTZType | DoubleType => skipFully(in, 8)
    case BooleanType | ByteType => skipFully(in, 1)
    case ShortType => skipFully(in, 2)
    case StringType | BinaryType => val n = in.readInt(); skipFully(in, n)
    case VariantType =>
      val nv = in.readInt(); skipFully(in, nv)
      val nm = in.readInt(); skipFully(in, nm)
    case d: DecimalType =>
      if (d.precision <= MaxCompactDecimal) skipFully(in, 8)
      else { val n = in.readInt(); skipFully(in, n) }
    case st: StructType =>
      var i = 0
      while (i < st.length) {
        if (in.readBoolean()) skip(in, st.fields(i).dataType)
        i += 1
      }
    case mt: MapType =>
      val n = in.readInt()
      var i = 0
      while (i < n) { skip(in, mt.keyType); i += 1 }
      i = 0
      while (i < n) { if (in.readBoolean()) skip(in, mt.valueType); i += 1 }
    case ArrayType(IntegerType | FloatType | DateType, _) =>
      val n = in.readInt(); skipFully(in, n.toLong * 4)
    case ArrayType(LongType | DoubleType | TimestampType | TimestampNTZType, _) =>
      val n = in.readInt(); skipFully(in, n.toLong * 8)
    case ArrayType(et, _) =>
      // variable-width or nested elements: skip one by one (strings,
      // structs, nested arrays, maps, decimals, ...)
      val n = in.readInt()
      var i = 0
      while (i < n) { skip(in, et); i += 1 }
    case other => throw new IllegalArgumentException(s"unsupported type $other")
  }

  private def skipFully(in: DataInputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s <= 0) { // skip() may return 0 at buffer boundaries; fall back to a read
        if (in.read() < 0) throw new EOFException(s"segment truncated, $left bytes missing")
        left -= 1
      } else left -= s
    }
  }

  /** Streaming min/max/null-count collector for one column — feeds the
    * manifest zone maps. String stats are kept only while every value
    * fits [[StatsCollector.MaxStatString]] bytes: a truncated min/max
    * would be UNSOUND for pruning (a prefix underestimates max), so
    * long-string columns simply carry no stats and are never pruned on.
    *
    * With `bloomBits > 0` the collector also builds a per-segment
    * BLOOM FILTER over the column's values — the point-lookup
    * complement to min/max: an equality predicate on a column the
    * layout does NOT cluster (custkey lookups on an orderkey-clustered
    * table) sees full-range zone maps everywhere, but a bloom answers
    * "this segment definitely lacks the value" for every segment the
    * key never touched. k = 6 double-hashed probes; soundness is
    * one-sided by construction (false positives only → a kept segment,
    * never a wrongly pruned one). Value hashing must agree with
    * [[SegmentBloom.hashValue]]'s literal-side canonicalization. */
  final class StatsCollector(dt: DataType, bloomBits: Int = 0,
      nestedBloomFor: Set[String] = Set.empty,
      collectNdv: Boolean = false,
      nestedNdvFor: Set[String] = Set.empty,
      collectHist: Boolean = false,
      nestedHistFor: Set[String] = Set.empty) {
    private val bloom: Array[Long] =
      if (bloomBits > 0 && SegmentBloom.bloomable(dt)) new Array[Long](bloomBits / 64)
      else null
    // declared NDV columns collect a per-segment KMV sketch (k-min
    // distinct portable hashes) — the manifest-resident distinctCount
    // feed for the optimizer ([[SegmentNdv]])
    private val kmv: SegmentNdv.Collector =
      if (collectNdv && SegmentNdv.hashable(dt)) new SegmentNdv.Collector else null
    // declared histogram columns collect a per-segment bounded exact
    // frequency map — the manifest-resident skew statistic feeding
    // catalyst's equi-height histogram face ([[SegmentHistogram]])
    private val hist: SegmentHistogram.Collector =
      if (collectHist && SegmentHistogram.supported(dt))
        new SegmentHistogram.Collector else null
    // the STRING arm (r16): engine-local exact frequency maps — the
    // CALL-face / distinctCount / salt-factor skew statistic for the
    // keys that ARE strings (language tags, status codes)
    private val shist: SegmentHistogram.StringCollector =
      if (collectHist && dt == StringType)
        new SegmentHistogram.StringCollector else null
    // STRUCT columns collect per-FIELD zone maps (one child collector
    // each; blooms for `nestedBloomFor`-declared fields, NDV sketches
    // for `nestedNdvFor`-declared fields): Spark pushes
    // nested predicates (`st.a = 5` arrives as a dotted V1 filter), so
    // typed-metadata fields inside structs prune segments exactly like
    // top-level columns. A field's null count includes parent-null
    // rows — `st.a IS NULL` is true when EITHER is null, so the
    // pruning rules stay exact.
    private val children: Array[(String, StatsCollector)] = dt match {
      case st: StructType =>
        st.fields.map(f => f.name -> new StatsCollector(f.dataType,
          if (nestedBloomFor.contains(f.name)) bloomBits else 0,
          collectNdv = nestedNdvFor.contains(f.name),
          collectHist = nestedHistFor.contains(f.name)))
      case _ => null
    }
    import StatsCollector.MaxStatString
    private var nulls = 0L
    private var any = false
    private var sound = dt match {
      case ByteType | ShortType | IntegerType | LongType | DoubleType |
          FloatType | TimestampType | TimestampNTZType | DateType |
          StringType => true
      case _: DecimalType => true
      case _ => false // booleans/binary/arrays/structs/maps: no zone maps
    }
    private var minL = 0L; private var maxL = 0L
    private var minD = 0.0; private var maxD = 0.0
    private var minS: UTF8String = _; private var maxS: UTF8String = _
    private var minDec: java.math.BigDecimal = _
    private var maxDec: java.math.BigDecimal = _
    // value BYTE lengths of string/binary columns — the avgLen/maxLen
    // optimizer feed (independent of `sound`: a >64-byte string kills
    // the zone map, not the length accounting)
    private val varWidth = dt == StringType || dt == BinaryType
    private var lenSumV = 0L; private var lenMaxV = 0L

    def addNull(): Unit = {
      nulls += 1
      if (children != null) children.foreach(_._2.addNull())
    }

    def add(row: InternalRow, ordinal: Int): Unit = {
      if (bloom != null) SegmentBloom.put(bloom, SegmentBloom.hashRow(dt, row, ordinal))
      if (kmv != null) kmv.add(SegmentNdv.canonical(dt, row, ordinal))
      if (hist != null) hist.add(SegmentHistogram.valueOf(dt, row, ordinal))
      if (shist != null) shist.add(row.getUTF8String(ordinal))
      if (varWidth) {
        val len =
          if (dt == StringType) row.getUTF8String(ordinal).numBytes().toLong
          else row.getBinary(ordinal).length.toLong
        lenSumV += len
        if (len > lenMaxV) lenMaxV = len
      }
      if (sound) addBounds(row, ordinal)
      if (children != null) {
        val s = row.getStruct(ordinal, children.length)
        var i = 0
        while (i < children.length) {
          if (s.isNullAt(i)) children(i)._2.addNull()
          else children(i)._2.add(s, i)
          i += 1
        }
      }
    }

    /** Per-field stats of a struct column, keyed by bare field name
      * (the writer prefixes the column name) — Nil for non-structs. */
    def nested: Seq[(String, ColumnStats)] =
      if (children == null) Nil
      else children.toSeq.map { case (n, c) =>
        val (ls, lm) = c.lenStats
        n -> ColumnStats(c.bounds, c.nullCount, c.bloomBase64, c.kmvBase64,
          ls, lm, c.histBase64, c.shistBase64) }

    private def addBounds(row: InternalRow, ordinal: Int): Unit = dt match {
      case IntegerType | DateType => addLong(row.getInt(ordinal).toLong)
      case ByteType => addLong(row.getByte(ordinal).toLong)
      case ShortType => addLong(row.getShort(ordinal).toLong)
      case LongType | TimestampType | TimestampNTZType => addLong(row.getLong(ordinal))
      case FloatType => addDouble(row.getFloat(ordinal).toDouble)
      case DoubleType => addDouble(row.getDouble(ordinal))
      case StringType =>
        val s = row.getUTF8String(ordinal)
        if (s.numBytes() > MaxStatString) { sound = false; minS = null; maxS = null }
        else {
          // clone: the incoming UTF8String aliases the row's buffer
          val c = s.clone()
          if (!any || c.compareTo(minS) < 0) minS = c
          if (!any || c.compareTo(maxS) > 0) maxS = c
          any = true
        }
      case d: DecimalType =>
        val v = row.getDecimal(ordinal, d.precision, d.scale).toJavaBigDecimal
        if (!any || v.compareTo(minDec) < 0) minDec = v
        if (!any || v.compareTo(maxDec) > 0) maxDec = v
        any = true
      case _ =>
    }

    private def addLong(v: Long): Unit = {
      if (!any || v < minL) minL = v
      if (!any || v > maxL) maxL = v
      any = true
    }
    private def addDouble(v: Double): Unit = {
      // any NaN poisons the column's bounds: Spark orders NaN above
      // every double, so a (min, max) that silently excluded an
      // observed NaN would let zone-map pruning drop segments whose
      // NaN rows match `col > x`, and metadata-only MAX/DELETE would
      // act on the wrong extreme. NaN min/max renders as unbounded
      // (bounds = None) below — matching SegmentPruning's refusal to
      // compare NaN literals.
      if (v.isNaN) { minD = Double.NaN; maxD = Double.NaN; any = true }
      else {
        if (!any || v < minD) minD = v
        if (!any || v > maxD) maxD = v
        any = true
      }
    }

    def nullCount: Long = nulls

    /** Base64 KMV sketch, None when not collected for this column. */
    def kmvBase64: Option[String] = Option(kmv).flatMap(_.base64)

    /** Base64 frequency map, None when not collected (or poisoned by
      * cap overflow) for this column. */
    def histBase64: Option[String] = Option(hist).flatMap(_.base64)

    /** Base64 STRING frequency map, None when not collected or
      * poisoned (cap overflow / oversized value). */
    def shistBase64: Option[String] = Option(shist).flatMap(_.base64)

    /** (Σ value bytes, max value bytes) for string/binary columns —
      * present even when all-null (zero is a true sum), absent for
      * fixed-width types (their width is the type's). */
    def lenStats: (Option[Long], Option[Long]) =
      if (varWidth) (Some(lenSumV), Some(lenMaxV)) else (None, None)

    /** Base64 bloom bits, None when not collected for this column. */
    def bloomBase64: Option[String] = Option(bloom).map { b =>
      val bb = java.nio.ByteBuffer.allocate(b.length * 8)
      b.foreach(bb.putLong)
      java.util.Base64.getEncoder.encodeToString(bb.array())
    }

    /** (min, max) serialized as strings for the manifest, or None when
      * the column carries no sound stats. */
    def bounds: Option[(String, String)] =
      if (!sound || !any) None
      else dt match {
        case ByteType | ShortType | IntegerType | LongType | TimestampType |
            TimestampNTZType | DateType =>
          Some((minL.toString, maxL.toString))
        case FloatType | DoubleType =>
          if (minD.isNaN || maxD.isNaN) None else Some((minD.toString, maxD.toString))
        case StringType => Some((minS.toString, maxS.toString))
        case _: DecimalType => Some((minDec.toPlainString, maxDec.toPlainString))
        case _ => None
      }
  }

  object StatsCollector { val MaxStatString = 64 }

  /** Fill `rows` slots of a vector with one constant (the catalyst
    * value of an EXISTS_DEFAULT — [[SegmentDefaults]]): served for
    * required columns a segment does not store. Atomic types only,
    * enforced at DDL time. */
  def fillConstant(v: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      dt: DataType, value: Any, rows: Int): Unit = {
    var r = 0
    dt match {
      case IntegerType | DateType =>
        val x = value.asInstanceOf[Int]; while (r < rows) { v.putInt(r, x); r += 1 }
      case ByteType =>
        val x = value.asInstanceOf[Byte]; while (r < rows) { v.putByte(r, x); r += 1 }
      case ShortType =>
        val x = value.asInstanceOf[Short]; while (r < rows) { v.putShort(r, x); r += 1 }
      case LongType | TimestampType | TimestampNTZType =>
        val x = value.asInstanceOf[Long]; while (r < rows) { v.putLong(r, x); r += 1 }
      case FloatType =>
        val x = value.asInstanceOf[Float]; while (r < rows) { v.putFloat(r, x); r += 1 }
      case DoubleType =>
        val x = value.asInstanceOf[Double]; while (r < rows) { v.putDouble(r, x); r += 1 }
      case BooleanType =>
        val x = value.asInstanceOf[Boolean]; while (r < rows) { v.putBoolean(r, x); r += 1 }
      case StringType =>
        val b = value.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
        while (r < rows) { v.putByteArray(r, b, 0, b.length); r += 1 }
      case BinaryType =>
        val b = value.asInstanceOf[Array[Byte]]
        while (r < rows) { v.putByteArray(r, b, 0, b.length); r += 1 }
      case d: DecimalType =>
        val x = value.asInstanceOf[Decimal]
        while (r < rows) { v.putDecimal(r, x, d.precision); r += 1 }
      case other => throw new IllegalArgumentException(
        s"no constant fill for ${other.simpleString}")
    }
  }

  /** Decode rows from a segment stream, materializing only `required`
    * columns (in required-field order). `template`, when non-null,
    * seeds each output row (existence defaults for columns this
    * segment does not store — stored positions are always null in it,
    * so stored NULLs stay null). */
  final class RowIterator(in: DataInputStream, stored: StructType, required: StructType,
      template: Array[Any] = null)
      extends Iterator[InternalRow] with java.io.Closeable {
    private val outIdx: Array[Int] = stored.fields.map(f => required.fieldIndex2(f.name))
    private val types: Array[DataType] = stored.fields.map(_.dataType)
    // widened columns decode as written, then promote into the
    // required (current) type — stored != required only after an
    // ALTER COLUMN TYPE, and only for pre-widen segments
    private val up: Array[Int] = Array.tabulate(types.length)(c =>
      if (outIdx(c) < 0) 0 else upcast(types(c), required(outIdx(c)).dataType))
    private val reqT: Array[DataType] = Array.tabulate(types.length)(c =>
      if (outIdx(c) < 0) null else required(outIdx(c)).dataType)
    private var nextRow: InternalRow = _
    private var done = false
    private val body = bodyIn(in, readHeader(in, stored.length))

    private def advance(): Unit = {
      if (done) return
      val first = body.read() // marker of column 0, or EOF
      if (first < 0) { done = true; nextRow = null; return }
      val vals =
        if (template == null) new Array[Any](required.length) else template.clone()
      var c = 0
      while (c < types.length) {
        val present = if (c == 0) first == 1 else body.readBoolean()
        val o = outIdx(c)
        if (present) {
          if (o < 0) skip(body, types(c))
          // nested pruning (codes 8/9/10 — struct fields, array
          // elements, map values, recursively): one shared reader
          else if (up(c) >= 8) vals(o) = readPrunedValue(body, types(c), reqT(c))
          else vals(o) = promote(readValue(body, types(c)), up(c), reqT(c))
        } // null → vals(o) stays null
        c += 1
      }
      nextRow = new GenericInternalRow(vals)
    }

    advance()
    override def hasNext: Boolean = nextRow != null
    override def next(): InternalRow = { val r = nextRow; advance(); r }
    override def close(): Unit = { body.close(); in.close() }
  }

  /** True when `dt` has a vectorized decode path ([[readBatch]]).
    * Primitive arrays decode into the vector's CHILD array (offsets +
    * appended elements), so `array<float>` embedding scans — the
    * hottest LLM-pipeline shape — stay columnar instead of dropping
    * the whole scan to the row reader. */
  def vectorizable(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DoubleType |
        FloatType | BooleanType | StringType | BinaryType | TimestampType |
        TimestampNTZType | DateType => true
    case _: DecimalType => true
    case ArrayType(IntegerType | LongType | FloatType | DoubleType | StringType, _) => true
    // struct fields write POSITIONALLY into child vectors — every
    // atomic type has a positional put, decimals included. An
    // ARRAY-typed field (r14's span shape) combines both disciplines:
    // elements APPEND into the field child's own element vector, the
    // (offset, length) window puts POSITIONALLY at the row index
    case StructType(fields) =>
      fields.forall(f => atomic(f.dataType) || scalarArray(f.dataType))
    // map entries APPEND into the two child vectors; decimals have no
    // append form, so decimal-keyed/valued maps take the row reader.
    // STRUCT values append via appendStruct + lockstep field appends
    // (a NULL struct value must appendStruct(true) so the field
    // children stay in step — plain appendNull would desync them)
    case MapType(k, v, _) =>
      def appendable(t: DataType): Boolean = atomic(t) && !t.isInstanceOf[DecimalType]
      appendable(k) && (v match {
        case t if appendable(t) => true
        case StructType(fields) => fields.forall(f => appendable(f.dataType))
        case _ => false
      })
    // array<struct> elements appendStruct into the element vector and
    // the fields append into ITS children in lockstep (the map-arm
    // discipline) — decimal fields take the row reader like maps;
    // array-typed element fields ride appendArray (window first,
    // elements after — the WritableColumnVector append contract)
    case ArrayType(st: StructType, _) =>
      st.fields.forall(f =>
        (atomic(f.dataType) && !f.dataType.isInstanceOf[DecimalType]) ||
          scalarArray(f.dataType))
    case _ => false
  }

  /** Decode up to `maxRows` rows into writable column vectors — the
    * vectorized read path: one virtual call per VALUE instead of a
    * GenericInternalRow allocation plus boxing per ROW, and the
    * downstream operators run Spark's columnar-to-row codegen instead
    * of the row iterator. Same byte layout, same skip discipline for
    * unrequested columns. Returns rows decoded (0 = exhausted).
    *
    * `vectors` is indexed by REQUIRED column position; `fill` columns
    * (e.g. the `_segment` metadata constant) are written by the caller.
    */
  def readBatch(in: DataInputStream, stored: StructType, required: StructType,
      vectors: Array[org.apache.spark.sql.execution.vectorized.WritableColumnVector],
      maxRows: Int): Int =
    readBatchLive(in, stored, required, vectors, maxRows, 0L, null, null, -1)._1

  /** [[readBatch]] with DELETION-VECTOR filtering in the decode loop —
    * the columnar path stays columnar for dv'd segments (Spark forbids
    * mixing row and columnar partitions within one scan, so a
    * per-partition fallback is not an option). A dead physical row's
    * bytes are CONSUMED without touching a vector slot; `posIdx >= 0`
    * fills that required column with the live rows' PHYSICAL ordinals.
    * `pos0` is the physical position of the next row in the stream;
    * returns (live rows decoded, next physical position) so the caller
    * threads positions across batches. */
  def readBatchLive(in: DataInputStream, stored: StructType, required: StructType,
      vectors: Array[org.apache.spark.sql.execution.vectorized.WritableColumnVector],
      maxRows: Int, pos0: Long, skipBits: Array[Long], onlyBits: Array[Long],
      posIdx: Int): (Int, Long) = {
    val outIdx: Array[Int] = stored.fields.map(f => {
      var i = 0; var found = -1
      while (i < required.length && found < 0) {
        if (required(i).name == f.name) found = i; i += 1
      }
      found
    })
    val types: Array[DataType] = stored.fields.map(_.dataType)
    // widened columns: decode as written, put into the (wider) vector
    val up: Array[Int] = Array.tabulate(types.length)(c =>
      if (outIdx(c) < 0) 0 else upcast(types(c), required(outIdx(c)).dataType))
    var r = 0
    var pos = pos0
    var exhausted = false
    while (r < maxRows && !exhausted) {
      val first = in.read()
      if (first < 0) exhausted = true
      else {
        val dead = (skipBits != null && DeletionVector.contains(skipBits, pos)) ||
          (onlyBits != null && !DeletionVector.contains(onlyBits, pos))
        var c = 0
        while (c < types.length) {
          val present = if (c == 0) first == 1 else in.readBoolean()
          val o = if (dead) -1 else outIdx(c)
          if (o < 0) { if (present) skip(in, types(c)) }
          else if (!present) vectors(o).putNull(r)
          else {
            val v = vectors(o)
            types(c) match {
              case IntegerType | DateType =>
                if (up(c) == 1) v.putLong(r, in.readInt().toLong)
                else if (up(c) == 5) v.putDouble(r, in.readInt().toDouble)
                else v.putInt(r, in.readInt())
              case ByteType =>
                val x = in.readByte()
                if (up(c) == 0) v.putByte(r, x)
                else putWidened(v, required(o).dataType, r, x.toLong)
              case ShortType =>
                val x = in.readShort()
                if (up(c) == 0) v.putShort(r, x)
                else putWidened(v, required(o).dataType, r, x.toLong)
              case st: StructType =>
                // fields write POSITIONALLY into the struct's child
                // vectors at the same row index; the parent tracks
                // only nulls (handled by the generic !present branch).
                // Child vectors follow the REQUIRED (possibly
                // nested-pruned) struct; stored-only fields skip.
                val req = required(o).dataType.asInstanceOf[StructType]
                var i = 0
                var ri = 0
                while (i < st.length) {
                  val present = in.readBoolean()
                  if (ri < req.length && st(i).name == req(ri).name) {
                    val child = v.getChild(ri)
                      .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
                    if (present) putAtomic(in, st.fields(i).dataType, child, r)
                    else child.putNull(r)
                    ri += 1
                  } else if (present) skip(in, st.fields(i).dataType)
                  i += 1
                }
              case mt: MapType =>
                // entries APPEND into the key/value child vectors in
                // lockstep; the row slot records the (offset, length)
                // window exactly like arrays
                val n = in.readInt()
                val kc = v.getChild(0)
                  .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
                val vc = v.getChild(1)
                  .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
                val start = kc.getElementsAppended
                var i = 0
                while (i < n) { appendAtomic(in, mt.keyType, kc); i += 1 }
                i = 0
                val structVal = mt.valueType.isInstanceOf[StructType]
                // struct values follow the REQUIRED (possibly value-
                // pruned — upcast code 10) struct: `SELECT m['t0'].n`
                // plans map<string, struct<n>>, the vector's value
                // children are the required fields, and stored-only
                // fields skip without materializing (code 9's per-
                // element discipline, per map entry)
                val reqVSt = if (structVal) required(o).dataType
                  .asInstanceOf[MapType].valueType.asInstanceOf[StructType] else null
                while (i < n) {
                  if (in.readBoolean()) {
                    if (structVal) {
                      val st = mt.valueType.asInstanceOf[StructType]
                      vc.appendStruct(false)
                      var si = 0
                      var ri = 0
                      while (si < st.length) {
                        val present = in.readBoolean()
                        if (ri < reqVSt.length && st(si).name == reqVSt(ri).name) {
                          val fc = vc.getChild(ri)
                            .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
                          if (present) appendAtomic(in, st.fields(si).dataType, fc)
                          else fc.appendNull()
                          ri += 1
                        } else if (present) skip(in, st.fields(si).dataType)
                        si += 1
                      }
                    } else appendAtomic(in, mt.valueType, vc)
                  }
                  // a NULL struct value appends null to its field
                  // children too (appendStruct(true)) — plain
                  // appendNull would leave them one slot behind
                  else if (structVal) vc.appendStruct(true)
                  else vc.appendNull()
                  i += 1
                }
                v.putArray(r, start, n)
              case LongType | TimestampType | TimestampNTZType => v.putLong(r, in.readLong())
              case DoubleType => v.putDouble(r, in.readDouble())
              case FloatType =>
                if (up(c) == 2) v.putDouble(r, in.readFloat().toDouble)
                else v.putFloat(r, in.readFloat())
              case BooleanType => v.putBoolean(r, in.readBoolean())
              case StringType | BinaryType =>
                val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
                v.putByteArray(r, b, 0, n)
              case d: DecimalType =>
                // the vector is typed by the REQUIRED precision (it
                // may be wider after an ALTER COLUMN TYPE) — putDecimal
                // dispatches storage on the precision passed in
                val reqP = required(o).dataType.asInstanceOf[DecimalType].precision
                if (d.precision <= MaxCompactDecimal)
                  v.putDecimal(r, Decimal(in.readLong(), d.precision, d.scale), reqP)
                else {
                  val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
                  v.putDecimal(r, Decimal(new java.math.BigDecimal(
                    new java.math.BigInteger(b), d.scale), d.precision, d.scale), reqP)
                }
              case ArrayType(et, _) =>
                // elements APPEND into the child vector (it grows and
                // resets with the parent); the row slot records the
                // (offset, length) window. The format stores array
                // elements densely non-null, so no child null marks.
                val n = in.readInt()
                val child = v.arrayData()
                val start = child.getElementsAppended
                var i = 0
                et match {
                  case IntegerType =>
                    if (up(c) == 3)
                      while (i < n) { child.appendLong(in.readInt().toLong); i += 1 }
                    else while (i < n) { child.appendInt(in.readInt()); i += 1 }
                  case LongType =>
                    while (i < n) { child.appendLong(in.readLong()); i += 1 }
                  case FloatType =>
                    if (up(c) == 4)
                      while (i < n) { child.appendDouble(in.readFloat().toDouble); i += 1 }
                    else while (i < n) { child.appendFloat(in.readFloat()); i += 1 }
                  case DoubleType =>
                    while (i < n) { child.appendDouble(in.readDouble()); i += 1 }
                  case StringType =>
                    while (i < n) {
                      val m = in.readInt(); val b = new Array[Byte](m)
                      in.readFully(b)
                      child.appendByteArray(b, 0, m); i += 1
                    }
                  case st: StructType =>
                    // each element appendStructs into the element
                    // vector, then its fields append into the element
                    // vector's children in lockstep; the element
                    // vector follows the REQUIRED (possibly
                    // nested-pruned — upcast code 9) struct, so
                    // stored-only fields skip without materializing
                    val req = required(o).dataType.asInstanceOf[ArrayType]
                      .elementType.asInstanceOf[StructType]
                    while (i < n) {
                      child.appendStruct(false)
                      var si = 0
                      var ri = 0
                      while (si < st.length) {
                        val present = in.readBoolean()
                        if (ri < req.length && st(si).name == req(ri).name) {
                          val fc = child.getChild(ri)
                            .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
                          if (present) appendAtomic(in, st.fields(si).dataType, fc)
                          else fc.appendNull()
                          ri += 1
                        } else if (present) skip(in, st.fields(si).dataType)
                        si += 1
                      }
                      i += 1
                    }
                  case other =>
                    throw new IllegalArgumentException(s"not vectorizable: array<$other>")
                }
                v.putArray(r, start, n)
              case other => throw new IllegalArgumentException(s"not vectorizable: $other")
            }
          }
          c += 1
        }
        if (!dead) {
          if (posIdx >= 0) vectors(posIdx).putLong(r, pos)
          r += 1
        }
        pos += 1
      }
    }
    (r, pos)
  }

  /** Positional put of a widened integer-family value (upcast 7). */
  private def putWidened(
      v: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      to: DataType, r: Int, l: Long): Unit = to match {
    case ShortType => v.putShort(r, l.toShort)
    case IntegerType => v.putInt(r, l.toInt)
    case LongType => v.putLong(r, l)
    case DoubleType => v.putDouble(r, l.toDouble)
    case other => throw new IllegalArgumentException(
      s"no integer-family widen target ${other.simpleString}")
  }

  /** Append `n` dense scalar elements into an ELEMENT vector — the
    * shared tail of every array decode (top-level arrays, map
    * children, and r14's array-typed struct/element fields). */
  private def appendScalarElements(in: DataInputStream, et: DataType,
      ac: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      n: Int): Unit = {
    var i = 0
    et match {
      case IntegerType => while (i < n) { ac.appendInt(in.readInt()); i += 1 }
      case LongType => while (i < n) { ac.appendLong(in.readLong()); i += 1 }
      case FloatType => while (i < n) { ac.appendFloat(in.readFloat()); i += 1 }
      case DoubleType => while (i < n) { ac.appendDouble(in.readDouble()); i += 1 }
      case StringType => while (i < n) {
        val m = in.readInt(); val b = new Array[Byte](m); in.readFully(b)
        ac.appendByteArray(b, 0, m); i += 1
      }
      case other => throw new IllegalArgumentException(
        s"not an appendable array element: ${other.simpleString}")
    }
  }

  /** Positional decode of one atomic (or array-of-scalars — the span
    * shape) value into a child vector at row `r` — the struct-field
    * path (structs never widen, so the stored and required types
    * coincide). */
  private def putAtomic(in: DataInputStream, dt: DataType,
      v: org.apache.spark.sql.execution.vectorized.WritableColumnVector,
      r: Int): Unit = dt match {
    case IntegerType | DateType => v.putInt(r, in.readInt())
    case LongType | TimestampType | TimestampNTZType => v.putLong(r, in.readLong())
    case DoubleType => v.putDouble(r, in.readDouble())
    case FloatType => v.putFloat(r, in.readFloat())
    case BooleanType => v.putBoolean(r, in.readBoolean())
    case ByteType => v.putByte(r, in.readByte())
    case ShortType => v.putShort(r, in.readShort())
    case StringType | BinaryType =>
      val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
      v.putByteArray(r, b, 0, n)
    case d: DecimalType =>
      if (d.precision <= MaxCompactDecimal)
        v.putDecimal(r, Decimal(in.readLong(), d.precision, d.scale), d.precision)
      else {
        val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
        v.putDecimal(r, Decimal(new java.math.BigDecimal(
          new java.math.BigInteger(b), d.scale), d.precision, d.scale), d.precision)
      }
    case ArrayType(et, _) =>
      // the field child is itself an array vector: elements append
      // into ITS element vector, the (offset, length) window puts at
      // the struct's row index — rows whose struct (or field) is null
      // simply never put a window, and the parent/field null mark
      // keeps the garbage slot unreadable
      val n = in.readInt()
      val ac = v.arrayData()
        .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
      val start = ac.getElementsAppended
      appendScalarElements(in, et, ac, n)
      v.putArray(r, start, n)
    case other => throw new IllegalArgumentException(
      s"not a positional atomic decode: ${other.simpleString}")
  }

  /** Append-style decode of one atomic value into a map's key/value
    * child vector (decimals excluded — no append form; the
    * [[vectorizable]] gate routes them to the row reader), or of an
    * array-of-scalars field inside an array<struct> element (the span
    * shape): appendArray records the window over the element vector's
    * CURRENT high-water mark, then the elements append after it — the
    * WritableColumnVector append contract. */
  private def appendAtomic(in: DataInputStream, dt: DataType,
      v: org.apache.spark.sql.execution.vectorized.WritableColumnVector): Unit = dt match {
    case IntegerType | DateType => v.appendInt(in.readInt())
    case LongType | TimestampType | TimestampNTZType => v.appendLong(in.readLong())
    case DoubleType => v.appendDouble(in.readDouble())
    case FloatType => v.appendFloat(in.readFloat())
    case BooleanType => v.appendBoolean(in.readBoolean())
    case ByteType => v.appendByte(in.readByte())
    case ShortType => v.appendShort(in.readShort())
    case StringType | BinaryType =>
      val n = in.readInt(); val b = new Array[Byte](n); in.readFully(b)
      v.appendByteArray(b, 0, n)
    case ArrayType(et, _) =>
      val n = in.readInt()
      v.appendArray(n)
      appendScalarElements(in, et, v.arrayData()
        .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector], n)
    case st: StructType =>
      // a struct MAP VALUE (r14): one appendStruct slot, then each
      // field appends into its child in lockstep (null fields append
      // null — field children are element-indexed, so every element
      // must land exactly one slot per child)
      v.appendStruct(false)
      var i = 0
      while (i < st.length) {
        val fc = v.getChild(i)
          .asInstanceOf[org.apache.spark.sql.execution.vectorized.WritableColumnVector]
        if (in.readBoolean()) appendAtomic(in, st.fields(i).dataType, fc)
        else fc.appendNull()
        i += 1
      }
    case other => throw new IllegalArgumentException(
      s"not an appendable atomic decode: ${other.simpleString}")
  }

  private implicit final class SchemaOps(val s: StructType) extends AnyVal {
    /** fieldIndex that returns -1 instead of throwing. */
    def fieldIndex2(name: String): Int = {
      var i = 0
      while (i < s.length) { if (s(i).name == name) return i; i += 1 }
      -1
    }
  }
}
