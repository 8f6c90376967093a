package graft.sources.segment

import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._

/** Zone-map segment pruning: decide from a segment's manifest stats
  * whether a pushed filter can PROVABLY match no row in it.
  *
  * Soundness contract: [[prunes]] returns true only when the segment
  * certainly contains no matching row. Every uncertain case — missing
  * stats, un-parseable literal, unsupported predicate shape, non-ASCII
  * string bounds — answers false (keep the segment). Spark re-applies
  * every pushed filter row-by-row after the scan (the ScanBuilder
  * returns all filters as residual), so pruning is purely an I/O
  * optimization and can never change results.
  *
  * String comparisons: manifest bounds were collected in UTF8String
  * (binary) order, while `java.lang.String.compareTo` is UTF-16 order.
  * The two agree exactly on ASCII, so string pruning engages only when
  * bounds and literal are all-ASCII — the common case for the code-like
  * columns (status, lang, source) zone maps help with.
  */
object SegmentPruning {

  def prunes(filter: Filter, schema: StructType, seg: SegmentMeta): Boolean = filter match {
    case And(l, r) => prunes(l, schema, seg) || prunes(r, schema, seg)
    case Or(l, r) => prunes(l, schema, seg) && prunes(r, schema, seg)
    case EqualTo(c, v) =>
      outsideBounds(c, v, schema, seg, lo = true, hi = true) ||
        bloomExcludes(c, v, schema, seg)
    case EqualNullSafe(c, null) => seg.stats.get(c).exists(_.nullCount == 0L)
    case EqualNullSafe(c, v) =>
      outsideBounds(c, v, schema, seg, lo = true, hi = true) ||
        bloomExcludes(c, v, schema, seg)
    case GreaterThan(c, v) => cmpMax(c, v, schema, seg).exists(_ <= 0) // max <= v
    case GreaterThanOrEqual(c, v) => cmpMax(c, v, schema, seg).exists(_ < 0) // max < v
    case LessThan(c, v) => cmpMin(c, v, schema, seg).exists(_ >= 0) // min >= v
    case LessThanOrEqual(c, v) => cmpMin(c, v, schema, seg).exists(_ > 0) // min > v
    case In(c, vs) =>
      vs.nonEmpty && vs.forall(v =>
        v != null && (outsideBounds(c, v, schema, seg, lo = true, hi = true) ||
          bloomExcludes(c, v, schema, seg)))
    case IsNull(c) => seg.stats.get(c).exists(_.nullCount == 0L)
    case IsNotNull(c) => seg.stats.get(c).exists(_.nullCount == seg.rows)
    case StringStartsWith(c, p) => prefixPrunes(c, p, seg)
    case _ => false
  }

  /** The dual of [[prunes]]: true only when EVERY row of the segment
    * provably satisfies the filter — the metadata-only DELETE
    * decision (a segment where all rows match can be dropped from the
    * manifest without being read). Null rows fail every predicate
    * except IS NULL, so each value rule also requires zero nulls.
    * Conservative by the same contract: uncertain → false. */
  def allMatch(filter: Filter, schema: StructType, seg: SegmentMeta): Boolean = {
    def noNulls(c: String) = seg.stats.get(c).exists(_.nullCount == 0L)
    filter match {
      case And(l, r) => allMatch(l, schema, seg) && allMatch(r, schema, seg)
      case Or(l, r) => allMatch(l, schema, seg) || allMatch(r, schema, seg)
      case EqualTo(c, v) => noNulls(c) &&
        cmpMin(c, v, schema, seg).contains(0) && cmpMax(c, v, schema, seg).contains(0)
      case GreaterThan(c, v) => noNulls(c) && cmpMin(c, v, schema, seg).exists(_ > 0)
      case GreaterThanOrEqual(c, v) => noNulls(c) && cmpMin(c, v, schema, seg).exists(_ >= 0)
      case LessThan(c, v) => noNulls(c) && cmpMax(c, v, schema, seg).exists(_ < 0)
      case LessThanOrEqual(c, v) => noNulls(c) && cmpMax(c, v, schema, seg).exists(_ <= 0)
      case In(c, vs) => vs.exists(v => v != null && allMatch(EqualTo(c, v), schema, seg))
      case IsNull(c) => seg.stats.get(c).exists(_.nullCount == seg.rows)
      case IsNotNull(c) => noNulls(c)
      case _ => false
    }
  }

  /** compare(max(col), v): Some(sign) when provable, None otherwise. */
  private def cmpMax(c: String, v: Any, schema: StructType, seg: SegmentMeta): Option[Int] =
    bound(c, schema, seg, min = false).flatMap(mx => compare(schema, c, mx, v))

  private def cmpMin(c: String, v: Any, schema: StructType, seg: SegmentMeta): Option[Int] =
    bound(c, schema, seg, min = true).flatMap(mn => compare(schema, c, mn, v))

  /** v < min || v > max, both sides provable as requested. */
  private def outsideBounds(c: String, v: Any, schema: StructType, seg: SegmentMeta,
      lo: Boolean, hi: Boolean): Boolean =
    (lo && cmpMin(c, v, schema, seg).exists(_ > 0)) ||
      (hi && cmpMax(c, v, schema, seg).exists(_ < 0))

  /** Bloom point-lookup pruning: the segment carries a bloom for the
    * column and it PROVES the value absent. One-sided by the bloom
    * contract (false positives keep the segment); engages only when
    * the pushed literal canonicalizes into the column's key domain
    * exactly as the write side hashed it ([[SegmentBloom.hashValue]]).
    * This is what decides equality on columns the layout does not
    * cluster — full-range zone maps everywhere, but most segments
    * never saw the key. */
  private def bloomExcludes(c: String, v: Any, schema: StructType, seg: SegmentMeta): Boolean = {
    val dt = fieldType(schema, c).getOrElse(return false)
    seg.stats.get(c).flatMap(_.bloom) match {
      case Some(b64) =>
        SegmentBloom.hashValue(dt, v).exists(h => !SegmentBloom.mightContain(b64, h))
      case None => false
    }
  }

  /** Resolve a pushed column reference's type: an exact top-level
    * match first (a literal-dotted name wins), then one level of
    * struct-field resolution — Spark pushes nested predicates with
    * dotted names (`st.a = 5`), and struct columns carry per-field
    * zone maps under the same keys. */
  private def fieldType(schema: StructType, c: String): Option[DataType] = {
    schema.fields.find(_.name == c).map(_.dataType).orElse {
      val dot = c.indexOf('.')
      if (dot <= 0) None
      else schema.fields.find(_.name == c.substring(0, dot)).map(_.dataType) match {
        case Some(st: StructType) =>
          st.fields.find(_.name == c.substring(dot + 1)).map(_.dataType)
        case _ => None
      }
    }
  }

  /** The segment's serialized min or max for the column. */
  private def bound(c: String, schema: StructType, seg: SegmentMeta, min: Boolean): Option[String] =
    seg.stats.get(c).flatMap(_.bounds).map(b => if (min) b._1 else b._2)

  /** compare(bound, literal) in the column's domain; None when the
    * literal can't be soundly interpreted there. */
  private def compare(schema: StructType, c: String, boundStr: String, v: Any): Option[Int] = {
    val dt = fieldType(schema, c).getOrElse(return None)
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        asLong(v).map(l => java.lang.Long.compare(boundStr.toLong, l))
      case TimestampType =>
        asMicros(v).map(l => java.lang.Long.compare(boundStr.toLong, l))
      case TimestampNTZType =>
        asNtzMicros(v).map(l => java.lang.Long.compare(boundStr.toLong, l))
      case DateType =>
        asDays(v).map(d => java.lang.Integer.compare(boundStr.toInt, d))
      case FloatType | DoubleType =>
        asDouble(v).map(d => java.lang.Double.compare(boundStr.toDouble, d))
      case StringType => v match {
        case s: String if isAscii(s) && isAscii(boundStr) => Some(boundStr.compareTo(s))
        case _ => None
      }
      case _: DecimalType => asBigDecimal(v).map(b =>
        new java.math.BigDecimal(boundStr).compareTo(b))
      case _ => None
    }
  }

  /** Pushed decimal literals arrive as java.math.BigDecimal (the
    * catalyst→Scala conversion); integer literals compare exactly in
    * the same domain. */
  private def asBigDecimal(v: Any): Option[java.math.BigDecimal] = v match {
    case b: java.math.BigDecimal => Some(b)
    case b: scala.math.BigDecimal => Some(b.bigDecimal)
    case i: Int => Some(java.math.BigDecimal.valueOf(i.toLong))
    case l: Long => Some(java.math.BigDecimal.valueOf(l))
    case _ => None
  }

  private def asLong(v: Any): Option[Long] = v match {
    case i: Int => Some(i.toLong)
    case l: Long => Some(l)
    case s: Short => Some(s.toLong)
    case b: Byte => Some(b.toLong)
    case _ => None
  }

  private def asDouble(v: Any): Option[Double] = v match {
    case d: Double if !d.isNaN => Some(d)
    case f: Float if !f.isNaN => Some(f.toDouble)
    case i: Int => Some(i.toDouble)
    case l: Long => Some(l.toDouble)
    case _ => None
  }

  /** Pushed timestamp literals arrive as java.sql.Timestamp or
    * java.time.Instant depending on spark.sql.datetime.java8API. */
  private def asMicros(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp =>
      Some(Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L)
    case i: java.time.Instant =>
      Some(i.getEpochSecond * 1000000L + i.getNano / 1000L)
    case _ => None
  }

  /** NTZ literals arrive as java.time.LocalDateTime: micros of the
    * wall-clock value, zone-free by definition. */
  private def asNtzMicros(v: Any): Option[Long] = v match {
    case dt: java.time.LocalDateTime =>
      Some(dt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + dt.getNano / 1000L)
    case _ => None
  }

  private def asDays(v: Any): Option[Int] = v match {
    case d: java.sql.Date => Some(d.toLocalDate.toEpochDay.toInt)
    case d: java.time.LocalDate => Some(d.toEpochDay.toInt)
    case _ => None
  }

  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) { if (s.charAt(i) > 127) return false; i += 1 }
    true
  }

  /** s startsWith p ⇒ p <= s < succ(p), so prune when max < p or
    * min >= succ(p). succ increments the last character — sound for
    * the ASCII-only case this engages in. */
  private def prefixPrunes(c: String, p: String, seg: SegmentMeta): Boolean = {
    if (p.isEmpty || !isAscii(p)) return false
    seg.stats.get(c).flatMap(_.bounds) match {
      case Some((mn, mx)) if isAscii(mn) && isAscii(mx) =>
        val succ = p.substring(0, p.length - 1) + (p.charAt(p.length - 1) + 1).toChar
        mx.compareTo(p) < 0 || mn.compareTo(succ) >= 0
      case _ => false
    }
  }
}
