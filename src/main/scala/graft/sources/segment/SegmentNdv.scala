package graft.sources.segment

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._

/** Per-segment KMV (k-minimum-values, k = 256) distinct sketches —
  * NDV statistics the optimizer reads from the MANIFEST, never from a
  * scan:
  *
  * {{{
  * CREATE TABLE graft.db.t (k BIGINT, lang STRING)
  *   TBLPROPERTIES ('ndvFor' = 'k,lang')   -- or option("ndvFor", ...)
  * }}}
  *
  * Declared columns collect the k smallest 32-bit hashes of their
  * DISTINCT values per segment (1 KiB per column-segment); min-k sets
  * are mergeable (the global k smallest are each in their segment's k
  * smallest), so planning reduces live segments' sketches to a table
  * NDV in manifest time. The estimate feeds
  * [[org.apache.spark.sql.connector.read.colstats.ColumnStatistics
  * .distinctCount]] beside the zone-map min/max/nullCount — at 100 TB
  * cost-based join reordering needs NDV, and an ANALYZE scan over a
  * petabyte to get it is exactly the pass this table format exists to
  * avoid. Incremental by construction: every append computes its own
  * segment's sketch from rows already streaming through the encoder.
  *
  * The hash is the repo's engine-portable construction (first 8 hex
  * chars of md5 of the canonical string — [[graft.ops.Hll.hash32]]'s
  * contract), so the estimate is a DETERMINISTIC function of the data
  * that DuckDB replays bit-for-bit; the estimator is single divisions
  * of exact integers (no float-order ambiguity). Estimates are
  * OVER-APPROXIMATE under deletion vectors (a dv'd row's value still
  * counts) — fine for statistics, which are estimates by contract.
  *
  * Supported columns: STRING and the integer family (their canonical
  * strings match DuckDB's CAST(x AS VARCHAR) exactly); anything else
  * is refused at declaration time. */
object SegmentNdv {
  val K = 256

  def hashable(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Validate an `ndvFor` declaration: existing, hashable, top-level
    * columns only. */
  def parseCols(csv: String, schema: Option[StructType] = None): Set[String] = {
    val cols = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    schema.foreach(sc => cols.foreach { c =>
      val f = sc.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"ndvFor column $c not in schema"))
      require(hashable(f.dataType),
        s"ndvFor column $c: NDV sketches support STRING and the integer " +
          s"family, not ${f.dataType.simpleString}")
    })
    cols
  }

  /** The portable 32-bit hash: first 8 hex chars of md5(canonical). */
  def hash(canonical: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Canonical string of a non-null value — integer-family values
    * render as their decimal string (= DuckDB's CAST(x AS VARCHAR)). */
  def canonical(dt: DataType, row: InternalRow, ordinal: Int): String = dt match {
    case StringType => row.getUTF8String(ordinal).toString
    case ByteType => row.getByte(ordinal).toString
    case ShortType => row.getShort(ordinal).toString
    case IntegerType => row.getInt(ordinal).toString
    case LongType => row.getLong(ordinal).toString
    case other => throw new IllegalArgumentException(
      s"no NDV canonicalization for ${other.simpleString}")
  }

  /** Bounded distinct min-k collector (TreeSet dedups; cap at K). */
  final class Collector {
    private val mins = new java.util.TreeSet[java.lang.Long]()
    def add(h: Long): Unit = {
      mins.add(h)
      if (mins.size > K) mins.pollLast()
    }
    /** Base64 of the sorted hashes as 4-byte big-endian ints (hashes
      * are 32-bit by construction). */
    def base64: Option[String] =
      if (mins.isEmpty) None
      else {
        val bb = java.nio.ByteBuffer.allocate(mins.size * 4)
        mins.forEach(h => bb.putInt(h.intValue()))
        Some(java.util.Base64.getEncoder.encodeToString(bb.array()))
      }
  }

  def decode(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt().toLong & 0xffffffffL)
  }

  /** Merge per-segment sketches and estimate NDV: the k smallest of
    * the deduped union are the global min-k; fewer than K merged
    * hashes means NO segment saturated, so the count is exact (modulo
    * hash collisions — the same contract as the query-level KMV). */
  def estimate(sketches: Seq[Array[Long]]): Double = {
    val merged = sketches.flatten.distinct.sorted.take(K)
    if (merged.length < K) merged.length.toDouble
    else (K - 1).toDouble * 4294967296.0 / merged.last
  }
}
