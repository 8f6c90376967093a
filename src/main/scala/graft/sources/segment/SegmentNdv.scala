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
  * smallest), so every commit also maintains the TABLE-LEVEL merged
  * sketch in the manifest ([[Manifest.ndvMerged]]) and planning reads
  * the estimate in O(k) — no per-plan flatten over live segments. The
  * estimate feeds
  * [[org.apache.spark.sql.connector.read.colstats.ColumnStatistics
  * .distinctCount]] beside the zone-map min/max/nullCount — at 100 TB
  * cost-based join reordering needs NDV, and an ANALYZE scan over a
  * petabyte to get it is exactly the pass this table format exists to
  * avoid. Incremental by construction: every append computes its own
  * segment's sketch from rows already streaming through the encoder,
  * and the commit extends the table sketch with just the new
  * segments' hashes (KMV merge is associative).
  *
  * The hash is the repo's engine-portable construction (first 8 hex
  * chars of md5 of the canonical string — [[graft.ops.Hll.hash32]]'s
  * contract), so the estimate is a DETERMINISTIC function of the data
  * that DuckDB replays bit-for-bit; the estimator is single divisions
  * of exact integers (no float-order ambiguity). Estimates are
  * OVER-APPROXIMATE under deletion vectors (a dv'd row's value still
  * counts) — fine for statistics, which are estimates by contract.
  *
  * Supported columns: STRING, DATE, DECIMAL, TIMESTAMP, and the
  * integer family. STRING/integer/DATE/DECIMAL canonical strings
  * match DuckDB's CAST(x AS VARCHAR) exactly (ISO `yyyy-MM-dd` for
  * dates, scale-padded plain form for decimals); TIMESTAMP hashes its
  * EPOCH-MICROS integer rendered as a decimal string — the one
  * timestamp canonical with no session-timezone or sub-second-
  * rendering trap, exact in both engines (DuckDB replays it as
  * `CAST(epoch_us(ts) AS VARCHAR)`). Floating point stays refused
  * (shortest-roundtrip rendering differs across engines). Columns may
  * be top-level or ONE dotted struct-field level (`meta.lang`) — the
  * same resolution blooms and zone maps already use. Anything else is
  * refused at declaration time. */
object SegmentNdv {
  val K = 256

  def hashable(dt: DataType): Boolean = dt match {
    case StringType | ByteType | ShortType | IntegerType | LongType |
         DateType | TimestampType | TimestampNTZType => true
    // DECIMAL renders at its declared scale (toPlainString — "1.50"
    // for DECIMAL(p,2)) exactly as DuckDB's CAST(d AS VARCHAR), and
    // precision growth at unchanged scale (the one decimal widening)
    // leaves every canonical string intact — sketches survive the
    // widen like int→long's do
    case _: DecimalType => true
    case _ => false
  }

  /** Validate an `ndvFor` declaration: existing, hashable columns —
    * top-level or one dotted struct-field level (`meta.lang`), the
    * [[SegmentBloom.parseCols]] resolution (exact top-level match
    * wins for a literal-dotted column name). */
  def parseCols(csv: String, schema: Option[StructType] = None): Set[String] = {
    val cols = csv.split(",").map(_.trim).filter(_.nonEmpty).toSet
    schema.foreach(sc => cols.foreach { c =>
      val dt: DataType = SegmentCodec.resolveStatsColumn(sc, c).getOrElse(
        throw new IllegalArgumentException(
          s"ndvFor column $c not in schema (top-level or struct field)"))
      require(hashable(dt),
        s"ndvFor column $c: NDV sketches support STRING, DATE, DECIMAL, " +
          s"TIMESTAMP and the integer family, not ${dt.simpleString} " +
          "(floating point has no engine-portable canonical string)")
    })
    cols
  }

  /** The portable 32-bit hash: first 8 hex chars of md5(canonical).
    * One-shot form (oracle replay, tests); the write path amortizes
    * the digest through [[Collector.add]]. */
  def hash(canonical: String): Long =
    hashWith(java.security.MessageDigest.getInstance("MD5"), canonical)

  private def hashWith(md: java.security.MessageDigest, canonical: String): Long = {
    val d = md.digest(canonical.getBytes(StandardCharsets.UTF_8)) // digest() resets
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Canonical string of a non-null value — integer-family values
    * render as their decimal string, dates as ISO `yyyy-MM-dd`,
    * timestamps as their epoch-micros integer (= DuckDB's
    * CAST(x AS VARCHAR) / CAST(epoch_us(ts) AS VARCHAR)). Returns
    * NULL for a value with no engine-portable canonical (a DATE
    * outside years 0001-9999: LocalDate renders year 10000 as
    * '+10000-...' and BCE years signed, where DuckDB renders
    * '10000-...' and '... (BC)') — the collector then POISONS the
    * segment's sketch (absent beats divergent-from-the-replay, the
    * same presence-based honesty guard planning already applies), so
    * one out-of-range value degrades statistics instead of aborting
    * the write job. */
  def canonical(dt: DataType, row: InternalRow, ordinal: Int): String = dt match {
    case StringType => row.getUTF8String(ordinal).toString
    case ByteType => row.getByte(ordinal).toString
    case ShortType => row.getShort(ordinal).toString
    case IntegerType => row.getInt(ordinal).toString
    case LongType => row.getLong(ordinal).toString
    // both timestamp kinds store epoch micros as a long: the integer
    // is the canonical — no zone, no sub-second rendering, exact in
    // both engines
    case TimestampType | TimestampNTZType => row.getLong(ordinal).toString
    case DateType =>
      val d = java.time.LocalDate.ofEpochDay(row.getInt(ordinal))
      if (d.getYear < 1 || d.getYear > 9999) null
      else d.toString
    case dec: DecimalType =>
      // toPlainString at the declared scale: "1.50" for (p,2), "150"
      // for (p,0), "-1.50" negative — byte-identical to DuckDB's
      // CAST(d AS VARCHAR), and scale-stable across the precision-
      // growth widening
      row.getDecimal(ordinal, dec.precision, dec.scale)
        .toJavaBigDecimal.toPlainString
    case other => throw new IllegalArgumentException(
      s"no NDV canonicalization for ${other.simpleString}")
  }

  /** Bounded distinct min-k collector (TreeSet dedups; cap at K). One
    * per declared column per write task: the digest instance is held
    * and reused across values (a fresh getInstance per row×column is
    * pure allocation waste at 100 TB write volume), and once the set
    * saturates, hashes at or above the current k-th minimum are
    * rejected BEFORE the O(log K) insert — the overwhelming majority
    * of values on a large segment.
    *
    * A NULL canonical (a value [[canonical]] has no portable
    * rendering for) POISONS the collector: the segment carries no
    * sketch for the column, the table-level merge and planning drop
    * the estimate behind the every-segment presence guard, and the
    * WRITE SUCCEEDS — a statistics declaration must never become a
    * data-dependent write refusal. */
  final class Collector {
    private val md = java.security.MessageDigest.getInstance("MD5")
    private val mins = new java.util.TreeSet[java.lang.Long]()
    private var cap = Long.MaxValue // mins.last, once saturated
    private var poisoned = false

    def add(canonical: String): Unit = {
      if (poisoned) return
      if (canonical == null) { poisoned = true; mins.clear(); return }
      val h = hashWith(md, canonical)
      if (mins.size == K) {
        if (h >= cap) return // not among the k smallest: skip the insert
        mins.add(h)
        if (mins.size > K) { mins.pollLast(); cap = mins.last }
      } else {
        mins.add(h)
        if (mins.size == K) cap = mins.last
      }
    }

    /** Base64 of the sorted hashes as 4-byte big-endian ints (hashes
      * are 32-bit by construction); None when empty or poisoned. */
    def base64: Option[String] =
      if (poisoned || mins.isEmpty) None
      else {
        val out = new Array[Long](mins.size)
        val it = mins.iterator(); var i = 0
        while (it.hasNext) { out(i) = it.next(); i += 1 }
        Some(encode(out))
      }
  }

  /** Encode sorted 32-bit hashes as base64 of 4-byte big-endian ints
    * — the manifest wire form of both per-segment and table-level
    * sketches. */
  def encode(sorted: Array[Long]): String = {
    val bb = java.nio.ByteBuffer.allocate(sorted.length * 4)
    sorted.foreach(h => bb.putInt(h.toInt))
    java.util.Base64.getEncoder.encodeToString(bb.array())
  }

  def decode(b64: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(b64)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt().toLong & 0xffffffffL)
  }

  /** Merge sketches into the deduped global min-k, sorted ascending —
    * the k smallest of the union are each in their sketch's k
    * smallest, so merging sketches loses nothing vs sketching the
    * concatenated data. */
  def merge(sketches: IterableOnce[Array[Long]]): Array[Long] = {
    val set = new java.util.TreeSet[java.lang.Long]()
    sketches.iterator.foreach { arr =>
      var i = 0
      while (i < arr.length) {
        val h = arr(i)
        if (set.size < K) set.add(h)
        else if (h < set.last) {
          set.add(h)
          if (set.size > K) set.pollLast()
        }
        i += 1
      }
    }
    val out = new Array[Long](set.size)
    val it = set.iterator(); var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Estimate NDV from an already-merged (sorted, deduped, ≤K) sketch:
    * fewer than K hashes means NO source saturated, so the count is
    * exact (modulo hash collisions — the same contract as the
    * query-level KMV). */
  def estimateMerged(merged: Array[Long]): Double =
    if (merged.length < K) merged.length.toDouble
    else (K - 1).toDouble * 4294967296.0 / merged.last

  /** Merge per-segment sketches and estimate NDV. */
  def estimate(sketches: Seq[Array[Long]]): Double =
    estimateMerged(merge(sketches))
}
