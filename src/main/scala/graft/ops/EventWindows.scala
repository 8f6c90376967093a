package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time windowing over the `events` table — tumbling, sliding and
  * session windows. Declared engine extensions beyond the reference's
  * pure processing-time semantics (SURVEY.md §2.6-ST6).
  *
  * The same `window`/`session_window` expressions run unchanged in a
  * streaming plan with `withWatermark` (see graft.streaming); batch
  * formulations here are what the DuckDB oracle certifies. Window starts
  * are emitted as formatted strings — a display contract that sidesteps
  * engine-specific timestamp physical types.
  *
  * Scale: each windowed aggregate is one shuffle on (window, key);
  * watermarking bounds state in streaming, and AQE handles hot windows.
  */
object EventWindows {

  private def fmt(ts: org.apache.spark.sql.Column) =
    date_format(ts, "yyyy-MM-dd HH:mm")

  /** Tumbling 1-hour windows per event type. */
  def tumblingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .select(
        fmt(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Sliding 1-hour windows every 30 minutes (each event in 2 windows). */
  def slidingHourly(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"))
      .select(
        fmt(col("window.start")).as("win_start"),
        col("n_events"), col("n_users"))

  /** Session windows per user with a fixed inactivity gap. */
  def sessions(events: DataFrame, gap: String = "10 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .select(
        col("user_id"),
        fmt(col("session_window.start")).as("session_start"),
        col("n_events"), col("session_value"))

  /** Semi-structured payload extraction: parse the `props` JSON column
    * once with a declared schema (`from_json` — codegen'd, no UDF, no
    * per-field re-parse the way repeated `get_json_object` calls would)
    * and aggregate the typed field per event type. The JSON never
    * reaches the shuffle — parsing happens map-side and only the
    * (type, k) pair flows into the partial aggregate. */
  def propsStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(avg(col("k")), 4).as("avg_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  /** Per-event trailing rate: how many events the same user produced in
    * the preceding `windowSec` seconds (inclusive of this one) — the
    * rate-limit / abuse-detection primitive. A RANGE frame over epoch
    * micros, not a ROWS frame: the bound is value-based, so ties in the
    * order column contribute deterministically on any engine. One
    * shuffle on user_id; each partition is a single ordered sweep with
    * a sliding frame — O(n) per key, the 100 TB shape for per-entity
    * time-series features. */
  /** Two-step funnel: for every user with a `fromType` event, the first
    * `toType` event at-or-after their first `fromType` — conversion
    * flag and gap. Two tiny per-user aggregates bracket one equi-join
    * on user_id; the first aggregate's output is user-cardinality
    * (orders of magnitude below event-cardinality), so the join
    * broadcasts at any realistic scale. No windows over the raw event
    * stream, no per-user sort. */
  def funnel(events: DataFrame, fromType: String, toType: String): DataFrame = {
    val first = events.filter(col("event_type") === fromType)
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_from"))
    val converted = events.filter(col("event_type") === toType)
      .join(first, Seq("user_id"))
      .filter(col("ts") >= col("first_from"))
      .groupBy(col("user_id"))
      .agg(min(col("ts")).as("first_to"))
    first.join(converted, Seq("user_id"), "left")
      .select(
        col("user_id"),
        fmt(col("first_from")).as("first_from"),
        col("first_to").isNotNull.as("converted"),
        ((unix_micros(col("first_to")) - unix_micros(col("first_from")))
          / lit(1000000L)).cast("long").as("gap_sec"))
  }

  /** Sessionization with BOTH production rules: an inactivity gap
    * closes a session (like `session_window`) AND a hard duration cap
    * splits marathon sessions (the rule `session_window` cannot
    * express — analytics stacks cap at 4 h so a left-open tab is not
    * one infinite session). Pure window arithmetic on the per-user
    * shuffle: gap-islands via a running sum of new-session flags,
    * then fixed `capSec` sub-slots from each island's start — µs-exact
    * integers end to end, so the oracle replays it verbatim. A capped
    * sub-session inherits the island's clock (slots are aligned to
    * island start, not wall time), which is the analytics convention. */
  def cappedSessions(events: DataFrame, gapSec: Long, capSec: Long): DataFrame = {
    val byTime = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val run = byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val islandW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("island"))
    events
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_island",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byTime) >
          lit(gapSec * 1000000L), 1).otherwise(0))
      .withColumn("island", sum(col("new_island")).over(run))
      .withColumn("sub",
        ((col("ts_us") - min(col("ts_us")).over(islandW)) /
          lit(capSec * 1000000L)).cast("long"))
      .groupBy(col("user_id"), col("island"), col("sub"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("session_value"))
      .drop("island", "sub")
  }

  /** Per-user silence gaps above `thresholdSec` between consecutive
    * events — the heartbeat/SLA monitor (a gap is an outage candidate,
    * the negative-space complement of session windows). One lag window
    * riding the per-user shuffle; microsecond-exact integer
    * arithmetic, so the gap seconds hash-match any engine. */
  def gaps(events: DataFrame, thresholdSec: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("prev_event_id", lag(col("event_id"), 1).over(w))
      .filter(col("prev_us").isNotNull &&
        col("ts_us") - col("prev_us") > thresholdSec * 1000000L)
      .select(col("user_id"), col("prev_event_id"), col("event_id"),
        ((col("ts_us") - col("prev_us")) / 1000000L).cast("long").as("gap_sec"))
  }

  def rollingRate(events: DataFrame, windowSec: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts_us"))
      .rangeBetween(-windowSec * 1000000L, 0L)
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("n_window", count(lit(1)).over(w))
      .select(col("event_id"), col("user_id"), col("n_window"))
  }

  /** Time-series resample + forward fill: a fixed `stepMinutes` grid
    * per user from their first to last event, each slot carrying the
    * LAST observation on or before it — the gap-filling primitive
    * behind sensor/metric rollups and feature-store point-in-time
    * materialization (the batch analog of a KV lookup "latest value
    * as of t"). Slots with no event of their own are filled from the
    * previous slot's carry; the first slot always observes (the grid
    * starts at the floor of the user's first event).
    *
    * Shape at 100 TB: slotting is a map-only floor-div; last-in-slot
    * is a per-(user, slot) window ranked at MICROSECOND precision
    * (ties by event_id) so the carry is deterministic; the grid
    * explode generates (span/step) rows per user off a per-user
    * min/max aggregate — output-proportional, no cross-user work —
    * and the forward-fill window rides the same user partitioning
    * the slot shuffle already established. A user's whole grid lives
    * in one partition: the only skew bound is the longest single
    * user's span, not the corpus. */
  def resampleFfill(events: DataFrame, stepMinutes: Int): DataFrame = {
    require(stepMinutes > 0, "stepMinutes must be positive")
    val stepUs = stepMinutes * 60L * 1000000L
    val stepSec = stepMinutes * 60L
    val slotted = events
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .select(col("user_id"), col("event_id"), col("value"),
        floor(unix_micros(col("ts")) / stepUs).as("slot"),
        unix_micros(col("ts")).as("ts_us"))
    val inSlot = Window.partitionBy(col("user_id"), col("slot"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    val lastInSlot = slotted
      .withColumn("rn", row_number().over(inSlot))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("slot"), col("value"))
    val grid = slotted
      .groupBy(col("user_id"))
      .agg(min(col("slot")).as("lo"), max(col("slot")).as("hi"))
      .select(col("user_id"), explode(sequence(col("lo"), col("hi"))).as("slot"))
    val ffill = Window.partitionBy(col("user_id")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(lastInSlot, Seq("user_id", "slot"), "left")
      .select(col("user_id"), (col("slot") * stepSec).as("slot_sec"),
        last(col("value"), ignoreNulls = true).over(ffill).as("value_ffill"),
        col("value").isNotNull.as("is_observed"))
  }

  /** Rolling z-score anomaly detection over the [[resampleFfill]]
    * series: each slot scored against the trailing `windowSlots`
    * slots' mean/std, flagged when |z| exceeds `threshold`. The
    * windowed moments are computed in EXACT integer cents (the
    * corpus's values are 2-decimal by contract), so sum and
    * sum-of-squares are order-free BIGINTs and the final double
    * z-score is bit-identical across engines — a windowed double sum
    * would hand the flag boundary to each engine's summation tree.
    * Only full windows score (n = windowSlots) and zero-variance
    * windows are excluded by an exact integer comparison
    * (n*s2 > s1²) before any sqrt. One per-user ordered window over
    * the partitioning the resample already established. */
  def anomalies(
      events: DataFrame, stepMinutes: Int,
      windowSlots: Int = 8, threshold: Double = 2.0): DataFrame = {
    val n = windowSlots
    val w = Window.partitionBy(col("user_id")).orderBy(col("slot_sec"))
      .rowsBetween(-(n - 1), 0)
    resampleFfill(events, stepMinutes)
      .select(col("user_id"), col("slot_sec"),
        round(col("value_ffill") * 100.0, 0).cast("long").as("cents"))
      .select(col("user_id"), col("slot_sec"), col("cents"),
        count(lit(1)).over(w).as("wn"),
        sum(col("cents")).over(w).as("s1"),
        sum(col("cents") * col("cents")).over(w).as("s2"))
      .filter(col("wn") === n && col("s2") * n > col("s1") * col("s1"))
      .withColumn("z",
        (col("cents") - col("s1") / n.toDouble) /
          sqrt((col("s2") - col("s1") * col("s1") / n.toDouble) / n.toDouble))
      .filter(abs(col("z")) > threshold)
      .select(col("user_id"), col("slot_sec"), col("cents"), round(col("z"), 4).as("z"))
  }

  /** Cohort retention: users grouped by first-seen day, distinct-user
    * counts at each day offset since — the activation/retention curve
    * behind every growth dashboard. Two keyed aggregates and one join:
    * first-seen is a per-user min (map-side combined), the join back is
    * user-keyed (broadcastable while the user dimension fits, shuffled
    * co-located otherwise), and the final (cohort, offset) aggregate
    * has days² cardinality — tiny forever. No window functions, no
    * per-user arrays, so a hot user costs one extra row, not a sort. */
  def retention(events: DataFrame, maxOffset: Int): DataFrame = {
    require(maxOffset >= 0, "maxOffset must be non-negative")
    val e = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), col("ts").cast("date").as("day"))
    val first = e.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    e.join(first, Seq("user_id"))
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")))
      .filter(col("day_offset") <= maxOffset)
      .groupBy(col("cohort_day"), col("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Ordered-subsequence match per user — the k-step generalization of
    * [[funnel]]: did the user's event-type sequence (time order,
    * event_id tiebreak) contain `pattern` as a subsequence? The
    * per-user path reduces to ONE string and the subsequence test to
    * ONE anchored regex over it — no k-way self-join, no per-step
    * state; cost is the per-user aggregate everyone already pays.
    * The regex anchors every step at a separator boundary (a U+0001
    * field separator that, unlike a comma, cannot plausibly occur
    * inside an event type — and rows containing it are dropped), so
    * event types that are substrings or comma-joinings of others
    * cannot false-match. Rows with null
    * user/type/ts are dropped on BOTH engines up front (null ordering
    * differs between them, so they must never reach the sort).
    *
    * Scale: one shuffle on user_id; a hot user's whole history
    * materializes as one array — bound it upstream (per-user event
    * caps, or a time-windowed slice) the same way sessions are. */
  def sequenceMatch(events: DataFrame, pattern: Seq[String]): DataFrame = {
    require(pattern.nonEmpty, "pattern must have at least one step")
    // steps are spliced into a regex: restrict to word characters so a
    // metacharacter-bearing event type cannot change the semantics
    require(pattern.forall(_.matches("[A-Za-z0-9_]+")),
      s"pattern steps must be word characters, got $pattern")
    // the path string joins on \u0001, not ',' — an event_type
    // containing the display delimiter (e.g. "view,click") must stay
    // ONE opaque token, not inject false step boundaries; rows whose
    // type contains the separator itself are dropped (they can never
    // equal a word-character pattern step, and keeping them would
    // corrupt the path)
    val d = "\u0001"
    val rx = pattern.mkString(s"(^|$d)", s"$d(.*$d)?", s"($d|$$)")
    events
      .filter(col("user_id").isNotNull && col("event_type").isNotNull &&
        col("ts").isNotNull && !col("event_type").contains(d))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("event_type")))).as("evs"))
      .select(
        col("user_id"),
        size(col("evs")).as("n_events"),
        array_join(transform(col("evs"), e => e.getField("event_type")), d)
          .rlike(rx).as("matched"))
  }

  /** Frequent behavioral paths: the top-k most common CONSECUTIVE
    * event-type trigrams across all users — the sequence-mining
    * staple behind "what do users do right before churning" and
    * next-event-prediction training data. Two `lead`s over the
    * per-user time order build each trigram locally (one shuffle on
    * user_id, the ordering every per-user op here shares — no
    * self-join, no explosion), then a vocabulary-scale count ranks
    * them. Ties break on the path string; tied timestamps order by
    * event_id, the table's unique tiebreak. */
  def frequentPaths(events: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    // single-partition by DESIGN (vocabulary-scale path counts); a
    // non-foldable key keeps the deliberate spec past
    // EliminateWindowPartitions
    val rw = Window.partitionBy(pmod(hash(col("path")), lit(1)))
      .orderBy(col("n_paths").desc, col("path"))
    events
      .select(col("user_id"), col("event_type").as("t0"),
        lead(col("event_type"), 1).over(w).as("t1"),
        lead(col("event_type"), 2).over(w).as("t2"))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .select(concat_ws(">", col("t0"), col("t1"), col("t2")).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_paths"))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= k)
  }
}
