package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}
import org.apache.spark.sql.types.IntegerType

import graft.sources.segment.GraftSegmentTable

/** Catalyst optimizer rule: salt a shuffle equi-join whose fact side is
  * a graft-segment scan with a MANIFEST-DECLARED hot key — the planner
  * face of the skew statistic (r17; [[graft.ops.Skew.saltedJoin]] is
  * the explicit-call form, certified result-invisible by
  * store_join_autosalt).
  *
  * Rewrite (multiplicity-exact — every fact row gets exactly ONE salt,
  * every dim row is replicated once per salt value, so each qualifying
  * (fact, dim) pair meets exactly once, and NULL keys are dropped by
  * the key equality in both forms):
  * {{{
  *   Join_inner(F, D, fk = dk)
  *   ==>
  *   Project(original output,
  *     Join_inner(
  *       Project(F.*, pmod(hash(fk, mid()), salts) AS graft_salt_f, F),
  *       Generate(explode(sequence(0, salts-1)), drop seq, D),
  *       fk = dk && graft_salt_f = graft_salt_d))
  * }}}
  *
  * The fan-out derives at PLAN TIME from the manifest frequency map
  * ([[graft.ops.Skew.saltsFromHistogram]]: hottest key mass over
  * live-rows/shuffle-partitions, clamped to 64) — zero scans, the same
  * arithmetic `CALL graft.system.salts` serves. Fires only when ALL of:
  *
  *  - inner join, condition EXACTLY one equality between the children
  *    (the convergence guard: the rewritten join carries TWO equality
  *    conjuncts, so the rule can never re-match its own output inside
  *    the fixed-point batch — the [[JoinRewriteGuard]] doctrine), and
  *    no join-strategy hints (a user hint outranks the statistic);
  *  - one side scans an UNPINNED graft-segment table whose manifest
  *    map for the key derives salts > 1 (undeclared / overflowed /
  *    not-hot all fall back to 1 — no statistic, no rewrite; pinned
  *    scans are skipped because the CURRENT map may not describe a
  *    time-traveled snapshot);
  *  - the dim side is NOT broadcast-eligible (sizeInBytes above
  *    `autoBroadcastJoinThreshold`): a broadcast join has no fact-side
  *    shuffle, hence NO skew problem — SaltBench measured BHJ 0.8 s vs
  *    best salted 2.5 s at x80, so rewriting a broadcastable join
  *    would be strictly worse;
  *  - replicating the dim `salts` times costs less than the fact scan
  *    it parallelizes (dim bytes x salts <= fact bytes, plan stats).
  *
  * Why a static rewrite when AQE splits skewed sort-merge joins at
  * runtime? Measured head-to-head (SaltBench, 75%-hot fact, 32-way
  * local): AQE's split works at MAP-OUTPUT granularity, so it cannot
  * split at all when the hot partition's bytes come from few mappers
  * (a 1-file table: "0 skewed partitions" with a 97 MB hot partition —
  * salted x2.5 faster at x40); with 32 mappers and a tuned advisory
  * size AQE reached 4.3 s at x80 where salted+AQE reached 2.5 s —
  * salting balances the shuffle at WRITE time (every map task's output
  * spreads over `salts` reducers), the read-side split cannot. The two
  * compose: the salted join's residual imbalance still gets AQE's
  * treatment. Skewed AGGREGATIONS have no AQE analogue; that face is
  * [[graft.ops.Skew.saltedAgg]]/[[graft.ops.Skew.saltedCountDistinct]]
  * (explicit, because an agg rewrite cannot be hidden behind identical
  * results for non-decomposable functions).
  *
  * Disable with `spark.graft.saltJoin.enabled=false`. Plan-time cost:
  * the broadcast-eligibility precheck is stats-only; the manifest
  * lookup rides the table instance's cached read (one log read per
  * query resolution, however many fixed-point iterations re-match a
  * non-firing candidate) and is Try-guarded — an FS hiccup must never
  * fail planning of a query that didn't need the rewrite. At 100 TB
  * the O(KB) read replaces a GROUP-BY sizing pass.
  */
case class SaltJoinRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // tolerant parse (the rule's own never-fail-planning doctrine,
    // applied to its OWN kill switch): a malformed value ('0', 'yes')
    // degrades to the default instead of throwing
    // IllegalArgumentException out of the optimizer for every query
    // in the session — only an explicit "false" disables
    if (session.conf.get(SaltJoinRule.EnabledKey, "true")
        .equalsIgnoreCase("false")) return plan
    plan.transform {
      case j @ Join(left, right, Inner, Some(EqualTo(a: AttributeReference, b: AttributeReference)), hint)
          if hint.leftHint.isEmpty && hint.rightHint.isEmpty =>
        val keyed =
          if (left.outputSet.contains(a) && right.outputSet.contains(b)) Some((a, b))
          else if (left.outputSet.contains(b) && right.outputSet.contains(a)) Some((b, a))
          else None
        keyed.flatMap { case (lk, rk) =>
          oriented(left, lk, right, rk).orElse(oriented(right, rk, left, lk))
        } match {
          case Some((fact, fk, dim, dk, salts)) =>
            rewrite(j, fact, fk, dim, dk, salts)
          case _ => j
        }
    }
  }

  /** Fire conditions for one orientation, cheapest first. The
    * STRUCTURAL check (is the fact side an eligible graft-segment
    * scan?) runs before ANY stats call: a pre-pushdown DSv2
    * relation's `computeStats` builds a throwaway ScanBuilder — and
    * throws outright under `spark.testing` — so a join with no graft
    * table in it must never touch plan stats. The stats that do run
    * are Try-guarded for the same reason. */
  private def oriented(fact: LogicalPlan, fk: AttributeReference,
      dim: LogicalPlan, dk: AttributeReference)
      : Option[(LogicalPlan, AttributeReference, LogicalPlan, AttributeReference, Int)] =
    segmentTable(fact, fk).flatMap { t =>
      scala.util.Try((dim.stats.sizeInBytes, fact.stats.sizeInBytes))
        .toOption.flatMap { case (dimSize, factSize) =>
          // broadcast beats any salting (no fact shuffle at all,
          // SaltBench measured dominant)
          val thresh = conf.autoBroadcastJoinThreshold
          if (thresh >= 0 && dimSize <= BigInt(thresh)) None
          else tableSalts(t, fk)
            // the replicated dim must stay cheaper than the fact scan
            // it parallelizes
            .filter(s => dimSize * s <= factSize)
            .map(s => (fact, fk, dim, dk, s))
        }
    }

  /** The unpinned, non-time-traveled graft-segment table `side` scans
    * to produce `key`, if any — pure plan-structure inspection, no
    * stats, no I/O. Option-based time travel (versionAsOf /
    * timestampAsOf / sinceVersion) is skipped for the same reason as
    * a catalog pin: the CURRENT manifest's masses may not describe
    * the snapshot being scanned. */
  private def segmentTable(side: LogicalPlan,
      key: AttributeReference): Option[GraftSegmentTable] =
    side.collectFirst {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[GraftSegmentTable] &&
            r.outputSet.contains(key) && !timeTraveled(r.options) =>
        r.table.asInstanceOf[GraftSegmentTable]
      // the experimental.extraOptimizations path runs AFTER V2 scan
      // pushdown has turned the relation into a ScanRelation
      case r: DataSourceV2ScanRelation
          if r.relation.table.isInstanceOf[GraftSegmentTable] &&
            r.outputSet.contains(key) && !timeTraveled(r.relation.options) =>
        r.relation.table.asInstanceOf[GraftSegmentTable]
    }.filter(_.pinned.isEmpty)

  private def timeTraveled(
      o: org.apache.spark.sql.util.CaseInsensitiveStringMap): Boolean =
    o.containsKey("versionAsOf") || o.containsKey("timestampAsOf") ||
      o.containsKey("sinceVersion")

  /** The derived fan-out when the table's manifest map marks `key`
    * hot; None otherwise. fallback = 1: no statistic, no salt. Reads
    * the TABLE INSTANCE's cached manifest (one log read per query
    * resolution), Try-guarded: a statistic that can't be read is a
    * statistic that's absent, never a planning failure. */
  private def tableSalts(t: GraftSegmentTable,
      key: AttributeReference): Option[Int] =
    scala.util.Try(t.liveManifest).toOption.flatten.flatMap { m =>
      val live = m.segments.map(_.liveRows).sum
      val target = math.max(1L, live / math.max(1, conf.numShufflePartitions))
      val s = graft.ops.Skew.saltsFromHistogram(
        graft.ops.Skew.mapCounts(m, key.name), fallback = 1, target)
      if (s > 1) Some(s) else None
    }

  private def rewrite(j: Join, fact: LogicalPlan, fk: AttributeReference,
      dim: LogicalPlan, dk: AttributeReference, salts: Int): LogicalPlan = {
    // the fact row's salt: hash of its own key + partition-stable id —
    // uniform enough to split the hot key, invisible to the result
    // (exactly ops.Skew.saltedJoin's expression, as resolved nodes)
    val fSalt = Alias(
      Pmod(new Murmur3Hash(Seq(fk, MonotonicallyIncreasingID())), Literal(salts)),
      "graft_salt_f")()
    val saltedFact = Project(fact.output :+ fSalt, fact)
    // Sequence is TimeZoneAwareExpression: without an explicit
    // timeZoneId it reports unresolved post-analysis (FuzzyJoinRule
    // precedent); unrequiredChildIndex drops the array right at the
    // Generate — nothing downstream needs it
    val seq = Alias(
      new Sequence(Literal(0), Literal(salts - 1))
        .withTimeZone(conf.sessionLocalTimeZone),
      "graft_salts")()
    val dSalt = AttributeReference("graft_salt_d", IntegerType, nullable = false)()
    val repDim = Generate(
      Explode(seq.toAttribute), unrequiredChildIndex = Seq(dim.output.size),
      outer = false, qualifier = None, generatorOutput = Seq(dSalt),
      child = Project(dim.output :+ seq, dim))
    val salted = Join(saltedFact, repDim, Inner,
      Some(And(EqualTo(fk, dk), EqualTo(fSalt.toAttribute, dSalt))), j.hint)
    Project(j.output, salted)
  }
}

object SaltJoinRule {
  val EnabledKey = "spark.graft.saltJoin.enabled"
}
