package graft.sources.segment

import org.apache.spark.sql.{functions => F, AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, CurrentDate, CurrentTimestampLike, EqualNullSafe, Expression, Literal, LocalTimestamp, PlanExpression, Predicate, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.types.StructType

/** CHECK constraints on graft-segment tables — the Delta
  * `ALTER TABLE … ADD CONSTRAINT` shape carried as validated table
  * properties (`check.<name> = '<boolean sql>'`), enforced on EVERY
  * row that enters the table:
  *
  * {{{
  * CREATE TABLE graft.db.t (k BIGINT, v BIGINT)
  *   TBLPROPERTIES ('check.positive' = 'k > 0');
  * ALTER TABLE graft.db.t SET TBLPROPERTIES ('check.capped' = 'v <= 100');
  * ALTER TABLE graft.db.t UNSET TBLPROPERTIES ('check.capped'); -- drop
  * }}}
  *
  * Semantics are SQL CHECK: a row violates only when the expression is
  * definitively FALSE — NULL (unknown) passes, exactly as in
  * Delta/ANSI. Declaring a constraint on an existing table validates
  * the EXISTING rows first ([[requireClean]] — the Delta ADD
  * CONSTRAINT behavior), so every later rewrite (compaction,
  * copy-on-write DML, merge-on-read appends) can re-enforce without
  * exploding on old data. Dropping or renaming a column a constraint
  * references is refused until the constraint is dropped
  * ([[requireAnalyzable]] runs against the post-DDL schema).
  *
  * Enforcement sits in the ONE chokepoint every write route shares —
  * [[GraftDataWriter.write]] (batch appends, the streaming sink,
  * CTAS/RTAS staged writes, copy-on-write rewrites, and the
  * merge-on-read delta writer's inserted row versions) — as a
  * compiled Catalyst predicate: the expression is analyzed ONCE on
  * the driver against the table schema, bound to the write schema's
  * ordinals (a column this write does not carry evaluates as NULL —
  * it lands null-backfilled, and unknown passes), and
  * code-generated per task. Cost is one predicate eval per row when
  * constraints exist and nothing otherwise.
  *
  * 100 TB: enforcement is embarrassingly parallel (per-row, per
  * task, no extra pass — the same rows are already streaming through
  * the encoder), and declaration-time validation is one predicate
  * scan that prunes with the same zone maps as any other filter.
  */
object SegmentChecks {
  val Prefix = "check."

  /** One compiled constraint: `violation` is TRUE exactly when the
    * declared expression is definitively FALSE, bound to the write
    * schema's ordinals and ready for executor-side codegen. */
  case class CheckSpec(name: String, sql: String, violation: Expression)

  /** The `check.*` declarations of `props`, name-sorted. An EMPTY
    * constraint name fails here rather than being skipped: a property
    * that looks declared but never enforces is the worst outcome, so
    * a malformed key poisons writes loudly (declaration-time
    * validation rejects it before it can ever be committed). */
  def declared(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq
      .collect { case (k, v) if k.startsWith(Prefix) =>
        require(k.length > Prefix.length,
          s"CHECK constraint property '$k' has an empty name")
        k.substring(Prefix.length) -> v }
      .sortBy(_._1)

  /** Parse + analyze `sql` as a boolean expression over `schema`,
    * refusing what cannot soundly gate a write: unresolvable or
    * non-boolean expressions (analysis), nondeterministic functions,
    * and subqueries. Returns the analyzed condition (attributes
    * resolved, casts inserted). */
  def requireAnalyzable(spark: SparkSession, schema: StructType,
      name: String, sql: String): Expression = {
    val cond =
      try {
        val df = spark.createDataFrame(
          java.util.Collections.emptyList[Row](), schema)
        df.where(F.expr(sql)).queryExecution.analyzed.collectFirst {
          case f: Filter => f.condition
        }.getOrElse(throw new IllegalArgumentException(
          s"CHECK constraint $name ($sql) did not analyze to a filter"))
      } catch {
        case e: AnalysisException => throw new IllegalArgumentException(
          s"CHECK constraint $name ($sql) does not analyze against " +
            s"${schema.simpleString}: ${e.getMessage}")
      }
    require(name.nonEmpty, s"CHECK constraint name must not be empty")
    require(cond.deterministic,
      s"CHECK constraint $name ($sql) must be deterministic")
    require(!cond.exists(_.isInstanceOf[PlanExpression[_]]),
      s"CHECK constraint $name ($sql) must not contain a subquery")
    // current_timestamp()/current_date() and friends count as
    // deterministic to Catalyst (the optimizer pins them per query),
    // but a TIME-DEPENDENT gate is wrong for a constraint: the same
    // row would pass today and fail in the compaction that re-encodes
    // it years later. Refuse the family by class; anything else
    // Unevaluable (beyond the attributes compileAll binds) is refused
    // too — it would declare cleanly and then crash every write.
    require(!cond.exists {
        case _: CurrentTimestampLike | _: CurrentDate | _: LocalTimestamp => true
        case e => e.isInstanceOf[Unevaluable] && !e.isInstanceOf[AttributeReference]
      },
      s"CHECK constraint $name ($sql) must be evaluable at write time — " +
        "time-dependent functions (current_timestamp, current_date, ...) " +
        "are not allowed")
    cond
  }

  /** Compile every declared constraint of `props` (analyzed against
    * the TABLE schema) into violation predicates bound to
    * `writeSchema`'s ordinals; constrained columns the write does not
    * carry bind to NULL (they land null-backfilled, and SQL CHECK
    * passes on unknown). Driver-side; results serialize to tasks. */
  def compileAll(spark: SparkSession, props: Map[String, String],
      tableSchema: StructType, writeSchema: StructType): Seq[CheckSpec] =
    declared(props).map { case (name, sql) =>
      val cond = requireAnalyzable(spark, tableSchema, name, sql)
      val resolver = spark.sessionState.conf.resolver
      val bound = cond.transformUp {
        case a: AttributeReference =>
          val i = writeSchema.fieldNames.indexWhere(resolver(_, a.name))
          if (i >= 0) BoundReference(i, a.dataType, nullable = true)
          else Literal.create(null, a.dataType)
      }
      CheckSpec(name, sql, EqualNullSafe(bound, Literal(false)))
    }

  /** Declaration-time validation of EXISTING rows (the Delta ADD
    * CONSTRAINT contract): refuse a constraint the table already
    * violates, naming the violation count — otherwise every later
    * rewrite of old rows would fail on data the user never touched. */
  def requireClean(spark: SparkSession, dir: String,
      name: String, sql: String): Unit = {
    val violations = spark.read.format("graft-segment").load(dir)
      .where(F.expr(s"($sql) <=> false")).count()
    require(violations == 0L,
      s"cannot declare CHECK constraint $name ($sql): $violations existing " +
        s"row(s) violate it — fix the data first, or declare a weaker constraint")
  }

  /** Executor-side evaluator: codegen'd predicates plus a readable
    * row renderer for the failure message. */
  final class Enforcer(checks: Seq[CheckSpec], schema: StructType) {
    private val preds: Array[(CheckSpec, org.apache.spark.sql.catalyst.expressions.BasePredicate)] =
      checks.map { c =>
        val p = Predicate.create(c.violation)
        p.initialize(0)
        (c, p)
      }.toArray

    private def render(row: InternalRow): String =
      schema.fields.zipWithIndex.map { case (f, i) =>
        val v = if (row.isNullAt(i)) "null" else String.valueOf(row.get(i, f.dataType))
        s"${f.name}=${if (v.length > 64) v.take(61) + "..." else v}"
      }.mkString(", ")

    def enforce(row: InternalRow): Unit = {
      var i = 0
      while (i < preds.length) {
        val (c, p) = preds(i)
        if (p.eval(row)) throw new IllegalArgumentException(
          s"CHECK constraint ${c.name} (${c.sql}) violated by row: ${render(row)}")
        i += 1
      }
    }
  }
}
