package graft.sources.segment

import org.apache.spark.sql.{functions => F, AnalysisException, Row, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, BoundReference, Cast, CurrentDate, CurrentTimestampLike, EqualNullSafe, Expression, If, IsNotNull, IsNull, Literal, LocalTimestamp, MutableProjection, Not, PlanExpression, Predicate, TimeZoneAwareExpression, Unevaluable}
import org.apache.spark.sql.catalyst.plans.logical.Project
import org.apache.spark.sql.types.StructType

/** GENERATED columns on graft-segment tables — the Delta
  * `GENERATED ALWAYS AS (expr)` shape, carried as validated table
  * properties (`gen.<col> = '<sql>'`), declared at CREATE TABLE and
  * fixed for the table's lifetime:
  *
  * {{{
  * CREATE TABLE graft.db.t (
  *   k BIGINT, price DOUBLE,
  *   cents BIGINT GENERATED ALWAYS AS (CAST(round(price * 100, 0) AS BIGINT)))
  * }}}
  *
  * Write semantics (every route through the one
  * [[GraftDataWriter.write]] chokepoint — batch INSERT, streaming
  * epochs, CTAS/RTAS staged data, copy-on-write rewrites, MoR inserted
  * versions):
  *  - an OMITTED or NULL generated column computes from the expression
  *    (the catalog injects CURRENT_DEFAULT = NULL into the column's
  *    metadata, so the analyzer accepts INSERTs that omit it and the
  *    writer sees NULL — null-means-compute; an explicit NULL can never
  *    be stored, which is the Delta contract too);
  *  - an EXPLICIT value must EQUAL the expression's value for the row,
  *    or the write fails loudly (the Delta explicit-write validation) —
  *    silent divergence between stored and derivable values is the one
  *    unacceptable outcome for a derived column.
  *
  * Declaration-time validation mirrors [[SegmentChecks]]: the
  * expression must analyze against the table schema, be deterministic,
  * subquery-free, evaluable at write time (no current_timestamp
  * family), reference only NON-generated columns, and produce EXACTLY
  * the declared column type (write a CAST in the expression when the
  * natural type differs). Generated columns must be atomic (the
  * DEFAULT machinery the omission face rides on serves atomics only).
  * DDL that would break a generation expression — dropping or renaming
  * a referenced column, widening a type out from under the expression,
  * renaming the generated column itself — is refused until the table
  * is redefined; `gen.*` cannot be SET or UNSET after creation.
  *
  * 100 TB: generation is one projection evaluated per row inside the
  * write task (codegen'd, no extra pass — the rows already stream
  * through the encoder), and the declaration is one manifest property.
  */
object SegmentGenerated {
  val Prefix = "gen."

  /** One compiled generated column, bound to the write schema:
    * `fill` yields the stored value (explicit value, or the expression
    * when the incoming slot is NULL); `mismatch` is TRUE exactly when
    * an explicit value diverges from the expression. */
  case class GenSpec(name: String, sql: String, ordinal: Int,
      fill: Expression, mismatch: Expression)

  /** The `gen.*` declarations of `props`, name-sorted; empty names are
    * refused loudly (the SegmentChecks discipline). */
  def declared(props: Map[String, String]): Seq[(String, String)] =
    props.toSeq
      .collect { case (k, v) if k.startsWith(Prefix) =>
        require(k.length > Prefix.length,
          s"generated-column property '$k' has an empty column name")
        k.substring(Prefix.length) -> v }
      .sortBy(_._1)

  /** Session-context "functions" the analyzer folds into per-session
    * LITERALS (ReplaceCurrentLike / literal-function resolution) before
    * any post-analysis walk can see them: an expression built on one
    * would validate and compute DIFFERENT values across sessions,
    * breaking the stored-equals-derivable contract — so they are
    * refused at the PARSE level, before folding can hide them. The
    * timestamp family is listed here too (better error, earlier);
    * post-analysis checks still back it up. */
  private val SessionContextNames = Set(
    "current_user", "user", "session_user",
    "current_database", "current_schema", "current_catalog",
    "current_timezone",
    "current_timestamp", "now", "localtimestamp", "current_date")

  /** `DATE 'today'` / `TIMESTAMP 'now'` (and tomorrow/yesterday): the
    * parser folds these to per-session literals before any tree
    * exists, so they can only be refused textually. Both quote styles
    * are matched — under the default `doubleQuotedIdentifiers=false`,
    * `DATE "today"` parses as the same folded literal — and the scan
    * runs over [[stripComments]] output so `DATE/**/'today'` cannot
    * sneak the keyword past the regex. (When double-quoted strings are
    * configured as identifiers, a column literally named `"today"`
    * typed as `DATE "today"` is refused too — a false positive this
    * guard accepts over the silent cross-session divergence.) */
  private val SpecialDatetime =
    ("(?i)\\b(date|timestamp|timestamp_ltz|timestamp_ntz)\\s*['\"]\\s*" +
      "(now|today|tomorrow|yesterday)\\s*['\"]").r

  /** Strip bracketed and line comments OUTSIDE quoted literals /
    * identifiers (a string containing `--` must not be truncated, or
    * a `'today'` after it would escape the scan). Refusal scanning
    * only — never used for parsing. */
  private[segment] def stripComments(sql: String): String = {
    val out = new java.lang.StringBuilder(sql.length)
    var i = 0
    var quote: Char = 0 // 0 = outside; else the open quote/backtick
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (quote != 0) {
        // backslash escapes are live inside string literals under the
        // default escapedStringLiterals=false — '\'' does NOT close
        // the string, and treating it as closing would desync the
        // tracker and let a '--' inside the literal truncate the scan
        // text (a guard bypass). Backticks have no backslash escapes.
        if (c == '\\' && quote != '`' && i + 1 < sql.length) {
          out.append(c).append(sql.charAt(i + 1))
          i += 2
        } else {
          out.append(c)
          if (c == quote) quote = 0 // '' escapes simply re-open next char
          i += 1
        }
      } else if (c == '\'' || c == '"' || c == '`') {
        quote = c; out.append(c); i += 1
      } else if (c == '-' && i + 1 < sql.length && sql.charAt(i + 1) == '-') {
        while (i < sql.length && sql.charAt(i) != '\n') i += 1
      } else if (c == '/' && i + 1 < sql.length && sql.charAt(i + 1) == '*') {
        i += 2
        while (i + 1 < sql.length &&
          !(sql.charAt(i) == '*' && sql.charAt(i + 1) == '/')) i += 1
        i = math.min(i + 2, sql.length)
        out.append(' ') // a comment is a token separator
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Parse + analyze `sql` as a projection over `schema`, refusing
    * everything that cannot soundly derive a stored column; returns
    * the analyzed expression. `allGenerated` are the table's generated
    * column names (an expression may not reference one — chains would
    * make fill order and validation ambiguous). */
  def requireAnalyzable(spark: SparkSession, schema: StructType,
      name: String, sql: String, allGenerated: Set[String]): Expression = {
    val field = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"generated column $name is not in the schema ${schema.simpleString}"))
    require(SegmentDefaults.fillable(field.dataType),
      s"generated column $name must have an atomic type, not " +
        s"${field.dataType.simpleString}")
    // SPECIAL datetime strings (DATE 'today', TIMESTAMP 'now', ...)
    // fold to per-session literals INSIDE the parser itself
    // (convertSpecialDate/convertSpecialTimestamp) — by the time any
    // tree exists they are indistinguishable from honest literals, so
    // the refusal must be textual: comment-stripped, both quote
    // styles. 'epoch' is a fixed instant and stays allowed.
    require(SpecialDatetime.findFirstIn(stripComments(sql)).isEmpty,
      s"generated column $name ($sql) must not use the special datetime " +
        "strings now/today/tomorrow/yesterday — the parser folds them to " +
        "per-session literals, so the stored value would diverge from the " +
        "expression across sessions")
    // parse-level session-context guard: current_user()/current_database()
    // etc. reach the analyzed tree only as already-folded literals, so
    // walk the UNRESOLVED tree. A bare keyword form (CURRENT_USER without
    // parens) parses as an attribute; it is refused only when no schema
    // column claims the name — column resolution wins in the analyzer,
    // so a real column named `user` stays usable.
    val colNames = schema.fieldNames.map(_.toLowerCase(java.util.Locale.ROOT)).toSet
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(sql)
      catch {
        case e: org.apache.spark.sql.catalyst.parser.ParseException =>
          throw new IllegalArgumentException(
            s"generated column $name ($sql) does not parse: ${e.getMessage}")
      }
    parsed.foreach {
      case f: UnresolvedFunction
          if SessionContextNames.contains(
            f.nameParts.last.toLowerCase(java.util.Locale.ROOT)) =>
        throw new IllegalArgumentException(
          s"generated column $name ($sql) must not depend on session " +
            s"context (${f.nameParts.last} varies across sessions, so the " +
            "stored value would diverge from the expression)")
      case a: UnresolvedAttribute
          if a.nameParts.length == 1 && {
            val n = a.nameParts.head.toLowerCase(java.util.Locale.ROOT)
            SessionContextNames.contains(n) && !colNames.contains(n)
          } =>
        throw new IllegalArgumentException(
          s"generated column $name ($sql) must not depend on session " +
            s"context (${a.nameParts.head} resolves to a per-session value, " +
            "not a column of this table)")
      case _ =>
    }
    val expr =
      try {
        val df = spark.createDataFrame(
          java.util.Collections.emptyList[Row](), schema)
        df.select(F.expr(sql)).queryExecution.analyzed.collectFirst {
          case p: Project => p.projectList.head
        }.map { case a: Alias => a.child; case e => e }
          .getOrElse(throw new IllegalArgumentException(
            s"generated column $name ($sql) did not analyze to a projection"))
      } catch {
        case e: AnalysisException => throw new IllegalArgumentException(
          s"generated column $name ($sql) does not analyze against " +
            s"${schema.simpleString}: ${e.getMessage}")
      }
    require(expr.dataType == field.dataType,
      s"generated column $name ($sql) produces ${expr.dataType.simpleString} " +
        s"but the column is declared ${field.dataType.simpleString} — " +
        "CAST inside the expression")
    require(expr.deterministic,
      s"generated column $name ($sql) must be deterministic")
    require(!expr.exists(_.isInstanceOf[PlanExpression[_]]),
      s"generated column $name ($sql) must not contain a subquery")
    require(!expr.exists {
        case _: CurrentTimestampLike | _: CurrentDate | _: LocalTimestamp => true
        case e => e.isInstanceOf[Unevaluable] && !e.isInstanceOf[AttributeReference]
      },
      s"generated column $name ($sql) must be evaluable at write time")
    // timezone-sensitivity guard: the expression is re-analyzed per
    // write session, so anything reading spark.sql.session.timeZone
    // (CAST(ts AS STRING), date_format, hour, ...) computes — and
    // validates explicit values against — DIFFERENT results under a
    // different session zone. Casts are refused only when the specific
    // from→to pair consults the zone (Cast.needsTimeZone), so the
    // bread-and-butter numeric casts stay usable; every other
    // TimeZoneAwareExpression genuinely reads the zone. Pure date
    // arithmetic (year/month/datediff on DATE) is zone-free and passes.
    expr.foreach {
      case c: Cast =>
        require(!Cast.needsTimeZone(c.child.dataType, c.dataType),
          s"generated column $name ($sql): CAST from " +
            s"${c.child.dataType.simpleString} to ${c.dataType.simpleString} " +
            "depends on spark.sql.session.timeZone, so the stored value " +
            "would diverge from the expression across sessions")
      case e: TimeZoneAwareExpression =>
        throw new IllegalArgumentException(
          s"generated column $name ($sql): ${e.prettyName} depends on " +
            "spark.sql.session.timeZone, so the stored value would diverge " +
            "from the expression across sessions")
      case _ =>
    }
    expr.foreach {
      case a: AttributeReference =>
        require(!allGenerated.contains(a.name),
          s"generated column $name ($sql) references generated column " +
            s"${a.name} — expressions may reference stored columns only")
      case _ =>
    }
    expr
  }

  /** Compile every declared generation of `props` (analyzed against
    * the TABLE schema) bound to `writeSchema`'s ordinals. A write that
    * does not carry a generated column (a pure MoR DELETE's empty
    * schema) has nothing to fill; a write that carries the column but
    * not one of its inputs is refused — computing from a silent NULL
    * would freeze a wrong derived value. Driver-side. */
  def compileAll(spark: SparkSession, props: Map[String, String],
      tableSchema: StructType, writeSchema: StructType): Seq[GenSpec] = {
    val decls = declared(props)
    if (decls.isEmpty) return Nil
    val genNames = decls.map(_._1).toSet
    val resolver = spark.sessionState.conf.resolver
    decls.flatMap { case (name, sql) =>
      val ord = writeSchema.fieldNames.indexWhere(resolver(_, name))
      if (ord < 0) {
        // only a row-IDENTITY-only write (the pure MoR DELETE's empty
        // value schema) may omit a generated column: a mergeSchema
        // append carrying data columns but not the derived one would
        // land rows whose derived slot reads back NULL ≠ expression —
        // silent divergence, refused here
        require(writeSchema.isEmpty,
          s"this write omits generated column $name — partial-schema " +
            "appends must carry every generated column (write NULL to " +
            "have it computed)")
        None
      } else {
        val expr = requireAnalyzable(spark, tableSchema, name, sql, genNames)
        val bound = expr.transformUp {
          case a: AttributeReference =>
            val i = writeSchema.fieldNames.indexWhere(resolver(_, a.name))
            require(i >= 0,
              s"generated column $name ($sql) references ${a.name}, which " +
                "this write does not carry")
            BoundReference(i, a.dataType, nullable = true)
        }
        val self = BoundReference(ord, writeSchema(ord).dataType, nullable = true)
        // per row the expression evaluates exactly ONCE under codegen
        // short-circuiting: a NULL slot skips the mismatch's right
        // conjunct and computes in the fill's else-branch; a non-NULL
        // slot computes in the mismatch and the fill takes the
        // self-branch without touching it
        Some(GenSpec(name, sql, ord,
          fill = If(IsNull(self), bound, self),
          mismatch = And(IsNotNull(self), Not(EqualNullSafe(self, bound)))))
      }
    }
  }

  /** Executor-side: validate explicit values, then project the row
    * with generated slots filled. The projection is codegen'd and its
    * output row is reused — callers encode immediately (the writer
    * chokepoint does). */
  final class Generator(specs: Seq[GenSpec], schema: StructType) {
    private val mismatches = specs.map { s =>
      val p = Predicate.create(s.mismatch); p.initialize(0); (s, p)
    }.toArray
    private val proj: MutableProjection = {
      val byOrd = specs.map(s => s.ordinal -> s.fill).toMap
      val exprs = schema.fields.zipWithIndex.map { case (f, i) =>
        byOrd.getOrElse(i, BoundReference(i, f.dataType, nullable = true)): Expression
      }.toSeq
      val m = MutableProjection.create(exprs)
      m.initialize(0)
      m
    }

    private def render(row: InternalRow): String =
      schema.fields.zipWithIndex.map { case (f, i) =>
        val v = if (row.isNullAt(i)) "null" else String.valueOf(row.get(i, f.dataType))
        s"${f.name}=${if (v.length > 64) v.take(61) + "..." else v}"
      }.mkString(", ")

    def apply(row: InternalRow): InternalRow = {
      var i = 0
      while (i < mismatches.length) {
        val (s, p) = mismatches(i)
        if (p.eval(row)) throw new IllegalArgumentException(
          s"generated column ${s.name} (${s.sql}): explicit value diverges " +
            s"from the expression for row: ${render(row)} — write NULL (or " +
            "omit the column) to have it computed")
        i += 1
      }
      proj(row)
    }
  }
}
