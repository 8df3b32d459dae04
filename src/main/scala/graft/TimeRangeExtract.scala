package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}

/**
 * Time-range extraction from a parsed Catalyst plan.
 *
 * Replaces the reference's 16 regex patterns
 * (/root/reference/querier/queryClient.go:185-337): instead of string
 * surgery we parse the SQL with Spark's ANTLR parser and walk the
 * Filter expressions for conjunctive comparisons against the time
 * column. Covers every reference form — bare literal, `cast(… as
 * timestamp)`, `epoch_ns('…'::TIMESTAMP)`, `epoch_ns(cast(…))`,
 * equality, BETWEEN — plus anything else that parses to a comparison
 * with a literal-valued operand.
 *
 * Extraction is used ONLY for scan pruning; the original WHERE always
 * executes afterwards, so a missed pattern costs performance, never
 * correctness (reference quirk §2.3-7).
 */
object TimeRangeExtract {

  /** Inclusive ns bounds; None = unbounded on that side. */
  case class TimeRange(start: Option[Long], end: Option[Long]) {
    def isEmpty: Boolean = start.isEmpty && end.isEmpty
    def asTuple: Option[(Long, Long)] =
      if (isEmpty) None else Some((start.getOrElse(Long.MinValue), end.getOrElse(Long.MaxValue)))
  }

  /** The plan plus every (nested) subquery plan hanging off its
    * expressions — `plan.collect` alone never descends into
    * EXISTS/IN/scalar-subquery plans, so a lake table referenced only
    * inside a subquery would otherwise be invisible. */
  def withSubqueryPlans(plan: LogicalPlan): Seq[LogicalPlan] =
    plan +: plan.collect { case p => p }
      .flatMap(_.expressions.flatMap(_.collect {
        case s: org.apache.spark.sql.catalyst.expressions.SubqueryExpression => s.plan
      }))
      .flatMap(withSubqueryPlans)

  /** Every `db.table` (or bare table) relation referenced by the plan
    * (including subqueries), in occurrence order, deduplicated. */
  def findRelations(plan: LogicalPlan): Seq[Seq[String]] =
    withSubqueryPlans(plan)
      .flatMap(_.collect { case r: UnresolvedRelation => r.multipartIdentifier })
      .distinct

  /** The first relation referenced by the plan. */
  def findRelation(plan: LogicalPlan): Option[Seq[String]] =
    findRelations(plan).headOption

  def parse(spark: SparkSession, sql: String): LogicalPlan =
    spark.sessionState.sqlParser.parsePlan(sql)

  /**
   * Alias-aware extraction for multi-relation plans: returns the time
   * range per relation name, attributing `alias.time` predicates
   * through `SubqueryAlias` wrappers (`FROM mydb.meas m ... m.time >= …`
   * tightens only `meas`). Unqualified `time` predicates are
   * attributed only when the plan references a single relation —
   * with several, an unqualified column can't be attributed before
   * resolution, and mis-attributed pruning would drop rows.
   *
   * A table that occurs MORE THAN ONCE in the plan (UNION ALL branches,
   * a self-join with per-alias windows, or an outer query plus a
   * subquery over the same table) gets NO pruning: all occurrences
   * share one temp view, so the only sound per-view range would be the
   * UNION of the occurrences' windows — and intersecting them (the
   * naive fold) silently drops rows for disjoint branches. Filters
   * inside subquery expressions are never harvested either: a
   * `NOT EXISTS (… t.time > X)` pruned by `time > X` would invert the
   * result. Pruning stays a strict optimization (quirk §2.3-7).
   */
  /** alias → relation-name map (lowercased; bare table name and
    * `db.table` both alias the table; a subquery alias maps to the
    * first relation under it). Shared by per-relation pruning and the
    * alias-scoped literal rewrite. */
  def aliasMap(plan: LogicalPlan): Map[String, String] = {
    val aliasToTable = scala.collection.mutable.Map[String, String]()
    withSubqueryPlans(plan).foreach(_.foreach {
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(ident, child) =>
        child.collectFirst { case r: UnresolvedRelation =>
          aliasToTable(ident.name.toLowerCase) = r.multipartIdentifier.last.toLowerCase
        }
      case r: UnresolvedRelation =>
        val t = r.multipartIdentifier.last.toLowerCase
        aliasToTable.getOrElseUpdate(t, t)
        // db.table used as qualifier too
        aliasToTable.getOrElseUpdate(r.multipartIdentifier.mkString(".").toLowerCase, t)
      case _ => ()
    })
    aliasToTable.toMap
  }

  /**
   * Per-ALIAS ranges for multi-occurrence tables: when one table is
   * referenced several times under DISTINCT, statement-unique aliases
   * (`FROM meas a JOIN meas b`), each alias's QUALIFIED predicates
   * (`a.time >= …`) can soundly prune that occurrence's scan even
   * though the per-table attribution (extractPerRelation) must give
   * up. Aliases whose name appears more than once across the
   * statement, and unaliased occurrences, are excluded — no range.
   */
  def extractPerAlias(plan: LogicalPlan,
                      timeCol: String = "time"): Map[String, TimeRange] = {
    val aliasCounts = scala.collection.mutable.Map[String, Int]()
    withSubqueryPlans(plan).foreach(_.foreach {
      case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(ident, _) =>
        val a = ident.name.toLowerCase
        aliasCounts(a) = aliasCounts.getOrElse(a, 0) + 1
      case _ => ()
    })
    aliasCounts.collect { case (a, 1) =>
      a -> extract(plan, timeCol, qualifierFilter = Some { parts =>
        parts.size >= 2 && parts.dropRight(1).mkString(".").toLowerCase == a
      })
    }.toMap
  }

  def extractPerRelation(plan: LogicalPlan,
                         timeCol: String = "time"): Map[String, TimeRange] = {
    val aliasToTable = aliasMap(plan)
    val tables = scala.collection.mutable.ListBuffer[String]()
    withSubqueryPlans(plan).foreach(_.foreach {
      case r: UnresolvedRelation => tables += r.multipartIdentifier.last.toLowerCase
      case _ => ()
    })
    val counts = tables.groupBy(identity).view.mapValues(_.size).toMap
    val single = tables.size == 1
    tables.distinct.map { t =>
      if (counts(t) > 1) t -> TimeRange(None, None) // multi-occurrence: no pruning
      else t -> extract(plan, timeCol, qualifierFilter = Some { parts =>
        if (parts.size >= 2)
          aliasToTable.get(parts.dropRight(1).mkString(".").toLowerCase).contains(t)
        else single // unqualified: only attributable with one relation
      })
    }.toMap
  }

  /** Extract bounds for `timeCol` from every Filter in the plan.
    * `qualifierFilter`: when set, only attribute comparisons whose
    * attribute name-parts pass the predicate (alias attribution). */
  def extract(plan: LogicalPlan, timeCol: String = "time",
              qualifierFilter: Option[Seq[String] => Boolean] = None): TimeRange = {
    var lo: Option[Long] = None
    var hi: Option[Long] = None
    def tighten(newLo: Option[Long], newHi: Option[Long]): Unit = {
      newLo.foreach(v => lo = Some(lo.fold(v)(math.max(_, v))))
      newHi.foreach(v => hi = Some(hi.fold(v)(math.min(_, v))))
    }
    def isTime(e: Expression): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.lastOption.exists(_.equalsIgnoreCase(timeCol)) &&
          qualifierFilter.forall(_(a.nameParts))
      case Cast(c, _, _, _) => isTime(c)
      case _ => false
    }
    // strict→inclusive normalization saturates at the Long extremes —
    // a wrap-around would invert the bound and prune everything
    def inc(v: Option[Long]): Option[Long] =
      v.map(x => if (x == Long.MaxValue) x else x + 1)
    def dec(v: Option[Long]): Option[Long] =
      v.map(x => if (x == Long.MinValue) x else x - 1)
    def walk(e: Expression): Unit = e match {
      case And(l, r) => walk(l); walk(r)
      case GreaterThanOrEqual(a, v) if isTime(a) => tighten(lit(v), None)
      case GreaterThan(a, v) if isTime(a) => tighten(inc(lit(v)), None)
      case LessThanOrEqual(a, v) if isTime(a) => tighten(None, lit(v))
      case LessThan(a, v) if isTime(a) => tighten(None, dec(lit(v)))
      case EqualTo(a, v) if isTime(a) => tighten(lit(v), lit(v))
      // mirrored operand order: '2023-…' <= time
      case GreaterThanOrEqual(v, a) if isTime(a) => tighten(None, lit(v))
      case GreaterThan(v, a) if isTime(a) => tighten(None, dec(lit(v)))
      case LessThanOrEqual(v, a) if isTime(a) => tighten(lit(v), None)
      case LessThan(v, a) if isTime(a) => tighten(inc(lit(v)), None)
      case EqualTo(v, a) if isTime(a) => tighten(lit(v), lit(v))
      case Between(a, lower, upper, _) if isTime(a) =>
        tighten(lit(lower), lit(upper))
      // the parser leaves BETWEEN as an unresolved function call
      case f: UnresolvedFunction
          if f.nameParts.lastOption.exists(_.equalsIgnoreCase("between")) &&
            f.arguments.size == 3 && isTime(f.arguments.head) =>
        tighten(lit(f.arguments(1)), lit(f.arguments(2)))
      case _ => () // OR / NOT / unrelated predicates: no pruning info
    }
    plan.foreach {
      case Filter(cond, _) => walk(cond)
      case _ => ()
    }
    TimeRange(lo, hi)
  }

  /**
   * True iff `cond` is a conjunction of EXACTLY the comparison forms
   * `extract` tightens — time-vs-evaluable-literal comparisons (all
   * mirrored variants, equality, BETWEEN) joined by AND — so the
   * extracted TimeRange REPRESENTS the condition, not merely bounds
   * it. A single unrecognized or unevaluable conjunct returns false:
   * callers (the metadata count fast path) must not treat a broader
   * condition as if it were its time-range projection.
   */
  def isExactTimeRange(cond: Expression, timeCol: String): Boolean = {
    def isTime(e: Expression): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.lastOption.exists(_.equalsIgnoreCase(timeCol))
      case Cast(c, _, _, _) => isTime(c)
      case _ => false
    }
    // strict comparisons at the Long extremes saturate during
    // normalization (extract would represent `time > MaxValue` as
    // `>= MaxValue`) — sound for pruning, NOT an exact representation
    def strictOk(v: Expression): Boolean =
      lit(v).exists(x => x != Long.MinValue && x != Long.MaxValue)
    def ok(e: Expression): Boolean = e match {
      case And(l, r) => ok(l) && ok(r)
      case GreaterThanOrEqual(a, v) if isTime(a) => lit(v).isDefined
      case GreaterThan(a, v) if isTime(a) => strictOk(v)
      case LessThanOrEqual(a, v) if isTime(a) => lit(v).isDefined
      case LessThan(a, v) if isTime(a) => strictOk(v)
      case EqualTo(a, v) if isTime(a) => lit(v).isDefined
      case GreaterThanOrEqual(v, a) if isTime(a) => lit(v).isDefined
      case GreaterThan(v, a) if isTime(a) => strictOk(v)
      case LessThanOrEqual(v, a) if isTime(a) => lit(v).isDefined
      case LessThan(v, a) if isTime(a) => strictOk(v)
      case EqualTo(v, a) if isTime(a) => lit(v).isDefined
      case Between(a, lower, upper, _) if isTime(a) =>
        lit(lower).isDefined && lit(upper).isDefined
      case f: UnresolvedFunction
          if f.nameParts.lastOption.exists(_.equalsIgnoreCase("between")) &&
            f.arguments.size == 3 && isTime(f.arguments.head) =>
        lit(f.arguments(1)).isDefined && lit(f.arguments(2)).isDefined
      case _ => false
    }
    ok(cond)
  }

  /**
   * Analog of the reference's timestamp-literal rewrite (O9,
   * querier/queryClient.go:849-850): on a plan querying an int64-ns
   * time column, replace string/timestamp literals compared against it
   * with their epoch-ns long value — so `time >= '2024-01-10'` becomes
   * a plain long comparison (pushed down to parquet). Done as a
   * Catalyst plan transform, not string surgery.
   *
   * `attributable` scopes the rewrite to attributes that belong to a
   * LongType-time relation (alias attribution, same map as pruning):
   * in a join between an int64-ns lake table and a TimestampType-time
   * table, the timestamp side's literals must NOT be rewritten to ns
   * longs — that would be a silently wrong comparison.
   */
  def rewriteTimeLiterals(plan: LogicalPlan, timeCol: String,
                          attributable: Seq[String] => Boolean = _ => true): LogicalPlan = {
    def isTime(e: Expression): Boolean = e match {
      case a: UnresolvedAttribute =>
        a.nameParts.lastOption.exists(_.equalsIgnoreCase(timeCol)) &&
          attributable(a.nameParts)
      case Cast(c, _, _, _) => isTime(c)
      case _ => false
    }
    def bare(e: Expression): Expression = e match {
      case a: UnresolvedAttribute => a
      case Cast(c, _, _, _) => bare(c)
      case other => other
    }
    def asNs(e: Expression): Option[Expression] = e match {
      case _: Literal | _: Cast | _: UnresolvedFunction =>
        lit(e).map(ns => Literal(ns))
      case _ => None
    }
    val rules: PartialFunction[Expression, Expression] = {
      case GreaterThanOrEqual(a, v) if isTime(a) && asNs(v).isDefined =>
        GreaterThanOrEqual(bare(a), asNs(v).get)
      case GreaterThan(a, v) if isTime(a) && asNs(v).isDefined =>
        GreaterThan(bare(a), asNs(v).get)
      case LessThanOrEqual(a, v) if isTime(a) && asNs(v).isDefined =>
        LessThanOrEqual(bare(a), asNs(v).get)
      case LessThan(a, v) if isTime(a) && asNs(v).isDefined =>
        LessThan(bare(a), asNs(v).get)
      case EqualTo(a, v) if isTime(a) && asNs(v).isDefined =>
        EqualTo(bare(a), asNs(v).get)
      case GreaterThanOrEqual(v, a) if isTime(a) && asNs(v).isDefined =>
        LessThanOrEqual(bare(a), asNs(v).get)
      case GreaterThan(v, a) if isTime(a) && asNs(v).isDefined =>
        LessThan(bare(a), asNs(v).get)
      case LessThanOrEqual(v, a) if isTime(a) && asNs(v).isDefined =>
        GreaterThanOrEqual(bare(a), asNs(v).get)
      case LessThan(v, a) if isTime(a) && asNs(v).isDefined =>
        GreaterThan(bare(a), asNs(v).get)
      case Between(a, lo, hi, repl) if isTime(a) &&
          (asNs(lo).isDefined || asNs(hi).isDefined) =>
        Between(bare(a), asNs(lo).getOrElse(lo), asNs(hi).getOrElse(hi), repl)
      case f: UnresolvedFunction
          if f.nameParts.lastOption.exists(_.equalsIgnoreCase("between")) &&
            f.arguments.size == 3 && isTime(f.arguments.head) &&
            (asNs(f.arguments(1)).isDefined || asNs(f.arguments(2)).isDefined) =>
        f.copy(arguments = Seq(bare(f.arguments.head),
          asNs(f.arguments(1)).getOrElse(f.arguments(1)),
          asNs(f.arguments(2)).getOrElse(f.arguments(2))))
    }
    // apply inside subquery plans too — `transformAllExpressions` alone
    // never reaches a Filter nested in an EXISTS/IN subquery expression.
    // CTE definitions live OUTSIDE `children` (UnresolvedWith keeps them
    // as inner children), so they get their own recursion — without it a
    // time literal inside `WITH x AS (… WHERE time < '…')` stays a
    // string and the int64 comparison fails at runtime.
    plan.transformDownWithSubqueries {
      case w: org.apache.spark.sql.catalyst.plans.logical.UnresolvedWith =>
        w.copy(cteRelations = w.cteRelations.map { case (n, d, m) =>
          (n, rewriteTimeLiterals(d, timeCol, attributable)
            .asInstanceOf[org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias], m)
        })
      case p => p.transformExpressions(rules)
    }
  }

  /** Literal-ish expression → epoch ns, if statically evaluable. */
  private def lit(e: Expression): Option[Long] = e match {
    // TIMESTAMP 'x' literals are already-evaluated epoch-µs longs
    case Literal(us: Long, t) if t.typeName.startsWith("timestamp") => Some(us * 1000L)
    case Literal(v: Long, _) => Some(v)
    case Literal(v: Int, _) => Some(v.toLong)
    case Literal(s, t) if s != null && t.typeName == "string" =>
      parseTimeLiteral(s.toString)
    case Cast(c, _, _, _) => lit(c)
    case f: UnresolvedFunction
        if f.nameParts.lastOption.exists(_.equalsIgnoreCase("epoch_ns")) =>
      f.arguments.headOption.flatMap(lit)
    case _ => None
  }

  /**
   * Accepted time-literal formats (reference
   * querier/queryClient.go:241-243,269-271,291-293): RFC3339(Nano)
   * with zone, and naive `2006-01-02T15:04:05[.fff]` (UTC-assumed,
   * `T` or space). Date-only also accepted.
   */
  def parseTimeLiteral(s0: String): Option[Long] = {
    val s = s0.trim
    def inst(i: java.time.Instant): Long =
      i.getEpochSecond * 1000000000L + i.getNano
    scala.util.Try(inst(java.time.Instant.parse(s))).toOption
      .orElse(scala.util.Try(inst(java.time.OffsetDateTime.parse(s).toInstant)).toOption)
      .orElse(scala.util.Try {
        val norm = if (s.contains(' ')) s.replaceFirst(" ", "T") else s
        inst(java.time.LocalDateTime.parse(norm).toInstant(java.time.ZoneOffset.UTC))
      }.toOption)
      .orElse(scala.util.Try {
        inst(java.time.LocalDate.parse(s).atStartOfDay.toInstant(java.time.ZoneOffset.UTC))
      }.toOption)
      .orElse(scala.util.Try(s.toLong).toOption)
  }
}
