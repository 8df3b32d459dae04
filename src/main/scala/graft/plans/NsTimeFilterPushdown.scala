package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/**
 * Recovers parquet row-group skipping for time-range predicates after
 * the int64-ns `ts` normalization (Tables.normalizeTs).
 *
 * The normalization projects a timestamp-typed scan column through
 * `unix_micros(cast(ts as timestamp)) * 1000`, so a time-range filter
 * written against the ns contract — e.g. `ts >= 1704844800000000000L` —
 * lands on a DERIVED expression the parquet source cannot translate:
 * only `IsNotNull` reaches `PushedFilters` and every row group is read.
 * On a 100 TB lake the time-range filter is THE pruning predicate (the
 * reference's whole O2 time-range extraction exists to feed it), so
 * losing footer-stats skipping is a full-scan regression.
 *
 * `unix_micros` is strictly monotone in the underlying column, so each
 * integer-ns comparison has an exact native-timestamp equivalent with
 * the bound divided by 1000 and rounded in the direction that preserves
 * semantics over the unrepresented sub-µs range:
 *
 *   us(a)*1000 >= L  ⇔  a >= ceil(L/1000) µs
 *   us(a)*1000 >  L  ⇔  a >  floor(L/1000) µs
 *   us(a)*1000 <  L  ⇔  a <  ceil(L/1000) µs
 *   us(a)*1000 <= L  ⇔  a <= floor(L/1000) µs
 *   us(a)*1000 == L  ⇔  a == L/1000 µs when 1000 | L, else false
 *
 * The rewritten comparison is attribute-vs-literal on the scan column's
 * own type, which DataSourceStrategy translates into a pushed parquet
 * filter (verified by TsPushdownSpec's `PushedFilters` plan pin).
 *
 * The TimestampType (instant) path is timezone-independent. The
 * TimestampNTZType path relies on `cast(ntz as timestamp)` being the
 * identity on the internal µs value, which holds exactly when the
 * session time zone is UTC (Tables.configure pins it) — the rule
 * checks and declines to rewrite under any other zone.
 */
object NsTimeFilterPushdown extends Rule[LogicalPlan] {

  /** `unix_micros(cast(a as timestamp)) * 1000` (either operand order,
    * cast possibly elided by SimplifyCasts for LTZ inputs) → `a`. */
  private object NsOfTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(UnixMicros(TsChild(a)), Literal(1000L, LongType), _) => Some(a)
      case Multiply(Literal(1000L, LongType), UnixMicros(TsChild(a)), _) => Some(a)
      case _ => None
    }
  }

  private object TsChild {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(a, TimestampType, _, _)
          if a.dataType == TimestampType ||
            (a.dataType == TimestampNTZType && utcSession) => Some(a)
      case a if a.dataType == TimestampType => Some(a)
      case _ => None
    }
  }

  private def utcSession: Boolean = {
    val z = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    z == "UTC" || z == "Etc/UTC" || z == "GMT" || z == "+00:00" || z == "Z"
  }

  private def floorUs(ns: Long): Long = Math.floorDiv(ns, 1000L)
  private def ceilUs(ns: Long): Long = // overflow-free ceil division
    Math.floorDiv(ns, 1000L) + (if (Math.floorMod(ns, 1000L) != 0L) 1L else 0L)

  private def usLit(a: Expression, us: Long): Literal = Literal(us, a.dataType)

  override def apply(plan: LogicalPlan): LogicalPlan = plan transformAllExpressions {
    case GreaterThanOrEqual(NsOfTs(a), Literal(l: Long, LongType)) =>
      GreaterThanOrEqual(a, usLit(a, ceilUs(l)))
    case GreaterThan(NsOfTs(a), Literal(l: Long, LongType)) =>
      GreaterThan(a, usLit(a, floorUs(l)))
    case LessThan(NsOfTs(a), Literal(l: Long, LongType)) =>
      LessThan(a, usLit(a, ceilUs(l)))
    case LessThanOrEqual(NsOfTs(a), Literal(l: Long, LongType)) =>
      LessThanOrEqual(a, usLit(a, floorUs(l)))
    // mirrored literal-first forms
    case GreaterThanOrEqual(Literal(l: Long, LongType), NsOfTs(a)) =>
      GreaterThanOrEqual(usLit(a, floorUs(l)), a)
    case GreaterThan(Literal(l: Long, LongType), NsOfTs(a)) =>
      GreaterThan(usLit(a, ceilUs(l)), a)
    case LessThan(Literal(l: Long, LongType), NsOfTs(a)) =>
      LessThan(usLit(a, floorUs(l)), a)
    case LessThanOrEqual(Literal(l: Long, LongType), NsOfTs(a)) =>
      LessThanOrEqual(usLit(a, ceilUs(l)), a)
    // equality only when the bound is µs-representable; a non-aligned
    // bound is NOT rewritten to `false` — that would flip NULL inputs
    // from NULL to false (visible under negation or in projections).
    // The unrewritten expression stays correct, it just doesn't push.
    case EqualTo(NsOfTs(a), Literal(l: Long, LongType)) if l % 1000L == 0L =>
      EqualTo(a, usLit(a, l / 1000L))
    case EqualTo(Literal(l: Long, LongType), NsOfTs(a)) if l % 1000L == 0L =>
      EqualTo(usLit(a, l / 1000L), a)
  }
}
