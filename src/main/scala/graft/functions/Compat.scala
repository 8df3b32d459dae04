package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal, Multiply, UnixMicros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/**
 * Reference-dialect compat functions.
 *
 * `epoch_ns(ts)` — int64 epoch-ns of a timestamp — is the function the
 * reference rewrites all time literals through so they compare against
 * its int64-ns `time` column (/root/reference/querier/queryClient.go:314,
 * :849-850). Registered as a pure Catalyst expression tree
 * (unix_micros(cast(x as timestamp)) * 1000) — constant-folded by the
 * optimizer when the argument is a literal, so `time >= epoch_ns('…')`
 * becomes a plain long comparison with full predicate pushdown.
 *
 * `version()` is Spark's builtin — nothing to add.
 */
object Compat {
  private def epochNs(args: Seq[Expression]): Expression = {
    val ts = args.head match {
      case e if e.dataType == TimestampType => e
      case e => Cast(e, TimestampType)
    }
    Multiply(Cast(UnixMicros(ts), LongType), Literal(1000L))
  }

  /** Register dialect functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "epoch_ns", epochNs, "built-in")
  }
}
