package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session-extension entry point:
 * `--conf spark.sql.extensions=graft.GraftExtensions` gives any plain
 * Spark session the graft dialect — the `epoch_ns` compat function and
 * the native as-of join strategy — without touching application code.
 * (`Engine` registers the same pieces imperatively for embedded use.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfStrategy)
    e.injectOptimizerRule(_ => graft.plans.NsTimeFilterPushdown)
    // function registration needs a live session; defer via a
    // check-and-register rule that runs once per session
    e.injectResolutionRule { session =>
      functions.Compat.register(session)
      new org.apache.spark.sql.catalyst.rules.Rule[
          org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
        override def apply(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) = p
      }
    }
  }
}
