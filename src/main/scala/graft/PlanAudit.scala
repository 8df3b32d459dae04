package graft

/** Dev tool: print the structural skeleton (exchanges, joins,
  * aggregates, windows, sorts, scans) of named gate queries' physical
  * plans — the per-round plan-audit loop (would this shape survive a
  * 100× scale-up?) without wading through full explain output.
  *
  * Usage: runMain graft.PlanAudit [sfDir] [name,name,...]
  * Defaults: sf0.001, the queries added most recently (edit the list
  * per round). The round-15 audit caught qC0's heap aggregate
  * executing twice (rows consumed by the final projection AND the
  * rank-1 guard — fixed with the qBW localCheckpoint pattern). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val names =
      if (args.length > 1) args(1).split(",").toSeq
      else Seq("qE0_ivf_search_exact", "qE1_knn_join_exact",
        "qE2_semantic_dedup_exact", "qE3_significance_capstone",
        "qE4_pq_search_exact", "qE5_changepoint", "qE6_event_funnel")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n")
      println(SparkEntry.queries(n)(spark, dir).queryExecution.executedPlan
        .toString.linesIterator.filter(l =>
          l.contains("Exchange") || l.contains("Window") ||
            l.contains("Join") || l.contains("Aggregate") ||
            l.contains("Scan") || l.contains("Sort")).mkString("\n"))
    }
    spark.stop()
  }
}
