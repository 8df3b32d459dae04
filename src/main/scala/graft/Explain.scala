package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit main: print the formatted physical plan of one
  * `SparkEntry` query, then time a full `noop` materialization — the
  * `.explain` feedback loop used to keep plans shuffle-lean.
  *
  * Usage: `runMain graft.Explain <queryName> [sfDir]`
  * (`SPARK_GRAFT_CPUS` sets parallelism, default 8).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Explain <queryName> [sfDir]")
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    // time from CONSTRUCTION: operators with eager stages (two-phase
    // prefix sums, localCheckpoints) do real work inside fn() — timing
    // only the final write would hide it, and the printed plan of such
    // queries is only the post-checkpoint tail (noted per query)
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val tBuilt = System.nanoTime()
    df.explain("formatted")
    df.write.format("noop").mode("overwrite").save()
    val tEnd = System.nanoTime()
    // Locale.ROOT so timings print with decimal points under any locale
    def sec(nanos: Long): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(nanos / 1e9))
    println(s"[explain] $name build ${sec(tBuilt - t0)} s " +
      s"(eager stages run here), write ${sec(tEnd - tBuilt)} s, " +
      s"total ${sec(tEnd - t0)} s")
    spark.stop()
  }
}
