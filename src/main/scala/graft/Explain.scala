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
    val df = fn(spark, sfDir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name elapsed ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
