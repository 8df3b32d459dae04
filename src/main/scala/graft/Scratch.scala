package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q72_ivf_search")) {
      println(s"===== $q =====")
      try SparkEntry.queries(q)(spark, dir).show(5)
      catch { case e: Throwable => println("FAILED: " + e); var c = e.getCause
        while (c != null) { println("CAUSE: " + c.toString.take(400)); c = c.getCause } }
    }
    spark.stop()
  }
}
