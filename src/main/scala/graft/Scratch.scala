package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    for (q <- Seq("q52_minhash_lsh", "q54_embed_pairs", "q56_ann_lsh", "q55_sim_topk")) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, dir).count()
      println(s"TIMING $q rows=$n ${(System.nanoTime() - t0) / 1e9}s")
    }
    SparkEntry.queries("q52_minhash_lsh")(spark, dir).show(5, false)
    spark.stop()
  }
}
