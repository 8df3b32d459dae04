package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val df = graft.plans.AsOfJoinNative.backward(views, clicks,
      Seq("user_id"), "ts", "ts", rightPayload = Seq("event_id"))
    println(df.queryExecution.executedPlan.treeString.take(2500))
    spark.stop()
  }
}
