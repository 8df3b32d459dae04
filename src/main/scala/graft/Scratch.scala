package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 1. default read of ns timestamps
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema()
      df.select("ts").show(3, false)
    } catch { case e: Throwable => println(s"DEFAULT READ FAILED: ${e.getMessage.take(300)}") }
    // 2. nanosAsLong
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      df.printSchema()
      df.select("ts").show(3, false)
    } catch { case e: Throwable => println(s"NANOS-AS-LONG FAILED: ${e.getMessage.take(300)}") }
    spark.stop()
  }
}
