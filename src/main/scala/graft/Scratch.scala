package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = TimeRangeExtract.parse(spark,
      "SELECT 1 FROM t WHERE time BETWEEN '2023-01-01T00:00:00Z' AND '2023-01-02T00:00:00Z'")
    println("PLAN " + p.treeString)
    spark.stop()
  }
}
