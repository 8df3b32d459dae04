package graft
import org.apache.spark.sql.SparkSession

/** Dev scratchpad — not part of the library. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      spark.sql("WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n+1 FROM t WHERE n < 10) SELECT sum(n) AS s FROM t").show()
    } catch { case e: Throwable => println("RECURSIVE FAILED: " + e.getMessage.take(200)) }
    try {
      spark.sql("SELECT * FROM VALUES (1,'a'),(2,'b') AS v(id, tag)").show()
    } catch { case e: Throwable => println("VALUES FAILED: " + e.getMessage.take(150)) }
    spark.stop()
  }
}
