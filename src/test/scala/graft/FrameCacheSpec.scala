package graft

import graft.operators.FrameCache
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The offline-artifact frame cache: correctness of the memoization
  * contract (same rows, true reuse, key isolation) — the guard
  * against a stale- or cross-key-serving regression in the cache that
  * qA3/qA4/qAG/qAK/qAZ/qAP/qAU now ride. */
class FrameCacheSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("cached returns the builder's rows and reuses the SAME frame") {
    var builds = 0
    def build() = {
      builds += 1
      Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    }
    val a = FrameCache.cached(spark, "fcspec-reuse")(build())
    val b = FrameCache.cached(spark, "fcspec-reuse")(build())
    assert(builds == 1, "second call must not re-build")
    assert(a eq b, "second call must return the memoized frame")
    assert(a.orderBy("id").collect().map(r => (r.getLong(0), r.getString(1)))
      .toSeq == Seq((1L, "a"), (2L, "b")))
  }

  test("distinct keys do not collide") {
    val a = FrameCache.cached(spark, "fcspec-k1")(Seq(1L).toDF("x"))
    val b = FrameCache.cached(spark, "fcspec-k2")(Seq(2L).toDF("x"))
    assert(a.collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(b.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("cached frame is checkpointed: no lineage back to the source plan") {
    val src = spark.range(100).withColumn("y", col("id") * 2)
    val c = FrameCache.cached(spark, "fcspec-ck")(src)
    // localCheckpoint truncates lineage — the physical plan must scan
    // checkpointed blocks, not re-derive from Range
    val plan = c.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") || plan.contains("Scan"),
      s"expected a checkpoint scan, got:\n$plan")
    assert(!plan.contains("Range"), "lineage to the source survived")
    assert(c.count() == 100L)
  }
}
