package graft

import graft.operators.BandJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BandJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("matches the naive theta join on random keys, incl. bucket edges") {
    val rnd = new scala.util.Random(17)
    // keys clustered so pairs straddle bucket boundaries
    val l = (0 until 400).map(i => (i.toLong, rnd.nextInt(5000).toLong * 7))
      .toDF("lid", "lk")
    val r = (0 until 400).map(i => (i.toLong + 1000, rnd.nextInt(5000).toLong * 7))
      .toDF("rid", "rk")
    val tol = 100L
    val got = BandJoin.bandJoin(l, r, "lk", "rk", tol)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = l.join(r, abs(col("lk") - col("rk")) <= tol)
      .select("lid", "rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
    // exact boundary: |diff| == tol is included, tol+1 is not
    val gb = BandJoin.bandJoin(
        Seq((1L, 1000L)).toDF("lid", "lk"),
        Seq((2L, 1000L + tol), (3L, 1000L + tol + 1)).toDF("rid", "rk"),
        "lk", "rk", tol)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(gb == Set(2L))
  }

  test("epoch-ns magnitude keys: buckets stay exact (integer division)") {
    // keys near 1.7e18 exceed 2^53 — double division would round them
    // to multiples of 256 before bucketing and drop in-tolerance pairs
    val base = 1700000000000000000L
    val l = Seq((1L, base + 30)).toDF("lid", "lk")
    val r = Seq((2L, base + 129), (3L, base + 131)).toDF("rid", "rk")
    val got = BandJoin.bandJoin(l, r, "lk", "rk", 100L)
      .select("rid").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L)) // |129-30|=99 <= 100; |131-30|=101 > 100
  }

  test("plans as a bucket equi-join, not a nested-loop join") {
    val l = (0 until 100).map(i => (i.toLong, i.toLong * 1000)).toDF("lid", "lk")
    val r = (0 until 100).map(i => (i.toLong, i.toLong * 999)).toDF("rid", "rk")
    val banded = BandJoin.bandJoin(l, r, "lk", "rk", 500L)
    val plan = banded.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    // the naive formulation DOES nested-loop — that's what we're avoiding
    val naive = l.join(r, abs(col("lk") - col("rk")) <= 500L)
    assert(naive.queryExecution.executedPlan.toString
      .contains("BroadcastNestedLoopJoin"))
  }
}
