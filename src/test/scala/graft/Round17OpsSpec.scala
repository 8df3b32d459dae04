package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round17OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("splitRankKeys: 1e-9-grid order, overflow-proof past 9.2e9") {
    // the single-key floor(x*1e9+0.5) long overflows past x ~ 9.2e9;
    // the split key must keep strict order across that boundary and
    // up to the 1e18 regime (10^17 bigram events), and sort the -eps
    // a gated float dag can produce below every non-negative score
    val xs = Seq(9.0e18, 9.0e18 - 4096.0, 9.3e9, 9.2e9, 2.0,
      1.9999999995, 1.25, 1.0, 1e-9, 0.0, -1e-12)
    val df = xs.zipWithIndex.toDF("x", "idx")
    val Seq(ki, kf) = TextAnalysis.splitRankKeys(col("x"))
    val got = df.select(col("idx"), ki.as("i"), kf.as("f"))
      .orderBy(col("i").desc, col("f").desc, col("idx"))
      .select("idx").as[Int].collect().toSeq
    // expected order = input order (xs is strictly descending except
    // the 1.9999999995 -> 2.0 grid tie, which quantizes to the same
    // 1e-9 cell: (1, 1e9) vs (2, 0) -- distinct split keys, and the
    // (2,0) key correctly wins)
    assert(got == xs.indices, s"split-key order broke: $got")
    // the old single key saturates both 1e18-regime values to
    // Long.MaxValue (a tie); the split key separates them
    val keys = df.select(ki.as("i"), kf.as("f")).orderBy(col("i").desc)
      .as[(Long, Long)].collect()
    assert(keys(0) != keys(1), "1e18-regime scores must not collide")
    // -eps ranks below zero: floor(-1e-12) = -1
    val negKey = df.filter(col("x") < 0).select(ki).as[Long].head()
    assert(negKey == -1L)
  }
}
