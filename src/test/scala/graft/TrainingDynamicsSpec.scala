package graft

import graft.operators.TrainingDynamics
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TrainingDynamicsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def carto(df: org.apache.spark.sql.DataFrame) =
    TrainingDynamics.cartography(df, "ex", "p", "c")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4), r.getString(5)))).toMap

  test("cartography: moments, regions, and boundaries by hand") {
    val df = Seq(
      // always confident and right -> easy_to_learn, var 0
      (1L, 100L, true), (1L, 100L, true), (1L, 100L, true),
      // never confident, never right -> hard_to_learn
      (2L, 0L, false), (2L, 0L, false), (2L, 0L, false),
      // flip-flopping -> ambiguous: vq = 2*10000 - 100^2 = 10000,
      // var = sqrt(10000)/200 = 0.5
      (3L, 0L, false), (3L, 100L, true),
      // variability EXACTLY 0.25: (25, 75) -> vq = 2500 = 625*4,
      // classified ambiguous by the >= integer compare
      (4L, 25L, false), (4L, 75L, true),
      // confidence EXACTLY 0.5, var 0: 2*sp = 100*n not >, so hard
      (5L, 50L, false), (5L, 50L, true)
    ).toDF("ex", "p", "c")
    val m = carto(df)
    assert(m(1L) == ((3L, 1.0, 0.0, 1.0, "easy_to_learn")), m(1L).toString)
    assert(m(2L) == ((3L, 0.0, 0.0, 0.0, "hard_to_learn")), m(2L).toString)
    assert(m(3L) == ((2L, 0.5, 0.5, 0.5, "ambiguous")), m(3L).toString)
    assert(m(4L) == ((2L, 0.5, 0.25, 0.5, "ambiguous")), m(4L).toString)
    assert(m(5L) == ((2L, 0.5, 0.0, 0.5, "hard_to_learn")), m(5L).toString)
  }

  test("cartography: domain refusals and null exclusion") {
    // a probability outside [0, 100] refuses mid-job, never clamps
    val oob = Seq((1L, 101L, true)).toDF("ex", "p", "c")
    val ex = intercept[Exception] { carto(oob) }
    assert(ex.getMessage != null, "out-of-domain percent must refuse")
    val neg = Seq((1L, -1L, true)).toDF("ex", "p", "c")
    intercept[Exception] { carto(neg) }
    // a float probability refuses at ENTRY (quantize upstream)
    val flt = Seq((1L, 0.5, true)).toDF("ex", "p", "c")
    intercept[IllegalArgumentException] {
      TrainingDynamics.cartography(flt, "ex", "p", "c")
    }
    // a non-boolean correct column refuses at entry
    val ib = Seq((1L, 50L, 1L)).toDF("ex", "p", "c")
    intercept[IllegalArgumentException] {
      TrainingDynamics.cartography(ib, "ex", "p", "c")
    }
    // a null epoch row is excluded, not zero-filled
    val withNull = Seq(
      (1L, Option(100L), Option(true)),
      (1L, Option.empty[Long], Option(true))
    ).toDF("ex", "p", "c")
    assert(carto(withNull)(1L)._1 == 1L, "null epoch leaked in")
  }
}
