package graft

import graft.operators.Classification
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ClassificationSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def auc(df: org.apache.spark.sql.DataFrame,
                  maxGroup: Long = 10000000L) =
    Classification.rankSumAuc(df, "g", "s", "y", maxGroup)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap

  test("rankSumAuc: exact doubled-rank U and AUC by hand") {
    val df = Seq(
      // perfect separation: pos {3,5} above neg {1,2} -> AUC 1
      ("a", 3L, true), ("a", 5L, true), ("a", 1L, false), ("a", 2L, false),
      // a single tied pair: AUC exactly 0.5 (the half-credit tie)
      ("t", 2L, true), ("t", 2L, false),
      // reversed: the positive scores below the negative -> AUC 0
      ("r", 1L, true), ("r", 2L, false),
      // single class: undefined, visible
      ("o", 5L, true)
    ).toDF("g", "s", "y")
    val m = auc(df)
    assert(m("a") == ((2L, 2L, 8L, 1.0, true)), m("a").toString)
    assert(m("t") == ((1L, 1L, 1L, 0.5, true)), m("t").toString)
    assert(m("r") == ((1L, 1L, 0L, 0.0, true)), m("r").toString)
    assert(m("o") == ((1L, 0L, 0L, 0.0, false)), m("o").toString)
  }

  test("rankSumAuc: contract refusals") {
    val df = Seq(("a", 1L, true), ("a", 2L, false), ("a", 3L, true))
      .toDF("g", "s", "y")
    intercept[Exception] { auc(df, maxGroup = 2L) }
    intercept[IllegalArgumentException] {
      Classification.rankSumAuc(Seq(("a", 1.5, true)).toDF("g", "s", "y"),
        "g", "s", "y")
    }
    intercept[IllegalArgumentException] {
      Classification.rankSumAuc(Seq(("a", 1L, 1L)).toDF("g", "s", "y"),
        "g", "s", "y")
    }
  }

  test("classifierReport: every rate from the exact cells by hand") {
    val df = Seq(
      ("w", true, true), ("w", true, true), ("w", true, false),
      ("w", false, true), ("w", false, false), ("w", false, false),
      // truth constant -> the tn+fp margin is 0: MCC undefined,
      // the other rates still reported
      ("k", true, true), ("k", false, true)
    ).toDF("g", "p", "t")
    val out = Classification.classifierReport(df, "g", "p", "t")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6),
        r.getDouble(7), r.getDouble(8), r.getDouble(9), r.getDouble(10),
        r.getDouble(11), r.getBoolean(12)))).toMap
    // cells (2,1,1,2): every rate 2/3, MCC = 3/9 = 0.333333
    assert(out("w") == ((6L, 2L, 1L, 1L, 2L, 0.666667, 0.666667,
      0.666667, 0.666667, 0.666667, 0.333333, true)), out("w").toString)
    val k = out("k")
    assert(k._2 == 1L && k._4 == 1L && !k._12 && k._11 == 0.0,
      k.toString)
    intercept[IllegalArgumentException] {
      Classification.classifierReport(Seq(("a", 1L, true))
        .toDF("g", "p", "t"), "g", "p", "t")
    }
  }

  test("thresholdSweep: operating points over the densified spine") {
    val df = Seq(("g", 100L, true), ("g", 50L, true), ("g", 50L, false),
      ("g", 0L, false)).toDF("g", "s", "y")
    val rows = Classification.thresholdSweep(df, "g", "s", "y")
      .collect().map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7))))
      .toMap
    assert(rows.size == 101, s"spine not densified: ${rows.size}")
    // t=0 admits everything: (tp 2, fp 2), recall 1
    assert(rows(0L) == ((2L, 2L, 0L, 0L, 0.5, 1.0)), rows(0L).toString)
    // t=50 still admits both 50s
    assert(rows(50L) == ((2L, 1L, 0L, 1L, 0.666667, 1.0)))
    // t=51..100 keeps only the 100-scored positive
    assert(rows(51L) == ((1L, 0L, 1L, 2L, 1.0, 0.5)))
    assert(rows(100L) == ((1L, 0L, 1L, 2L, 1.0, 0.5)))
    // out-of-domain score refuses mid-job
    intercept[Exception] {
      Classification.thresholdSweep(Seq(("g", 101L, true))
        .toDF("g", "s", "y"), "g", "s", "y").collect()
    }
  }

  test("effectSize: pooled d and Hedges' g by hand") {
    // A=[0,2] mean 1 var 2, B=[4,6] mean 5 var 2: pooled 2,
    // d = -4/sqrt(2) = -2.828427, g = d*(1 - 3/7) = -1.616244
    val df = Seq(("g", false, 0L), ("g", false, 2L),
      ("g", true, 4L), ("g", true, 6L),
      // constant scores on both sides: zero pooled variance
      ("z", false, 5L), ("z", false, 5L), ("z", true, 5L), ("z", true, 5L),
      // single-sided group
      ("o", false, 1L), ("o", false, 2L)
    ).toDF("g", "b", "x")
    val out = Classification.effectSize(df, "g", "b", "x")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))).toMap
    assert(out("g") == ((2L, 2L, 1.0, 5.0, -2.828427, -1.616244, true)),
      out("g").toString)
    assert(!out("z")._7 && out("z")._5 == 0.0, out("z").toString)
    assert(!out("o")._7 && out("o")._3 == 1.5, out("o").toString)
    intercept[IllegalArgumentException] {
      Classification.effectSize(Seq(("g", 1L, 1L)).toDF("g", "b", "x"),
        "g", "b", "x")
    }
  }

  test("ksTest: exact sup-norm numerator by hand") {
    val df = Seq(
      // disjoint supports: D = 1
      ("d", false, 1L), ("d", false, 2L), ("d", true, 3L), ("d", true, 4L),
      // interleaved: max gap 2/4 = 0.5
      ("i", false, 1L), ("i", false, 3L), ("i", true, 2L), ("i", true, 4L),
      // identical samples: D = 0
      ("s", false, 7L), ("s", true, 7L),
      // single-sided
      ("o", false, 1L)
    ).toDF("g", "b", "x")
    val out = Classification.ksTest(df, "g", "b", "x")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out("d") == ((2L, 2L, 4L, 1.0, true)), out("d").toString)
    assert(out("i") == ((2L, 2L, 2L, 0.5, true)), out("i").toString)
    assert(out("s") == ((1L, 1L, 0L, 0.0, true)), out("s").toString)
    assert(out("o") == ((1L, 0L, 0L, 0.0, false)), out("o").toString)
  }

  test("psi: smoothed bin terms and the densified spine by hand") {
    // A = {5, 15} (bins 0,1), B = {5, 5} (bin 0 twice); smoothed
    // shares over T+10=12: bin0 (2/12 vs 3/12) -> 0.033789, bin1
    // (2/12 vs 1/12) -> 0.057762, empty bins contribute exactly 0
    val df = Seq(("g", false, 5L), ("g", false, 15L),
      ("g", true, 5L), ("g", true, 5L),
      ("o", false, 50L)).toDF("g", "b", "s")
    val rows = Classification.psi(df, "g", "b", "s")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getBoolean(6)))).toMap
    assert(rows.count(_._1._1 == "g") == 10, "spine not densified")
    assert(rows(("g", 0)) == ((1L, 2L, 0.033789, 0.091551, true)),
      rows(("g", 0)).toString)
    assert(rows(("g", 1)) == ((1L, 0L, 0.057762, 0.091551, true)),
      rows(("g", 1)).toString)
    assert(rows(("g", 5)) == ((0L, 0L, 0.0, 0.091551, true)))
    // a missing snapshot is undefined, not silently zero-drift
    assert(!rows(("o", 0))._5, rows(("o", 0)).toString)
    intercept[Exception] {
      Classification.psi(Seq(("g", false, 101L)).toDF("g", "b", "s"),
        "g", "b", "s").collect()
    }
  }

  test("cramersV: association extremes by hand") {
    val df = Seq(
      // perfect association: phi2 = 1, V = 1, chi2 = n = 4
      ("p", "x", "u"), ("p", "x", "u"), ("p", "y", "v"), ("p", "y", "v"),
      // independence: every cell uniform -> phi2 = 0, V = 0
      ("i", "x", "u"), ("i", "x", "v"), ("i", "y", "u"), ("i", "y", "v"),
      // a single-column table has nothing to normalize
      ("o", "x", "u"), ("o", "y", "u")
    ).toDF("g", "a", "b")
    val out = Classification.cramersV(df, "g", "a", "b")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getBoolean(6))))
      .toMap
    assert(out("p") == ((4L, 2L, 2L, 4.0, 1.0, true)), out("p").toString)
    assert(out("i") == ((4L, 2L, 2L, 0.0, 0.0, true)), out("i").toString)
    assert(out("o") == ((2L, 2L, 1L, 0.0, 0.0, false)), out("o").toString)
  }
}
