package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[graft.operators.Retrieval.rankingMetrics]] — hand-computed
  * metrics, coverage visibility, and the plan-side domain guards. */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def metrics(run: org.apache.spark.sql.DataFrame,
                      qrels: org.apache.spark.sql.DataFrame, k: Int = 3) =
    graft.operators.Retrieval.rankingMetrics(run, qrels, "q", "d", "r",
      "g", k)

  test("hand-computed recall/RR/nDCG, judged-irrelevant and unjudged") {
    // query 1 at k=3: run = c@1 (judged gain 0), a@2 (gain 3),
    // x@3 (unjudged); d (gain 2) and b (gain 1) never retrieved.
    // recall = 1/3, RR = 1/2, DCG = 3/log2(3) -> fp 1892789261,
    // IDCG over sorted gains (3,2,1) = 4761859507, nDCG = 0.39749.
    // query 2: judged but absent from the run -> visible zeros.
    // query 3: retrieved but unjudged -> visible, defined = false.
    val run = Seq((1L, "c", 1L), (1L, "a", 2L), (1L, "x", 3L),
      (1L, "b", 4L), (3L, "z", 1L)).toDF("q", "d", "r")
    val qrels = Seq((1L, "a", 3L), (1L, "b", 1L), (1L, "c", 0L),
      (1L, "d", 2L), (2L, "y", 1L)).toDF("q", "d", "g")
    val out = metrics(run, qrels).collect()
      .map(r => r.getLong(0) -> r).toMap
    val q1 = out(1L)
    assert((q1.getLong(1), q1.getLong(2), q1.getLong(3)) == ((4L, 3L, 1L)))
    assert(q1.getDouble(4) == 0.333333 && q1.getDouble(5) == 0.5,
      q1.toString)
    assert(q1.getDouble(6) == 1.892789 && q1.getDouble(7) == 4.76186,
      q1.toString)
    assert(q1.getDouble(8) == 0.39749 && q1.getBoolean(10), q1.toString)
    // AP@3: one relevant hit at rank 2 over 3 judged-positive docs
    assert(q1.getDouble(9) == 0.166667, q1.toString)
    val q2 = out(2L)
    assert((q2.getLong(1), q2.getLong(2), q2.getLong(3)) == ((1L, 0L, 0L)))
    assert(q2.getDouble(4) == 0.0 && q2.getDouble(5) == 0.0 &&
      q2.getDouble(8) == 0.0 && q2.getDouble(9) == 0.0 &&
      q2.getBoolean(10), q2.toString)
    val q3 = out(3L)
    assert(q3.getLong(1) == 0L && q3.getLong(2) == 1L &&
      q3.getDouble(9) == 0.0 && !q3.getBoolean(10), q3.toString)
    // a perfect run scores nDCG 1.0 exactly (dcg_fp == idcg_fp)
    val perfect = Seq((9L, "a", 1L), (9L, "b", 2L)).toDF("q", "d", "r")
    val pq = Seq((9L, "a", 2L), (9L, "b", 1L)).toDF("q", "d", "g")
    val p = metrics(perfect, pq).head()
    assert(p.getDouble(8) == 1.0 && p.getDouble(4) == 1.0 &&
      p.getDouble(9) == 1.0, p.toString)
  }

  test("domain guards: rank >= 1, gain >= 0, one doc per rank") {
    val qrels = Seq((1L, "a", 1L)).toDF("q", "d", "g")
    val badRank = intercept[Exception] {
      metrics(Seq((1L, "a", 0L)).toDF("q", "d", "r"), qrels).collect()
    }
    assert(badRank.getMessage.contains("rank must be"), badRank.getMessage)
    val badGain = intercept[Exception] {
      metrics(Seq((1L, "a", 1L)).toDF("q", "d", "r"),
        Seq((1L, "a", -1L)).toDF("q", "d", "g")).collect()
    }
    assert(badGain.getMessage.contains("gain must be"), badGain.getMessage)
    val dupRank = intercept[Exception] {
      metrics(Seq((1L, "a", 1L), (1L, "b", 1L)).toDF("q", "d", "r"),
        qrels).collect()
    }
    assert(dupRank.getMessage.contains("repeats a rank"),
      dupRank.getMessage)
    val frac = intercept[IllegalArgumentException] {
      metrics(Seq((1L, "a", 1L)).toDF("q", "d", "r"),
        Seq((1L, "a", 0.5)).toDF("q", "d", "g"))
    }
    assert(frac.getMessage.contains("integral"), frac.getMessage)
  }

  test("overlapAtK: head intersection over the total tie order") {
    import spark.implicits._
    import graft.operators.Retrieval
    // scorer A ranks ids desc by a, B reverses half the head:
    // A top-2 = {1, 2}, B top-2 = {2, 3} -> overlap 1
    val df = Seq(("g", 1L, 40L, 10L), ("g", 2L, 30L, 40L),
      ("g", 3L, 20L, 30L), ("g", 4L, 10L, 20L),
      // identical scorers: overlap = k
      ("s", 1L, 9L, 9L), ("s", 2L, 8L, 8L), ("s", 3L, 7L, 7L),
      // a group smaller than k compares its whole order
      ("t", 1L, 5L, 1L)
    ).toDF("g", "i", "a", "b")
    val out = Retrieval.overlapAtK(df, "g", "i", "a", "b", k = 2)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(out("g") == ((4L, 2, 2L, 1L, 0.5)), out("g").toString)
    assert(out("s") == ((3L, 2, 2L, 2L, 1.0)), out("s").toString)
    assert(out("t") == ((1L, 2, 1L, 1L, 1.0)), out("t").toString)
    // tied scores cut identically on both sides (id-asc break)
    val tied = Seq(("x", 1L, 5L, 5L), ("x", 2L, 5L, 5L),
      ("x", 3L, 5L, 5L)).toDF("g", "i", "a", "b")
    assert(Retrieval.overlapAtK(tied, "g", "i", "a", "b", k = 2)
      .head().getLong(4) == 2L)
    intercept[IllegalArgumentException] {
      Retrieval.overlapAtK(Seq(("g", 1L, 1.5, 1L)).toDF("g", "i", "a", "b"),
        "g", "i", "a", "b", k = 2)
    }
  }
}
