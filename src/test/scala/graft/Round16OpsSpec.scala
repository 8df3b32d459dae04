package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round16OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("chiSquaredTerms: 2x2 cells and chi2 by hand, total-order ranking") {
    val docs = Seq(
      ("en", "apple apple banana"), ("en", "apple cherry"),
      ("de", "banana"), ("de", "cherry dog")
    ).toDF("lang", "text")
    val out = TextAnalysis.chiSquaredTerms(docs, "lang", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6), r.getLong(7), r.getBoolean(8)))).toMap
    // apple is perfectly en-associated: N=4, cells (2,0,0,2),
    // chi2 = 4*16/(2*2*2*2) = 4.0, rank 1
    assert(out(("en", "apple")) == ((2L, 0L, 0L, 2L, 4.0, 1L, true)),
      out(("en", "apple")).toString)
    // dog (de-only, df=1): en cells (0,1,2,1), det=-2,
    // chi2 = 4*4/(1*2*3*2) = 1.333333, rank 2
    assert(out(("en", "dog")) == ((0L, 1L, 2L, 1L, 1.333333, 2L, true)),
      out(("en", "dog")).toString)
    // banana/cherry are uninformative (det=0) and tie at chi2=0:
    // term-asc breaks the tie -> banana rank 3, cherry rank 4
    assert(out(("en", "banana"))._6 == 3L && out(("en", "cherry"))._6 == 4L)
    // the de column mirrors: apple chi2 4.0 (association is symmetric
    // in a 2-label corpus), dog 1.333333
    assert(out(("de", "apple"))._5 == 4.0 &&
      out(("de", "dog"))._5 == 1.333333)
  }

  test("chiSquaredTerms: minDf prunes, single-label corpus undefined") {
    val docs = Seq(
      ("en", "apple banana"), ("en", "apple cherry"), ("de", "dog")
    ).toDF("lang", "text")
    val pruned = TextAnalysis.chiSquaredTerms(docs, "lang", "text",
        topK = 10, minDf = 2)
      .select("term").distinct().as[String].collect().toSet
    assert(pruned == Set("apple"), s"minDf=2 should keep only apple: $pruned")
    // one label: n10 + n00 = 0 for every term -> chi2 0, defined false
    val one = Seq(("en", "apple banana"), ("en", "apple")).toDF("lang", "text")
    val rows = TextAnalysis.chiSquaredTerms(one, "lang", "text", topK = 10)
      .collect()
    assert(rows.nonEmpty && rows.forall(r =>
      r.getDouble(6) == 0.0 && !r.getBoolean(8)), rows.mkString(";"))
  }

  private def js(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.jsDivergence(df, "in_b", "text").head()

  test("jsDivergence: identical = 0, disjoint = 1 bit, empty undefined") {
    val same = Seq((false, "a b"), (true, "a b")).toDF("in_b", "text")
    val s = js(same)
    assert((s.getLong(0), s.getLong(1), s.getLong(2), s.getDouble(3),
      s.getBoolean(4)) == ((2L, 2L, 2L, 0.0, true)), s.toString)
    // fully disjoint vocabularies: JS = ln 2 nats = exactly 1 bit
    val disj = Seq((false, "x"), (true, "y")).toDF("in_b", "text")
    assert(js(disj).getDouble(3) == 1.0, js(disj).toString)
    // a token-less half has no distribution: visible, undefined
    val half = Seq((false, "x y"), (true, "")).toDF("in_b", "text")
    val h = js(half)
    assert(h.getDouble(3) == 0.0 && !h.getBoolean(4), h.toString)
    // symmetry: swapping the halves leaves JS unchanged
    val ab = Seq((false, "a a b"), (true, "a b b")).toDF("in_b", "text")
    val ba = Seq((true, "a a b"), (false, "a b b")).toDF("in_b", "text")
    assert(js(ab).getDouble(3) == js(ba).getDouble(3))
    assert(js(ab).getDouble(3) > 0.0 && js(ab).getDouble(3) < 1.0)
  }

  private def rouge(df: org.apache.spark.sql.DataFrame, n: Int) =
    TextAnalysis.rougeN(df, "id", "cand", "ref", n)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))).toMap

  test("rougeN: clipped matches, harmonic F1, visibility by hand") {
    val uni = Seq(
      (1L, "a b c", "a b d"),        // m=2/3+3 -> p=r=2/3, f1=2/3
      (2L, "a a a", "a"),            // clipping: m=min(3,1)=1
      (3L, "a b", ""),               // gram-less ref: visible, undefined
      (4L, "x y", "x y")             // exact match
    ).toDF("id", "cand", "ref")
    val r1 = rouge(uni, 1)
    assert(r1(1L) == ((3L, 3L, 2L, 0.666667, 0.666667, 0.666667, true)),
      r1(1L).toString)
    assert(r1(2L) == ((3L, 1L, 1L, 0.333333, 1.0, 0.5, true)),
      r1(2L).toString)
    assert(r1(3L) == ((2L, 0L, 0L, 0.0, 0.0, 0.0, false)), r1(3L).toString)
    assert(r1(4L) == ((2L, 2L, 2L, 1.0, 1.0, 1.0, true)), r1(4L).toString)
    // bigrams: cand {a b, b c} vs ref {b c, c d} share one gram
    val bi = Seq((1L, "a b c", "b c d")).toDF("id", "cand", "ref")
    assert(rouge(bi, 2)(1L) == ((2L, 2L, 1L, 0.5, 0.5, 0.5, true)))
  }

  private def brier(df: org.apache.spark.sql.DataFrame) = {
    val r = graft.operators.Preference
      .brierDecomposition(df, "pct", "correct").head()
    (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3),
      r.getDouble(4), r.getBoolean(5))
  }

  test("brierDecomposition: Murphy components by hand") {
    // perfectly calibrated and fully resolved: brier 0 = rel 0 -
    // res 0.25 + unc 0.25 (the identity holds exactly here)
    val perfect = Seq((100L, true), (100L, true), (0L, false), (0L, false))
      .toDF("pct", "correct")
    assert(brier(perfect) == ((4L, 0.0, 0.0, 0.25, 0.25, true)),
      brier(perfect).toString)
    // confidently wrong everywhere: brier 1 = rel 1 - res 0.25 + 0.25
    val inverted = Seq((100L, false), (0L, true)).toDF("pct", "correct")
    assert(brier(inverted) == ((2L, 1.0, 1.0, 0.25, 0.25, true)),
      brier(inverted).toString)
    // empty input: the one visible undefined row, never zero rows
    assert(brier(perfect.filter(col("pct") < 0L)) ==
      ((0L, 0.0, 0.0, 0.0, 0.0, false)))
    // domain refusals: out-of-range percent mid-job, float at entry
    intercept[Exception] {
      brier(Seq((101L, true)).toDF("pct", "correct"))
    }
    intercept[IllegalArgumentException] {
      graft.operators.Preference.brierDecomposition(
        Seq((0.5, true)).toDF("pct", "correct"), "pct", "correct")
    }
  }

  test("collocations: G2 contingency by hand, minCount prunes hapaxes") {
    val docs = Seq("a b", "a b", "a b", "a c", "c b").toDF("text")
    // bigram events: (a,b)x3, (a,c), (c,b) -> N=5; for (a,b):
    // k=(3,1,1,0), G2 = 2*(3*ln(15/16) + ln(5/4) + ln(5/4)) = 0.505343
    val kept = TextAnalysis.collocations(docs, "text", topK = 10,
        minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getDouble(6)))
    assert(kept.toSeq == Seq(("a", "b", 3L, 4L, 4L, 5L, 0.505343)),
      kept.mkString(";"))
    // minCount=1 keeps the hapax pairs; tie on g2 -> lexicographic cut
    val all = TextAnalysis.collocations(docs, "text", topK = 2,
        minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(all.toSeq == Seq(("a", "b"), ("a", "c")), all.mkString(";"))
  }

  test("kneserNeyBigrams: continuation-count smoothing by hand") {
    val docs = Seq("a b", "a b", "a b", "a c", "c b").toDF("text")
    // types (a,b):3 (a,c):1 (c,b):1; ctx a:(c1=4,n1f=2) c:(1,1);
    // cont b:2 c:1; nt=3
    val m = TextAnalysis.kneserNeyBigrams(docs, "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getDouble(7)))).toMap
    // P(b|a) = 2.25/4 + (0.75*2/4)*(2/3) = 0.8125
    assert(m(("a", "b")) == ((3L, 4L, 2L, 2L, 3L, 0.8125)),
      m(("a", "b")).toString)
    // P(c|a) = 0.25/4 + 0.375*(1/3) = 0.1875 — probabilities per
    // context sum to exactly 1 (the KN normalization)
    assert(m(("a", "c"))._6 == 0.1875)
    assert(m(("a", "b"))._6 + m(("a", "c"))._6 == 1.0)
    // P(b|c) = 0.25/1 + 0.75*(2/3) = 0.75
    assert(m(("c", "b"))._6 == 0.75)
    // the top-k cut is by raw count then lexicographic
    val top2 = TextAnalysis.kneserNeyBigrams(docs, "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(top2.toSeq == Seq(("a", "b"), ("a", "c")), top2.mkString(";"))
    intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyBigrams(docs, "text", topK = 10,
        discount = 1.5)
    }
  }

  test("sprtMonitor: boundary decisions and llr by hand") {
    import graft.operators.Preference
    val df = Seq.fill(17)(("h1", true)) ++ Seq.fill(15)(("h0", false)) ++
      (Seq.fill(5)(("c", true)) ++ Seq.fill(5)(("c", false))) ++
      Seq.fill(10)(("almost", true))
    val out = Preference.sprtMonitor(df.toDF("src", "win"), "src", "win")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getString(5)))).toMap
    // 17 straight wins: llr = 17 ln 1.2 = 3.099466 >= ln 19 -> stop
    assert(out("h1") == ((17L, 17L, 0L, 3.099466, "accept_h1")),
      out("h1").toString)
    // 15 straight losses: 15 ln 0.8 = -3.347153 <= ln(1/19) -> stop
    assert(out("h0")._5 == "accept_h0", out("h0").toString)
    // a 5-5 split and a 10-win streak both stay in the continue band
    assert(out("c")._5 == "continue" && out("c")._4 == -0.20411)
    assert(out("almost") == ((10L, 10L, 0L, 1.823216, "continue")),
      out("almost").toString)
    intercept[IllegalArgumentException] {
      Preference.sprtMonitor(df.toDF("src", "win"), "src", "win",
        p0Pct = 60, p1Pct = 50)
    }
    intercept[IllegalArgumentException] {
      Preference.sprtMonitor(Seq(("a", 1L)).toDF("src", "win"),
        "src", "win")
    }
  }

  private def agree(df: org.apache.spark.sql.DataFrame) = {
    val r = graft.operators.TrainingDynamics
      .clusterLabelAgreement(df, "c", "l").head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getBoolean(6))
  }

  test("clusterLabelAgreement: purity and NMI by hand") {
    // perfect alignment: purity 1, MI = H = ln 2, NMI exactly 1
    val perfect = Seq(("A", "x"), ("A", "x"), ("B", "y"), ("B", "y"))
      .toDF("c", "l")
    assert(agree(perfect) == ((4L, 2L, 2L, 1.0, 0.693147, 1.0, true)),
      agree(perfect).toString)
    // independence: every cell uniform -> MI 0, NMI 0, purity 0.5
    val indep = Seq(("A", "x"), ("A", "y"), ("B", "x"), ("B", "y"))
      .toDF("c", "l")
    assert(agree(indep) == ((4L, 2L, 2L, 0.5, 0.0, 0.0, true)),
      agree(indep).toString)
    // one cluster: H_C = 0 -> NMI undefined, purity still reported
    val one = Seq(("A", "x"), ("A", "y")).toDF("c", "l")
    val o = agree(one)
    assert(o._4 == 0.5 && o._6 == 0.0 && !o._7, o.toString)
    // empty input: the single visible undefined row
    assert(agree(perfect.filter(col("c") === "zz")) ==
      ((0L, 0L, 0L, 0.0, 0.0, 0.0, false)))
  }

  test("lexicalDiversity: type/token arithmetic by hand") {
    val docs = Seq(("a", "x x y"), ("a", "z"), ("b", "w"))
      .toDF("source", "text")
    val m = TextAnalysis.lexicalDiversity(docs, "source", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
        r.getBoolean(7)))).toMap
    // 4 tokens, 3 types, 2 hapaxes: ttr 0.75, C = ln3/ln4 = 0.792481
    assert(m("a") == ((4L, 3L, 2L, 0.75, 0.792481, 0.666667, true)),
      m("a").toString)
    // a single token leaves Herdan's C undefined (ln 1 denominator)
    assert(m("b") == ((1L, 1L, 1L, 1.0, 0.0, 1.0, false)),
      m("b").toString)
  }

  test("dupGramRate: duplicate-mass accounting by hand") {
    val uni = TextAnalysis.dupGramRate(
      Seq("a b a", "c").toDF("text"), "text", n = 1).head()
    // unigrams a:2 b:1 c:1 -> 2 of 4 occurrences are duplicate mass
    assert((uni.getLong(0), uni.getLong(1), uni.getLong(2),
      uni.getLong(3), uni.getDouble(4), uni.getBoolean(5)) ==
      ((4L, 3L, 1L, 2L, 0.5, true)), uni.toString)
    // bigrams of "a b a b": "a b" twice, "b a" once -> 0.666667
    val bi = TextAnalysis.dupGramRate(
      Seq("a b a b").toDF("text"), "text", n = 2).head()
    assert(bi.getDouble(4) == 0.666667 && bi.getLong(0) == 3L,
      bi.toString)
    // empty corpus: the one visible undefined row
    val e = TextAnalysis.dupGramRate(
      Seq.empty[String].toDF("text"), "text", n = 3).head()
    assert(e.getLong(0) == 0L && !e.getBoolean(5), e.toString)
  }

  test("vocabChurn: type-set accounting by hand") {
    // A = {x, y}, B = {y, z}: shared 1, jaccard 1/3, half of B is new
    val df = Seq((false, "x y"), (true, "y z z")).toDF("in_b", "text")
    val r = TextAnalysis.vocabChurn(df, "in_b", "text").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getBoolean(5)) ==
      ((2L, 2L, 1L, 0.333333, 0.5, true)), r.toString)
    // an empty snapshot is undefined, counts visible
    val half = Seq((false, "x y")).toDF("in_b", "text")
    val h = TextAnalysis.vocabChurn(half, "in_b", "text").head()
    assert(h.getLong(0) == 2L && h.getLong(1) == 0L && !h.getBoolean(5),
      h.toString)
    intercept[IllegalArgumentException] {
      TextAnalysis.vocabChurn(Seq((1L, "x")).toDF("in_b", "text"),
        "in_b", "text")
    }
  }

  test("signTest: exact binomial tails by hand") {
    import graft.operators.Preference
    val df = (Seq.fill(5)(("a", true)) ++
      (Seq.fill(4)(("b", true)) ++ Seq.fill(1)(("b", false))) ++
      (Seq.fill(3)(("c", true)) ++ Seq.fill(3)(("c", false))))
      .toDF("src", "win")
    val out = Preference.signTest(df, "src", "win")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))).toMap
    // 5-0: p = 2 * C(5,5)/32 = 0.0625
    assert(out("a") == ((5L, 5L, 0L, 0.0625, true)), out("a").toString)
    // 4-1: p = 2 * (C(5,4)+C(5,5))/32 = 12/32 = 0.375
    assert(out("b") == ((5L, 4L, 1L, 0.375, true)), out("b").toString)
    // 3-3: 2 * 42/64 = 1.3125 clamps to 1.0
    assert(out("c") == ((6L, 3L, 3L, 1.0, true)), out("c").toString)
    // an oversize group refuses the O(n^2) fold loudly
    intercept[Exception] {
      Preference.signTest(df, "src", "win", maxN = 4).collect()
    }
    intercept[IllegalArgumentException] {
      Preference.signTest(df, "src", "win", maxN = 2000)
    }
    intercept[IllegalArgumentException] {
      Preference.signTest(Seq(("a", 1L)).toDF("src", "win"), "src", "win")
    }
  }

  test("stratifiedWinRate: direct standardization by hand") {
    import graft.operators.Preference
    // stratum s1: 3/4 wins, s2: 0/1 -> raw 3/5 = 0.6 but the
    // equal-weight stratified rate is (0.75 + 0)/2 = 0.375 — the gap
    // IS the confound's contribution
    val df = Seq(("A", 1L, true), ("A", 1L, true), ("A", 1L, true),
      ("A", 1L, false), ("A", 2L, false),
      ("B", 1L, true), ("B", 2L, true)
    ).toDF("m", "stratum", "win")
    val out = Preference.stratifiedWinRate(df, "m", "stratum", "win")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("A") == ((5L, 2L, 0.6, 0.375)), out("A").toString)
    assert(out("B") == ((2L, 2L, 1.0, 1.0)), out("B").toString)
    intercept[IllegalArgumentException] {
      Preference.stratifiedWinRate(Seq(("a", 1L, 1L))
        .toDF("m", "stratum", "win"), "m", "stratum", "win")
    }
  }
}
