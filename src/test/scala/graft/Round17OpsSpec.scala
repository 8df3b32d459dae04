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

  test("bhFdr: hand-computed step-up cutoff, ties, degenerates") {
    import graft.operators.Preference
    // q=10%, m=10: crit(i) = 0.01*i. rank-3 p=0.035 > 0.03 FAILS its
    // own row but rank-5 p=0.05 <= 0.05 passes -> step-up k=5 rejects
    // ranks 1..5 INCLUDING the rank-3 failure (the step-up point)
    val ps = Seq(0.005, 0.013, 0.035, 0.038, 0.05, 0.11, 0.21, 0.35,
      0.57, 0.92)
    val f = ps.zipWithIndex.map { case (p, i) => ("f", s"t$i", p) }
      .toDF("family", "test_id", "p")
    val out = Preference.bhFdr(f, "family", "test_id", "p", qPct = 10)
      .collect().map(r => r.getString(1) ->
        ((r.getDouble(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getBoolean(6)))).toMap
    assert(out("t2") == ((0.035, 3L, 10L, 5L, true)), out("t2").toString)
    assert(out("t4") == ((0.05, 5L, 10L, 5L, true)))
    assert(out("t5") == ((0.11, 6L, 10L, 5L, false)))
    assert(out.values.count(_._5) == 5)
    // single-test family: BH reduces to p <= q
    val one = Seq(("a", "x", 0.04), ("b", "y", 0.06))
      .toDF("family", "test_id", "p")
    val o1 = Preference.bhFdr(one, "family", "test_id", "p", qPct = 5)
      .collect().map(r => r.getString(0) -> r.getBoolean(6)).toMap
    assert(o1 == Map("a" -> true, "b" -> false))
    // all-null family vanishes; nulls inside a family shrink m
    val withNull = Seq(("dead", "x", null), ("live", "a", "0.01"),
        ("live", "b", null))
      .toDF("family", "test_id", "p")
      .select(col("family"), col("test_id"), col("p").cast("double"))
    val o2 = Preference.bhFdr(withNull, "family", "test_id", "p", 5)
      .collect()
    assert(o2.length == 1 && o2.head.getString(0) == "live" &&
      o2.head.getLong(4) == 1L)
    // tied p's are accepted or rejected together
    val tied = Seq(("f", "a", 0.05), ("f", "b", 0.05))
      .toDF("family", "test_id", "p")
    val o3 = Preference.bhFdr(tied, "family", "test_id", "p", 10)
      .collect().map(_.getBoolean(6)).toSet
    assert(o3.size == 1, "equal p must share the verdict")
    // refusals: p outside [0,1] mid-plan, qPct at entry
    intercept[Exception] {
      Preference.bhFdr(Seq(("f", "x", 1.5)).toDF("family", "test_id",
        "p"), "family", "test_id", "p", 10).collect()
    }
    intercept[IllegalArgumentException] {
      Preference.bhFdr(one, "family", "test_id", "p", 0)
    }
  }

  test("pairedBootstrapCi: planted shift bracketed, deterministic") {
    import graft.operators.Preference
    // planted shift ~100: d = 100 + (i%21) - ((13i)%21), n=400
    val rows = (1 to 400).map(i =>
      ("g", i.toLong, 100L + i % 21, (13L * i) % 21))
    val df = rows.toDF("grp", "id", "a", "b")
    val run1 = Preference.pairedBootstrapCi(df.repartition(13), "grp",
      "id", "a", "b", b = 100, alphaPct = 5).collect()
    assert(run1.length == 1)
    val r = run1.head
    val (n, b, beff, est, lo, hi, defined) = (r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getDouble(5), r.getDouble(6),
      r.getBoolean(7))
    assert(n == 400L && b == 100L && beff == 100L && defined)
    // est is the exact full-data mean delta
    val truth = rows.map(t => (t._3 - t._4).toDouble).sum / 400.0
    assert(est == BigDecimal(truth).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble, s"$est vs $truth")
    // the interval brackets the estimate and detects the shift
    assert(lo <= est && est <= hi, s"[$lo, $hi] vs $est")
    assert(lo > 50.0, s"planted shift must be detected: lo=$lo")
    assert(hi - lo > 0.0 && hi - lo < 20.0, s"width ${hi - lo}")
    // determinism across partitionings: same resamples, same CI
    val run2 = Preference.pairedBootstrapCi(df.repartition(1), "grp",
      "id", "a", "b", b = 100, alphaPct = 5).collect()
    assert(run1.toSeq == run2.toSeq)
    // zero-noise data: every resample mean is the constant
    val const = (1 to 50).map(i => ("g", i.toLong, 7L, 2L))
      .toDF("grp", "id", "a", "b")
    val rc = Preference.pairedBootstrapCi(const, "grp", "id", "a", "b",
      b = 20).head()
    assert(rc.getDouble(4) == 5.0 && rc.getDouble(5) == 5.0 &&
      rc.getDouble(6) == 5.0)
    intercept[IllegalArgumentException] {
      Preference.pairedBootstrapCi(const, "grp", "id", "a", "b", b = 0)
    }
    intercept[IllegalArgumentException] {
      Preference.pairedBootstrapCi(
        (1 to 3).map(i => ("g", i.toLong, 1.5, 2.0))
          .toDF("grp", "id", "a", "b"), "grp", "id", "a", "b")
    }
  }

  test("holmBonferroni: step-down stop blocks later passers") {
    import graft.operators.Preference
    // alpha=5%, m=5: crit(i) = 0.05/(m-i+1) = .01, .0125, .016667,
    // .025, .05. Rank 3 (p=.02) is the ONLY failure — ranks 4 and 5
    // pass their own rows (.022<=.025, .03<=.05) but step-down stops
    // at the first failure -> k=2
    val ps = Seq(0.008, 0.012, 0.02, 0.022, 0.03)
    val f = ps.zipWithIndex.map { case (p, i) => ("f", s"t$i", p) }
      .toDF("family", "test_id", "p")
    val out = Preference.holmBonferroni(f, "family", "test_id", "p", 5)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(3), r.getLong(5), r.getBoolean(6)))).toMap
    assert(out("t1") == ((2L, 2L, true)), out("t1").toString)
    assert(out("t3") == ((4L, 2L, false)), "rank 4 passes its row " +
      "but must be blocked by the rank-3 failure")
    assert(out.values.count(_._3) == 2)
    // contrast: BH at the same 5% RESCUES everything (crit .01*i:
    // rank-5 p=.03 <= .05 -> step-up k=5, all five rejected)
    val bh = Preference.bhFdr(f, "family", "test_id", "p", 5)
      .collect().map(r => r.getString(1) -> r.getBoolean(6)).toMap
    assert(bh.values.forall(identity), bh.toString)
    // all pass -> k=m; smallest-p failure -> k=0
    val all = Preference.holmBonferroni(
      Seq(("f", "a", 0.001), ("f", "b", 0.002))
        .toDF("family", "test_id", "p"),
      "family", "test_id", "p", 5).collect()
    assert(all.forall(_.getBoolean(6)) && all.head.getLong(5) == 2L)
    val none = Preference.holmBonferroni(
      Seq(("f", "a", 0.9), ("f", "b", 0.95))
        .toDF("family", "test_id", "p"),
      "family", "test_id", "p", 5).collect()
    assert(none.forall(!_.getBoolean(6)) && none.head.getLong(5) == 0L)
  }

  test("permutationTest: exact extremes, null p=1, deterministic") {
    import graft.operators.Preference
    // strong constant shift: every sign flip strictly shrinks |s|,
    // so only the all-plus permutation ties the observed 500 ->
    // n_extreme ~ 0 and p = 1/201
    val shift = (1 to 50).map(i => ("g", i.toLong, 15L, 5L))
      .toDF("grp", "id", "a", "b")
    val rs = Preference.permutationTest(shift.repartition(7), "grp",
      "id", "a", "b", p = 200).head()
    assert(rs.getLong(1) == 50L && rs.getLong(2) == 500L)
    assert(rs.getLong(3) == 0L && rs.getDouble(4) == 0.004975,
      s"n_extreme=${rs.getLong(3)} p=${rs.getDouble(4)}")
    // exact-zero observed sum: |s_r| >= 0 for every permutation -> p=1
    val nul = (1 to 40).map(i =>
      ("g", i.toLong, if (i % 2 == 0) 10L else 0L,
        if (i % 2 == 0) 0L else 10L)).toDF("grp", "id", "a", "b")
    val rn = Preference.permutationTest(nul, "grp", "id", "a", "b",
      p = 50).head()
    assert(rn.getLong(2) == 0L && rn.getLong(3) == 50L &&
      rn.getDouble(4) == 1.0)
    // determinism across partitionings
    val a = Preference.permutationTest(shift.repartition(1), "grp",
      "id", "a", "b", p = 100).collect().toSeq
    val b = Preference.permutationTest(shift.repartition(31), "grp",
      "id", "a", "b", p = 100).collect().toSeq
    assert(a == b)
    intercept[IllegalArgumentException] {
      Preference.permutationTest(shift, "grp", "id", "a", "b", p = 0)
    }
  }

  test("jackknifeRatioSe: delete-one replicates by hand, poisons") {
    import graft.operators.Quantiles
    // Sa=60, Sb=10: loo = 50/8, 40/7, 30/5 -> se = 0.309524 (computed
    // through the operator's own quantize-then-identity chain)
    val df = Seq(("g", 10L, 2L), ("g", 20L, 3L), ("g", 30L, 5L))
      .toDF("grp", "a", "b")
    val r = Quantiles.jackknifeRatioSe(df, "grp", "a", "b").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getBoolean(6)) ==
      ((3L, 60L, 10L, 6.0, 0.309524, true)), r.toString)
    // a zero delete-one denominator poisons the replicate set
    val poison = Seq(("g", 10L, 10L), ("g", 20L, 0L))
      .toDF("grp", "a", "b")
    val rp = Quantiles.jackknifeRatioSe(poison, "grp", "a", "b").head()
    assert(!rp.getBoolean(6) && rp.getDouble(5) == 0.0 &&
      rp.getDouble(4) == 3.0, rp.toString)
    // zero group total: ratio itself undefined
    val zt = Quantiles.jackknifeRatioSe(
      Seq(("g", 1L, 5L), ("g", 2L, -5L)).toDF("grp", "a", "b"),
      "grp", "a", "b").head()
    assert(!zt.getBoolean(6) && zt.getDouble(4) == 0.0)
    // determinism across partitionings
    val big = (1 to 200).map(i => ("g", (i % 13).toLong + 1L,
      (i % 7).toLong + 1L)).toDF("grp", "a", "b")
    assert(Quantiles.jackknifeRatioSe(big.repartition(17), "grp", "a",
        "b").collect().toSeq ==
      Quantiles.jackknifeRatioSe(big.repartition(1), "grp", "a", "b")
        .collect().toSeq)
    intercept[IllegalArgumentException] {
      Quantiles.jackknifeRatioSe(Seq(("g", 1.5, 2.0))
        .toDF("grp", "a", "b"), "grp", "a", "b")
    }
  }

  test("oneWayAnova: SSB/SSW/F by hand, degenerates, overflow guard") {
    import graft.operators.Classification
    // g1=[1,2,3], g2=[5,7]: T=84, grand=64.8, SSB=19.2, SSW=4,
    // F=(19.2/1)/(4/3)=14.4
    val df = Seq(("f", "g1", 1L), ("f", "g1", 2L), ("f", "g1", 3L),
      ("f", "g2", 5L), ("f", "g2", 7L)).toDF("fam", "grp", "x")
    val r = Classification.oneWayAnova(df, "fam", "grp", "x").head()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getBoolean(6)) ==
      ((5L, 2L, 19.2, 4.0, 14.4, true)), r.toString)
    // single group: k=1 undefined; zero within-variance: undefined
    val one = Classification.oneWayAnova(
      Seq(("f", "g1", 1L), ("f", "g1", 2L)).toDF("fam", "grp", "x"),
      "fam", "grp", "x").head()
    assert(!one.getBoolean(6) && one.getDouble(5) == 0.0)
    val const = Classification.oneWayAnova(
      Seq(("f", "g1", 2L), ("f", "g1", 2L), ("f", "g2", 4L),
        ("f", "g2", 4L)).toDF("fam", "grp", "x"),
      "fam", "grp", "x").head()
    assert(!const.getBoolean(6) && const.getDouble(3) == 4.0,
      const.toString)
    // cell-sum overflow refused plan-side
    intercept[Exception] {
      Classification.oneWayAnova(
        Seq(("f", "g1", 3037000500L), ("f", "g2", 1L))
          .toDF("fam", "grp", "x"), "fam", "grp", "x").collect()
    }
    intercept[IllegalArgumentException] {
      Classification.oneWayAnova(Seq(("f", "g", 1.5))
        .toDF("fam", "grp", "x"), "fam", "grp", "x")
    }
  }

  test("kruskalWallis: doubled ranks, tie correction by hand") {
    import graft.operators.Classification
    // no ties: g1=[1,2], g2=[3,4] -> H = 0.6*(9/2+49/2) - 15 = 2.4,
    // C = 1, corrected = H
    val clean = Seq(("f", "g1", 1L), ("f", "g1", 2L), ("f", "g2", 3L),
      ("f", "g2", 4L)).toDF("fam", "grp", "x")
    val r = Classification.kruskalWallis(clean, "fam", "grp", "x")
      .head()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getBoolean(6)) ==
      ((4L, 2L, 2.4, 1.0, 2.4, true)), r.toString)
    // ties: g1=[1,1], g2=[2] -> doubled avg ranks (3,3,6), H = 1.5,
    // C = 1 - 6/24 = 0.75, corrected = 2.0
    val tied = Seq(("f", "g1", 1L), ("f", "g1", 1L), ("f", "g2", 2L))
      .toDF("fam", "grp", "x")
    val rt = Classification.kruskalWallis(tied, "fam", "grp", "x")
      .head()
    assert((rt.getDouble(3), rt.getDouble(4), rt.getDouble(5),
      rt.getBoolean(6)) == ((1.5, 0.75, 2.0, true)), rt.toString)
    // all tied: C = 0 -> undefined
    val allTied = Seq(("f", "g1", 5L), ("f", "g2", 5L))
      .toDF("fam", "grp", "x")
    val ra = Classification.kruskalWallis(allTied, "fam", "grp", "x")
      .head()
    assert(!ra.getBoolean(6) && ra.getDouble(4) == 0.0)
    // family-size guard fires plan-side
    intercept[Exception] {
      Classification.kruskalWallis(clean, "fam", "grp", "x",
        maxN = 3L).collect()
    }
    intercept[IllegalArgumentException] {
      Classification.kruskalWallis(clean, "fam", "grp", "x",
        maxN = 3000000L)
    }
  }

  test("cochranQ: classic 4x3 contingency by hand, degenerate") {
    import graft.operators.Classification
    // G=(3,3,1), T=7, sumG2=19, L=(2,3,1,1), sumL2=15:
    // Q = 2*(3*19-49)/(3*7-15) = 16/6 = 2.666667
    val x = Seq(
      ("s1", "a", true), ("s1", "b", true), ("s1", "c", false),
      ("s2", "a", true), ("s2", "b", true), ("s2", "c", true),
      ("s3", "a", false), ("s3", "b", true), ("s3", "c", false),
      ("s4", "a", true), ("s4", "b", false), ("s4", "c", false))
      .map { case (s, t, v) => ("g", s, t, v) }
      .toDF("grp", "subj", "treat", "succ")
    val r = Classification.cochranQ(x, "grp", "subj", "treat", "succ")
      .head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getBoolean(5)) == ((4L, 3L, 7L, 2.666667, true)), r.toString)
    // every subject constant across treatments: denominator 0
    val const = Seq(("g", "s1", "a", true), ("g", "s1", "b", true),
      ("g", "s2", "a", false), ("g", "s2", "b", false))
      .toDF("grp", "subj", "treat", "succ")
    val rc = Classification.cochranQ(const, "grp", "subj", "treat",
      "succ").head()
    assert(!rc.getBoolean(5) && rc.getDouble(4) == 0.0)
    intercept[IllegalArgumentException] {
      Classification.cochranQ(
        Seq(("g", "s", "t", 1L)).toDF("grp", "subj", "treat", "succ"),
        "grp", "subj", "treat", "succ")
    }
  }

  test("chao1Richness: f1/f2 head by hand, f2=0 corrected form") {
    // tokens a:2 b:1 c:2 d:1 -> N=6 S=4 f1=2 f2=2,
    // chao1 = 4 + 2*1/(2*3) = 4.333333, unseen = 2/6
    val docs = Seq(("g", "a a b c"), ("g", "c d")).toDF("src", "text")
    val r = TextAnalysis.chao1Richness(docs, "src", "text").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7)) ==
      ((6L, 4L, 2L, 2L, 4.333333, 0.333333, 0.666667)), r.toString)
    // all-hapax with f2=0: the bias-corrected form stays finite
    val hapax = Seq(("g", "a b")).toDF("src", "text")
    val rh = TextAnalysis.chao1Richness(hapax, "src", "text").head()
    assert(rh.getDouble(5) == 3.0 && rh.getDouble(6) == 1.0)
    // all-null-text group vanishes
    val nul = Seq(("g", null: String)).toDF("src", "text")
    assert(TextAnalysis.chao1Richness(nul, "src", "text").count() == 0)
  }

  test("zipfSlope: exact power law recovers slope -2") {
    // freq = 64/r^2 at ranks 1,2 -> OLS through the operator's own
    // quantize chain gives slope -2.0, intercept ln(64) = 4.158883
    val text = (Seq.fill(64)("a") ++ Seq.fill(16)("b")).mkString(" ")
    val df = Seq(text).toDF("text")
    val r = TextAnalysis.zipfSlope(df, "text").head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
      r.getBoolean(4)) == ((2L, 2L, -2.0, 4.158883, true)), r.toString)
    // topR caps the head; a single type is undefined
    val rich = Seq("a a a b b c").toDF("text")
    val rc = TextAnalysis.zipfSlope(rich, "text", topR = 2).head()
    assert(rc.getLong(0) == 3L && rc.getLong(1) == 2L)
    val one = TextAnalysis.zipfSlope(Seq("x x x").toDF("text"), "text")
      .head()
    assert(!one.getBoolean(4) && one.getDouble(2) == 0.0)
    intercept[IllegalArgumentException] {
      TextAnalysis.zipfSlope(df, "text", topR = 1)
    }
  }

  test("kaplanMeier: product-limit by hand, censoring, extinction") {
    import graft.operators.Retention
    // (1,obs),(2,cens),(3,obs),(3,obs),(4,cens): S(1)=4/5=0.8,
    // S(3)=0.8*(1/3)=0.266667 with n_risk 3 (the censored t=2
    // subject has left); censor-only times emit no row
    val df = Seq(("g", 1L, true), ("g", 2L, false), ("g", 3L, true),
      ("g", 3L, true), ("g", 4L, false)).toDF("grp", "dur", "obs")
    val rows = Retention.kaplanMeier(df, "grp", "dur", "obs")
      .orderBy(col("t")).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6)))
    // Nelson-Aalen: H(1) = 1/5 = 0.2, H(3) = 0.2 + 2/3 = 0.866667
    assert(rows.toSeq == Seq((1L, 5L, 1L, 0L, 0.8, 0.2),
      (3L, 3L, 2L, 0L, 0.266667, 0.866667)), rows.mkString(";"))
    // extinction: every at-risk subject dies -> survival exactly 0,
    // no infinity in the dag
    val ext = Seq(("g", 1L, true), ("g", 2L, true), ("g", 2L, true))
      .toDF("grp", "dur", "obs")
    val er = Retention.kaplanMeier(ext, "grp", "dur", "obs")
      .orderBy(col("t")).collect()
    assert(er.map(_.getDouble(5)).toSeq == Seq(0.666667, 0.0),
      er.mkString(";"))
    // the hazard stays FINITE at extinction: 1/3, then + 2/2
    assert(er.map(_.getDouble(6)).toSeq == Seq(0.333333, 1.333333),
      er.mkString(";"))
    // determinism across partitionings
    val big = (1 to 300).map(i =>
      ("g", (i % 20 + 1).toLong, i % 3 != 0)).toDF("grp", "dur", "obs")
    assert(Retention.kaplanMeier(big.repartition(11), "grp", "dur",
        "obs").orderBy(col("t")).collect().toSeq ==
      Retention.kaplanMeier(big.repartition(1), "grp", "dur", "obs")
        .orderBy(col("t")).collect().toSeq)
    intercept[IllegalArgumentException] {
      Retention.kaplanMeier(Seq(("g", 1.5, true))
        .toDF("grp", "dur", "obs"), "grp", "dur", "obs")
    }
  }

  test("captureRecapture: Chapman estimate by hand") {
    import graft.operators.Dedup
    // n_a=5, n_b=4, m=2: N-hat = 6*5/3 - 1 = 9, se = sqrt(5)
    val rows = Seq.fill(2)((true, true)) ++ Seq.fill(3)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(4)((false, false))
    val df = rows.map { case (a, b) => ("g", a, b) }
      .toDF("grp", "in_a", "in_b")
    val r = Dedup.captureRecapture(df, "grp", "in_a", "in_b").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getBoolean(6)) ==
      ((5L, 4L, 2L, 9.0, 2.236068, true)), r.toString)
    // one detector caught nothing: undefined (no overlap evidence)
    val empty = Seq(("g", true, false), ("g", true, false))
      .toDF("grp", "in_a", "in_b")
    val re = Dedup.captureRecapture(empty, "grp", "in_a", "in_b")
      .head()
    assert(!re.getBoolean(6) && re.getDouble(4) == 0.0)
    // perfect-overlap detectors: N-hat collapses to the catch size
    val full = Seq.fill(5)(("g", true, true)).toDF("grp", "in_a",
      "in_b")
    val rf = Dedup.captureRecapture(full, "grp", "in_a", "in_b").head()
    assert(rf.getDouble(4) == 5.0 && rf.getDouble(5) == 0.0)
  }

  test("newcombeDiffCi: hybrid Wilson delta interval by hand") {
    import graft.operators.Preference
    // 8/10 vs 2/10: diff 0.6, CI [0.161816, 0.802684] through the
    // exact z=1.96 Wilson dag
    val rows = Seq.fill(8)((true, true)) ++ Seq.fill(2)((true, false)) ++
      Seq.fill(2)((false, true)) ++ Seq.fill(8)((false, false))
    val df = rows.map { case (a, s) => ("g", a, s) }
      .toDF("grp", "arm", "succ")
    val r = Preference.newcombeDiffCi(df, "grp", "arm", "succ").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7),
      r.getBoolean(8)) ==
      ((10L, 10L, 8L, 2L, 0.6, 0.161816, 0.802684, true)), r.toString)
    // the interval brackets the delta and excludes zero here
    assert(r.getDouble(6) > 0.0 && r.getDouble(6) < 0.6 &&
      r.getDouble(7) > 0.6)
    // an empty arm: undefined, visible
    val solo = Seq(("g", true, true), ("g", true, false))
      .toDF("grp", "arm", "succ")
    val rs = Preference.newcombeDiffCi(solo, "grp", "arm", "succ")
      .head()
    assert(!rs.getBoolean(8) && rs.getDouble(5) == 0.0)
  }

  test("logRank: hypergeometric O-E/V by hand, null case exact zero") {
    import graft.operators.Retention
    // A: (1,obs),(3,cens); B: (2,obs),(3,obs) -> OE = .5 - 1/3 - .5,
    // V = .25 + 2/9 + .25 -> z = -0.392232, chi2 = 0.153846
    val df = Seq(("g", true, 1L, true), ("g", true, 3L, false),
      ("g", false, 2L, true), ("g", false, 3L, true))
      .toDF("grp", "arm", "dur", "obs")
    val r = Retention.logRank(df, "grp", "arm", "dur", "obs").head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7),
      r.getBoolean(8)) ==
      ((4L, 2L, 3L, -0.333333, 0.722222, -0.392232, 0.153846, true)),
      r.toString)
    // identical arms: every O-E term is exactly 0 -> z = 0, defined
    val same = Seq(("g", true, 1L, true), ("g", true, 2L, true),
      ("g", false, 1L, true), ("g", false, 2L, true))
      .toDF("grp", "arm", "dur", "obs")
    val rs = Retention.logRank(same, "grp", "arm", "dur", "obs").head()
    assert(rs.getDouble(4) == 0.0 && rs.getDouble(6) == 0.0 &&
      rs.getBoolean(8), rs.toString)
    // single-arm group: variance 0 -> undefined
    val solo = Seq(("g", true, 1L, true), ("g", true, 2L, true))
      .toDF("grp", "arm", "dur", "obs")
    val ro = Retention.logRank(solo, "grp", "arm", "dur", "obs").head()
    assert(!ro.getBoolean(8))
  }

  test("mantelHaenszel: pooled odds ratio by hand") {
    import graft.operators.Preference
    // s1 cells (4,1,2,3): ad/n=1.2, bc/n=0.2; s2 (1,2,3,4): 0.4, 0.6
    // -> OR = 1.6/0.8 = 2, ln = 0.693147
    def rows(st: String, a: Int, b: Int, c: Int, d: Int) =
      Seq.fill(a)((st, true, true)) ++ Seq.fill(b)((st, true, false)) ++
        Seq.fill(c)((st, false, true)) ++ Seq.fill(d)((st, false, false))
    val df = (rows("s1", 4, 1, 2, 3) ++ rows("s2", 1, 2, 3, 4))
      .map { case (st, e, s) => ("g", st, e, s) }
      .toDF("grp", "stratum", "exp", "succ")
    val r = Preference.mantelHaenszel(df, "grp", "stratum", "exp",
      "succ").head()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getBoolean(5)) == ((20L, 2L, 2.0, 0.693147, true)), r.toString)
    // no discordant pairs anywhere: denominator 0 -> undefined
    val conc = Seq(("g", "s1", true, true), ("g", "s1", false, false))
      .toDF("grp", "stratum", "exp", "succ")
    val rc = Preference.mantelHaenszel(conc, "grp", "stratum", "exp",
      "succ").head()
    assert(!rc.getBoolean(5) && rc.getDouble(3) == 0.0)
  }

  test("cusum: Page recursion via clamped running min, all integer") {
    import graft.operators.Retention
    // y = x: cum = 1,3,-2,1,5,4,14; clamped min = 0,0,-2,-2,-2,-2,-2
    // -> S = 1,3,0,3,7,6,16; alarms past 5 at seq 5,6,7
    val xs = Seq(1L, 2L, -5L, 3L, 4L, -1L, 10L)
    val df = xs.zipWithIndex.map { case (x, i) =>
      ("g", (i + 1).toLong, x) }.toDF("grp", "seq", "x")
    val r = Retention.cusum(df, "grp", "seq", "x", target = 0L,
      threshold = 5L).head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getBoolean(6)) ==
      ((7L, 16L, 3L, 5L, 5L, true)), r.toString)
    // a quiet series never alarms; first_alarm_seq stays null
    val quiet = (1 to 10).map(i => ("g", i.toLong, 0L))
      .toDF("grp", "seq", "x")
    val rq = Retention.cusum(quiet, "grp", "seq", "x", 0L, 5L).head()
    assert(rq.getLong(2) == 0L && rq.isNullAt(4) && !rq.getBoolean(6))
    // duplicate seq refused plan-side
    intercept[Exception] {
      Retention.cusum(Seq(("g", 1L, 1L), ("g", 1L, 2L))
        .toDF("grp", "seq", "x"), "grp", "seq", "x", 0L, 5L).collect()
    }
    intercept[IllegalArgumentException] {
      Retention.cusum(df, "grp", "seq", "x", 0L, 0L)
    }
  }

  test("termBurstiness: VMR separates clumped from spread terms") {
    // docs "x x x"/"y"/"y z": x clumps (vmr 3), y spreads (0.5),
    // z is Poisson-like (1.0) — through the div/mod mean-square path
    val docs = Seq((1L, "x x x"), (2L, "y"), (3L, "y z"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.termBurstiness(docs, "doc_id", "text",
        topK = 10, minDf = 1L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    assert(out.toSeq == Seq(("x", 1L, 3L, 1.0, 3.0),
      ("y", 2L, 2L, 0.666667, 0.5), ("z", 1L, 1L, 0.333333, 1.0)),
      out.mkString(";"))
    // minDf prunes the hapax tail
    val pruned = TextAnalysis.termBurstiness(docs, "doc_id", "text",
      topK = 10, minDf = 2L).collect().map(_.getString(0))
    assert(pruned.toSeq == Seq("y"))
    intercept[IllegalArgumentException] {
      TextAnalysis.termBurstiness(docs, "doc_id", "text", topK = 0)
    }
  }

  test("byFdr: harmonic budget is stricter than BH on the same family") {
    import graft.operators.Preference
    // q=10%, m=5, c(5)=2.283333 (quantized): BH crit .02i accepts
    // rank 3 (p=.03 <= .06) -> k=3; BY crit .02i/c rejects it
    // (.03 > .026277) -> k=2
    val ps = Seq(0.001, 0.002, 0.03, 0.5, 0.9)
    val f = ps.zipWithIndex.map { case (p, i) => ("f", s"t$i", p) }
      .toDF("family", "test_id", "p")
    val by = Preference.byFdr(f, "family", "test_id", "p", 10)
      .collect().map(r => r.getString(1) ->
        ((r.getLong(3), r.getDouble(5), r.getLong(6),
          r.getBoolean(7)))).toMap
    assert(by("t2") == ((3L, 2.283333, 2L, false)), by("t2").toString)
    assert(by("t1")._4 && !by("t2")._4 && by.values.count(_._4) == 2)
    val bh = Preference.bhFdr(f, "family", "test_id", "p", 10)
      .collect().map(r => r.getString(1) -> r.getBoolean(6)).toMap
    assert(bh("t2") && bh.values.count(identity(_)) == 3,
      "BH must accept rank 3 where BY refuses")
    // single test: c(1) = 1, BY == BH == plain q
    val one = Preference.byFdr(Seq(("a", "x", 0.04))
        .toDF("family", "test_id", "p"), "family", "test_id", "p", 5)
      .head()
    assert(one.getDouble(5) == 1.0 && one.getBoolean(7))
  }

  test("brownForsythe: doubled-median deviations feed the ANOVA") {
    import graft.operators.Classification
    // g1=[1,2,3,10] m2=5 -> z=(3,1,1,15); g2=[4,6] m2=10 -> z=(2,2)
    // ANOVA on z: T=108, grand=96, SSB=12, SSW=136, F=0.352941
    val df = Seq(("f", "g1", 1L), ("f", "g1", 2L), ("f", "g1", 3L),
      ("f", "g1", 10L), ("f", "g2", 4L), ("f", "g2", 6L))
      .toDF("fam", "grp", "x")
    val r = Classification.brownForsythe(df, "fam", "grp", "x").head()
    assert((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
      r.getDouble(5), r.getBoolean(6)) ==
      ((6L, 2L, 12.0, 136.0, 0.352941, true)), r.toString)
    // equal spreads around different centers: SSB 0, undefined-free
    val shift = Seq(("f", "g1", 1L), ("f", "g1", 3L), ("f", "g2", 11L),
      ("f", "g2", 13L)).toDF("fam", "grp", "x")
    val rs = Classification.brownForsythe(shift, "fam", "grp", "x")
      .head()
    assert(rs.getDouble(3) == 0.0 && rs.getDouble(5) == 0.0,
      rs.toString)
  }

  test("friedman: matched-block ranks, ties, incomplete blocks") {
    import graft.operators.Classification
    // classic 4x3, no ties: R=(5,10,9) -> chi2 = 51.5 - 48 = 3.5
    val rows = Seq(
      ("s1", "a", 1L), ("s1", "b", 2L), ("s1", "c", 3L),
      ("s2", "a", 2L), ("s2", "b", 3L), ("s2", "c", 1L),
      ("s3", "a", 1L), ("s3", "b", 3L), ("s3", "c", 2L),
      ("s4", "a", 1L), ("s4", "b", 2L), ("s4", "c", 3L))
      .map { case (s, t, x) => ("g", s, t, x) }
      .toDF("grp", "subj", "treat", "x")
    val r = Classification.friedman(rows, "grp", "subj", "treat", "x")
      .head()
    // Kendall's W = 3.5/(4*2) = 0.4375
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getDouble(5), r.getDouble(6), r.getDouble(7),
      r.getBoolean(8)) ==
      ((4L, 3L, 0L, 3.5, 1.0, 3.5, 0.4375, true)), r.toString)
    // ties (doubled avg ranks) + one incomplete subject dropped:
    // R2=(5,8,11), chi2=2.25, C=0.75, corrected=3.0
    val tied = Seq(
      ("s1", "a", 1L), ("s1", "b", 1L), ("s1", "c", 2L),
      ("s2", "a", 1L), ("s2", "b", 2L), ("s2", "c", 2L),
      ("s3", "a", 9L))
      .map { case (s, t, x) => ("g", s, t, x) }
      .toDF("grp", "subj", "treat", "x")
    val rt = Classification.friedman(tied, "grp", "subj", "treat", "x")
      .head()
    assert((rt.getLong(1), rt.getLong(2), rt.getLong(3),
      rt.getDouble(4), rt.getDouble(5), rt.getDouble(6),
      rt.getDouble(7), rt.getBoolean(8)) ==
      ((2L, 3L, 1L, 2.25, 0.75, 3.0, 0.5625, true)), rt.toString)
    // every subject incomplete: group stays visible, undefined
    val allInc = Seq(("g", "s1", "a", 1L), ("g", "s2", "b", 2L))
      .toDF("grp", "subj", "treat", "x")
    val ri = Classification.friedman(allInc, "grp", "subj", "treat",
      "x").head()
    assert((ri.getLong(1), ri.getLong(3), ri.getBoolean(8)) ==
      ((0L, 2L, false)), ri.toString)
    // duplicate cell refused plan-side
    intercept[Exception] {
      Classification.friedman(
        Seq(("g", "s1", "a", 1L), ("g", "s1", "a", 2L))
          .toDF("grp", "subj", "treat", "x"),
        "grp", "subj", "treat", "x").collect()
    }
  }

  test("wilcoxonSignedRank: ranks, ties, zeros by hand") {
    import graft.operators.Preference
    // d = +1,+2,+3,-4: ranks 1..4, W+ = 6, num = (2*12-20)/4 = 1,
    // v = (2*4*5*9)/48 = 7.5 -> z = 1/sqrt(7.5) = 0.365148
    val clean = Seq(("g", 2L, 1L), ("g", 3L, 1L), ("g", 4L, 1L),
      ("g", 1L, 5L)).toDF("grp", "a", "b")
    val r = Preference.wilcoxonSignedRank(clean, "grp", "a", "b")
      .head()
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4),
      r.getBoolean(5)) == ((4L, 0L, 12L, 0.365148, true)), r.toString)
    // all |d| tied + one zero excluded: d = +1,-1,+1,0 -> doubled
    // avg rank 4 each, W2+ = 8, num = (16-12)/4 = 1,
    // v48 = 168 - 24 = 144 -> z = 1/sqrt(3) = 0.57735
    val tied = Seq(("g", 2L, 1L), ("g", 1L, 2L), ("g", 3L, 2L),
      ("g", 5L, 5L)).toDF("grp", "a", "b")
    val rt = Preference.wilcoxonSignedRank(tied, "grp", "a", "b")
      .head()
    assert((rt.getLong(1), rt.getLong(2), rt.getLong(3),
      rt.getDouble(4), rt.getBoolean(5)) ==
      ((3L, 1L, 8L, 0.57735, true)), rt.toString)
    // all-zero group stays visible, undefined
    val zeros = Seq(("g", 7L, 7L), ("g", 3L, 3L)).toDF("grp", "a", "b")
    val rz = Preference.wilcoxonSignedRank(zeros, "grp", "a", "b")
      .head()
    assert((rz.getLong(1), rz.getLong(2), rz.getBoolean(5)) ==
      ((0L, 2L, false)), rz.toString)
    intercept[IllegalArgumentException] {
      Preference.wilcoxonSignedRank(
        Seq(("g", 1.5, 2.0)).toDF("grp", "a", "b"), "grp", "a", "b")
    }
  }

  test("kneserNeyCrossEntropy: coverage classes and entropy by hand") {
    // train (a,b):2 (a,c):1 -> ctx a:(3,2), cont b:1 c:1, nt=2
    // held-out (a,b) covered p=2/3; (a,d) d has no continuation
    // mass; (e,b) e unseen context -> coverage 1/3, ce=0.405465,
    // ppl = 1.5 (exp of the quantized ln recovers it exactly)
    val train = Seq("a b", "a b", "a c").toDF("text")
    val ho = Seq("a b", "a d", "e b").toDF("text")
    val r = TextAnalysis.kneserNeyCrossEntropy(train, ho, "text").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
      r.getDouble(4), r.getDouble(5), r.getBoolean(6)) ==
      ((2L, 3L, 1L, 0.333333, 0.405465, 1.5, true)), r.toString)
    // nothing covered: entropy refused visibly, counts stay
    val miss = TextAnalysis.kneserNeyCrossEntropy(train,
      Seq("x y").toDF("text"), "text").head()
    assert((miss.getLong(1), miss.getLong(2), miss.getBoolean(6)) ==
      ((1L, 0L, false)), miss.toString)
    // self-evaluation sanity: training text is fully covered
    val self = TextAnalysis.kneserNeyCrossEntropy(train, train, "text")
      .head()
    assert(self.getDouble(3) == 1.0 && self.getDouble(4) > 0.0)
    intercept[IllegalArgumentException] {
      TextAnalysis.kneserNeyCrossEntropy(train, ho, "text",
        discount = 1.0)
    }
  }
}
