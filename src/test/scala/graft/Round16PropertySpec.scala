package graft

import graft.operators.{Classification, Preference, Quantiles}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Randomized invariants for the round-16 eval/robust-stats family —
  * algebraic identities the hand-computed unit cases can't sweep
  * (fixed seeds keep runs deterministic, the PropertySpecs
  * convention). */
class Round16PropertySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private val rng = new Random(421L)

  test("kendall and spearman hit exactly ±1 on strict monotone data " +
      "and agree in sign elsewhere") {
    val xs = rng.shuffle((1L to 40L).toList)
    val mono = xs.zipWithIndex.map { case (x, i) =>
      (1L, i.toLong, x, x * 3 + 7) }
    val anti = xs.zipWithIndex.map { case (x, i) =>
      (2L, i.toLong, x, -x) }
    val tauDf = (mono ++ anti).toDF("grp", "id", "x", "y")
    val tau = Preference.kendallTau(tauDf, "grp", "id", "x", "y")
      .collect().map(r => r.getLong(0) -> r.getDouble(8)).toMap
    assert(tau(1L) == 1.0 && tau(2L) == -1.0, tau.toString)
    val rho = Preference.spearmanRho(
        (mono ++ anti).map(t => (t._1, t._3, t._4)).toDF("grp", "x", "y"),
        "grp", "x", "y")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(rho(1L) == 1.0 && rho(2L) == -1.0, rho.toString)
    // noisy groups: the two rank statistics must agree in SIGN when
    // both are comfortably nonzero (they measure the same monotone
    // association)
    val noisy = (0 until 6).flatMap { g =>
      (0 until 30).map { i =>
        val x = rng.nextInt(100).toLong
        val y = if (g % 2 == 0) x + rng.nextInt(20) else -x + rng.nextInt(20)
        (100L + g, i.toLong, x, y)
      }
    }
    val nt = Preference.kendallTau(noisy.toDF("grp", "id", "x", "y"),
        "grp", "id", "x", "y")
      .collect().map(r => r.getLong(0) -> r.getDouble(8)).toMap
    val nr = Preference.spearmanRho(
        noisy.map(t => (t._1, t._3, t._4)).toDF("grp", "x", "y"),
        "grp", "x", "y")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    nt.keys.foreach { g =>
      if (math.abs(nt(g)) > 0.1 && math.abs(nr(g)) > 0.1)
        assert(nt(g).sign == nr(g).sign, s"group $g: tau ${nt(g)} vs " +
          s"rho ${nr(g)}")
    }
  }

  test("rankSumAuc: label complement flips AUC around 0.5 exactly") {
    val df = (0 until 200).map { i =>
      ("g" + (i % 4), rng.nextInt(50).toLong, rng.nextBoolean())
    }.toDF("g", "s", "y")
    val flipped = df.select(col("g"), col("s"), (!col("y")).as("y"))
    val a = Classification.rankSumAuc(df, "g", "s", "y")
      .collect().map(r => r.getString(0) -> ((r.getDouble(4),
        r.getBoolean(5)))).toMap
    val b = Classification.rankSumAuc(flipped, "g", "s", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    a.foreach { case (g, (auc, defined)) =>
      if (defined)
        // 2U+ + 2U- = 2 nP nN exactly, so the rounded AUCs sum to 1
        // within one rounding ulp of the 6th decimal
        assert(math.abs(auc + b(g) - 1.0) < 2e-6, s"$g: $auc + ${b(g)}")
    }
  }

  test("ksTest is symmetric in the two samples") {
    val df = (0 until 300).map { i =>
      ("g" + (i % 3), rng.nextBoolean(), rng.nextInt(30).toLong)
    }.toDF("g", "b", "x")
    val swapped = df.select(col("g"), (!col("b")).as("b"), col("x"))
    val d1 = Classification.ksTest(df, "g", "b", "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val d2 = Classification.ksTest(swapped, "g", "b", "x")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    d1.foreach { case (g, n) => assert(d2(g) == n, s"$g: $n vs ${d2(g)}") }
  }

  test("gini is invariant under integer mass scaling") {
    val df = (0 until 120).map { i =>
      ("g" + (i % 3), rng.nextInt(1000).toLong)
    }.toDF("g", "w")
    val scaled = df.select(col("g"), (col("w") * 7L).as("w"))
    val g1 = Quantiles.gini(df, "g", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    val g2 = Quantiles.gini(scaled, "g", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    g1.foreach { case (g, v) => assert(g2(g) == v, s"$g: $v vs ${g2(g)}") }
  }

  test("medianMad: median shifts with a constant, MAD does not") {
    val df = (0 until 150).map { i =>
      ("g" + (i % 3), rng.nextInt(500).toLong)
    }.toDF("g", "s")
    val shifted = df.select(col("g"), (col("s") + 1000L).as("s"))
    val m1 = Quantiles.medianMad(df, "g", "s")
      .collect().map(r => r.getString(0) -> ((r.getDouble(2),
        r.getDouble(3)))).toMap
    val m2 = Quantiles.medianMad(shifted, "g", "s")
      .collect().map(r => r.getString(0) -> ((r.getDouble(2),
        r.getDouble(3)))).toMap
    m1.foreach { case (g, (med, mad)) =>
      assert(m2(g) == ((med + 1000.0, mad)), s"$g: $m1 vs $m2")
    }
  }

  test("trimmedMean lies within [min, max] and trim tightens toward " +
      "the median half") {
    val df = (0 until 100).map { i =>
      ("g" + (i % 2), rng.nextInt(10000).toLong)
    }.toDF("g", "s")
    val byG = (0 until 100).map(i => ("g" + (i % 2))).zip(
      df.select("s").as[Long].collect()).groupBy(_._1)
    val out = Quantiles.trimmedMean(df, "g", "s", trimPct = 20)
      .collect().map(r => r.getString(0) -> ((r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    out.foreach { case (g, (mean, trimmed, wins)) =>
      val vals = byG(g).map(_._2)
      assert(trimmed >= vals.min && trimmed <= vals.max)
      assert(wins >= vals.min && wins <= vals.max)
      assert(mean >= vals.min && mean <= vals.max)
    }
  }

  test("conformalQuantile rank is monotone in the coverage demand") {
    val df = (0 until 90).map { i =>
      ("g" + (i % 3), rng.nextInt(1000).toLong, i.toLong)
    }.toDF("g", "s", "i")
    val ks = Seq(5, 10, 20, 40).map { a =>
      a -> Quantiles.conformalQuantile(df, "g", "s", "i", a)
        .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    }
    ks.sliding(2).foreach { case Seq((a1, k1), (a2, k2)) =>
      k1.keys.foreach { g =>
        assert(k1(g) >= k2(g),
          s"alpha $a1 rank ${k1(g)} < alpha $a2 rank ${k2(g)} for $g")
      }
    }
  }

  test("signTest p-value is 1.0 at perfect balance and shrinks with " +
      "imbalance") {
    val ps = Seq((10, 10), (14, 6), (18, 2), (20, 0)).map { case (w, l) =>
      val df = (Seq.fill(w)(("g", true)) ++ Seq.fill(l)(("g", false)))
        .toDF("src", "win")
      Preference.signTest(df, "src", "win").head().getDouble(4)
    }
    assert(ps.head == 1.0, ps.toString)
    ps.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a, s"p-values not monotone: $ps")
    }
  }
}
