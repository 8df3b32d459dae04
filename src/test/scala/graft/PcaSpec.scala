package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PCA/whitening math pins — the rows-only qBO gate row's substitute
  * for an oracle: the eigensolver against hand eigensystems, the
  * fitted model against planted geometry, and the whitening contract
  * against its own definition. */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("jacobiEigen matches hand-computed eigensystems") {
    // 2x2 with analytic eigenpairs: [[2,1],[1,2]] -> 3 @ (1,1)/√2, 1 @ (1,-1)/√2
    val (v2, e2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(e2(0).zip(Array(r, r)).forall { case (a, b) => math.abs(a - b) < 1e-9 })
    // diagonal matrix: eigenvalues sorted descending, axes recovered
    val (v3, e3) = Pca.jacobiEigen(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(v3.toSeq == Seq(5.0, 3.0, 1.0))
    assert(e3(0)(1) == 1.0 && e3(1)(2) == 1.0 && e3(2)(0) == 1.0)
    // eigenvectors orthonormal on a random symmetric matrix
    val rnd = new scala.util.Random(3)
    val n = 16
    val m = Array.ofDim[Double](n, n)
    for (i <- 0 until n; j <- i until n) {
      val x = rnd.nextGaussian(); m(i)(j) = x; m(j)(i) = x
    }
    val (vals, vecs) = Pca.jacobiEigen(m)
    for (i <- 0 until n; j <- 0 until n) {
      val d = vecs(i).zip(vecs(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9, s"($i,$j) dot $d")
    }
    // similarity preserved: trace equals eigenvalue sum
    val tr = (0 until n).map(i => m(i)(i)).sum
    assert(math.abs(vals.sum - tr) < 1e-9)
  }

  test("fit recovers a planted dominant axis; whitening isotropizes") {
    import spark.implicits._
    // anisotropic cloud: variance 25 along a fixed unit axis u,
    // variance ~0.01 elsewhere
    val dim = 12
    val rnd = new scala.util.Random(7)
    val u = {
      val raw = Array.tabulate(dim)(i => math.sin(i + 1.0))
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm)
    }
    val rows = (0 until 400).map { i =>
      val a = rnd.nextGaussian() * 5.0
      val v = Array.tabulate(dim)(j => a * u(j) + rnd.nextGaussian() * 0.1)
      (i.toLong, v.toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim, k = 3)
    val cos = model.components(0).zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.995,
      s"top component missed the planted axis: |cos| = ${math.abs(cos)}")
    assert(model.eigenvalues(0) > 15.0 && model.eigenvalues(1) < 1.0,
      s"eigen spectrum off: ${model.eigenvalues.toSeq}")
    // whitened projection: per-dim variance ~ 1 for informative dims
    val proj = Pca.project(df, "vec_id", "embedding", model, whiten = true,
        scale = 9)
      .collect().map(_.getSeq[Double](1).toArray)
    (0 until 3).foreach { d =>
      val xs = proj.map(_(d))
      val mu = xs.sum / xs.length
      val va = xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
      assert(math.abs(va - 1.0) < 0.15, s"whitened dim $d variance $va")
    }
    // unwhitened projection variance along the top axis equals its
    // eigenvalue (the definition of PCA)
    val raw = Pca.project(df, "vec_id", "embedding", model, whiten = false,
        scale = 9)
      .collect().map(_.getSeq[Double](1).head)
    val mu0 = raw.sum / raw.length
    val va0 = raw.map(x => (x - mu0) * (x - mu0)).sum / (raw.length - 1)
    assert(math.abs(va0 - model.eigenvalues(0)) < 0.05 * model.eigenvalues(0),
      s"top-axis variance $va0 vs eigenvalue ${model.eigenvalues(0)}")
    // the fitted SUBSPACE is partitioning-invariant (float sums may
    // wiggle ulps; the spanned top axis must not)
    val model2 = Pca.fit(df.repartition(13), "embedding", dim, k = 3)
    val agree = model.components(0).zip(model2.components(0))
      .map { case (a, b) => a * b }.sum
    assert(math.abs(agree) > 0.999999, s"partitioning moved the top axis: $agree")
  }

  test("plan pins: projection paths are shuffle-free maps over broadcasts") {
    import graft.operators.Similarity
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val model = Pca.fit(emb, "embedding", dim = 64, k = 4)
    // both projections are one scan + one broadcast row: a hash
    // Exchange here would mean the corpus is being shuffled to
    // multiply by a constant matrix
    val pcaPlan = Pca.project(emb, "vec_id", "embedding", model)
      .queryExecution.executedPlan.toString
    assert(!pcaPlan.contains("Exchange hashpartitioning"), pcaPlan.take(600))
    val jlPlan = Similarity.randomProject(emb, "vec_id", "embedding", 64, 8)
      .queryExecution.executedPlan.toString
    assert(!jlPlan.contains("Exchange hashpartitioning"), jlPlan.take(600))
  }

  test("fit skips nulls/short vectors and refuses degenerate corpora") {
    import spark.implicits._
    val good = (0 until 20).map(i =>
      (i.toLong, Some(Seq(i.toDouble, 2.0 * i, 1.0))))
    val bad = Seq((100L, Some(Seq(1.0))), (101L, None: Option[Seq[Double]]))
    val df = (good ++ bad).toDF("vec_id", "embedding")
    val model = Pca.fit(df, "embedding", dim = 3, k = 2)
    // mean computed over the 20 usable rows only: mean of 0..19 = 9.5
    assert(math.abs(model.mean(0) - 9.5) < 1e-9, model.mean.toSeq.toString)
    // projection drops the SAME rows the fit skipped — a padded
    // projection would emit sheared scores for rows outside the model
    val projIds = Pca.project(df, "vec_id", "embedding", model)
      .collect().map(_.getLong(0)).toSet
    assert(projIds == good.map(_._1).toSet,
      s"project emitted model-unseen rows: ${projIds -- good.map(_._1).toSet}")
    val e = intercept[IllegalArgumentException] {
      Pca.fit(df.filter(col("vec_id") === 0L), "embedding", dim = 3, k = 1)
    }
    assert(e.getMessage.contains(">= 2 usable vectors"))
  }

  test("powerIteration recovers a planted dominant direction exactly " +
      "enough, canonical sign, guards") {
    import spark.implicits._
    // corpus dominated by multiples of (0.6, 0.8) with small
    // orthogonal noise — the gram's top eigenvector is ±(0.6, 0.8);
    // the canonical sign makes the largest-|v| component positive
    val planted = Seq(
      Seq(0.6f, 0.8f), Seq(1.2f, 1.6f), Seq(-0.6f, -0.8f),
      Seq(0.61f, 0.79f), Seq(0.08f, -0.06f)
    ).map(Tuple1(_)).toDF("emb")
    val out = Pca.powerIteration(planted, "emb")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val (v0, v1) = (out(0)._2, out(1)._2)
    // direction ~ (0.6, 0.8) normalized to max-component 1: (0.75, 1)
    assert(math.abs(v1 - 1.0) < 1e-6 && math.abs(v0 - 0.75) < 0.02,
      out.toString)
    assert(v1 > 0, "canonical sign: the leading component is positive")
    // lambda is the Rayleigh quotient of the gram — positive, and at
    // least the dominant mass (sum of squared norms along the
    // direction ~ 0.36+1.44*4... sanity: > 4)
    assert(out(0)._3 == out(1)._3 && out(0)._3 > 4.0, out.toString)
    // a sign-flipped corpus yields the SAME canonical vector
    val flipped = planted.select(transform(col("emb"),
      x => -x).as("emb"))
    val f = Pca.powerIteration(flipped, "emb")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(f(0) == out(0)._1 && f(1) == out(1)._1, f.toString)
    // all-zero corpus: defined-free zeros, never NaN or a crash
    val zero = Seq(Seq(0f, 0f), Seq(0f, 0f)).map(Tuple1(_)).toDF("emb")
    val z = Pca.powerIteration(zero, "emb").collect()
    assert(z.forall(r => r.getLong(1) == 0L && r.getDouble(3) == 0.0))
    // ragged dimensions and oversize dims are refused loudly
    val ragged = Seq(Seq(1f, 0f), Seq(1f, 0f, 0f)).map(Tuple1(_))
      .toDF("emb")
    val e1 = intercept[IllegalArgumentException] {
      Pca.powerIteration(ragged, "emb")
    }
    assert(e1.getMessage.contains("mixed dimensions"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Pca.powerIteration(planted, "emb", maxDim = 1)
    }
    assert(e2.getMessage.contains("dim"), e2.getMessage)
    // wild coordinates break the fixed-point contract loudly
    val wild = Seq(Seq(11f, 0f), Seq(1f, 0f)).map(Tuple1(_)).toDF("emb")
    val e3 = intercept[Exception] { Pca.powerIteration(wild, "emb") }
    assert(e3.getMessage.contains("fixed-point"), e3.getMessage)
  }
}
