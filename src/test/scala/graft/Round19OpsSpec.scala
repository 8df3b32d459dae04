package graft

import graft.operators.{Pca, ProductQuantizer, Retention}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round19OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("changepointMean: contrast-safe bound refuses the 2x case") {
    // r18 ADVICE case: n=2, x = [4.6e18, -9.2e18]. |C_1| = 4.6e18
    // passes the old (2^63-1)/n bound (4.61e18) but the contrast
    // n*C_1 - 1*C_2 = 9.2e18 + 4.6e18 ~ 1.38e19 overflows signed-64.
    // The halved bound must refuse it with the CURATED error, not an
    // uncurated ANSI ArithmeticException.
    val d = Seq(("g", 1L, 4600000000000000000L),
      ("g", 2L, -9200000000000000000L)).toDF("g", "seq", "x")
    val e = intercept[Exception] {
      Retention.changepointMean(d, "g", "seq", "x").collect()
    }
    assert(e.getMessage.contains("overflows signed-64"), e.getMessage)
    // just inside the new bound: (2^63-1)/(2n) with n=4 is ~1.15e18;
    // prefix sums stay below it and the contrast computes exactly
    val ok = Seq(("g", 1L, 1000000000000000000L), ("g", 2L, -999999999999999999L),
      ("g", 3L, 1L), ("g", 4L, -2L)).toDF("g", "seq", "x")
    val r = Retention.changepointMean(ok, "g", "seq", "x").collect().head
    assert(r.getBoolean(7), "in-bound series must compute")
  }

  test("pq encode/encodeExact drop null vectors; shortlist unpoisoned") {
    // one null-embedding row: ascending approx_dist sorts nulls
    // FIRST, so pre-fix it would displace a real shortlist candidate
    val base = emb.select(col("vec_id"), col("embedding")).limit(40)
    val withNull = base.unionByName(
      Seq((9999L, null.asInstanceOf[Seq[Double]]))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(
          base.schema("embedding").dataType)))

    val cb = ProductQuantizer.train(base, "vec_id", "embedding",
      m = 8, ksub = 4)
    val enc = ProductQuantizer.encode(withNull, "embedding", cb)
    assert(!enc.select(col("vec_id")).collect().map(_.getLong(0))
      .contains(9999L), "encode must drop null vectors")
    val top = ProductQuantizer.searchRerank(enc, "vec_id", "embedding",
      cb, queryId = 0L, k = 5, shortlist = 10).collect()
    assert(top.nonEmpty && !top.map(_.getLong(0)).contains(9999L))

    val cbx = ProductQuantizer.trainExact(base, "vec_id", "embedding",
      m = 8, ksub = 4)
    val encx = ProductQuantizer.encodeExact(withNull, "embedding", cbx)
    assert(!encx.select(col("vec_id")).collect().map(_.getLong(0))
      .contains(9999L), "encodeExact must drop null vectors")
    val codes = encx.select(col("vec_id"), col("pq_codes"))
    val topx = ProductQuantizer.searchRerankExact(codes, withNull,
      "vec_id", "embedding", cbx, queryId = 0L, k = 5, shortlist = 10)
      .collect()
    assert(topx.nonEmpty && !topx.map(_.getLong(0)).contains(9999L))
    // exact results identical with and without the null row present
    val codesClean = ProductQuantizer.encodeExact(base, "embedding", cbx)
      .select(col("vec_id"), col("pq_codes"))
    val topClean = ProductQuantizer.searchRerankExact(codesClean, base,
      "vec_id", "embedding", cbx, queryId = 0L, k = 5, shortlist = 10)
      .collect()
    assert(topx.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      topClean.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "a null row must not perturb the exact shortlist")
  }

  test("funnel maxSpan: anchored window bites, boundary inclusive, " +
      "step-1 unaffected") {
    import graft.operators.Retention
    val ev = Seq(
      // u1: full chain inside the window (span 10 from t1=100)
      (1L, "view", 100L), (1L, "click", 105L), (1L, "purchase", 110L),
      // u2: click beyond t1+span -> depth 1 even though a later
      // purchase exists (cascade)
      (2L, "view", 100L), (2L, "click", 115L), (2L, "purchase", 116L),
      // u3: click at the exact boundary t1+span converts (<=), the
      // purchase after it does not
      (3L, "view", 100L), (3L, "click", 110L), (3L, "purchase", 111L),
      // u4: anchor is the FIRST view (first-touch) — the later view
      // at 200 would admit the click, but attribution anchors at 100
      (4L, "view", 100L), (4L, "view", 200L), (4L, "click", 205L))
      .toDF("u", "t", "ts")
    val r = Retention.funnel(ev, "u", "t", "ts",
        Seq("view", "click", "purchase"), maxSpan = Some(10L))
      .collect().map(x => x.getLong(0) ->
        ((Option(x.get(1)), Option(x.get(2)), Option(x.get(3)),
          x.getLong(4)))).toMap
    assert(r(1L) == ((Some(100L), Some(105L), Some(110L), 3L)))
    assert(r(2L) == ((Some(100L), None, None, 1L)))
    assert(r(3L) == ((Some(100L), Some(110L), None, 2L)))
    assert(r(4L) == ((Some(100L), None, None, 1L)))
    // span absent reproduces the unbounded chain (u2 converts fully)
    val r0 = Retention.funnel(ev, "u", "t", "ts",
        Seq("view", "click", "purchase")).collect()
      .map(x => x.getLong(0) -> x.getLong(4)).toMap
    assert(r0(2L) == 3L)
    val e = intercept[IllegalArgumentException] {
      Retention.funnel(ev, "u", "t", "ts", Seq("view"), Some(0L))
    }
    assert(e.getMessage.contains("maxSpan"), e.getMessage)
  }

  test("grid-sum audit: centroid sums overflow LOUDLY; pair-sum " +
      "fan-out knob is capped") {
    import graft.operators.{Preference, Similarity}
    // two coordinates near the fixedPoint guard's 9e9 ceiling pass
    // the per-value check but their 1e-9-grid longs sum past 2^63 —
    // pre-fix LongVectorSum wrapped silently; now Math.addExact
    // fails the job loudly (SCALE.md "Grid-sum audit")
    val big = Seq((1L, "g", Seq(8.9e9)), (2L, "g", Seq(8.9e9)),
      (3L, "g", Seq(8.9e9))).toDF("id", "grp", "v")
    val e = intercept[Exception] {
      Similarity.robustCentroids(big, "id", "grp", "v", dim = 1,
        shards = 1).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).toSeq
    assert(causes(e).exists(c => c.isInstanceOf[ArithmeticException] ||
      c.getMessage != null && c.getMessage.contains("overflow")),
      s"expected a loud overflow, got: $e")
    // normal-scale sums are untouched by the addExact switch
    val ok = Seq((1L, "g", Seq(1.0, 2.0)), (2L, "g", Seq(3.0, 4.0)))
      .toDF("id", "grp", "v")
    val r = Similarity.robustCentroids(ok, "id", "grp", "v", dim = 2,
      shards = 1).collect()
    assert(r.map(x => x.getInt(1) -> x.getDouble(2)).toMap ==
      Map(1 -> 2.0, 2 -> 3.0))
    // embeddingDiversity: the fan-out knob now doubles as the
    // pair-grid-sum bound — values past 1e5 are refused
    val emb = Seq(("p", 1L, Seq(1.0, 0.0))).toDF("p", "id", "v")
    val e2 = intercept[IllegalArgumentException] {
      Preference.embeddingDiversity(emb, "p", "id", "v",
        maxFanOut = 200000)
    }
    assert(e2.getMessage.contains("100000"), e2.getMessage)
  }

  test("streaming twins refuse non-integral state keys loudly") {
    // the r19 key-type parity contract: the twins key state on a
    // long cast, so a string id would cast to null and silently
    // merge keys — refused up front instead
    val evS = Seq(("u1", "view", 1L)).toDF("user_id", "event_type", "ts")
    val e1 = intercept[IllegalArgumentException] {
      graft.streaming.StreamingFunnel.funnel(evS, "user_id",
        "event_type", "ts", Seq("view"))
    }
    assert(e1.getMessage.contains("must be integral"), e1.getMessage)
    val docsS = Seq(("d1", "some text here")).toDF("doc_id", "text")
    val e2 = intercept[IllegalArgumentException] {
      graft.streaming.StreamingDedup.nearDupCandidates(docsS,
        "doc_id", "text")
    }
    assert(e2.getMessage.contains("must be integral"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException] {
      graft.streaming.StreamingWinnow.candidates(docsS, "doc_id", "text")
    }
    assert(e3.getMessage.contains("must be integral"), e3.getMessage)
    val trS = Seq(("ex1", 50L, true)).toDF("ex", "p", "c")
    val e4 = intercept[IllegalArgumentException] {
      graft.streaming.StreamingCartography.cartography(trS, "ex", "p", "c")
    }
    assert(e4.getMessage.contains("must be integral"), e4.getMessage)
    val rsS = Seq(("p", "r1", 3L)).toDF("prompt", "resp", "score")
    val e5 = intercept[IllegalArgumentException] {
      graft.streaming.StreamingBestOfN.bestOfN(rsS, "prompt", "resp",
        "score", 2)
    }
    assert(e5.getMessage.contains("must be integral"), e5.getMessage)
  }

  /** Sequential trigram-KN replica — the same statistics and dag
    * [[graft.operators.TextAnalysis.kneserNeyTrigrams]] distributes
    * (all lower-order stats from the one trigram census). */
  private class KnTriReplica(docs: Seq[String], D: Double) {
    val tris: Seq[(String, String, String)] = docs.flatMap(t =>
      t.split("\\s+").filter(_.nonEmpty).sliding(3)
        .filter(_.size == 3).map(a => (a(0), a(1), a(2))).toSeq)
    val c123 = tris.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c12 = c123.toSeq.groupBy { case ((a, b, _), _) => (a, b) }
      .view.mapValues(_.map(_._2).sum).toMap
    val n1f12 = c123.keys.toSeq.groupBy(k => (k._1, k._2))
      .view.mapValues(_.size.toLong).toMap
    val mids = c123.keys.map(k => (k._2, k._3)).toSet
    val nc23 = c123.keys.toSeq.groupBy(k => (k._2, k._3))
      .view.mapValues(_.map(_._1).toSet.size.toLong).toMap
    val ncmid2 = mids.toSeq.groupBy(_._1)
      .view.mapValues(_.map(nc23).sum).toMap
    val n1fmid2 = mids.toSeq.groupBy(_._1)
      .view.mapValues(_.size.toLong).toMap
    val n1b3 = mids.toSeq.groupBy(_._2)
      .view.mapValues(_.size.toLong).toMap
    val ntm = mids.size.toLong
    def p(w1: String, w2: String, w3: String): Double = {
      val ctx = c12((w1, w2))
      val pc = n1b3.getOrElse(w3, 0L).toDouble / ntm
      val pm = math.max(nc23.getOrElse((w2, w3), 0L) - D, 0.0) /
        ncmid2(w2) + D * n1fmid2(w2) / ncmid2(w2) * pc
      math.max(c123.getOrElse((w1, w2, w3), 0L) - D, 0.0) / ctx +
        D * n1f12((w1, w2)) / ctx * pm
    }
  }

  test("kneserNeyTrigrams: sequential replica equality + per-context " +
      "probability mass sums to exactly 1") {
    import graft.operators.TextAnalysis
    val docs = Seq("a b c a b d a b c", "b c a b c x", "x y z x y w",
      "c a b", "a b")
    val rep = new KnTriReplica(docs, 0.75)
    val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.kneserNeyTrigrams(df, "text", topK = 1000)
      .collect()
    assert(got.length == rep.c123.size, "one model row per trigram type")
    got.foreach { r =>
      val (w1, w2, w3) = (r.getString(0), r.getString(1), r.getString(2))
      assert(r.getLong(3) == rep.c123((w1, w2, w3)))
      assert(r.getLong(4) == rep.c12((w1, w2)))
      assert(r.getLong(6) == rep.nc23((w2, w3)))
      assert(r.getLong(10) == rep.ntm)
      val exp = BigDecimal(rep.p(w1, w2, w3))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(11) - exp) < 2e-6,
        s"($w1,$w2,$w3): got ${r.getDouble(11)} want $exp")
    }
    // the KN telescoping identity: for every SEEN context, the model
    // distributes exactly unit mass over the continuation vocabulary
    val vocab = rep.n1b3.keys.toSeq
    rep.c12.keys.foreach { case (w1, w2) =>
      val mass = vocab.map(w3 => rep.p(w1, w2, w3)).sum
      assert(math.abs(mass - 1.0) < 1e-12,
        s"context ($w1,$w2) mass $mass != 1")
    }
  }

  test("kneserNeyTrigramCrossEntropy: coverage + entropy vs replica") {
    import graft.operators.TextAnalysis
    val train = Seq("a b c a b d a b c", "b c a b c", "c a b x")
    val ho = Seq("a b c x", "a b d", "q q q")
    val rep = new KnTriReplica(train, 0.75)
    val hoTris = new KnTriReplica(ho, 0.75).tris
    val hoTypes = hoTris.groupBy(identity).view.mapValues(_.size.toLong)
    var nEval = 0L; var nCov = 0L; var num = BigInt(0)
    hoTypes.foreach { case ((w1, w2, w3), hc) =>
      nEval += hc
      if (rep.c12.contains((w1, w2)) && rep.n1b3.contains(w3)) {
        nCov += hc
        val qln = math.floor(math.log(rep.p(w1, w2, w3)) * 1e9 + 0.5).toLong
        num += BigInt(hc * qln)
      }
    }
    val ceExp = BigDecimal(-(num.toDouble / 1e9) / nCov)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = TextAnalysis.kneserNeyTrigramCrossEntropy(
      train.toDF("text"), ho.toDF("text"), "text").collect().head
    assert(r.getLong(0) == rep.c123.size)
    assert(r.getLong(1) == nEval && r.getLong(2) == nCov)
    assert(nCov < nEval, "fixture must exercise uncovered events")
    assert(math.abs(r.getDouble(4) - ceExp) < 2e-6,
      s"ce ${r.getDouble(4)} vs replica $ceExp")
    assert(r.getBoolean(6))
    // a fully-unseen held-out corpus: defined = false, zero coverage
    val r0 = TextAnalysis.kneserNeyTrigramCrossEntropy(
      train.toDF("text"), Seq("p q r s").toDF("text"), "text")
      .collect().head
    assert(r0.getLong(2) == 0L && !r0.getBoolean(6) &&
      r0.getDouble(4) == 0.0)
  }

  /** Planted 3-axis fixture: exactly orthogonal zero-mean Rademacher
    * patterns (bits of i) along dims 0/1/2 at well-separated
    * amplitudes, so the true covariance is diag(.25, .04, .0025, 0…)
    * and 20 power iterations converge hard. */
  private def planted(n: Int = 64, d: Int = 8) = {
    (0 until n).map { i =>
      def s(b: Int) = if ((i & b) != 0) 1.0 else -1.0
      val v = Array.fill(d)(0.0)
      v(0) = 0.5 * s(1); v(1) = 0.2 * s(2); v(2) = 0.05 * s(4)
      (i.toLong, v.toSeq)
    }.toDF("id", "v")
  }

  test("eigenExact: planted-axis recovery, orthogonality, partition " +
      "invariance, float-path agreement") {
    val df = planted()
    val m = Pca.eigenExact(df, "v", k = 3, iters = 20)
    assert(m.n == 64 && m.d == 8)
    def unit(v: Array[BigInt]): Array[Double] = {
      val dv = v.map(_.toDouble)
      val nrm = math.sqrt(dv.map(x => x * x).sum)
      dv.map(_ / nrm)
    }
    val us = m.comps.map(unit)
    // each recovered component is its planted axis (up to 1e-5-scale
    // fixed-point truncation)
    (0 until 3).foreach(c =>
      assert(math.abs(us(c)(c)) > 0.999,
        s"component $c not on planted axis: ${us(c).toSeq}"))
    // pairwise near-orthogonality (deflation + truncation)
    for (a <- 0 until 3; b <- (a + 1) until 3) {
      val cos = us(a).zip(us(b)).map { case (x, y) => x * y }.sum
      assert(math.abs(cos) < 0.01, s"components $a,$b not orthogonal: $cos")
    }
    // exact model is partition-order invariant
    val m17 = Pca.eigenExact(df.repartition(17), "v", k = 3, iters = 20)
    assert(m17.comps.map(_.toSeq).toSeq == m.comps.map(_.toSeq).toSeq &&
      m17.nums.toSeq == m.nums.toSeq && m17.d1 == m.d1,
      "eigenExact is partition-order dependent")
    // the float Jacobi path spans the same directions
    val fm = Pca.fit(df, "v", dim = 8, k = 3)
    (0 until 3).foreach { c =>
      val cos = us(c).zip(fm.components(c)).map { case (x, y) => x * y }.sum
      assert(math.abs(cos) > 0.999, s"float/exact disagree on $c: $cos")
    }
  }

  /** Pure-driver BigInt replica of the eigenExact contract — the
    * same math the DuckDB oracle replays as chained HUGEINT CTEs. */
  private def eigenReplica(vecs: Seq[Seq[Double]], k: Int, iters: Int)
      : (Long, BigInt, Seq[Seq[BigInt]], Seq[BigInt]) = {
    val q = vecs.map(_.map(x => BigInt(math.floor(x * 1e6 + 0.5).toLong)))
    val d = q.head.size
    val n = BigInt(q.size)
    val sq = (0 until d).map(i => q.map(_(i)).sum)
    val a = Array.tabulate(d, d)((i, j) =>
      n * q.map(v => v(i) * v(j)).sum - sq(i) * sq(j))
    val sm = BigInt("1000000000000"); val sv = BigInt(100000)
    val d1 = BigInt(1).max(a.flatten.map(_.abs).max / sm)
    val b1 = a.map(_.map(_ / d1))
    var b = b1
    val comps = Array.ofDim[Seq[BigInt]](k)
    val nums = Array.ofDim[BigInt](k)
    (0 until k).foreach { c =>
      var v: Seq[BigInt] = Seq.fill(d)(sv)
      var dead = false
      (1 to iters).foreach { _ =>
        if (!dead) {
          val w = (0 until d).map(i =>
            (0 until d).map(j => b(i)(j) * v(j)).sum)
          val m = w.map(_.abs).max
          if (m == 0) dead = true else v = w.map(_ * sv / m)
        }
      }
      if (dead) v = Seq.fill(d)(BigInt(0))
      val lead = v.zipWithIndex.maxBy { case (x, i) => (x.abs, BigInt(-i)) }._1
      if (lead < 0) v = v.map(-_)
      def quad(m: Array[Array[BigInt]]) = (for {
        i <- 0 until d; j <- 0 until d } yield v(i) * m(i)(j) * v(j)).sum
      comps(c) = v; nums(c) = quad(b1)
      if (c < k - 1) {
        val den = v.map(x => x * x).sum
        val numB = quad(b)
        val m = Array.tabulate(d, d)((i, j) =>
          den * den * b(i)(j) - numB * v(i) * v(j))
        val dm = BigInt(1).max(m.flatten.map(_.abs).max / sm)
        b = m.map(_.map(_ / dm))
      }
    }
    (q.size.toLong, d1, comps.toSeq, nums.toSeq)
  }

  test("eigenExact + whitenExact: property — seeded random corpora " +
      "match the sequential BigInt replica at every output value") {
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(7919 * (seed + 1))
      val n = 24 + rnd.nextInt(20); val d = 5 + rnd.nextInt(4)
      val vecs = Seq.fill(n)(Seq.fill(d)(
        BigDecimal((rnd.nextDouble() - 0.5) * 4)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val m = Pca.eigenExact(df, "v", k = 3, iters = 10)
      val (rn, rd1, rcomps, rnums) = eigenReplica(vecs, 3, 10)
      assert(m.n == rn && m.d1 == rd1, s"seed $seed scalars")
      assert(m.comps.map(_.toSeq).toSeq == rcomps, s"seed $seed comps")
      assert(m.nums.toSeq == rnums, s"seed $seed rayleighs")
      // whitened scores: replica computes the identical float chain
      val nD = rn.toDouble
      val sq = (0 until d).map(i => vecs.map(v =>
        math.floor(v(i) * 1e6 + 0.5).toLong).map(BigInt(_)).sum)
      val got = Pca.whitenExact(df, "id", "v", m).collect()
        .map(r => r.getLong(0) -> (1 to 3).map(r.getDouble)).toMap
      vecs.zipWithIndex.foreach { case (v, id) =>
        val qv = v.map(x => BigInt(math.floor(x * 1e6 + 0.5).toLong))
        val zs = (0 until 3).map { c =>
          if (rnums(c).signum <= 0) 0.0
          else {
            val kC = (0 until d).map(i => sq(i) * rcomps(c)(i)).sum
            val cs = BigInt(rn) * (0 until d).map(i =>
              qv(i) * rcomps(c)(i)).sum - kC
            val denom = math.sqrt(
              rnums(c).toDouble * rd1.toDouble * nD / (nD - 1.0))
            val z = cs.toDouble / denom
            BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP)
              .toDouble
          }
        }
        zs.zip(got(id.toLong)).zipWithIndex.foreach { case ((e, g), c) =>
          assert(math.abs(e - g) < 2e-6,
            s"seed $seed id $id z${c + 1}: replica $e vs operator $g")
        }
      }
    }
  }

  test("QuantizedDot kernel: equals the HOF quantize+dot formulation " +
      "on double AND float arrays; wild coordinates refused") {
    val w = Seq(100000.0, -25000.0, 3.0)
    val rnd = new scala.util.Random(31)
    val vecs = Seq.fill(50)(Seq.fill(3)((rnd.nextDouble() - 0.5) * 19))
    val dDf = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      .toDF("id", "v")
    val fDf = vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat)) }.toDF("id", "v")
    def hof = org.apache.spark.sql.functions.transform(col("v"),
      x => floor(x.cast("double") * lit(1e6) + lit(0.5)))
    Seq(dDf, fDf).foreach { df =>
      val got = df.select(col("id"), graft.functions.ArrayDot
          .quantized_dot(col("v"), w).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      // float inputs promote per element BEFORE quantizing — the
      // kernel must match the HOF chain on the same column exactly
      val exp = df.select(col("id"), graft.operators.Similarity.dot(
          hof.cast("array<double>"), typedLit(w)).as("d"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      exp.foreach { case (id, e) =>
        assert(got(id) == e, s"id $id: kernel ${got(id)} vs HOF $e")
      }
    }
    val wild = Seq((1L, Seq(0.1, 11.0, 0.2))).toDF("id", "v")
    val e = intercept[Exception] {
      wild.select(graft.functions.ArrayDot.quantized_dot(col("v"), w))
        .collect()
    }
    assert(e.getMessage.contains("fixed-point"), e.getMessage)
  }

  test("eigenExactCached: durable artifact round-trips the model " +
      "bit-for-bit") {
    val e = emb
    val live = Pca.eigenExact(e, "embedding", k = 3, iters = 8)
    val cached = Pca.eigenExactCached(e, "embedding", k = 3, iters = 8,
      cacheKey = "/root/testdata/sf0.001")
    assert(cached.n == live.n && cached.d == live.d &&
      cached.d1 == live.d1 && cached.sq.toSeq == live.sq.toSeq)
    assert(cached.comps.map(_.toSeq).toSeq == live.comps.map(_.toSeq).toSeq)
    assert(cached.nums.toSeq == live.nums.toSeq &&
      cached.dens.toSeq == live.dens.toSeq)
  }

  test("whitenExact: unit variance per component, zero mean, " +
      "null-vector drop, degenerate spectrum -> 0.0") {
    val df = planted()
    val m = Pca.eigenExact(df, "v", k = 3, iters = 20)
    val z = Pca.whitenExact(df, "id", "v", m).collect()
    assert(z.length == 64)
    (1 to 3).foreach { c =>
      val xs = z.map(_.getDouble(c))
      val mean = xs.sum / xs.length
      val varS = xs.map(x => (x - mean) * (x - mean)).sum / (xs.length - 1)
      assert(math.abs(mean) < 1e-4, s"z$c mean $mean")
      assert(math.abs(varS - 1.0) < 0.01, s"z$c sample variance $varS")
    }
    // null vectors are dropped, and the model ignores them upstream
    val withNull = df.unionByName(
      Seq((999L, null.asInstanceOf[Seq[Double]])).toDF("id", "v")
        .select(col("id"), col("v").cast(df.schema("v").dataType)))
    val z2 = Pca.whitenExact(withNull, "id", "v", m).collect()
    assert(z2.length == 64 && !z2.map(_.getLong(0)).contains(999L))
    // constant corpus: zero scatter, degenerate spectrum, all z = 0.0
    val const = (0 until 8).map(i => (i.toLong, Seq(1.0, 2.0, 3.0)))
      .toDF("id", "v")
    val mc = Pca.eigenExact(const, "v", k = 2, iters = 5)
    assert(mc.comps.forall(_.forall(_ == 0)))
    val zc = Pca.whitenExact(const, "id", "v", mc).collect()
    assert(zc.forall(r => r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0))
    // refusals: |x| >= 10, ragged dims, n < 2
    val big = Seq((1L, Seq(0.1, 11.0)), (2L, Seq(0.2, 0.3)))
      .toDF("id", "v")
    val e1 = intercept[Exception] { Pca.eigenExact(big, "v", k = 1) }
    assert(e1.getMessage.contains("fixed-point"), e1.getMessage)
    val ragged = Seq((1L, Seq(0.1)), (2L, Seq(0.2, 0.3))).toDF("id", "v")
    val e2 = intercept[Exception] { Pca.eigenExact(ragged, "v", k = 1) }
    assert(e2.getMessage.contains("mixed dimensions"), e2.getMessage)
    val single = Seq((1L, Seq(0.1, 0.2))).toDF("id", "v")
    val e3 = intercept[Exception] { Pca.eigenExact(single, "v", k = 1) }
    assert(e3.getMessage.contains(">= 2 usable vectors"), e3.getMessage)
  }
}
