package graft

import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("hardNegatives equals the window (row_number) formulation") {
    // the bounded-heap partial aggregate claims exact parity with the
    // canonical window top-k — pin it on the real embeddings table,
    // including rounded-score ties (round(...,4) manufactures them)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        col("vec_id") < 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4))).toSet

    val q = emb.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      col("label").as("ql")).filter(col("q_id") < 20)
    val scored = emb.join(q, col("label") =!= col("ql"))
      .select(col("q_id"),
        col("vec_id").as("n_id"), col("label").as("n_label"),
        round(Similarity.cosine(col("embedding"), col("qv")), 4).as("cos_sim"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("n_id"))
    val want = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("int"), col("n_id"),
        col("n_label"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4))).toSet

    assert(got == want && got.nonEmpty)
    // the mined set is label-disjoint from its query by construction
    val labels = emb.collect().map(r =>
      r.getLong(0) -> r.getInt(2)).toMap
    got.foreach { case (qid, _, nid, nlabel, _) =>
      assert(nid != qid, "self pair leaked")
      assert(labels(nid) == nlabel && nlabel != labels(qid),
        s"same-label negative leaked: q=$qid n=$nid")
    }
  }

  test("TopKByScore: partial/final merge and NaN ordering are exact") {
    // 40 groups x 500 candidates over 16 partitions: every merge path
    // runs. Scores collide on purpose (i % 7) so the id tie-break is
    // load-bearing; group 0 gets NaN scores which must rank LAST and
    // never displace real candidates.
    val rows = (0 until 40).flatMap { g =>
      (0 until 500).map { i =>
        val s = if (g == 0 && i < 450) Double.NaN else (i % 7).toDouble
        (g.toLong, s, (i * 13 % 500).toLong)
      }
    }
    val df = rows.toDF("g", "score", "id").repartition(16)
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKByScore(10))
    val got = df
      .groupBy("g").agg(topk(col("score"), col("id"), lit(0L)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("g"), col("pos"), col("n.score"), col("n.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))

    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(t => (t._2, t._3))
        .sortWith { (a, b) =>
          if (a._1.isNaN && b._1.isNaN) a._2 < b._2
          else if (a._1.isNaN) false
          else if (b._1.isNaN) true
          else if (a._1 != b._1) a._1 > b._1
          else a._2 < b._2
        }
        .take(10).zipWithIndex
        .map { case ((s, id), i) => (g, i, s, id) }
    }.toSet
    assert(got.toSet == want)
    // group 0 has only 50 real-scored candidates; NaNs must not appear
    // before real scores in its top-10
    val g0 = got.filter(_._1 == 0L).sortBy(_._2)
    assert(g0.length == 10 && g0.forall(!_._3.isNaN))
  }

  test("hardNegatives plans as a partial/final aggregate (map-side combine)") {
    // the operator's scale claim is that each map task reduces its
    // corpus slice to <= k candidates per query BEFORE the shuffle —
    // i.e. the physical plan carries a partial-mode TopKByScore below
    // the exchange and a final above it, exactly like a sum. Pin it so
    // a refactor to a window (full scored-stream shuffle) fails here.
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        col("vec_id") < 20, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_topkbyscore"),
      s"expected a partial-mode TopKByScore below the exchange:\n$plan")
    assert(!plan.contains("Window"),
      "hardNegatives must not degrade to a window over the scored stream")
  }

  test("klDriftMatrix equals the definitional full-vocabulary KL") {
    // the operator computes KL through the telescoped per-source /
    // shared-token decomposition (one join for all pairs); pin it
    // against the definition — an explicit sum over the ENTIRE union
    // vocabulary per pair — on a corpus with every support pattern:
    // shared tokens, a-only, b-only, and neither-side tokens
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a", "the cat sat on the mat"),
      (2L, "a", "the dog ate the bone"),
      (3L, "b", "quantum flux capacitor engaged"),
      (4L, "b", "the flux of the capacitor"),
      (5L, "c", "the cat sat on the mat")).toDF("doc_id", "source", "text")
    val got = TextAnalysis.klDriftMatrix(docs, "source", "text").collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap

    val bySrc: Map[String, Map[String, Long]] = Seq(
      "a" -> "the cat sat on the mat the dog ate the bone",
      "b" -> "quantum flux capacitor engaged the flux of the capacitor",
      "c" -> "the cat sat on the mat").toMap
      .view.mapValues(_.split("\\s+").groupBy(identity)
        .view.mapValues(_.length.toLong).toMap).toMap
    val vocab = bySrc.values.flatMap(_.keys).toSet
    val v = vocab.size.toDouble
    def p(src: String, t: String): Double = {
      val cs = bySrc(src)
      (cs.getOrElse(t, 0L) + 1.0) / (cs.values.sum + v)
    }
    val want = (for {
      a <- bySrc.keys; b <- bySrc.keys if a != b
    } yield (a, b) -> vocab.toSeq.map { t =>
      p(a, t) * math.log(p(a, t) / p(b, t))
    }.sum).toMap

    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (k, kl) =>
      assert(math.abs(kl - want(k)) <= 1.1e-4, s"$k: got $kl want ${want(k)}")
      assert(kl >= 0.0, s"KL must be non-negative, got $kl for $k")
    }
    // drift is asymmetric and discriminative: the near-identical pair
    // (c is a subset of a's language) diverges far less than the
    // disjoint-topic pair
    assert(got(("c", "a")) < got(("b", "a")))
  }

  test("nbClassifier matches the hand-computed closed form") {
    import graft.operators.TextAnalysis
    val seed = Seq(
      (1L, "good nice good", true),
      (2L, "nice fine good", true),
      (3L, "bad awful bad", false),
      (4L, "awful bad poor", false)).toDF("doc_id", "text", "y")
    val corpus = Seq(
      (10L, "good nice"),
      (11L, "bad poor"),
      (12L, "unseen words only"),
      (13L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.nbClassifier(seed, corpus, "doc_id", "text", "y")
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap

    val pos = Map("good" -> 3.0, "nice" -> 2.0, "fine" -> 1.0)
    val neg = Map("bad" -> 3.0, "awful" -> 2.0, "poor" -> 1.0)
    val v = (pos.keySet ++ neg.keySet).size.toDouble // 6
    val (np, nn) = (pos.values.sum, neg.values.sum)
    def w(t: String) = math.log((pos.getOrElse(t, 0.0) + 1) / (np + v)) -
      math.log((neg.getOrElse(t, 0.0) + 1) / (nn + v))
    val oov = math.log(1.0 / (np + v)) - math.log(1.0 / (nn + v))
    def expect(toks: Seq[String]) = BigDecimal(
      toks.map(t => if (pos.contains(t) || neg.contains(t)) w(t) else oov).sum
        + (math.log(2.0) - math.log(2.0)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(10L)._1 - expect(Seq("good", "nice"))) <= 1.1e-4)
    assert(got(10L)._2)
    assert(math.abs(got(11L)._1 - expect(Seq("bad", "poor"))) <= 1.1e-4)
    assert(!got(11L)._2)
    // all-OOV doc: every token carries the constant smoothed weight
    assert(math.abs(got(12L)._1 - expect(Seq("x", "y", "z"))) <= 1.1e-4)
    // zero-token doc scores exactly at the (here balanced → 0) prior
    assert(got(13L)._1 == 0.0 && !got(13L)._2)
  }

  test("nbClassifier generalizes to a held-out split of a separable corpus") {
    // NB must LEARN, not memorize: train on 4/5 of a deterministic
    // two-dialect corpus (each class draws 70% from its own vocabulary,
    // 30% from the other's), assert >= 0.95 accuracy on the UNSEEN
    // fifth. (The lake's synthetic `documents` table shares one
    // vocabulary across its lang values — labels there are independent
    // of the text, so qAO's real-corpus value is verified by ORACLE
    // PARITY, and the learning behavior is verified here.)
    import graft.operators.TextAnalysis
    val posV = Array("alpha", "beta", "gamma", "delta", "epsilon")
    val negV = Array("omega", "psi", "chi", "phi", "upsilon")
    val docs = (0L until 400L).map { i =>
      val own = if (i % 2 == 0) posV else negV
      val other = if (i % 2 == 0) negV else posV
      val words = (0 until 20).map { j =>
        val r = (i * 31 + j * 7) % 10 // deterministic 70/30 mixture
        if (r < 7) own(((i + j) % 5).toInt) else other(((i * 3 + j) % 5).toInt)
      }
      (i, words.mkString(" "), i % 2 == 0)
    }.toDF("doc_id", "text", "y")
    val scored = TextAnalysis.nbClassifier(
      docs.filter(col("doc_id") % 5 =!= 0), docs, "doc_id", "text", "y")
    val eval = scored.join(docs.select("doc_id", "y"), "doc_id")
      .filter(col("doc_id") % 5 === 0) // held-out fifth only
      .select((col("pred") === col("y")).cast("int").as("ok"))
      .agg(avg("ok")).head.getDouble(0)
    assert(eval >= 0.95, s"held-out accuracy $eval on a 70/30-separable " +
      "two-dialect corpus — the classifier failed to learn")
  }

  test("boilerplateStrip deletes ALL occurrences of group-frequent chunks") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "s1", "cookie banner alpha beta"),
      (2L, "s1", "cookie banner gamma delta"),
      (3L, "s1", "cookie banner epsilon zeta"),
      (4L, "s2", "cookie banner eta theta"), // same chunk, other group: kept
      (5L, "s1", "unique text here entirely")
    ).toDF("doc_id", "source", "text")
    val out = Dedup.boilerplateStrip(docs, "doc_id", "text", "source",
        w = 2, minDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out === Array(
      (1L, 2L, 1L, "alpha beta"),
      (2L, 2L, 1L, "gamma delta"),
      (3L, 2L, 1L, "epsilon zeta"),
      (4L, 2L, 0L, "cookie banner eta theta"),
      (5L, 2L, 0L, "unique text here entirely")))
  }

  test("boilerplateStrip equals brute force on a random grouped corpus") {
    import graft.operators.Dedup
    val rnd = new scala.util.Random(41)
    val vocabW = Vector("aa", "bb", "cc", "dd", "ee")
    val corpus = (0 until 80).map { i =>
      val words = (0 until 4 + rnd.nextInt(6)).map(_ => vocabW(rnd.nextInt(vocabW.length)))
      (i.toLong, s"g${i % 3}", words.mkString(" "))
    }
    val w = 2; val minDocs = 3
    def chunksOf(t: String): Vector[String] =
      t.split("\\s+").filter(_.nonEmpty).grouped(w).map(_.mkString(" ")).toVector
    val byGroup = corpus.groupBy(_._2)
    // NOTE .toSeq: flatMap on a Map yielding pairs would re-collect into
    // a Map and silently keep ONE chunk per group
    val boiler: Set[(String, String)] = byGroup.toSeq.flatMap { case (g, ds) =>
      ds.flatMap(d => chunksOf(d._3).distinct.map(c => (c, d._1)))
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= minDocs)
        .keys.map(c => (g, c))
    }.toSet
    val want = corpus.map { case (id, g, t) =>
      val ch = chunksOf(t)
      val kept = ch.filterNot(c => boiler((g, c)))
      (id, ch.size.toLong, (ch.size - kept.size).toLong, kept.mkString(" "))
    }.toArray
    val got = Dedup.boilerplateStrip(corpus.toDF("doc_id", "source", "text"),
        "doc_id", "text", "source", w, minDocs)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(want.exists(_._3 > 0L), "degenerate fixture: no boilerplate planted")
    assert(got === want)
  }

  test("qB3/qB4 plans: equi-joins and hash aggregates only — no windows, no products") {
    import graft.operators.Dedup
    val docs = Seq((1L, "s1", "a b c d"), (2L, "s1", "a b e f"))
      .toDF("doc_id", "source", "text")
    val bpPlan = Dedup.boilerplateStrip(docs, "doc_id", "text", "source", 2, 2)
      .queryExecution.executedPlan.toString
    val edPlan = Dedup.editDistancePairs(
        docs.select(explode(split(col("text"), " ")).as("w")), "w", 2)
      .queryExecution.executedPlan.toString
    Seq("boilerplateStrip" -> bpPlan, "editDistancePairs" -> edPlan)
      .foreach { case (n, p) =>
        // the scale claims: census/candidates are hash-agg + equi-join
        // shaped; an all-pairs product or a global window would be the
        // anti-pattern both operators exist to avoid
        assert(!p.contains("CartesianProduct"), s"$n plans a product:\n$p")
        assert(!p.contains("BroadcastNestedLoopJoin"), s"$n theta-joins:\n$p")
        assert(!p.contains("Window"), s"$n plans a Window:\n$p")
        assert(p.contains("HashAggregate"), s"$n lost hash aggregation:\n$p")
      }
  }

  test("tieredDownsample: raw passthrough above cutoff, hourly rollups below") {
    import graft.operators.Retention
    val H = 3600L * 1000 * 1000 * 1000
    val ev = Seq(
      ("a", 0L, 1.0), ("a", H / 2, 3.0), // cold, same bucket → one rollup row
      ("b", H, 5.0),                     // cold, own bucket
      ("a", 10 * H + 7L, 9.0)            // hot → raw, ts preserved exactly
    ).toDF("event_type", "ts", "value")
    val out = Retention.tieredDownsample(ev, "ts", Seq("event_type"), "value",
        cutoffNs = 10 * H, bucketNs = H)
      .orderBy("tier", "event_type", "bucket_ns").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getString(6)))
    assert(out === Array(
      ("a", 10 * H + 7L, 1L, 9.0, 9.0, 9.0, "raw"),
      ("a", 0L, 2L, 2.0, 1.0, 3.0, "rollup"),
      ("b", H, 1L, 5.0, 5.0, 5.0, "rollup")))
  }

  test("tieredDownsample refuses pre-epoch timestamps loudly") {
    import graft.operators.Retention
    // pmod floors where SQL % truncates — negative ts would bucket
    // differently per engine, so the rollup tier trips a named error
    // instead of silently diverging from the oracle
    val ev = Seq(("a", -5L, 1.0), ("a", 100L, 2.0)).toDF("event_type", "ts", "value")
    val ex = intercept[Exception] {
      Retention.tieredDownsample(ev, "ts", Seq("event_type"), "value",
        cutoffNs = 50L, bucketNs = 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("pre-epoch")))
    intercept[IllegalArgumentException] {
      Retention.tieredDownsample(ev, "ts", Seq("event_type"), "value",
        cutoffNs = -1L, bucketNs = 10L)
    }
  }

  test("editDistancePairs equals brute force at d=1 and d=2") {
    import graft.operators.Dedup
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(7)
    val words = (1 to 150).map(_ =>
      (1 to (1 + rnd.nextInt(5))).map(_ => ('a' + rnd.nextInt(2)).toChar).mkString)
    val df = words.toDF("w")
    val counts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (d <- Seq(1, 2)) {
      val got = Dedup.editDistancePairs(df, "w", d).collect()
        .map(r => (r.getString(0), r.getString(1), r.getInt(2),
          r.getLong(3), r.getLong(4))).toSet
      val vocab = words.distinct
      val want = (for {
        a <- vocab; b <- vocab
        if a < b
        dist = lev(a, b) if dist <= d
      } yield (a, b, dist, counts(a), counts(b))).toSet
      assert(want.nonEmpty, s"degenerate fixture at d=$d")
      assert(got == want, s"SymSpell candidates incomplete or unsound at d=$d")
    }
  }
}
