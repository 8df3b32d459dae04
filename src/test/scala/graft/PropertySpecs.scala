package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests promised in SURVEY.md §5: time-literal parsing is a
  * left inverse of formatting, and the JSON encoder preserves int64.
  * (Hand-rolled sampling: the scalatestplus bridge isn't among the
  * resolvable offline deps; Gen + fixed seeds keep runs deterministic.) */
class PropertySpecs extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 200): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  // epoch-ns values within a sane range (1970..2200, positive)
  private val nsGen: Gen[Long] = Gen.choose(0L, 7258118400000000000L)

  test("parseTimeLiteral ∘ RFC3339Nano format = identity") {
    samples(nsGen).foreach { ns =>
      val inst = java.time.Instant.ofEpochSecond(ns / 1000000000L, ns % 1000000000L)
      val formatted = java.time.format.DateTimeFormatter.ISO_INSTANT.format(inst)
      assert(TimeRangeExtract.parseTimeLiteral(formatted).contains(ns),
        s"failed for $formatted")
    }
  }

  test("parseTimeLiteral handles naive (UTC-assumed) second-precision forms") {
    samples(Gen.choose(0L, 7258118400L)).foreach { s =>
      val inst = java.time.Instant.ofEpochSecond(s)
      val naive = java.time.LocalDateTime.ofInstant(inst, java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss"))
      assert(TimeRangeExtract.parseTimeLiteral(naive).contains(s * 1000000000L))
      assert(TimeRangeExtract.parseTimeLiteral(naive.replace('T', ' '))
        .contains(s * 1000000000L))
    }
  }

  test("JSON encoder renders any int64 as its exact decimal string") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    val xs = samples(Gen.choose(Long.MinValue + 1, Long.MaxValue), 50)
    val json = encoders.ResultEncoder.toJsonString(xs.toDF("v"))
    xs.foreach(x => assert(json.contains("\"v\":\"" + x + "\"")))
  }

  test("spanDedup conserves tokens: n_tokens − n_removed = |tokens(clean)|") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // random corpora over a 6-word vocabulary: dense duplication, so
    // overlapping spans, boundary overlaps, and full-doc excision all
    // occur; the conservation law must hold for every doc regardless
    val vocab = Vector("a", "b", "c", "d", "e", "f")
    val docGen = Gen.chooseNum(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    (0 until 5).foreach { round =>
      val texts = samples(docGen, 40)
      val corpus = texts.zipWithIndex
        .map { case (t, i) => (i.toLong + 100L * round, t) }.toDF("doc_id", "text")
      val out = graft.operators.Dedup.spanDedup(corpus, "doc_id", "text", w = 3)
        .withColumn("clean_n",
          when(col("clean_text") === "", lit(0))
            .otherwise(size(split(col("clean_text"), " "))))
      val bad = out.filter(col("n_tokens") - col("n_removed") =!= col("clean_n"))
      assert(bad.count() == 0, bad.collect().take(3).mkString("; "))
    }
  }

  test("winnowing guarantee holds on random corpora with planted runs") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    // random noise docs over a large vocabulary + a shared run of
    // exactly w+k-1 = 6 tokens planted at random offsets in two of
    // them: the SIGMOD-03 guarantee says those two MUST share a
    // fingerprint, while the noise pairs (distinct vocab slices per
    // doc) must not
    val runGen = for {
      runWords <- Gen.listOfN(6, Gen.choose(0, 999).map(i => s"r$i"))
      offA <- Gen.choose(0, 10); offB <- Gen.choose(0, 10)
      padA <- Gen.listOfN(offA + 8, Gen.choose(0, 999).map(i => s"a$i"))
      padB <- Gen.listOfN(offB + 8, Gen.choose(0, 999).map(i => s"b$i"))
    } yield {
      val run = runWords.mkString(" ")
      val (pa1, pa2) = padA.splitAt(offA)
      val (pb1, pb2) = padB.splitAt(offB)
      (s"${pa1.mkString(" ")} $run ${pa2.mkString(" ")}".trim,
        s"${pb1.mkString(" ")} $run ${pb2.mkString(" ")}".trim)
    }
    samples(runGen, 25).zipWithIndex.foreach { case ((ta, tb), i) =>
      val docs = Seq((1L, ta), (2L, tb)).toDF("doc_id", "text")
      val byDoc = graft.operators.TextAnalysis
        .winnowFingerprints(docs, "doc_id", "text", k = 3, w = 4)
        .collect().groupBy(_.getLong(0))
        .map { case (d, rs) => d -> rs.map(_.getLong(2)).toSet }
      assert((byDoc(1L) & byDoc(2L)).nonEmpty,
        s"case $i: planted 6-token run shared no fingerprint\nA=$ta\nB=$tb")
    }
  }

  test("containmentPairs equals brute force on dense random corpora") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // tiny vocabulary => heavy shingle collisions, subsets, and exact
    // duplicates; the prefix-filtered join must still be EXACT
    val vocab = Vector("x", "y", "z", "w")
    val docGen = Gen.chooseNum(3, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
    (0 until 3).foreach { round =>
      val corpus = samples(docGen, 30).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.operators.Dedup
        .containmentPairs(corpus, "doc_id", "text", 3, 0.7)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
        .toMap
      val sets = corpus.select(col("doc_id"),
          graft.functions.ShingleExprs.shingle_hashes(col("text"), 3).as("h"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
        .filter(_._2.nonEmpty)
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        c = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
        if c >= 0.7
      } yield (a, b) -> c).toMap
      assert(got == want, s"round $round: missing ${(want.keySet -- got.keySet).take(3)}, " +
        s"extra ${(got.keySet -- want.keySet).take(3)}")
    }
  }

  test("weightedPrioritySample: k = n returns everything; heavy row dominates") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import graft.operators.Sampling
    val rows = (1L to 12L).map(i => (i, if (i == 7L) 100000L else 1L))
    val df = rows.toDF("id", "w")
    // k = n: the sample is the whole population, weights notwithstanding
    val all = Sampling.weightedPrioritySample(df, "id", "w", 12)
      .collect().map(_.getLong(0)).toSet
    assert(all == rows.map(_._1).toSet)
    // a row carrying ~10^5× the weight must appear in (nearly) every
    // 1-row draw across independent salts
    val hits = (0 until 25).count { s =>
      Sampling.weightedPrioritySample(df, "id", "w", 1, salt = s"s$s")
        .head.getLong(0) == 7L
    }
    assert(hits >= 23, s"heavy row drawn $hits/25 times")
  }

  test("widen is commutative and idempotent with absorbing supertypes") {
    import org.apache.spark.sql.types._
    val types = Seq(ByteType, ShortType, IntegerType, LongType, FloatType,
      DoubleType, StringType)
    for (a <- types; b <- types) {
      assert(Tables.widen(a, b) == Tables.widen(b, a))
      assert(Tables.widen(a, a) == a)
      val w = Tables.widen(a, b)
      assert(Tables.widen(w, a) == w && Tables.widen(w, b) == w)
    }
  }

  test("TopKByScore: any reduce/merge interleaving equals global sort-take") {
    // the aggregator's distributed contract: whatever order rows arrive
    // and however partial buffers merge, the result is the k best by
    // (score desc, id asc). Random inputs (duplicate scores AND ids,
    // k larger/smaller than the input) exercised through random
    // partition splits + pairwise buffer merges, against sort-take.
    val agg = new graft.functions.TopKByScore(8)
    import graft.functions.TopKByScore.In
    val rowGen = for {
      score <- Gen.oneOf(Gen.choose(-5, 5).map(_.toDouble),
        Gen.const(Double.NaN))
      id <- Gen.choose(0L, 30L)
    } yield In(score, id, 0L)
    val caseGen = for {
      n <- Gen.choose(0, 60)
      rows <- Gen.listOfN(n, rowGen)
      nSplits <- Gen.choose(1, 6)
    } yield (rows, nSplits)
    samples(caseGen, 300).foreach { case (rows, nSplits) =>
      val parts = rows.grouped(math.max(1, rows.size / nSplits)).toSeq
      val merged = parts
        .map(p => p.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
      val want = rows.sortWith { (a, b) =>
        if (a.score.isNaN && b.score.isNaN) a.id < b.id
        else if (a.score.isNaN) false
        else if (b.score.isNaN) true
        else if (a.score != b.score) a.score > b.score
        else a.id < b.id
      }.take(8)
      // NaN != NaN breaks == on In; compare via bit patterns
      def key(in: In) = (java.lang.Double.doubleToLongBits(in.score), in.id)
      assert(agg.finish(merged).map(key) == want.map(key),
        s"rows=$rows splits=$nSplits")
    }
  }

  test("klDriftMatrix telescoping holds on random corpora") {
    // the operator's one-join decomposition must equal the definitional
    // full-vocabulary sum for ANY support pattern — random corpora
    // manufacture disjoint, nested and partially-overlapping supports,
    // plus empty docs and single-source degeneracies
    val spark = GraftTestSession.spark
    import spark.implicits._
    import graft.operators.TextAnalysis
    val vocabPool = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh")
    val docGen = for {
      src <- Gen.oneOf("s1", "s2", "s3")
      n <- Gen.choose(0, 12)
      toks <- Gen.listOfN(n, Gen.oneOf(vocabPool))
    } yield (src, toks.mkString(" "))
    val corpusGen = Gen.choose(4, 14).flatMap(Gen.listOfN(_, docGen))
    samples(corpusGen, 25).foreach { corpus =>
      val df = corpus.zipWithIndex
        .map { case ((s, t), i) => (i.toLong, s, t) }
        .toDF("doc_id", "source", "text")
      val counts: Map[String, Map[String, Long]] = corpus
        .groupBy(_._1).view.mapValues(_.flatMap(_._2.split("\\s+"))
          .filter(_.nonEmpty).groupBy(identity)
          .view.mapValues(_.length.toLong).toMap).toMap
      val vocab = counts.values.flatMap(_.keys).toSet
      if (vocab.nonEmpty && counts.size >= 2) {
        val got = TextAnalysis.klDriftMatrix(df, "source", "text").collect()
          .map(r => ((r.getString(0), r.getString(1)), r.getDouble(2))).toMap
        def p(s: String, t: String) =
          (counts(s).getOrElse(t, 0L) + 1.0) / (counts(s).values.sum + vocab.size)
        val srcs = counts.keys.toSeq
        for (a <- srcs; b <- srcs if a != b) {
          val want = vocab.toSeq.map(t => p(a, t) * math.log(p(a, t) / p(b, t))).sum
          assert(math.abs(got((a, b)) - want) <= 1.1e-4,
            s"($a,$b): got ${got((a, b))} want $want in $corpus")
        }
      }
    }
  }

  test("nbClassifier equals the definitional closed form on random corpora") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import graft.operators.TextAnalysis
    val vocabPool = Vector("p1", "p2", "p3", "n1", "n2", "n3", "x1", "x2")
    val docGen = for {
      y <- Gen.oneOf(true, false)
      n <- Gen.choose(0, 10)
      toks <- Gen.listOfN(n, Gen.oneOf(vocabPool))
    } yield (y, toks.mkString(" "))
    val caseGen = for {
      seedDocs <- Gen.choose(4, 10).flatMap(Gen.listOfN(_, docGen))
      scoreDocs <- Gen.choose(1, 8).flatMap(Gen.listOfN(_, docGen))
    } yield (seedDocs, scoreDocs)
    samples(caseGen, 25).foreach { case (seedDocs, scoreDocs) =>
      val classes = seedDocs.map(_._1).toSet
      val seedTokens = seedDocs.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
      if (classes == Set(true, false) && seedTokens.nonEmpty) {
        val seed = seedDocs.zipWithIndex
          .map { case ((y, t), i) => (i.toLong, t, y) }.toDF("doc_id", "text", "y")
        val corpus = scoreDocs.zipWithIndex
          .map { case ((_, t), i) => (1000L + i, t) }.toDF("doc_id", "text")
        val got = TextAnalysis.nbClassifier(seed, corpus, "doc_id", "text", "y")
          .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

        val byClass = seedDocs.groupBy(_._1).view.mapValues(
          _.flatMap(_._2.split("\\s+")).filter(_.nonEmpty)
            .groupBy(identity).view.mapValues(_.length.toLong).toMap).toMap
        val pos = byClass.getOrElse(true, Map.empty)
        val neg = byClass.getOrElse(false, Map.empty)
        val v = (pos.keySet ++ neg.keySet).size.toDouble
        val (np, nn) = (pos.values.sum.toDouble, neg.values.sum.toDouble)
        def w(t: String) =
          math.log((pos.getOrElse(t, 0L) + 1.0) / (np + v)) -
            math.log((neg.getOrElse(t, 0L) + 1.0) / (nn + v))
        val prior =
          math.log(seedDocs.count(_._1).toDouble) -
            math.log(seedDocs.count(!_._1).toDouble)
        scoreDocs.zipWithIndex.foreach { case ((_, text), i) =>
          val want = text.split("\\s+").filter(_.nonEmpty)
            .map(w).sum + prior
          assert(math.abs(got(1000L + i) - want) <= 1.1e-4,
            s"doc $i '$text': got ${got(1000L + i)} want $want")
        }
      }
    }
  }

  test("SQL pipe syntax resolves to the same plan as the nested form") {
    val spark = GraftTestSession.spark
    Tables.registerAll(spark, "/root/testdata/sf0.001")
    // the qBD claim, pinned structurally: |> chains are parse-level
    // sugar, so the optimized plans must answer sameResult — not just
    // hash-equal output
    val pipe = spark.sql("""
      FROM lineitem
      |> WHERE l_quantity > 10
      |> AGGREGATE sum(l_quantity) AS sum_qty, count(*) AS n
         GROUP BY l_returnflag, l_linestatus
      |> WHERE n > 100
      |> SELECT l_returnflag, l_linestatus, sum_qty, n
      |> ORDER BY l_returnflag, l_linestatus
    """).queryExecution.optimizedPlan
    val plain = spark.sql("""
      SELECT l_returnflag, l_linestatus,
             sum(l_quantity) AS sum_qty, count(*) AS n
      FROM lineitem WHERE l_quantity > 10
      GROUP BY l_returnflag, l_linestatus
      HAVING count(*) > 100
      ORDER BY l_returnflag, l_linestatus
    """).queryExecution.optimizedPlan
    assert(pipe.sameResult(plain),
      s"pipe plan diverged:\n$pipe\nvs\n$plain")
  }

  test("chunkWindows invariants hold on randomized geometries") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    val geoms = samples(Gen.zip(Gen.choose(0, 120), Gen.choose(1, 20),
      Gen.choose(1, 20)), n = 40)
      .map { case (n, w, s) => (n, w, math.min(s, w)) }
    // one frame per distinct doc size; one operator call per geometry
    geoms.distinct.foreach { case (n, width, stride) =>
      val df = Seq((1L, (1 to n).map(i => s"t$i").mkString(" ")))
        .toDF("doc_id", "text")
      val out = graft.operators.Packing
        .chunkWindows(df, "doc_id", "text", width, stride)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1)
      if (n == 0) assert(out.isEmpty)
      else {
        // contract re-derivation: starts on the stride grid while
        // start == 1 or start <= n - width + stride
        val starts = (1 to n by stride)
          .filter(st => st == 1 || st <= n - width + stride)
        assert(out.map(_._2).toSeq == starts.map(_.toLong),
          s"n=$n w=$width s=$stride starts")
        assert(out.map(_._1).toSeq == out.indices.map(_.toLong))
        assert(out.forall { case (_, st, e) =>
          e == math.min(st + width - 1, n) })
        // full coverage, and every kept chunk extends coverage
        assert(out.flatMap(c => c._2 to c._3).toSet == (1 to n).toSet,
          s"n=$n w=$width s=$stride coverage")
        out.sliding(2).foreach {
          case Array(a, b) => assert(b._3 > a._3,
            s"n=$n w=$width s=$stride redundant tail at ${b._1}")
          case _ =>
        }
      }
    }
  }

  test("MisraGries bounds hold on randomized zipfy streams and partitionings") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // zipf-ish streams (value v with weight ~ 1/(v+1)) stress both the
    // heavy head (must survive) and the singleton tail (must evict)
    val streamGen = for {
      n <- Gen.choose(200, 1200)
      vs <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(0, 5)), (3, Gen.choose(6, 40)), (2, Gen.choose(41, 800))))
    } yield vs.map(v => s"v$v")
    samples(Gen.zip(streamGen, Gen.choose(4, 24), Gen.oneOf(1, 5, 17)), n = 25)
      .foreach { case (stream, k, parts) =>
        val truth = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
        val n = stream.size.toLong
        val mg = org.apache.spark.sql.functions.udaf(
          new graft.functions.MisraGries(k),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
        val s = stream.toDF("g").repartition(parts).agg(mg(col("g")))
          .head().getSeq[org.apache.spark.sql.Row](0)
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        assert(s.size <= k, s"k=$k parts=$parts over capacity")
        val bound = n / (k + 1)
        truth.foreach { case (g, c) =>
          if (c > bound)
            assert(s.contains(g), s"k=$k parts=$parts lost heavy '$g' ($c > $bound)")
        }
        s.foreach { case (g, est) =>
          assert(est <= truth(g), s"k=$k parts=$parts overestimated '$g'")
          assert(est >= truth(g) - bound, s"k=$k parts=$parts '$g' under bound")
        }
      }
  }

  test("Aho-Corasick scan equals naive contains on adversarial phrase sets") {
    // small alphabet maximizes overlapping/suffix-sharing matches —
    // the cases where fail-link bugs hide ("aa" inside "aaa", a
    // phrase that is a suffix of another's prefix, etc.)
    val alpha = Seq('a', 'b', ' ')
    val textGen = for {
      n <- Gen.choose(0, 60)
      cs <- Gen.listOfN(n, Gen.oneOf(alpha))
    } yield cs.mkString
    val phraseGen = for {
      n <- Gen.choose(1, 6)
      cs <- Gen.listOfN(n, Gen.oneOf(alpha))
    } yield cs.mkString
    val phraseSetGen = Gen.listOfN(8, phraseGen).map(_.distinct)
    samples(Gen.zip(textGen, phraseSetGen), n = 300).foreach {
      case (text, phrases) if phrases.nonEmpty =>
        val ac = new graft.functions.AhoCorasick.Automaton(phrases.toArray)
        val got = ac.scan(
          org.apache.spark.unsafe.types.UTF8String.fromString(text))
          .toObjectArray(org.apache.spark.sql.types.StringType)
          .map(_.toString).toSeq
        val want = phrases.filter(text.contains(_))
        assert(got == want,
          s"text='$text' phrases=$phrases: got $got want $want")
      case _ => ()
    }
    // fixed sentinels: suffix outputs via fail links (matching "ab"
    // must also report "b"), single char, phrase == text, no match
    val ac = new graft.functions.AhoCorasick.Automaton(
      Array("ab", "b", "abab", "baba"))
    def scan(t: String) = ac.scan(
      org.apache.spark.unsafe.types.UTF8String.fromString(t))
      .toObjectArray(org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
    assert(scan("abab") == Seq("ab", "b", "abab"))
    assert(scan("babab") == Seq("ab", "b", "abab", "baba"))
    assert(scan("aa") == Seq())
    assert(scan("") == Seq())
    // guards: empty list, empty phrase, duplicates refused loudly
    intercept[IllegalArgumentException] {
      graft.functions.MultiPhraseHits(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          org.apache.spark.sql.functions.lit("x")), Seq.empty)
    }
    intercept[IllegalArgumentException] {
      graft.functions.MultiPhraseHits(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          org.apache.spark.sql.functions.lit("x")), Seq("a", ""))
    }
    intercept[IllegalArgumentException] {
      graft.functions.MultiPhraseHits(
        org.apache.spark.sql.graftbridge.ColumnBridge.expression(
          org.apache.spark.sql.functions.lit("x")), Seq("a", "a"))
    }
  }

  test("pruned-exact similarity equals brute force on random geometries") {
    // the pruning bound is a PROOF obligation — one missed pair on any
    // geometry falsifies the operator, so hammer it with corpora the
    // hand-written cases don't cover: uniform, clustered, antipodal
    // (negative cosines), exact duplicates (radius-0 ties at cos 1.0),
    // and a degenerate zero vector (excluded by both paths)
    val spark = GraftTestSession.spark
    import spark.implicits._
    import graft.operators.Similarity
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    def topk(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val rnd = new scala.util.Random(1234)
    val geometries: Seq[(String, Seq[(Long, Seq[Float])])] = Seq(
      "uniform" -> (0 until 60).map(i =>
        (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat))),
      "clustered+dups" -> {
        val base = (0 until 54).map { i =>
          val c = i % 3
          (i.toLong, Array.tabulate(8)(j =>
            (if (j == c * 2) 1.0 else 0.0) + rnd.nextGaussian() * 0.04)
            .map(_.toFloat).toSeq)
        }
        // exact duplicates (cos 1.0 ties) + a zero vector (must stay
        // excluded, matching allPairsAbove/allPairsTopK)
        base ++ Seq((100L, base(0)._2), (101L, base(1)._2),
          (102L, Seq.fill(8)(0.0f)))
      },
      "antipodal" -> (0 until 40).map { i =>
        val sign = if (i % 2 == 0) 1.0 else -1.0
        (i.toLong, Array.tabulate(8)(j =>
          sign * (if (j == 0) 1.0 else 0.0) + rnd.nextGaussian() * 0.05)
          .map(_.toFloat).toSeq)
      })
    for ((name, rows) <- geometries) {
      val emb = rows.toDF("vec_id", "embedding")
      for (minCos <- Seq(-0.5, 0.2, 0.9); nlist <- Seq(2, 5)) {
        val brute = pairs(Similarity.allPairsAbove(
          emb, "vec_id", "embedding", minCos))
        val pruned = pairs(Similarity.exactPairsPruned(
          emb, "vec_id", "embedding", minCos, nlist, iters = 3))
        assert(pruned == brute,
          s"$name minCos=$minCos nlist=$nlist: ${pruned.size} != ${brute.size}")
      }
      for (k <- Seq(7, 5000)) { // 5000 > any pair count: no-bound path
        val brute = topk(Similarity.allPairsTopK(
          emb, "vec_id", "embedding", k))
        val pruned = topk(Similarity.allPairsTopKPruned(
          emb, "vec_id", "embedding", k, nlist = 4, iters = 3))
        assert(pruned == brute, s"$name k=$k: top-k diverged")
      }
    }
  }

  test("waterFillRates invariants hold on random source tables") {
    import graft.operators.Sampling
    val rowsGen = for {
      k <- Gen.choose(1, 12)
      ns <- Gen.listOfN(k, Gen.choose(1.0, 100000.0))
    } yield ns.zipWithIndex.map { case (n, i) => (s"s$i", n) }.toArray
    samples(Gen.zip(rowsGen, Gen.choose(0.0, 1.5),
        Gen.choose(1.0, 500000.0)), n = 200)
      .foreach { case (rows, tau, budget) =>
        val rates = Sampling.waterFillRates(rows, tau, budget).toMap
        val byName = rows.toMap
        assert(rates.keySet == byName.keySet)
        rates.values.foreach(r => assert(r >= 0.0 && r <= 1.0, s"rate $r"))
        // budget conservation: allocated mass = min(budget, total mass)
        val total = rows.map(_._2).sum
        val alloc = rates.map { case (s, r) => r * byName(s) }.sum
        val want = math.min(budget, total)
        assert(math.abs(alloc - want) <= 1e-6 * math.max(1.0, want),
          s"tau=$tau B=$budget: allocated $alloc, want $want")
        // uncapped sources share ONE fill level lambda = t_s / w_s
        val lambdas = rates.collect { case (s, r) if r < 1.0 =>
          r * byName(s) / math.pow(byName(s), tau)
        }
        if (lambdas.nonEmpty) {
          val l0 = lambdas.max
          lambdas.foreach(l => assert(math.abs(l - l0) <= 1e-9 * math.max(1.0, l0),
            s"uncapped sources disagree on lambda: $lambdas"))
        }
      }
  }

  test("luhnValid equals the reference checksum on random digit strings") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    def refLuhn(s: String): Boolean = {
      var sum = 0
      var i = s.length - 1
      var second = false
      while (i >= 0) {
        var d = s.charAt(i) - '0'
        if (second) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        second = !second
        i -= 1
      }
      sum % 10 == 0
    }
    val digits = samples(
      Gen.choose(1, 25).flatMap(n =>
        Gen.listOfN(n, Gen.choose(0, 9)).map(_.mkString)), n = 400)
      .distinct
    val got = digits.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
      .select(col("s"), graft.operators.TextAnalysis.luhnValid(col("s")).as("ok"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    digits.foreach { s =>
      assert(got(s) == refLuhn(s), s"luhn('$s'): got ${got(s)}")
    }
    // the classic valid PANs anchor the reference itself
    assert(refLuhn("4111111111111111") && refLuhn("4222222222222"))
    assert(!refLuhn("4111111111111112"))
  }

  test("lineStats equals a naive recompute on random multi-line docs") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    val lineGen = Gen.frequency(
      (4, Gen.oneOf("alpha beta.", "menu", "hello there!", "Why?", "plain line",
        "quoted\"", "x")),
      (1, Gen.oneOf("", " ", "  \t")))
    val docGen = Gen.choose(0, 8).flatMap(n =>
      Gen.listOfN(n, lineGen).map(_.mkString("\n")))
    val docs = samples(docGen, n = 150).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val got = graft.operators.TextAnalysis.lineStats(
        docs.toDF("doc_id", "text"), "doc_id", "text",
        minTermFrac = 0.5, maxDupFrac = 0.4)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))).toMap
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // the operator's trim is SQL trim: SPACE-ONLY on both engines
    // (a tab-padded line survives as non-empty) — the naive recompute
    // must share that contract, not java.lang.String#trim's <= 0x20
    def sqlTrim(s: String): String =
      s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse
    docs.foreach { case (id, text) =>
      val lines = text.split("\n", -1).map(sqlTrim).filter(_.nonEmpty).toSeq
      val exp =
        if (lines.isEmpty) (0, None, None, None, false)
        else {
          val ft = round6(lines.count(l =>
            ".!?\"".contains(l.last)).toDouble / lines.size)
          val fd = round6((lines.size - lines.distinct.size).toDouble / lines.size)
          val ml = round6(lines.map(_.length).sum.toDouble / lines.size)
          (lines.size, Some(ft), Some(fd), Some(ml), ft >= 0.5 && fd <= 0.4)
        }
      assert(got(id) == exp, s"doc $id '${text.replace("\n", "\\n")}'")
    }
  }

  test("preferencePairs ≡ driver brute force on random response tables") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    val words = Vector("aa", "bb", "cc", "dd", "ee", "ff", "gg")
    val rnd = new scala.util.Random(91)
    for (_ <- 1 to 3) {
      val rows = (0 until 120).map { i =>
        val text = Seq.fill(rnd.nextInt(6))(words(rnd.nextInt(words.size)))
          .mkString(" ")
        ((i / 5).toLong, i.toLong, text, rnd.nextInt(4).toLong)
      }
      val got = graft.operators.Preference.preferencePairs(
          rows.toDF("prompt_id", "resp_id", "text", "score"),
          "prompt_id", "resp_id", "text", "score", maxJaccard = 0.8)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getDouble(7), r.getBoolean(8)))).toMap
      rows.groupBy(_._1).foreach { case (p, rs) =>
        val chosen = rs.minBy(r => (-r._4, r._2))
        val rejected = rs.minBy(r => (r._4, -r._2))
        def toks(t: String) = t.split("\\s+").filter(_.nonEmpty)
        def set(t: String) = toks(t).toSet
        val (ca, ra) = (set(chosen._3), set(rejected._3))
        val inter = (ca & ra).size.toLong
        val uni = ca.size + ra.size - inter
        val jac = if (uni > 0) BigDecimal(inter.toDouble / uni)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble else 1.0
        val exp = (rs.size.toLong, chosen._2, rejected._2,
          toks(chosen._3).length.toLong, toks(rejected._3).length.toLong,
          toks(chosen._3).length.toLong - toks(rejected._3).length,
          jac, rs.size >= 2 && chosen._2 != rejected._2 && jac < 0.8)
        assert(got(p) == exp, s"prompt $p: got ${got(p)} expected $exp")
      }
    }
  }

  test("packingReport ≡ driver brute force on random packed layouts") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 3) {
      val n = 30 + rnd.nextInt(30)
      val seqLen = 8L + rnd.nextInt(8)
      val docs = (0 until n).map(i => (i.toLong, rnd.nextInt(20).toLong,
        i.toLong))
      val packed = graft.operators.Packing.packSequencesBy(
        docs.toDF("id", "w", "ord"), "id", "w", "ord", seqLen)
      val spans = packed.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(3) - r.getLong(2)))
      val r = graft.operators.Packing.packingReport(packed, "id", seqLen)
        .collect().head
      val byDoc = spans.groupBy(_._1)
      val bySeq = spans.groupBy(_._2)
      assert(r.getLong(0) == bySeq.size && r.getLong(1) == byDoc.size)
      assert(r.getLong(2) == spans.map(_._3).sum)
      assert(r.getLong(3) ==
        bySeq.values.count(_.map(_._3).sum == seqLen))
      assert(r.getLong(4) == byDoc.values.count(_.size > 1))
      if (bySeq.nonEmpty)
        assert(r.getLong(7) == spans.map(_._3).sum - (bySeq.size - 1) * seqLen)
    }
  }

  test("response-set analytics invariants hold on random tables") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat, lit}
    val rnd = new scala.util.Random(53)
    for (_ <- 1 to 3) {
      val rows = (0 until 150).map { i =>
        ((i / rnd.nextInt(6).max(1)).toLong % 20, i.toLong,
          rnd.nextInt(5).toLong, rnd.nextInt(2) == 0,
          rnd.nextInt(4).toString)
      }
      val df = rows.toDF("prompt_id", "resp_id", "score", "passed", "ans")

      // groupAdvantage: defined groups standardize to mean ~0 within
      // rounding; undefined groups emit exactly 0.0; every advantage
      // finite, never a signed zero
      val adv = graft.operators.Preference.groupAdvantage(
          df, "prompt_id", "resp_id", "score")
        .collect().map(r => (r.getLong(0), r.getDouble(4), r.getBoolean(5)))
      adv.groupBy(_._1).foreach { case (p, g) =>
        if (g.head._3) {
          val mean = g.map(_._2).sum / g.size
          assert(math.abs(mean) < 1e-5, s"prompt $p advantage mean $mean")
        } else g.foreach { case (_, a, _) =>
          assert(a == 0.0 &&
            java.lang.Double.doubleToRawLongBits(a) == 0L)
        }
        g.foreach(t => assert(!t._2.isNaN && !t._2.isInfinite))
      }

      // passAtK: pass@1 <= pass@k (more draws can only help), both in
      // [0, 1], and the n-c < k branch is exactly 1
      val pk = graft.operators.Preference.passAtK(df, "prompt_id",
          "passed", k = 3)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3),
          if (r.isNullAt(4)) None else Some(r.getDouble(4))))
      pk.foreach { case (n, c, p1, pkv) =>
        assert(p1 >= 0.0 && p1 <= 1.0)
        if (n < 3) assert(pkv.isEmpty, s"n=$n must be undefined")
        else {
          val v = pkv.get
          assert(v >= 0.0 && v <= 1.0 && v >= p1 - 1e-9,
            s"pass@3 $v < pass@1 $p1 (n=$n c=$c)")
          if (n - c < 3) assert(v == 1.0)
          if (c == 0) assert(v == 0.0)
        }
      }

      // majorityVote: the winner's count is the max count, its answer
      // the lexicographic min among max-count answers; votes <= n_resp
      val mv = graft.operators.Preference.majorityVote(df, "prompt_id",
          "ans")
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      rows.groupBy(_._1).foreach { case (p, g) =>
        val counts = g.groupBy(_._5).view.mapValues(_.size.toLong).toMap
        val best = counts.toSeq.minBy { case (a, c) => (-c, a) }
        val (va, nv, nr) = mv(p)
        assert((va, nv) == best, s"prompt $p: ($va, $nv) vs $best")
        assert(nv <= nr && nr == g.size)
      }

      // winRateMatrix: rate_a in [0,1]; wins + ties <= comparisons;
      // and the mirrored rate computed from B's perspective sums to 1
      val wr = graft.operators.Preference.winRateMatrix(
          df.withColumn("player", concat(lit("m"), col("score") % 3)),
          "prompt_id", "player", "resp_id")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5)))
      wr.foreach { case (a, b, n, w, t, rate) =>
        assert(a < b, "orientation broken")
        assert(w + t <= n)
        assert(rate >= 0.0 && rate <= 1.0)
        // losses = n - w - t; rate_b = (losses + 0.5 t)/n; sum = 1
        val rateB = BigDecimal(((n - w - t) + 0.5 * t) / n)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(rate + rateB - 1.0) < 2e-6, s"$a/$b rates")
      }

      // scoreCorrelation: r in [-1, 1] within rounding; sign matches
      // the covariance's; undefined groups emit +0.0 bits
      val sc = graft.operators.Preference.scoreCorrelation(
          df.withColumn("len", col("resp_id") % 7), "prompt_id",
          "score", "len")
        .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
      sc.foreach { case (p, r, defined) =>
        assert(r >= -1.0000005 && r <= 1.0000005, s"prompt $p r=$r")
        if (!defined)
          assert(java.lang.Double.doubleToRawLongBits(r) == 0L)
      }
    }
  }

  test("trainExact equals the BigInt Lloyd replica on random corpora") {
    val spark = GraftTestSession.spark
    import spark.implicits._
    // random small corpora, coordinates inside the |x| < 10 guard —
    // the distributed exact Lloyd must match a sequential BigInt
    // replica coordinate-for-coordinate at every (n, dim, nlist)
    val caseGen = for {
      n <- Gen.choose(3, 40)
      dim <- Gen.choose(1, 6)
      nlist <- Gen.choose(1, 5)
      coords <- Gen.listOfN(n * dim, Gen.choose(-9.5, 9.5))
    } yield (n, dim, nlist, coords)
    samples(caseGen, 15).foreach { case (n, dim, nlist, coords) =>
      val vecs = (0 until n).map(i =>
        (i.toLong, coords.slice(i * dim, (i + 1) * dim)))
      val df = vecs.toDF("id", "v")
      val got = graft.operators.IvfIndex.trainExact(
        df.repartition(5), "id", "v", nlist, iters = 2)
      // sequential replica: same quantization, seeds, ties, means
      val qv = vecs.map { case (_, v) =>
        v.map(x => math.floor(x * 1e6 + 0.5).toLong)
      }
      var cents: Seq[Seq[Long]] = qv.take(nlist)
      def sqd(a: Seq[Long], b: Seq[Long]): BigInt =
        a.zip(b).foldLeft(BigInt(0)) { case (s, (x, y)) =>
          s + BigInt(x - y) * BigInt(x - y)
        }
      for (_ <- 0 until 2) {
        val assign = qv.map(v =>
          (cents.zipWithIndex.map { case (c, j) => (sqd(v, c), j) }
            .min._2, v))
        cents = cents.indices.map { c =>
          val ms = assign.filter(_._1 == c).map(_._2)
          if (ms.isEmpty) cents(c)
          else (0 until dim).map { i =>
            (ms.foldLeft(BigInt(0))((s, m) => s + BigInt(m(i))) /
              BigInt(ms.size)).toLong
          }
        }
      }
      assert(got == cents, s"n=$n dim=$dim nlist=$nlist")
    }
  }
}
