package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 text-curation operators: winnowing fingerprints, n-gram
  * novelty, token entropy, quality-keeping cluster canonicalization. */
class WinnowNoveltySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def winnow(df: org.apache.spark.sql.DataFrame) =
    TextAnalysis.winnowFingerprints(df, "doc_id", "text", k = 3, w = 4)

  test("winnowing: shared run of >= w+k-1 tokens shares a fingerprint") {
    // the paper's guarantee: any match of length >= w+k-1 (= 6 here)
    // contributes at least one common selected hash
    val common = "c1 c2 c3 c4 c5 c6"
    val docs = Seq(
      (1L, s"p q r $common x y"),
      (2L, s"a b $common m n o z")).toDF("doc_id", "text")
    val fps = winnow(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2))).groupBy(_._1)
      .map { case (d, a) => d -> a.map(_._2).toSet }
    assert((fps(1L) & fps(2L)).nonEmpty, "no shared fingerprint on a 6-token run")
  }

  test("winnowing: coverage (every window selects) and position fidelity") {
    val toks = (0 until 50).map(i => s"w$i")
    val docs = Seq((7L, toks.mkString(" "))).toDF("doc_id", "text")
    val rows = winnow(docs).collect().map(r => (r.getLong(1), r.getLong(2)))
    val m = 48 // 50 tokens, 3-grams
    val selPos = rows.map(_._1).toSet
    (0 to m - 4).foreach { j =>
      assert((j to j + 3).exists(p => selPos.contains(p.toLong)),
        s"window starting at $j selected nothing")
    }
    // each emitted fp is the 40-bit md5 prefix of the gram AT that pos
    rows.foreach { case (pos, fp) =>
      val gram = toks.slice(pos.toInt, pos.toInt + 3).mkString(" ")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(fp == java.lang.Long.parseLong(hex.take(10), 16),
        s"fp at pos $pos is not the gram's 40-bit md5 prefix")
    }
    // density: ~2/(w+1) of positions selected, never more than #windows
    assert(rows.length <= m - 4 + 1 && rows.length >= (m / 5))
  }

  test("winnowing: short docs get one whole-array window; tiny docs none") {
    val docs = Seq(
      (1L, "a b c d"),        // 2 grams < w: single window, 1 fp
      (2L, "a b"),            // < k tokens: no grams, no rows
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val by = winnow(docs).collect().groupBy(_.getLong(0))
    assert(by.getOrElse(1L, Array.empty).length == 1)
    assert(!by.contains(2L) && !by.contains(3L))
  }

  test("ngramNovelty: copies score 0, originals 1, partial overlap fractional") {
    val docs = Seq(
      (1L, "u v w x y"),      // 3 grams, all first-seen here
      (2L, "u v w x y"),      // exact copy, later id: nothing novel
      (3L, "u v w z1 z2"),    // shares gram "u v w" only
      (4L, "ab")).toDF("doc_id", "text") // too short: 0 grams
    val got = Dedup.ngramNovelty(docs, "doc_id", "text", 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got(1L) == ((3L, 3L, 1.0)))
    assert(got(2L) == ((3L, 0L, 0.0)))
    assert(got(3L) == ((3L, 2L, 0.666667)))
    assert(got(4L) == ((0L, 0L, 0.0)))
  }

  test("tokenEntropy: degenerate 0, uniform ln(n), empty zeros") {
    val docs = Seq(
      (1L, "x x x x"),
      (2L, "a b c d"),
      (3L, "a a b b"),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got(1L) == ((4L, 1L, 0.0, 0.25)))
    assert(got(2L) == ((4L, 4L,
      BigDecimal(math.log(4)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, 1.0)))
    assert(got(3L) == ((4L, 2L,
      BigDecimal(math.log(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble, 0.5)))
    assert(got(4L) == ((0L, 0L, 0.0, 0.0)))
  }

  test("winnowPairs: a copied run is detected; unrelated docs are not paired") {
    val run = (0 until 20).map(i => s"r$i").mkString(" ") // 20-token plagiarized run
    val docs = Seq(
      (1L, s"intro alpha beta $run tail one two"),
      (2L, s"other start here $run closing words differ"),
      (3L, "completely different content with no overlap at all whatsoever"))
      .toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text",
        k = 3, w = 4, minShared = 2, maxFpBucket = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "copied 20-token run not detected")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc paired")
  }

  test("winnowPairs: hot-fingerprint cap drops ubiquitous grams loudly") {
    // 30 docs all sharing one boilerplate phrase + unique remainders:
    // with the cap below 30 the boilerplate fingerprint is dropped and
    // no pair survives minShared=2; without the cap pairs appear
    val boiler = "all rights reserved by the site operator"
    val docs = (0 until 30).map(i =>
      (i.toLong, s"u${i}a u${i}b u${i}c $boiler u${i}d u${i}e u${i}f"))
      .toDF("doc_id", "text")
    val capped = TextAnalysis.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 2, maxFpBucket = Some(10)).count()
    val uncapped = TextAnalysis.winnowPairs(docs, "doc_id", "text",
      k = 3, w = 4, minShared = 2, maxFpBucket = None).count()
    assert(capped == 0, s"cap leaked $capped pairs")
    assert(uncapped > 0, "boilerplate produced no shared fingerprints at all")
  }

  test("WinnowSelect kernel: deque minima equal naive window minima; loud cap") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = new scala.util.Random(7)
    for (m <- Seq(1, 2, 3, 4, 5, 17, 100); w <- Seq(1, 2, 4, 7)) {
      val keys = Array.fill(m)(rnd.nextLong(1L << 40))
      val got = graft.functions.WinnowSelect
        .select(new GenericArrayData(keys), w).toLongArray().toSeq
      val eff = math.min(w, m)
      val naive = (0 to m - eff).map(j => keys.slice(j, j + eff).min).distinct
      assert(got == naive, s"m=$m w=$w")
    }
    val big = new GenericArrayData(new Array[Long](1 << 20))
    val e = intercept[IllegalStateException] {
      graft.functions.WinnowSelect.select(big, 4)
    }
    assert(e.getMessage.contains("id-packing cap"))
  }

  test("novelty and entropy plan as pure aggregations — no Window operator") {
    // the SCALE.md claim: neither operator funnels a hot key through a
    // single-task window; everything is partial/final hash aggregation
    val docs = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val novPlan = Dedup.ngramNovelty(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    val entPlan = graft.operators.TextAnalysis
      .tokenEntropy(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    Seq("nov" -> novPlan, "ent" -> entPlan).foreach { case (n, p) =>
      assert(!p.contains("Window"), s"$n plans a Window:\n$p")
      assert(p.contains("HashAggregate"), s"$n lost hash aggregation")
    }
  }

  test("winnowFingerprints plans with zero shuffles") {
    // the scale claim: fingerprint selection is entirely per-row —
    // no Exchange anywhere in the physical plan
    val docs = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val plan = TextAnalysis.winnowFingerprints(docs, "doc_id", "text", 3, 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"winnow kernel shuffles:\n$plan")
  }

  test("zipfSlopes: closed form on hand counts; flat vs skewed sources") {
    // skewed source: freqs 4,2,1 -> regression of ln f on ln rank
    val docs = Seq(
      (1L, "s1", "t t t t u u v"),
      (2L, "s2", "p q r z")) // all freq 1: y const 0 -> slope 0
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.zipfSlopes(docs, "source", "text").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val x = Seq(1.0, 2.0, 3.0).map(math.log)
    val y = Seq(4.0, 2.0, 1.0).map(math.log)
    val n = 3.0
    val slope = (x.zip(y).map { case (a, b) => a * b }.sum - x.sum * y.sum / n) /
      (x.map(a => a * a).sum - x.sum * x.sum / n)
    assert(got("s1")._1 == 3L)
    assert(math.abs(got("s1")._2 - slope) < 1e-5, s"${got("s1")._2} vs $slope")
    assert(got("s1")._2 < -0.5, "skewed source should be steeply Zipfian")
    assert(got("s2") == ((4L, 0.0)), "uniform-frequency source must be flat")
  }

  test("containmentPairs finds quotes Jaccard misses; matches brute force") {
    // doc 2 is the first third of doc 1: containment 1.0, Jaccard ~1/3
    val long = (0 until 30).map(i => s"t$i").mkString(" ")
    val quote = (0 until 10).map(i => s"t$i").mkString(" ")
    val docs = Seq((1L, long), (2L, quote),
      (3L, "entirely different material with no shared shingles here at all"))
      .toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(cont.get((1L, 2L)).contains(1.0), s"quote not contained: $cont")
    val jac = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .collect()
    assert(jac.isEmpty, "Jaccard 0.8 should miss the one-third quote")
    // completeness vs brute force on real docs + planted half-copies
    val real = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .filter(col("doc_id") < 100).select(col("doc_id"), col("text"))
    val halves = real.select((col("doc_id") + 1000L).as("doc_id"),
      concat_ws(" ", slice(graft.operators.TextAnalysis.tokens(col("text")),
        lit(1), greatest((size(graft.operators.TextAnalysis.tokens(col("text"))) / 2)
          .cast("int"), lit(3)))).as("text"))
    val corpus = real.unionByName(halves)
    val got = Dedup.containmentPairs(corpus, "doc_id", "text", 3, 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute force: distinct shingle sets in Scala
    val sets = corpus.select(col("doc_id"),
        graft.functions.ShingleExprs.shingle_hashes(col("text"), 3).as("h"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
      c = (sa & sb).size.toDouble / math.min(sa.size, sb.size)
      if c >= 0.8
    } yield (a, b)).toSet
    assert(got == want && want.nonEmpty,
      s"containment incomplete: missing ${want -- got}, extra ${got -- want}")
  }

  test("fleschReadingEase: exact formula; prose outscores a keyword dump") {
    val docs = Seq(
      (1L, "The cat sat. The dog ran. We saw it all."),
      (2L, "cryptocurrency blockchain optimization infrastructure virtualization"))
      .toDF("doc_id", "text")
    val cols = graft.operators.TextAnalysis.fleschReadingEase(col("text"))
      .map { case (n, c) => c.as(n) }
    val got = docs.select(col("doc_id") +: cols: _*).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    val (w, s, y) = (10.0, 3.0, 10.0) // hand counts for doc 1
    assert(got(1L)._1 == 10L && got(1L)._2 == 3L && got(1L)._3 == 10L)
    val expect = BigDecimal(206.835 - 1.015 * (w / s) - 84.6 * (y / w))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got(1L)._4 - expect) < 1e-9)
    assert(got(1L)._4 > got(2L)._4, "simple prose must outscore the dump")
  }

  test("dedupImpactBySource: per-source doc and token survival") {
    val dupText = (0 until 12).map(i => s"d$i").mkString(" ") // 12 tokens
    val docs = Seq(
      (1L, "web", dupText),
      (2L, "web", dupText), // exact dup, higher id -> dropped
      (3L, "web", "unique web content that stands completely alone here"), // 8 tokens
      (4L, "books", "another unique passage with no duplicate partner at all")) // 9
      .toDF("doc_id", "source", "text")
    val got = Dedup.dedupImpactBySource(docs, "doc_id", "text", "source", 0.8)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(got("web") == ((3L, 2L, 32L, 20L,
      BigDecimal(20.0 / 32.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)), s"web row wrong: ${got("web")}")
    assert(got("books") == ((1L, 1L, 9L, 9L, 1.0)))
  }

  test("fertilityBySource: merged-friendly source scores lower; sums exact") {
    import graft.operators.Bpe
    val docs = Seq(
      (1L, "dense", "aaaa aaaa aaaa aaaa aaaa"),
      (2L, "dense", "aaaa aaaa aaaa"),
      (3L, "sparse", "wxyz qrst mnop")).toDF("doc_id", "source", "text")
    val merges = Bpe.learnMerges(docs, "text", merges = 6).orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val got = Bpe.fertilityBySource(docs, "doc_id", "text", "source", merges)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // independent reduction from the (already-pinned) per-doc encoder
    val enc = Bpe.encodeTokenCounts(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wantDense = (enc(1L) + enc(2L), 8L)
    assert(got("dense")._1 == wantDense._2 &&
      got("dense")._2 == wantDense._1)
    assert(got("dense")._3 == BigDecimal(wantDense._1.toDouble / 8.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(got("dense")._3 < got("sparse")._3,
      s"frequent fully-merged words must cost fewer tokens: $got")
  }

  test("mojibakeStats: clean text passes, each damage class detected") {
    val docs = Seq(
      (1L, "perfectly clean ascii prose"),
      (2L, "utf8 read as latin1: cafÃ© naÃ¯ve"), // 2 digraphs
      (3L, "decoder gave up �� here"),
      (4L, "c1 debrisbetweenwords")).toDF("doc_id", "text")
    val cols = graft.operators.TextAnalysis.mojibakeStats(col("text"))
      .map { case (n, c) => c.as(n) }
    val got = docs.select(col("doc_id") +: cols: _*).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))).toMap
    assert(got(1L) == ((0L, 0L, 0L, false)))
    assert(got(2L) == ((0L, 0L, 2L, true)))
    assert(got(3L) == ((2L, 0L, 0L, true)))
    assert(got(4L) == ((0L, 2L, 0L, true)))
  }

  test("scriptProfile: per-script counts and dominant share") {
    val docs = Seq(
      (1L, "abc кир 漢"), // 3 latin, 3 cyrillic, 1 han
      (2L, "12345 .,!?")) // no script chars at all
      .toDF("doc_id", "text")
    val cols = graft.operators.TextAnalysis.scriptProfile(col("text"))
      .map { case (n, c) => c.as(n) }
    val got = docs.select(col("doc_id") +: cols: _*).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    assert(got(1L) == ((3L, 3L, 1L, 0L, 0L,
      BigDecimal(3.0 / 7.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)))
    assert(got(2L) == ((0L, 0L, 0L, 0L, 0L, 0.0)))
  }

  test("curation composite: duplicate and degenerate docs drop, prose keeps") {
    // mirror qB2's exact predicate on a corpus engineered per-branch
    val prose = "The quick brown fox jumps over the lazy dog. It runs far."
    val docs = Seq(
      (1L, prose),                    // novel + entropic + readable -> keep
      (2L, prose),                    // exact dup: novelty 0 -> drop
      (3L, "spam spam spam spam spam spam spam spam")) // entropy 0 -> drop
      .toDF("doc_id", "text")
    val nov = Dedup.ngramNovelty(docs, "doc_id", "text", 3)
      .select(col("doc_id"), col("novelty"))
    val ent = graft.operators.TextAnalysis.tokenEntropy(docs, "doc_id", "text")
      .select(col("doc_id"), col("entropy"))
    val fl = graft.operators.TextAnalysis.fleschReadingEase(col("text"))
      .collectFirst { case ("flesch", c) => c }.get
    val keep = docs.select(col("doc_id"), fl.as("flesch"))
      .join(nov, Seq("doc_id")).join(ent, Seq("doc_id"))
      .select(col("doc_id"), (col("novelty") >= 0.5 && col("entropy") >= 1.0 &&
        col("flesch") > -100.0).as("keep"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(keep == Map(1L -> true, 2L -> false, 3L -> false), s"$keep")
  }

  test("clusterKeepBest keeps max quality with min-id tie-break") {
    val t10 = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (1L, t10),                 // 8 shingles
      (2L, t10 + " t11"),        // J(1,2)=8/9
      (3L, t10 + " t11 t12"),    // J(1,3)=8/10=0.8, longest -> winner
      (4L, "left alone solo island nothing shared here"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length(coalesce(col("text"), lit(""))))
    val got = Dedup.clusterKeepBest(docs, "doc_id", "text", "n_chars", 0.8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(got(1L) == ((3L, 3L)), s"cluster 1 wrong: $got") // doc 3 longest
    assert(got(4L) == ((4L, 1L)))
    // tie on quality -> smallest id: duplicate texts, equal length
    val ties = Seq((5L, t10), (6L, t10)).toDF("doc_id", "text")
      .withColumn("n_chars", length(col("text")))
    val t = Dedup.clusterKeepBest(ties, "doc_id", "text", "n_chars", 0.8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(t == Map(5L -> 5L))
  }

  test("redactCreditCards: Luhn gate separates PANs from order ids") {
    val docs = Seq(
      // classic Luhn-valid test PANs: 16-digit and 13-digit
      (1L, "pay 4111111111111111 now"),
      (2L, "visa 4222222222222 ok"),
      // same shape, checksum off by one -> must SURVIVE
      (3L, "order 4111111111111112 shipped"),
      // too short (12) and too long (20): not candidates at all
      (4L, "ids 411111111111 and 41111111111111111111"),
      // two valid cards in one doc, both redacted
      (5L, "a 4111111111111111 b 5500005555555559 c"),
      (6L, null.asInstanceOf[String]),
      // a valid PAN whose digits ALSO appear inside a longer
      // non-candidate run: the word-bounded replace must redact only
      // the standalone occurrence (a literal substring replace would
      // mangle the 21-digit order id)
      (7L, "pay 4111111111111111 ref 941111111111111112345")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.redactCreditCards(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getString(2))))
      .toMap
    assert(got(1L) == ((1, "pay <CC> now")), s"${got(1L)}")
    assert(got(2L) == ((1, "visa <CC> ok")), s"${got(2L)}")
    assert(got(3L) == ((0, "order 4111111111111112 shipped")))
    assert(got(4L) == ((0, "ids 411111111111 and 41111111111111111111")))
    assert(got(5L) == ((2, "a <CC> b <CC> c")), s"${got(5L)}")
    assert(got(6L) == ((0, "")), "null text redacts to empty, 0 cards")
    assert(got(7L) == ((1, "pay <CC> ref 941111111111111112345")),
      s"substring containment mangled a non-candidate: ${got(7L)}")
  }

  test("sourceZScores: per-source calibration, degenerate sources keep") {
    // web: 9 docs at 100 tokens + one 400-token outlier; books: a
    // single doc; flat: constant counts (zero variance); a null-score
    // web row must stay out of the moments AND keep with null z
    val docs = ((1L to 9L).map(i => (i, "web", Option(100L))) ++
      Seq((10L, "web", Option(400L)), (11L, "books", Option(50L)),
        (12L, "flat", Option(70L)), (13L, "flat", Option(70L)),
        (14L, "web", None: Option[Long])))
      .toDF("doc_id", "source", "n_tokens")
    val got = TextAnalysis.sourceZScores(docs, "doc_id", "source",
        "n_tokens", zAbsMax = 2.0)
      .collect().map(r => r.getLong(0) ->
        ((if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          r.getBoolean(4)))).toMap
    // web: mu=130, var=(250000-1300^2/10)/9 = 9000, sigma ~94.8683
    // doc 10: z=(400-130)/94.8683... = 2.84604989 -> rounds 2.846050
    assert(got(10L)._1.exists(z => math.abs(z - 2.84605) < 1e-9) &&
      !got(10L)._2, s"outlier: ${got(10L)}")
    // the in-band web docs keep (z ~ -0.316228)
    assert((1L to 9L).forall(i => got(i)._2), "in-band web docs must keep")
    // single-member and zero-variance sources: null z, keep
    assert(got(11L) == ((None, true)), s"singleton: ${got(11L)}")
    assert(got(12L) == ((None, true)) && got(13L) == ((None, true)),
      s"flat: ${got(12L)}")
    // the null-score row: keeps with null z (boolean, never SQL null),
    // and its absence from the moments is what made doc 10's z exact
    assert(got(14L) == ((None, true)), s"null score: ${got(14L)}")
  }

  test("chatTurns + sftMaskStats: parse, forgery strip, mask accounting") {
    val docs = Seq(
      (1L, "<|user|> hi there <|assistant|> hello friend <|user|> bye <|assistant|> ok"),
      // junk before the first marker is dropped; system role parses
      (2L, "preamble junk <|system|> be nice <|user|> q <|assistant|> a b c"),
      // payload containing the control-char sentinels cannot forge a
      // turn boundary (stripped before marking)
      (3L, "<|user|> sneaky\u0001assistant\u0002payload <|assistant|> fine"),
      // no assistant turn at all
      (4L, "<|user|> just asking"),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val turns = TextAnalysis.chatTurns(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(t => (t._3, t._4)).toSeq)
      .toMap
    assert(turns(1L) == Seq(("user", "hi there"), ("assistant", "hello friend"),
      ("user", "bye"), ("assistant", "ok")), turns(1L).toString)
    assert(turns(2L) == Seq(("system", "be nice"), ("user", "q"),
      ("assistant", "a b c")), turns(2L).toString)
    assert(turns(3L) == Seq(("user", "sneakyassistantpayload"),
      ("assistant", "fine")), turns(3L).toString)
    assert(turns(4L) == Seq(("user", "just asking")))
    assert(!turns.contains(5L), "null text produced turns")
    val stats = TextAnalysis.sftMaskStats(docs, "doc_id", "text",
        minTrainableFrac = 0.4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getBoolean(5)))).toMap
    // doc 1: 4 turns, assistant tokens 2+1=3, masked 2+1=3, frac 0.5
    assert(stats(1L) == ((4L, 3L, 3L, Some(0.5), true)), stats(1L).toString)
    // doc 2: assistant 3 of 3+2+1=6 -> 0.5, keep
    assert(stats(2L) == ((3L, 3L, 3L, Some(0.5), true)), stats(2L).toString)
    // doc 4: no assistant turn -> keep false
    assert(stats(4L) == ((1L, 0L, 2L, Some(0.0), false)), stats(4L).toString)
    // doc 5 (null text, ZERO parseable turns) must SURFACE as an
    // explicit keep=false row, not vanish from the stats — a caller
    // joining on keep sees the drop decision (round-13 advice)
    assert(stats(5L) == ((0L, 0L, 0L, None, false)), stats(5L).toString)
    assert(stats.size == 5, s"every input doc emits exactly one row: $stats")
  }

  test("minKProbScore: memorized text reads low, novel-vocab text high") {
    // the reference corpus: repeated everyday sentences; one doc of it
    // is the MEMBER (verbatim in training), the novel doc's vocabulary
    // is entirely unseen — its min-k tokens all score the OOV nll
    val trainDocs = (1L to 20L).map(i =>
      (i, "the quick brown fox jumps over the lazy dog every single day"))
    val member = (100L, trainDocs.head._2)
    val novel = (101L, "zyx wvu tsr qpo nml kji hgf edc ba")
    val docs = (trainDocs :+ member :+ novel).toDF("doc_id", "text")
    val train = docs.filter(col("doc_id") <= 20L)
    val got = TextAnalysis.minKProbScore(docs, train, "doc_id", "text",
        kFrac = 0.2, threshold = 5.0)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
        r.getBoolean(3)))).toMap
    val (nMem, sMem, fMem) = got(100L)
    val (nNov, sNov, fNov) = got(101L)
    assert(nMem == 12L && nNov == 9L)
    // the member's MOST surprising tokens are still familiar; the
    // novel doc's are all OOV — a wide margin, not a knife edge
    assert(sMem + 2.0 < sNov,
      s"membership signal missing: member $sMem vs novel $sNov")
    assert(fMem && !fNov, s"flags wrong: member $fMem novel $fNov")
    // hand-check the member's score: 12 tokens -> k = ceil(2.4) = 3.
    // Train: 20 copies, n = 240 tokens, v = 11 distinct, denom =
    // 240 + 0.5*(11+1) = 246. The member's rarest tokens occur 20x
    // ('the' occurs 40x and ranks LESS surprising), so the top-3 nlls
    // are all ln(246/20.5) and so is their mean.
    val expect = math.log(246.0 / 20.5)
    assert(math.abs(sMem - BigDecimal(expect).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-6,
      s"member score $sMem vs closed form $expect")
    // the novel doc's min-k tokens are pure OOV: nll = ln(246/0.5)
    val oov = math.log(246.0 / 0.5)
    assert(math.abs(sNov - BigDecimal(oov).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) <= 1e-6,
      s"novel score $sNov vs OOV closed form $oov")
  }

  test("lineStats: C4/FineWeb line heuristics, hand-computed") {
    val docs = Seq(
      // blank/whitespace-only lines drop; "menu" duplicates
      (1L, "A sentence.\nmenu\nmenu\nAnother?!\n\n  \nBad line"),
      (2L, "Clean one.\nClean two!\nClean three?"), // all terminal, no dup
      (3L, ""),                                     // no lines at all
      (4L, "no punct at all")                       // 1 line, 0 terminal
    ).toDF("doc_id", "text")
    val got = TextAnalysis.lineStats(docs, "doc_id", "text",
        minTermFrac = 0.9, maxDupFrac = 0.3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)),
          if (r.isNullAt(4)) None else Some(r.getDouble(4)),
          r.getBoolean(5)))).toMap
    // doc 1: lines "A sentence."(11) "menu"(4) "menu"(4) "Another?!"(9)
    //        "Bad line"(8) -> n=5, term 2/5 (. and !), dup 1/5, mean 7.2
    assert(got(1L) == ((5, Some(0.4), Some(0.2), Some(7.2), false)),
      s"doc1: ${got(1L)}")
    // doc 2: 3 lines, all terminal, no dup, mean (10+10+12)/3 = 10.666667
    assert(got(2L) == ((3, Some(1.0), Some(0.0), Some(10.666667), true)),
      s"doc2: ${got(2L)}")
    // doc 3: empty -> 0 lines, null fractions, keep FALSE (never NaN-true)
    assert(got(3L) == ((0, None, None, None, false)), s"doc3: ${got(3L)}")
    // doc 4: one unpunctuated line
    assert(got(4L) == ((1, Some(0.0), Some(0.0), Some(15.0), false)),
      s"doc4: ${got(4L)}")
  }
}
