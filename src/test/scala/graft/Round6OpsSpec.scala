package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-6 operator family: the Gopher quality-rule battery. */
class Round6OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def rules(rows: (Long, String)*) = {
    val df = rows.toDF("doc_id", "text")
    TextAnalysis.gopherRulesTable(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r).toMap
  }

  test("gopher rules: each rule flags its designed violator") {
    val passText = (1 to 56).map(i => s"word$i").mkString(" ") +
      " the of and it" // 60 words, mean len ~5, all alpha, 4 stopwords
    val shortText = "the of tiny words here" // 5 words
    val digitText = (1 to 60).map(_ => "12345").mkString(" ") // no letters
    val symbolText = (1 to 50).map(i => s"term$i").mkString(" ") +
      " the of " + (1 to 8).map(_ => "#").mkString(" ") // 60 words, 8 '#'
    val longText = (1 to 60).map(_ => "pneumonoultramicro").mkString(" ") +
      " the of" // 62 words, mean len ≈ 17.6

    val m = rules(1L -> passText, 2L -> shortText, 3L -> digitText,
      4L -> symbolText, 5L -> longText)

    def flag(id: Long, name: String): Boolean =
      m(id).getAs[Boolean](name)

    // 1: passes everything
    assert(flag(1L, "f_words") && flag(1L, "f_mean_len") &&
      flag(1L, "f_symbol") && flag(1L, "f_alpha") && flag(1L, "f_stop"))
    assert(flag(1L, "keep"))
    // 2: too few words — the word-count rule alone rejects it
    assert(!flag(2L, "f_words") && !flag(2L, "keep"))
    // 3: all-digit words — alpha rule rejects (and no stopwords)
    assert(!flag(3L, "f_alpha") && !flag(3L, "f_stop") && !flag(3L, "keep"))
    assert(flag(3L, "f_words") && flag(3L, "f_mean_len"))
    // 4: 8 '#' in 60 words = 0.133 > 0.1 — symbol rule rejects
    assert(!flag(4L, "f_symbol") && !flag(4L, "keep"))
    assert(flag(4L, "f_alpha"), "50/60 alpha words is still >= 0.8")
    // 5: 18-char words — mean-word-length rule rejects
    assert(!flag(5L, "f_mean_len") && !flag(5L, "keep"))
  }

  test("gopher rules: CJK ideographs count as alphabetic") {
    val zh = (1 to 60).map(_ => "的是").mkString(" ") + " 的 在"
    val m = rules(1L -> zh)
    assert(m(1L).getAs[Boolean]("f_alpha"))
    assert(m(1L).getAs[Double]("alpha_ratio") == 1.0)
  }

  test("gopher rules: empty and whitespace-only text degrade cleanly") {
    val m = rules(1L -> "", 2L -> "   \t  ")
    for (id <- Seq(1L, 2L)) {
      val r = m(id)
      assert(r.getAs[Int]("n_words") == 0)
      assert(r.getAs[Double]("mean_word_len") == 0.0) // no NaN/Inf
      assert(!r.getAs[Boolean]("f_words") && !r.getAs[Boolean]("keep"))
    }
  }

  test("deflate kernel: deterministic, and orders repetitive < prose < random") {
    import graft.functions.TextExprs
    val repetitive = (1 to 200).map(_ => "the same words again").mkString(" ")
    val prose = (1 to 100).map(i => s"sentence$i has varied content word$i")
      .mkString(" ")
    // hex of a fixed seed stream: incompressible relative to prose
    val rnd = new scala.util.Random(42)
    val random = (1 to 100).map(_ => rnd.nextLong().toHexString).mkString(" ")

    def ratio(texts: (Long, String)*): Map[Long, Double] = {
      val z = TextExprs.deflate_stats(col("text"))
      texts.toDF("doc_id", "text")
        .select(col("doc_id"),
          (z.getField("z_bytes").cast("double") /
            greatest(z.getField("n_bytes"), lit(1))).as("r"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    val r1 = ratio(1L -> repetitive, 2L -> prose, 3L -> random)
    val r2 = ratio(1L -> repetitive, 2L -> prose, 3L -> random)
    assert(r1 == r2, "deflate must be bit-deterministic")
    assert(r1(1L) < r1(2L) && r1(2L) < r1(3L),
      s"expected repetitive < prose < random, got $r1")
    assert(r1.values.forall(v => v > 0.0 && v < 1.5))
  }

  test("deflate kernel: registered as a SQL function") {
    graft.functions.Compat.register(spark)
    Seq((1L, "aaaa bbbb aaaa bbbb")).toDF("doc_id", "text")
      .createOrReplaceTempView("t_deflate")
    val row = spark.sql(
      "SELECT deflate_stats(text).n_bytes AS n, deflate_stats(text).z_bytes AS z FROM t_deflate")
      .collect().head
    assert(row.getInt(0) == 19 && row.getInt(1) > 0 && row.getInt(1) <= 19 + 8)
  }

  test("normalizeUrl: case, ports, fragments, tracking params, param order") {
    def norm(u: String): String =
      Seq((1L, u)).toDF("doc_id", "u")
        .select(TextAnalysis.normalizeUrl(col("u")).as("n"))
        .collect().head.getString(0)
    assert(norm("HTTPS://WWW.Example.COM:443/Path/X?b=2&utm_source=t&a=1#frag")
      == "https://www.example.com/Path/X?a=1&b=2")
    assert(norm("http://host.com:80") == "http://host.com/")
    assert(norm("http://host.com/p?utm_a=1&fbclid=z&gclid=y&ref=r")
      == "http://host.com/p")
    // path case is PRESERVED (paths are case-sensitive); 8080 is not a
    // default port and stays
    assert(norm("HTTP://H.COM:8080/CaseSensitive")
      == "http://h.com:8080/CaseSensitive")
    // idempotent on its own output
    val once = norm("HTTPS://A.B:443/x?z=1&a=2#f")
    assert(norm(once) == once)
  }

  test("stripHtml: blocks dropped with content, tags stripped, entities decoded") {
    val html = "<html><head><title>x</title><style>p{color:red}</style></head>" +
      "<body><h1 class=\"t\">Title</h1><p>a &amp; b &lt;c&gt; &quot;q&quot;" +
      " &#39;s&#39;</p><script>if (1 < 2) { alert(\"hi\"); }</script>" +
      " tail</body></html>"
    def strip(s: String): String =
      Seq((1L, s)).toDF("doc_id", "h")
        .select(TextAnalysis.stripHtml(col("h")).as("c"))
        .collect().head.getString(0)
    assert(strip(html) == "x Title a & b <c> \"q\" 's' tail")
    // plain text is a fixed point
    assert(strip("already clean text") == "already clean text")
    // entity-decode order: &amp;lt; must yield the literal "&lt;", not "<"
    assert(strip("<p>&amp;lt;</p>") == "&lt;")
  }

  test("repetition n-gram battery: hand-computed masses and flags") {
    import graft.functions.TextExprs
    val out = Seq((1L, "a b a b a b"), (2L, "x y z"))
      .toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(TextExprs.repetition_ngrams(col("text"))).as("r"))
      .select(col("doc_id"), col("r.n").as("n"), col("r.top_chars"),
        col("r.dup_chars"), col("r.total_chars"))
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    // doc 1, n=2: "a b"×3 (mass 9), "b a"×2 (mass 6) → top 9, dup 15, tot 15
    assert(out((1L, 2)) == ((9L, 15L, 15L)))
    // doc 1, n=5: two distinct 9-char grams, each once → no duplication
    assert(out((1L, 5)) == ((9L, 0L, 18L)))
    // doc 1, n=6: ONE gram "a b a b a b" (11 chars), once
    assert(out((1L, 6)) == ((11L, 0L, 11L)))
    // doc 1, n=7..10: fewer than n tokens → zeros
    for (n <- 7 to 10) assert(out((1L, n)) == ((0L, 0L, 0L)))
    // doc 2: 3 tokens, all distinct — n=2: "x y","y z" once each
    assert(out((2L, 2)) == ((3L, 0L, 6L)))
    assert(out((2L, 3)) == ((5L, 0L, 5L)))
    for (n <- 4 to 10) assert(out((2L, n)) == ((0L, 0L, 0L)))
  }

  test("repetition battery flags: spam fails, varied text passes") {
    val spam = (1 to 40).map(_ => "buy cheap pills now").mkString(" ")
    val varied = (1 to 80).map(i => s"unique$i word$i").mkString(" ")
    import graft.functions.TextExprs
    val tf = col("r.top_chars").cast("double") / col("r.total_chars")
    val df_ = col("r.dup_chars").cast("double") / col("r.total_chars")
    val rows = Seq((1L, spam), (2L, varied)).toDF("doc_id", "text")
      .select(col("doc_id"),
        explode(TextExprs.repetition_ngrams(col("text"))).as("r"))
      .filter(col("r.total_chars") > 0)
      .select(col("doc_id"), col("r.n").as("n"), tf.as("tf"), df_.as("df"))
      .collect()
    // the spam doc is one repeated 4-gram: every duplicated-gram rule
    // (n=5..10) sees dup_frac ≈ 1 — far above every threshold
    val spamDup = rows.filter(r => r.getLong(0) == 1L && r.getInt(1) >= 5)
    assert(spamDup.nonEmpty && spamDup.forall(_.getDouble(3) > 0.9))
    // the varied doc repeats nothing: dup_frac = 0 everywhere, and the
    // top n-gram is a vanishing fraction
    val varRows = rows.filter(_.getLong(0) == 2L)
    assert(varRows.forall(_.getDouble(3) == 0.0))
    assert(varRows.filter(_.getInt(1) <= 4).forall(_.getDouble(2) < 0.16))
  }

  test("dsir weights match an independent collections reimplementation") {
    val rows = Seq((1L, "en", "apple banana apple cherry"),
      (2L, "zh", "kiwi kiwi mango plum"),
      (3L, "en", "apple kiwi banana"),
      (4L, "de", "plum plum plum cherry mango"))
    // 16 exercises the dense kernel model path, 2048 the sparse
    // explode fallback — both must match the definitional form
    for (buckets <- Seq(16, 2048)) checkDsir(rows, buckets)
  }

  private def checkDsir(rows: Seq[(Long, String, String)],
                        buckets: Int): Unit = {

    // independent model: plain collections + MessageDigest
    def bucketOf(tok: String): Int = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      (java.lang.Long.parseLong(hex, 16) % buckets).toInt
    }
    val toks = rows.flatMap { case (id, lang, text) =>
      text.split("\\s+").filter(_.nonEmpty).map(t => (id, lang == "en", bucketOf(t)))
    }
    val cRaw = toks.groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val cT = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size.toLong).toMap
    val nRaw = toks.size.toLong
    val nT = toks.count(_._2).toLong
    def lr(b: Int): Double =
      math.log((cT.getOrElse(b, 0L) + 1).toDouble / (nT + buckets)) -
        math.log((cRaw.getOrElse(b, 0L) + 1).toDouble / (nRaw + buckets))
    val expected = toks.groupBy(_._1).view.mapValues { ts =>
      BigDecimal(ts.map(t => lr(t._3)).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap

    val got = TextAnalysis.dsirWeights(
        rows.toDF("doc_id", "lang", "text"), "doc_id", "text",
        isTarget = col("lang") === "en", buckets = buckets)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == expected.keySet)
    for ((id, w) <- expected)
      assert(math.abs(got(id) - w) < 1e-9, s"doc $id: got ${got(id)}, want $w")
  }

  test("dsir weights: target-language docs score above the rest") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val w = TextAnalysis.dsirWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 64)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val means = w.groupBy(col("lang") === "en")
      .agg(avg(col("dsir_weight")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(means(true) > means(false),
      s"en mean ${means(true)} should exceed non-en mean ${means(false)}")
  }

  test("per-row kernels plan shuffle-free; dsir stays within its budget") {
    import graft.functions.TextExprs
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    // gopher battery, deflate, html strip, url normalize: pure per-row
    // projections — a single Exchange anywhere is a regression
    val gopher = TextAnalysis.gopherRulesTable(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!gopher.contains("Exchange"), gopher)
    val perRow = docs.select(
        TextExprs.deflate_stats(col("text")).as("z"),
        TextAnalysis.stripHtml(col("text")).as("h"),
        TextAnalysis.normalizeUrl(col("text")).as("u"),
        TextExprs.repetition_ngrams(col("text")).as("r"))
      .queryExecution.executedPlan.toString
    assert(!perRow.contains("Exchange"), perRow)
    // dsir scoring pass: fused DsirScore kernel — the ratio table
    // rides INSIDE the expression (no broadcast join, no explode, no
    // per-doc agg), so the returned frame must plan with zero
    // Exchanges of any kind; the model pass (one LongVectorSum
    // partial/final) ran eagerly inside dsirWeights
    val dsir = TextAnalysis.dsirWeights(docs, "doc_id", "text",
        isTarget = col("lang") === "en", buckets = 16)
      .queryExecution.executedPlan.toString
    assert(!dsir.contains("Exchange"), dsir)
    assert(dsir.contains("dsir_score"), dsir)
  }

  test("sequence packing: dense sequences, tokens conserved, spans contiguous") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tok"))
    val L = 128L
    val packed = graft.operators.Packing
      .packSequences(docs, "doc_id", "n_tok", seqLen = L, partitions = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // tokens conserved: per-doc span lengths sum to the doc's n_tok
    val totals = docs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perDoc = packed.groupBy(_._1).view
      .mapValues(_.map(t => t._4 - t._3).sum).toMap
    assert(perDoc == totals.filter(_._2 > 0))
    // every sequence except the highest holds exactly L tokens (dense)
    val perSeq = packed.groupBy(_._2).view
      .mapValues(_.map(t => t._4 - t._3).sum).toMap
    val lastSeq = perSeq.keys.max
    assert(perSeq.filter(_._1 != lastSeq).values.forall(_ == L), perSeq)
    assert(perSeq(lastSeq) <= L)
    // spans are sane: 0 <= start < end <= n_tok
    assert(packed.forall { case (id, _, s, e) =>
      s >= 0 && s < e && e <= totals(id) })
  }

  test("web-ingest capstone: survivors are URL-unique and a strict subset") {
    val out = graft.queries.Pipeline.queries("qAD_web_ingest")(
      spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    val total = Tables.load(spark, "/root/testdata/sf0.001", "documents").count()
    assert(rows.nonEmpty && rows.length < total)
    // URL dedup happened: canonical URLs are unique among survivors
    val urls = rows.map(_.getString(1))
    assert(urls.distinct.length == urls.length)
    // gopher filter happened: every survivor satisfies the word-count rule
    assert(rows.forall(_.getInt(2) >= 50))
  }

  test("gopher rules: discriminative on the synthetic corpus, no nulls") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val out = TextAnalysis.gopherRulesTable(docs, "doc_id", "text")
    val n = out.count()
    assert(n == docs.count())
    assert(out.filter(out.columns.map(col(_).isNull).reduce(_ || _)).count() == 0)
    val kept = out.filter(col("keep")).count()
    assert(kept > 0 && kept < n,
      s"expected a mix of keep/drop, got $kept of $n")
  }

  test("chunkWindows: full coverage, exact overlap, no redundant tails") {
    import spark.implicits._
    // doc sizes around every boundary: empty, null, single token,
    // under/at/over width, grid-aligned and not
    val mk = (id: Long, n: Int) =>
      (id, if (n < 0) null else (1 to n).map(i => s"t$i").mkString(" "))
    val docs = Seq(mk(0, 0), mk(1, -1), mk(2, 1), mk(3, 7), mk(4, 8),
      mk(5, 9), mk(6, 12), mk(7, 20), mk(8, 21), mk(9, 100))
      .toDF("doc_id", "text")
    val width = 8; val stride = 5
    val out = graft.operators.Packing
      .chunkWindows(docs, "doc_id", "text", width, stride)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    val n = Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 7, 4L -> 8, 5L -> 9,
      6L -> 12, 7L -> 20, 8L -> 21, 9L -> 100)
    assert(!out.exists(c => c._1 == 0L || c._1 == 1L),
      "empty/null docs must emit no chunks")
    out.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      // dense indices, starts on the stride grid, spans match text
      assert(sorted.map(_._2).toSeq == sorted.indices.map(_.toLong))
      sorted.foreach { case (_, ci, s, e, text) =>
        assert(s == ci * stride + 1 && e == math.min(s + width - 1, n(id)))
        assert(text == (s to e).map(i => s"t$i").mkString(" "))
      }
      // coverage: every token position falls inside some chunk
      val covered = sorted.flatMap(c => c._3 to c._4).toSet
      assert(covered == (1 to n(id)).toSet, s"doc $id coverage hole")
      // no chunk contained in its predecessor (redundant tails dropped)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._4 > a._4,
          s"doc $id chunk ${b._2} adds no coverage")
        case _ =>
      }
    }
    // invalid geometry is refused loudly
    intercept[IllegalArgumentException] {
      graft.operators.Packing.chunkWindows(docs, "doc_id", "text", 8, 9)
    }
  }
}
