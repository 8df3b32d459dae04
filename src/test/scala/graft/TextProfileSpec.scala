package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential pin for the fused [[graft.functions.TextProfile]]
  * kernel: every counter must equal the regex-count spelling it
  * replaced (which is also the spelling the DuckDB oracles keep), on
  * inputs chosen to stress the match-semantics corners — non-BMP
  * codepoints (Han ext-B via surrogate pairs), the C1-control /
  * digraph overlap, 1:M lowercase expansion (U+0130), vertical tab
  * (in Java's `\s`), and run boundaries at string edges. */
class TextProfileSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private val cases = Seq(
    "",
    "plain ascii text. With two sentences! and?!? runs...",
    "abc кириллица 漢字 اللغة ελληνικά mixed",
    "𠀀𠀁 ext-B Han is still Han", // U+20000 U+20001
    "emoji 😀 and gothic 𐌰 are neither", // U+1F600, U+10330
    "cafÃ© naÃ¯ve", // 2 mojibake digraphs
    "ÃÃ©", // Ã then ÃA9: non-overlap count = 1
    "Ãx", // digraph whose 2nd char is ALSO a C1; lone C1
    "bad �� decode �",
    "tabsplit words here", // \x0B: Java \s — a word break
    "İstanbul IİYO", // U+0130 lowercases to i + combining dot
    "aeiouy YEA you buoy rhythm xyzzy",
    "...!?.", // sentence-run edge: entire string one run
    "  leading and trailing  ",
    "aÃ") // dangling Ã at end of string: no follower, no match

  test("fused kernel == the regex-count spelling, counter for counter") {
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val p = graft.functions.TextExprs.text_profile(col("text"))
    val fields = Seq("n_latin", "n_cyrillic", "n_han", "n_arabic", "n_greek",
      "n_replacement", "n_c1_controls", "n_mojibake_digraphs",
      "n_words", "n_sentences", "n_syllables")
    val regex = Seq(
      regexp_count(col("text"), lit("\\p{IsLatin}")),
      regexp_count(col("text"), lit("\\p{IsCyrillic}")),
      regexp_count(col("text"), lit("\\p{IsHan}")),
      regexp_count(col("text"), lit("\\p{IsArabic}")),
      regexp_count(col("text"), lit("\\p{IsGreek}")),
      regexp_count(col("text"), lit("\\x{FFFD}")),
      regexp_count(col("text"), lit("[\\x{0080}-\\x{009F}]")),
      regexp_count(col("text"), lit("\\x{00C3}[\\x{0080}-\\x{00BF}]")),
      regexp_count(col("text"), lit("\\S+")),
      regexp_count(col("text"), lit("[.!?]+")),
      regexp_count(lower(col("text")), lit("[aeiouy]+")))
    val cols = col("id") +:
      fields.map(f => p.getField(f).as("k_" + f)) ++:
      regex.zip(fields).map { case (c, f) => c.cast("long").as("r_" + f) }
    df.select(cols: _*).collect().foreach { r =>
      val id = r.getLong(0)
      fields.zipWithIndex.foreach { case (f, i) =>
        assert(r.getLong(1 + i) == r.getLong(1 + fields.size + i),
          s"counter $f diverges from its regex on case $id: " +
            s"'${cases(id.toInt)}'")
      }
    }
  }

  test("null text stays null through the kernel") {
    val df = Seq((1L, null.asInstanceOf[String]), (2L, "ok")).toDF("id", "text")
    val got = df.select(col("id"),
        graft.functions.TextExprs.text_profile(col("text")).as("p"))
      .orderBy(col("id")).collect()
    assert(got(0).isNullAt(1) && !got(1).isNullAt(1))
  }

  private val lexCases = Seq(
    "",
    "the cat of a and to in is it mat", // heavy stopword hits
    "theater band it. 'the' (a)", // stopwords as substrings / punctuated
    "one... two..... ...#tag ## #", // ellipsis runs 3,5,3 + hashes
    "....", // 4-dot run: one ellipsis match
    "café 漢字 123 ...abc 42x --- π", // alpha-word edge cases
    "  padded   runs\tand\nlines  ",
    "a#b...c#d", // symbols inside one token
    "многоязычный the текст and")

  test("lexical_stats == the regex spellings, counter for counter") {
    val stops = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    val markers = Seq(Seq("the", "a"), Seq("текст", "многоязычный"))
    val df = lexCases.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val ls = graft.functions.TextExprs.lexical_stats(col("text"),
      stops +: markers)
    def alt(ws: Seq[String]) = "(?<!\\S)(?:" + ws.mkString("|") + ")(?!\\S)"
    val got = df.select(col("id"),
        ls.getField("n_chars").as("k_chars"),
        ls.getField("n_tokens").as("k_toks"),
        ls.getField("n_nonspace").as("k_nonws"),
        ls.getField("n_hash").as("k_hash"),
        ls.getField("n_ellipsis").as("k_ellip"),
        ls.getField("n_alpha_words").as("k_alpha"),
        ls.getField("set_hits").getItem(0).as("k_stop"),
        ls.getField("set_hits").getItem(1).as("k_m0"),
        ls.getField("set_hits").getItem(2).as("k_m1"),
        length(col("text")).cast("long").as("r_chars"),
        regexp_count(col("text"), lit("\\S+")).cast("long").as("r_toks"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long")
          .as("r_nonws"),
        regexp_count(col("text"), lit("#")).cast("long").as("r_hash"),
        regexp_count(col("text"), lit("\\.\\.\\.")).cast("long").as("r_ellip"),
        regexp_count(col("text"), lit("(?<!\\S)[^\\p{L}\\s]*\\p{L}\\S*"))
          .cast("long").as("r_alpha"),
        regexp_count(col("text"), lit(alt(stops))).cast("long").as("r_stop"),
        regexp_count(col("text"), lit(alt(markers(0)))).cast("long").as("r_m0"),
        regexp_count(col("text"), lit(alt(markers(1)))).cast("long").as("r_m1"))
      .collect()
    val names = Seq("chars", "toks", "nonws", "hash", "ellip", "alpha",
      "stop", "m0", "m1")
    got.foreach { r =>
      names.zipWithIndex.foreach { case (nm, i) =>
        assert(r.getLong(1 + i) == r.getLong(1 + names.size + i),
          s"$nm diverges on case ${r.getLong(0)}: " +
            s"'${lexCases(r.getLong(0).toInt)}'")
      }
    }
  }

  test("langIdTable / textStatsTable / gopherRulesTable plan with zero shuffles") {
    import graft.operators.TextAnalysis
    // the scale claim of the fused-kernel rewrites: all three are
    // per-row projections — no Exchange anywhere (langIdTable used to
    // cost an explode + broadcast join + window)
    val docs = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    Seq(
      "langIdTable" -> TextAnalysis.langIdTable(docs, "doc_id", "text"),
      "textStatsTable" -> TextAnalysis.textStatsTable(docs, "doc_id", "text"),
      "gopherRulesTable" -> TextAnalysis.gopherRulesTable(docs, "doc_id", "text")
    ).foreach { case (name, df) =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$name shuffles:\n$plan")
    }
  }

  test("knnJoin ranks through the bounded-heap aggregate, not a window") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = graft.operators.Similarity
      .knnJoin(emb, "vec_id", "embedding", k = 2, nlist = 4, probeCells = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"knnJoin fell back to a window:\n$plan")
    assert(plan.contains("Aggregate"), s"no aggregate in knnJoin plan:\n$plan")
  }

  test("langIdTable per-row argmax equals the langId column fold") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "the cat and the hat of it"),
      (2L, "der hund und die katze und"),
      (3L, "le chat et les chiens le la"),
      (4L, "el que los gatos y perros"),
      (5L, "的 是 了 在 的"),
      (6L, "no markers whatsoever here"), // zero hits -> first lang
      (7L, "the der le el 的")) // all tie at 1 -> first lang
      .toDF("doc_id", "text")
    val viaTable = TextAnalysis.langIdTable(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(r => (r.getString(1), r.getLong(2)))
    val viaCol = df.orderBy("doc_id")
      .select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0))
    assert(viaTable.map(_._1).toSeq ==
      Seq("en", "de", "fr", "es", "zh", "en", "en"))
    assert(viaCol.toSeq == viaTable.map(_._1).toSeq)
    assert(viaTable(5)._2 == 0L)
    // the kernel's winning score must equal the regex-reference
    // langScore count for the predicted language (langScore is the
    // regex spelling the kernel replaced — kept as the reference
    // implementation this differential runs against)
    val scores = df.orderBy("doc_id").select(
        array(Seq("en", "de", "fr", "es", "zh")
          .map(l => TextAnalysis.langScore(col("text"), l)): _*))
      .collect().map(_.getSeq[Long](0))
    viaTable.zip(scores).foreach { case ((lang, score), ref) =>
      val li = Seq("en", "de", "fr", "es", "zh").indexOf(lang)
      assert(score == ref(li), s"kernel score for $lang != regex reference")
      assert(ref.forall(_ <= score), "argmax disagrees with regex scores")
    }
  }
}
