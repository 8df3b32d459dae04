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
}
