package graft

import graft.functions.{ShingleExprs, TextExprs}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the round-20 kernel wirings bit-identical to the relational
  * chains they replaced (the r19 verdict's "wire or delete" ask):
  * DistinctCharGrams ≡ the old Dedup.charShingles spelling,
  * SigAgreeCount ≡ the zip_with agree count behind estJaccard, and
  * HostSuffixes ≡ the old TextAnalysis.hostSuffixes transform chain —
  * each over the documented degenerate branches. */
class ShingleParitySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  /** The pre-round-20 Dedup.charShingles relational spelling. */
  private def oldCharShingles(c: Column, n: Int): Column =
    when(length(c) >= n,
      array_distinct(transform(sequence(lit(1), length(c) - (n - 1)),
        i => c.substr(i, lit(n)))))
      .otherwise(array(c))

  test("DistinctCharGrams == charShingles chain, degenerate branches included") {
    val texts = Seq(
      null, "", "a", "ab", "abc", "abcd", "aaaaaaa", "abcabcabc",
      "the cat sat on the mat", "éclair über née", "日本語のテキスト",
      "x y", "  spaced  out  ", "\ttabs\nnewlines\t", "ababababab",
      ("quick brown fox " * 40).trim)
    for (n <- Seq(1, 2, 3, 5)) {
      val df = texts.toDF("t")
      val rows = df.select(col("t"),
          oldCharShingles(col("t"), n).as("old"),
          ShingleExprs.distinct_char_grams(col("t"), n).as("fused"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"mismatch n=$n text=${r.getString(0)}")
      }
      // the null branch must yield [null] on BOTH sides, not null
      val nullRow = rows.find(_.isNullAt(0)).get
      assert(!nullRow.isNullAt(1) && !nullRow.isNullAt(2) &&
        nullRow.getSeq[String](2) == Seq(null))
    }
  }

  /** The pre-round-20 Dedup.estJaccard agree-count spelling. */
  private def oldAgree(a: Column, b: Column): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), z => z))

  test("SigAgreeCount == size(filter(zip_with)) incl. unequal lengths and null slots") {
    val pairs: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L)),             // partial agree
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),             // full agree
      (Seq(1L, 2L), Seq(9L, 8L)),                     // zero agree
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 2L)),             // right shorter
      (Seq(1L), Seq(1L, 2L, 3L)),                     // left shorter
      (Seq(1L, null, 3L), Seq(1L, null, 3L)),         // null slots never agree
      (Seq(null, null), Seq(null, null)),
      (Seq.empty, Seq(1L, 2L)),                       // empty side
      (null, Seq(1L, 2L)),                            // null side -> null
      (Seq(1L, 2L), null))
    val df = pairs.toDF("a", "b")
    val rows = df.select(
        oldAgree(col("a"), col("b")).as("old"),
        ShingleExprs.sig_agree_count(col("a"), col("b")).as("fused"))
      .collect()
    rows.zip(pairs).foreach { case (r, p) =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null mismatch for $p")
      if (!r.isNullAt(0))
        assert(r.getInt(0) == r.getInt(1), s"count mismatch for $p")
    }
    // estJaccard itself: the full division parity on realistic sigs
    val est = df.filter(col("a").isNotNull && col("b").isNotNull)
      .select((oldAgree(col("a"), col("b")) / lit(4.0)).as("old"),
        graft.operators.Dedup.estJaccard(col("a"), col("b"), 4).as("fused"))
      .collect()
    est.foreach(r => assert(
      java.lang.Double.doubleToRawLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(r.getDouble(1))))
  }

  test("SigAgreeCount rejects non-long arrays at analysis time") {
    val df = Seq((Seq(1, 2), Seq(1, 2))).toDF("a", "b") // array<int>
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ShingleExprs.sig_agree_count(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("sig_agree_count") ||
      e.getMessage.toLowerCase.contains("data type mismatch"))
  }

  /** The pre-round-20 TextAnalysis.hostSuffixes relational spelling. */
  private def oldHostSuffixes(host: Column): Column = {
    val labels = split(host, "\\.")
    transform(sequence(lit(1), size(labels)), i =>
      array_join(slice(labels, i, size(labels)), "."))
  }

  test("HostSuffixes == transform/slice chain incl. consecutive and trailing dots") {
    val hosts = Seq(null, "", "com", "example.com", "a.b.example.com",
      "a..b", "trailing.", ".leading", "..", "xn--bcher-kva.example",
      "a.b.c.d.e.f.g.h")
    val df = hosts.toDF("h")
    val rows = df.select(col("h"),
        oldHostSuffixes(col("h")).as("old"),
        TextExprs.host_suffixes(col("h")).as("fused"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null mismatch for ${r.getString(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"mismatch for host=${r.getString(0)}")
    }
    // null in -> null out on both sides (explode drops the row)
    assert(rows.find(_.isNullAt(0)).get.isNullAt(1))
  }
}
