package graft

import graft.operators.Preference
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PreferenceSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def pairsOf(df: org.apache.spark.sql.DataFrame,
                      maxJac: Double = 0.9) =
    Preference.preferencePairs(df, "prompt_id", "resp_id", "text", "score",
        maxJaccard = maxJac)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3),
        r.getLong(6), r.getDouble(7), r.getBoolean(8)))).toMap

  test("preferencePairs: selection, tie-breaks, near-dup guard by hand") {
    val df = Seq(
      // prompt 1: clear winner/loser, disjoint vocab
      (1L, 10L, "alpha beta gamma delta", 5L),
      (1L, 11L, "omega", 1L),
      (1L, 12L, "middle answer here", 3L),
      // prompt 2: ALL scores tie -> chosen = min id, rejected = max id
      (2L, 20L, "aa bb", 2L), (2L, 21L, "cc", 2L), (2L, 22L, "dd ee ff", 2L),
      // prompt 3: chosen and rejected near-identical -> guarded out
      (3L, 30L, "same words every time", 9L),
      (3L, 31L, "same words every time", 0L),
      // prompt 4: single response -> degenerate, keep = false
      (4L, 40L, "lonely", 7L),
      // prompt 5: both legs token-less -> jaccard 1 by convention
      (5L, 50L, "", 8L), (5L, 51L, "   ", 1L)
    ).toDF("prompt_id", "resp_id", "text", "score")
    val p = pairsOf(df)
    // prompt 1: (10 chosen score 5, 11 rejected score 1), delta 4-1=3,
    // disjoint vocab -> jaccard 0, kept
    assert(p(1L) == ((10L, 11L, 3L, 0.0, true)), p(1L).toString)
    // prompt 2: ties -> (min id 20, max id 22), delta 2-3 = -1, kept
    assert(p(2L) == ((20L, 22L, -1L, 0.0, true)), p(2L).toString)
    // prompt 3: identical texts -> jaccard 1, dropped
    assert(p(3L) == ((30L, 31L, 0L, 1.0, false)), p(3L).toString)
    // prompt 4: chosen == rejected == the only row -> dropped
    assert(p(4L) == ((40L, 40L, 0L, 1.0, false)), p(4L).toString)
    // prompt 5: empty responses are identical by convention
    assert(p(5L) == ((50L, 51L, 0L, 1.0, false)), p(5L).toString)
    // an UNSCORED response is invisible: it can be neither leg and
    // does not count toward n_resp (a null in the selection key would
    // make the argmax engine-dependent)
    val withNull = Seq(
      (6L, 60L, "scored a b", java.lang.Long.valueOf(4L)),
      (6L, 61L, "best text ever", null.asInstanceOf[java.lang.Long]),
      (6L, 62L, "scored c", java.lang.Long.valueOf(1L))
    ).toDF("prompt_id", "resp_id", "text", "score")
    val q = Preference.preferencePairs(withNull, "prompt_id", "resp_id",
        "text", "score")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).head
    assert(q == ((2L, 60L, 62L)), s"null-scored row leaked in: $q")
  }

  test("preferencePairs: jaccard arithmetic exact, threshold strict") {
    // |A|=4, |B|=3, |A∩B|=2 -> union 5, jaccard 0.4
    val df = Seq(
      (1L, 1L, "a b c d", 2L),
      (1L, 2L, "c d e", 1L)
    ).toDF("prompt_id", "resp_id", "text", "score")
    val p = pairsOf(df)
    assert(p(1L) == ((1L, 2L, 1L, 0.4, true)), p(1L).toString)
    // at maxJaccard = 0.4 the SAME pair is dropped (strict <)
    val strict = pairsOf(df, maxJac = 0.4)
    assert(!strict(1L)._5, "jaccard == maxJaccard must drop")
    // duplicate tokens collapse to the SET (jaccard is set-based)
    val dup = Seq(
      (1L, 1L, "a a a b", 2L),
      (1L, 2L, "a b b b", 1L)
    ).toDF("prompt_id", "resp_id", "text", "score")
    assert(pairsOf(dup)(1L)._4 == 1.0, "token multiset must not leak in")
  }

  test("preferencePairs: carry takes the CHOSEN row's columns; ids validated") {
    val df = Seq(
      (1L, 1L, "winner text", 9L, "modelA"),
      (1L, 2L, "loser text", 1L, "modelB")
    ).toDF("prompt_id", "resp_id", "text", "score", "src")
    val out = Preference.preferencePairs(df, "prompt_id", "resp_id",
        "text", "score", carry = Seq("src")).collect()
    assert(out.length == 1 && out.head.getAs[String]("src") == "modelA")
    val bad = Seq(("p", "x", "t", 1L)).toDF("prompt_id", "resp_id", "text",
      "score")
    val ex = intercept[IllegalArgumentException] {
      Preference.preferencePairs(bad, "prompt_id", "resp_id", "text", "score")
    }
    assert(ex.getMessage.contains("integral"))
  }

  test("plan pin: preferencePairs is ONE aggregate, no join, on real testdata") {
    // the packed-key max_by/min_by design exists so the corpus
    // shuffles exactly once — a join-based chosen×rejected plan
    // would shuffle it three times
    val r = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(expr("doc_id div 4").as("prompt_id"),
        col("doc_id").as("resp_id"), col("text"),
        (col("doc_id") % 7).as("score"))
    val plan = Preference.preferencePairs(r, "prompt_id", "resp_id",
      "text", "score").queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Join"),
      plan.take(800))
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly one shuffle:\n${plan.take(800)}")
  }

  test("cross-pair leak guard: near-dup legs across prompts split together") {
    import graft.operators.{Dedup, Sampling}
    // prompts 1 and 3 share a near-identical CHOSEN response — a
    // train/val split by prompt alone could put the duplicate on both
    // sides; composing with the existing leak-free split (q9R) over
    // leg-text near-dup edges forces linked prompts onto ONE side
    val resp = Seq(
      (1L, 10L, "the quick brown fox jumps over the lazy dog today", 5L),
      (1L, 11L, "completely different animal story entirely", 1L),
      (2L, 20L, "unrelated cooking recipe with many steps involved", 4L),
      (2L, 21L, "a short note", 1L),
      (3L, 30L, "the quick brown fox jumps over the lazy dog tonight", 7L),
      (3L, 31L, "yet another unrelated reply text", 2L)
    ).toDF("prompt_id", "resp_id", "text", "score")
    val pairs = Preference.preferencePairs(resp, "prompt_id", "resp_id",
      "text", "score")
    // legs carried back to their prompt: near-dup edges between leg
    // texts become edges between PROMPTS
    val legs = pairs.select(col("prompt_id").as("pid"),
        col("chosen_id").as("resp_id"))
      .union(pairs.select(col("prompt_id").as("pid"),
        col("rejected_id").as("resp_id")))
      .join(resp, Seq("resp_id"))
      .select((col("pid") * 1000 + col("resp_id")).as("leg_id"), col("text"))
    val dup = Dedup.prefixFilterJaccardPairs(legs, "leg_id", "text",
      shingleWords = 3, minJaccard = 0.5)
    val promptEdges = dup.select((col("id_a") / 1000).cast("long").as("a"),
      (col("id_b") / 1000).cast("long").as("b"))
    val split = Sampling.leakFreeSplit(
        resp.select("prompt_id").distinct(), "prompt_id",
        promptEdges, "a", "b", valBound = "8")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(split.size == 3)
    assert(split(1L) == split(3L),
      s"near-dup chosen legs straddle the split: $split")
  }

  test("lengthBias: exact sums, only kept pairs count") {
    val pairs = Seq(
      // (by, delta, keep): kept deltas 3, -1, 2 -> sum 4, avg 4/3,
      // 2 of 3 chosen-longer; the dropped +100 must not leak in
      ("web", 3L, true), ("web", -1L, true), ("web", 2L, true),
      ("web", 100L, false),
      ("books", -5L, true)
    ).toDF("source", "delta_tokens", "keep")
    val out = Preference.lengthBias(pairs, "source")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("web") == ((3L, 4L, 1.333333, 0.666667)), out("web").toString)
    assert(out("books") == ((1L, -5L, -5.0, 0.0)), out("books").toString)
  }
}
