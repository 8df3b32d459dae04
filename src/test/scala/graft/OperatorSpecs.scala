package graft

import graft.operators.{AsOfJoin, Dedup, Similarity, TextAnalysis}
import graft.functions.{ArrayDot, RollingMinHash}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "alpha beta gamma delta epsilon zeta eta theta"),
    (1L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 0
    (2L, "alpha beta gamma delta epsilon zeta eta iota"), // near dup of 0
    (3L, "one two three four five six seven eight"), // unrelated
    (4L, "nine ten eleven twelve thirteen fourteen fifteen sixteen")
  ).toDF("doc_id", "text")

  test("exact dedup keeps min-id representative with copy count") {
    val out = Dedup.exact(docs.unionByName(docs), "doc_id", Seq("text"))
      .orderBy("doc_id").collect()
    // texts 0 and 1 are identical → one group of 4 copies (doubled), others 2
    assert(out.map(_.getAs[Long]("n_copies")).toSeq.sorted == Seq(2L, 2L, 2L, 4L))
    assert(out.map(_.getAs[Long]("doc_id")).toSeq.sorted == Seq(0L, 2L, 3L, 4L))
  }

  test("minhash LSH finds dup + near-dup pairs, not unrelated ones") {
    val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleWords = 2, k = 64, bands = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3))).toMap
    assert(pairs.get((0L, 1L)).contains(1.0)) // exact dup
    assert(pairs.get((0L, 2L)).exists(_ > 0.5)) // near dup
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((3L, 4L)))
    // estimate correlates with exact on detected pairs
    val est = Dedup.minhashCandidates(docs, "doc_id", "text", 2, 64, 16)
      .collect().map(r => (r.getDouble(2), r.getDouble(3)))
    est.foreach { case (e, j) => assert(math.abs(e - j) < 0.35) }
  }

  test("ngram jaccard exact pairs") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((0L, 1L)) && out.contains((0L, 2L)))
    assert(!out.exists { case (a, b) => b == 3L || a == 3L })
  }

  test("simhash: identical docs get identical signatures, hamming 0") {
    val sigs = Dedup.simhash(docs, "doc_id", TextAnalysis.tokens(col("text")))
    val m = sigs.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(0L) == m(1L))
    // near-dup (one token differs) stays far closer than unrelated docs
    assert(java.lang.Long.bitCount(m(0L) ^ m(2L)) <
      java.lang.Long.bitCount(m(0L) ^ m(3L)))
    val pairs = Dedup.simhashPairs(sigs, maxHamming = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(pairs((0L, 1L)) == 0) // identical docs always share every band
  }
}

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("ArrayDot: known value, both float and double arrays") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val got = df.select(ArrayDot.array_dot(col("a"), col("b"))).head.getDouble(0)
    assert(got == 32.0)
    val dd = Seq((Array(1.0, 2.0), Array(0.5, 4.0))).toDF("a", "b")
    assert(dd.select(ArrayDot.array_dot(col("a"), col("b"))).head.getDouble(0) == 8.5)
  }

  test("cosine of identical vectors is 1") {
    val df = Seq(Tuple1(Array(0.6f, 0.8f))).toDF("v")
    val c = df.select(Similarity.cosine(col("v"), col("v"))).head.getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)), // closest to 0
      (2L, Array(0.0f, 1.0f)), // orthogonal
      (3L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 2)
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(1L, 3L))
  }

  test("knnJoin on a corpus smaller than nlist does not crash") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val out = graft.operators.Similarity
      .knnJoin(emb, "vec_id", "embedding", k = 2, nlist = 16, probeCells = 16)
      .collect()
    assert(out.length == 10 * 2) // every vector still gets k neighbours
  }

  test("knnJoin with all cells probed equals exact per-vector top-k") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val knn = graft.operators.Similarity
      .knnJoin(emb, "vec_id", "embedding", k = 5, nlist = 8, probeCells = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    (0L until 20L).foreach { q =>
      val want = graft.operators.Similarity
        .bruteForceTopK(emb, "vec_id", "embedding", q, 5)
        .collect().map(_.getLong(0)).toSet
      assert(want.forall(n => knn.contains((q, n))), s"vec $q")
    }
    // partial probing trades recall for linear candidates — measured
    // 0.72 at nlist=8/probe=4 on this corpus (no planted neighbours)
    val partial = graft.operators.Similarity
      .knnJoin(emb, "vec_id", "embedding", k = 5, nlist = 8, probeCells = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rs = (0L until 30L).map { q =>
      val want = graft.operators.Similarity
        .bruteForceTopK(emb, "vec_id", "embedding", q, 5)
        .collect().map(_.getLong(0)).toSet
      want.count(n => partial.contains((q, n))) / 5.0
    }
    assert(rs.sum / rs.size >= 0.7)
  }

  test("lshPairs only scores same-bucket pairs and computes exact cosine") {
    val emb = (0 until 20).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat))).toDF("vec_id", "embedding")
    val pairs = Similarity.lshPairs(emb, "vec_id", "embedding", bits = 4, dim = 8).collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(r.getDouble(2) <= 1.0001 && r.getDouble(2) >= -1.0001))
  }
}

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("backward as-of join: latest right at or before left time") {
    val trades = Seq( // key, time, qty
      ("A", 10L, 1), ("A", 20L, 2), ("A", 30L, 3), ("B", 15L, 4)
    ).toDF("sym", "ts", "qty")
    val quotes = Seq( // key, time, price
      ("A", 5L, 100.0), ("A", 20L, 105.0), ("A", 25L, 110.0), ("B", 99L, 50.0)
    ).toDF("sym", "ts", "price")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
        rightPayload = Seq("price"))
      .select("sym", "ts", "qty", "asof_ts", "asof_price")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(out == Set(
      ("A", 10L, Some(5L), Some(100.0)),
      ("A", 20L, Some(20L), Some(105.0)), // inclusive match at equality
      ("A", 30L, Some(25L), Some(110.0)),
      ("B", 15L, None, None) // no earlier quote → nulls
    ))
  }

  test("null payload on the LATEST matching right row stays null") {
    // DuckDB ASOF returns the latest row's values AS-IS: a null price at
    // ts=20 must NOT be papered over by ts=5's non-null price
    val trades = Seq(("A", 30L, 1)).toDF("sym", "ts", "qty")
    val quotes = Seq(
      ("A", 5L, Some(100.0)), ("A", 20L, Option.empty[Double])
    ).toDF("sym", "ts", "price")
    val out = AsOfJoin.backward(trades, quotes, Seq("sym"), "ts", "ts",
        rightPayload = Seq("price"))
      .select("asof_ts", "asof_price").collect().head
    assert(out.getLong(0) == 20L)   // matched the latest row...
    assert(out.isNullAt(1))         // ...and kept its null payload
    // agreement with the native exec on the same case
    val native = graft.plans.AsOfJoinNative.backward(trades, quotes,
        Seq("sym"), "ts", "ts", rightPayload = Seq("price"))
      .select("asof_ts", "asof_price").collect().head
    assert(native.getLong(0) == 20L && native.isNullAt(1))
  }
}

class AsOfJoinNativeSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("native exec equals crafted expectations incl. null and tie cases") {
    val trades = Seq(("A", 10L, 1), ("A", 20L, 2), ("A", 30L, 3), ("B", 15L, 4))
      .toDF("sym", "ts", "qty")
    val quotes = Seq(("A", 5L, 100.0), ("A", 20L, 105.0), ("A", 25L, 110.0),
      ("B", 99L, 50.0)).toDF("sym", "ts", "price")
    val out = graft.plans.AsOfJoinNative.backward(trades, quotes, Seq("sym"),
        "ts", "ts", rightPayload = Seq("price"))
      .select("sym", "ts", "qty", "asof_ts", "asof_price")
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]),
        Option(r.get(4)).map(_.asInstanceOf[Double]))).toSet
    assert(out == Set(
      ("A", 10L, Some(5L), Some(100.0)),
      ("A", 20L, Some(20L), Some(105.0)),
      ("A", 30L, Some(25L), Some(110.0)),
      ("B", 15L, None, None)))
  }

  test("native exec agrees with the window-composition operator on events") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("event_id", "user_id", "ts", "asof_ts", "asof_event_id")
      .collect().map(_.toSeq).toSet
    val composed = norm(AsOfJoin.backward(views, clicks, Seq("user_id"),
      "ts", "ts", rightPayload = Seq("event_id")))
    val native = norm(graft.plans.AsOfJoinNative.backward(views, clicks,
      Seq("user_id"), "ts", "ts", rightPayload = Seq("event_id")))
    assert(native == composed && native.nonEmpty)
  }

  test("physical plan is the custom exec with one shuffle per side") {
    val trades = Seq(("A", 10L, 1)).toDF("sym", "ts", "qty")
    val quotes = Seq(("A", 5L, 2.0)).toDF("sym", "ts", "price")
    val df = graft.plans.AsOfJoinNative.backward(trades, quotes, Seq("sym"),
      "ts", "ts", rightPayload = Seq("price"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin ")) // AsOfJoinExec nodeName
    assert(plan.split("Exchange hashpartitioning").length == 3) // one shuffle per side
  }
}

class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("RollingMinHash: deterministic, window edge cases, codegen = interpreted") {
    val b = 1000000007L
    def bpow(w: Int) = { var p = 1L; (1 until w).foreach(_ => p *= b); p }
    // string shorter than window hashes the whole string
    val s = "abc"
    val whole = RollingMinHash.minHash(s.getBytes, 16, b, bpow(16))
    assert(whole == s.getBytes.foldLeft(0L)((h, c) => h * b + (c & 0xFF)))
    assert(RollingMinHash.minHash(Array.emptyByteArray, 16, b, bpow(16)) == 0L)
    // dataframe (codegen) path equals the static function
    val df = Seq("the quick brown fox jumps over the lazy dog").toDF("t")
    val viaDf = df.select(RollingMinHash.rolling_min_hash(col("t"), 16)).head.getLong(0)
    val direct = RollingMinHash.minHash(
      "the quick brown fox jumps over the lazy dog".getBytes, 16, b, bpow(16))
    assert(viaDf == direct)
    // shared windows between near-identical strings give equal fingerprints
    val df2 = Seq("PREFIX common window content SUFFIX1", "XX common window content SUFFIX2")
      .toDF("t")
    // not asserted equal (different strings) — just deterministic across runs
    val fps = df2.select(RollingMinHash.rolling_min_hash(col("t"), 8)).collect().map(_.getLong(0))
    assert(fps.length == 2)
  }

  test("langId picks the max-marker language; first wins ties") {
    val df = Seq(
      "der hund und die katze und das haus", // de
      "the cat of the house and a dog", // en
      "le chat et la maison et les chiens", // fr
      "xyzzy plugh" // no markers → first lang (en) by tie rule
    ).toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).collect().map(_.getString(0)).toSeq
    assert(got == Seq("de", "en", "fr", "en"))
  }

  test("token count and stopword ratio") {
    val df = Seq("the quick  brown fox \t the end").toDF("text")
    assert(df.select(TextAnalysis.tokenCount(col("text"))).head.getInt(0) == 6)
    val ratio = df.select(TextAnalysis.stopwordRatio(col("text"))).head.getDouble(0)
    assert(math.abs(ratio - 2.0 / 6.0) < 1e-12)
  }
}

class EncoderSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._
  import graft.encoders.ResultEncoder

  test("int64 as string, floats native, nulls, count* coercion (A3)") {
    val df = Seq((1704067200000000000L, 1.5, true, "msg"))
      .toDF("time", "value", "active", "message")
      .withColumn("count_null", lit(null).cast("long"))
      .withColumn("other_null", lit(null).cast("string"))
    val json = ResultEncoder.toJsonString(df)
    assert(json.contains(""""time":"1704067200000000000""""))
    assert(json.contains(""""value":1.5"""))
    assert(json.contains(""""active":true"""))
    assert(json.contains(""""count_null":0"""))
    assert(json.contains(""""other_null":null"""))
    assert(json.startsWith("""{"results":["""))
  }

  test("column order: time first, rest alphabetical (flightsql.go:313-324)") {
    val df = Seq((1L, 2L, 3L)).toDF("zeta", "time", "alpha")
    assert(ResultEncoder.orderedColumns(df) == Seq("time", "alpha", "zeta"))
  }

  test("timestamps render RFC3339Nano UTC") {
    val df = Seq(Tuple1(java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-01T12:34:56.789Z")))).toDF("t")
    val json = ResultEncoder.toJsonString(df)
    assert(json.contains("2024-03-01T12:34:56.789000000Z"))
  }

  test("ndjson: one object per line") {
    val df = Seq(1, 2, 3).toDF("n")
    val nd = ResultEncoder.toNdjsonString(df)
    assert(nd.trim.split("\n").length == 3)
  }
}
