package graft

import graft.operators.{Audio, Bpe, Multimodal, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-7 operator family: perceptual audio near-dup (the audio twin
  * of the qA3 image pipeline) plus the stereo-duration fix pin. */
class Round7OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("rms fingerprint is invariant to gain shift and aligned resample") {
    for (seed <- 0L until 25L) {
      val base = Audio.rmsFingerprint(
        Audio.syntheticEnvelopeWav(seed, 8000, 80)).get
      val resampled = Audio.rmsFingerprint(
        Audio.syntheticEnvelopeWav(seed, 4000, 40)).get
      val gained = Audio.rmsFingerprint(
        Audio.syntheticEnvelopeWav(seed, 8000, 80, gainDiv = 2)).get
      val both = Audio.rmsFingerprint(
        Audio.syntheticEnvelopeWav(seed, 4000, 40, gainDiv = 2)).get
      assert(base == resampled, s"resample changed fingerprint (seed $seed)")
      assert(base == gained, s"gain shift changed fingerprint (seed $seed)")
      assert(base == both, s"resample+gain changed fingerprint (seed $seed)")
    }
  }

  test("rms fingerprints are discriminative across seeds") {
    // every distinct-seed pair must sit FAR outside the radius-3 gate
    // the oracle depends on — check all pairs over 200 seeds
    val fps = (0L until 200L).map(s =>
      Audio.rmsFingerprint(Audio.syntheticEnvelopeWav(s, 8000, 80)).get)
    var minHam = 64
    for (i <- fps.indices; j <- (i + 1) until fps.size) {
      val h = java.lang.Long.bitCount(fps(i) ^ fps(j))
      if (h < minHam) minHam = h
    }
    assert(minHam > 3, s"cross-seed fingerprints within radius: $minHam")
  }

  test("audioNearDupPairs recovers exactly the planted resampled twins") {
    val media = spark.range(100).as[Long].map { id =>
      val payload =
        if (id % 2 == 0) Audio.syntheticEnvelopeWav(id / 2, 8000, 80)
        else Audio.syntheticEnvelopeWav(id / 2, 4000, 40, gainDiv = 2)
      Multimodal.MediaRow(id, payload)
    }
    val pairs = Audio.audioNearDupPairs(media, maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0L until 100L by 2).map(i => (i, i + 1)).toSet
    assert(pairs == planted)
  }

  test("fingerprint refuses stereo, short, and non-audio payloads") {
    assert(Audio.rmsFingerprint(Array.emptyByteArray).isEmpty)
    assert(Audio.rmsFingerprint("not a wav".getBytes).isEmpty)
    // fewer samples than frames
    assert(Audio.rmsFingerprint(
      Audio.syntheticSquareWav(8000, 32, 1000)).isEmpty)
  }

  test("bpe: merges match the hand-computed corpus, ties break lexicographically") {
    // corpus: aaab ×2, ab ×1 → symbols [a,a,a,b,</w>]×2, [a,b,</w>]×1
    // round 1: (a,a)=4 (overlapping positions count), (a,b)=3, (b,</w>)=3
    // round 2: (a,b)=3 TIES (b,</w>)=3 → lexicographic picks (a,b)
    // round 3: (ab,</w>)=3 beats (aa,ab)=2
    val docs = Seq("aaab aaab", "ab").toDF("text")
    val merges = Bpe.learnMerges(docs, "text", merges = 3)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(merges == Seq((1, "a", "a", 4L), (2, "a", "b", 3L),
      (3, "ab", "</w>", 3L)))
  }

  test("bpe: greedy left-to-right apply and early exhaustion") {
    // a a a under (a,a) merges the FIRST pair only: aa a
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "a"))
    assert(Bpe.applyMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "aa"))
    // single word 'ab' exhausts after 2 merges; asking for 5 stops early
    val out = Bpe.learnMerges(Seq("ab").toDF("text"), "text", merges = 5)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1, "a", "b", 1L), (2, "ab", "</w>", 1L)))
  }

  test("bpe encode: rank-ordered apply matches hand-computed token counts") {
    // same corpus as the training test; after merges (a,a), (a,b),
    // (ab,</w>):
    //   aaab: [a,a,a,b,</w>] → (a,a): [aa,a,b,</w>]
    //         → (a,b): [aa,ab,</w>] → (ab,</w>): [aa,ab</w>] = 2 tokens
    //   ab:   [a,b,</w>] → (a,b): [ab,</w>] → (ab,</w>): [ab</w>] = 1
    // doc "aaab aaab" = 4 tokens, doc "ab" = 1
    val docs = Seq((0L, "aaab aaab"), (1L, "ab")).toDF("doc_id", "text")
    val merges = Seq(("a", "a"), ("a", "b"), ("ab", Bpe.Eow))
    val counts = Bpe.encodeTokenCounts(docs, "doc_id", "text", merges)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(counts == Seq((0L, 4L), (1L, 1L)))
    // rank ORDER matters: "aab" = [a,a,b,</w>] under (a,a) then (aa,b)
    // merges twice → [aab,</w>] = 2 tokens; under (aa,b) then (a,a)
    // the (aa,b) pass sees no "aa" symbol yet → only (a,a) applies,
    // [aa,b,</w>] = 3 tokens
    val w = Seq((0L, "aab")).toDF("doc_id", "text")
    assert(Bpe.encodeTokenCounts(w, "doc_id", "text",
      Seq(("a", "a"), ("aa", "b"))).as[(Long, Long)].head()._2 == 2L)
    assert(Bpe.encodeTokenCounts(w, "doc_id", "text",
      Seq(("aa", "b"), ("a", "a"))).as[(Long, Long)].head()._2 == 3L)
  }

  test("bpe: symbols are code points, not Java chars") {
    // U+1F600 is a surrogate pair in UTF-16 but ONE symbol
    val syms = Bpe.charSymbols("a😀b")
    assert(syms == IndexedSeq("a", "😀", "b", Bpe.Eow))
  }

  test("domain filter: blocks exact hosts and subdomains, label-aligned") {
    val docs = Seq(
      (1L, "https://example.com/a"),        // blocked: exact
      (2L, "https://www.example.com/b"),    // blocked: subdomain
      (3L, "https://notexample.com/c"),     // kept: endswith would block
      (4L, "https://example.com.evil.io/d"),// kept: blocked name mid-host
      (5L, "https://safe.org/e"),           // kept
      (6L, "https://bad.safe.org/f")        // blocked: exact subdomain entry
    ).toDF("doc_id", "url_norm")
    val blocklist = Seq("example.com", "bad.safe.org").toDF("host")
    val kept = TextAnalysis.domainFilter(docs, "doc_id", "url_norm", blocklist)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L, 4L, 5L))
  }

  test("host suffixes are label-aligned dot-suffixes") {
    val out = Seq("a.b.com").toDF("h")
      .select(TextAnalysis.hostSuffixes(col("h"))).as[Seq[String]]
      .collect().head
    assert(out == Seq("a.b.com", "b.com", "com"))
  }

  test("qAD plan runs the stripHtml chain exactly once — at the checkpoint") {
    // qAD materializes `cleaned` (= stripHtml + normalizeUrl) into a
    // localCheckpoint BEFORE the url-dedup self-join (round 10; the
    // chain previously re-inlined into the agg branch and every other
    // consumer). The pin is now the STRONGER property: the queryable
    // plan must contain NO trace of the strip chain at all — the
    // chain ran once, at checkpoint time, and everything downstream
    // (self-join, gopher filter, join-back) reads checkpointed rows.
    // A regression that drops the checkpoint puts the distinctive
    // script-block pattern back into this plan and fails here.
    val exec = graft.queries.Pipeline
      .queries("qAD_web_ingest")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
    val s = exec.toString
    assert(!s.contains("<script"),
      s"stripHtml chain re-entered the query plan:\n$s")
    assert(s.contains("ExistingRDD"),
      s"expected checkpointed-scan leaves:\n$s")
    val aggs = exec.collect { case a if a.nodeName.contains("Aggregate") => a }
    assert(aggs.nonEmpty, "expected the url_norm dedup aggregate")
  }

  test("stereo WAV duration uses frames, not interleaved samples") {
    // hand-built canonical 16-bit stereo WAV: 400 frames at 8 kHz
    // = 50 ms of audio; the interleaved sample count is 800
    val frames = 400
    val dataLen = frames * 4
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1); buf.putShort(2) // PCM, stereo
    buf.putInt(8000); buf.putInt(8000 * 4)
    buf.putShort(4); buf.putShort(16)
    buf.put("data".getBytes); buf.putInt(dataLen)
    for (_ <- 0 until frames) { buf.putShort(1000); buf.putShort(-1000) }
    val d = Audio.decodeWav(buf.array()).get
    assert(d.channels == 2 && d.nSamples == 800 && d.nFrames == 400)
    val meta = Audio.audioMeta(
        Seq(Multimodal.MediaRow(1L, buf.array())).toDS()).collect().head
    assert(meta.duration_ms == 50.0,
      s"stereo duration should be frames/rate, got ${meta.duration_ms}")
  }
}
