package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bpe

/**
 * Scale-shape pins for the BPE trainer/encoder rework (round 9):
 *
 *  1. training runs O(1) Spark jobs regardless of merge count — the
 *     corpus collapses to its vocabulary in ONE shuffle+collect and
 *     every merge round is in-memory incremental maintenance (the
 *     previous design ran one vocabulary-scale job PER MERGE: 30k
 *     merges = 30k job round-trips);
 *  2. the incremental trainer is bit-identical to the definition
 *     (full pair recount + top-1 each round);
 *  3. the priority-queue encoder is bit-identical to the rank-order
 *     sequential scan on every creation-ordered (i.e. trained) merge
 *     list, and refuses (falls back) on adversarial lists.
 */
class BpeScaleSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  /** The definition, kept as the test oracle: full pair count + top-1
    * per round, greedy apply everywhere. O(rounds × vocab) — test-only. */
  private def naiveTrain(vocab: Seq[(String, Long)],
                         merges: Int): Seq[(Int, String, String, Long)] = {
    var words = vocab.map { case (w, c) => (Bpe.charSymbols(w), c) }
    val out = Seq.newBuilder[(Int, String, String, Long)]
    for (rank <- 1 to merges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        (0 until syms.length - 1).foreach { i =>
          counts(syms(i) -> syms(i + 1)) =
            counts.getOrElse(syms(i) -> syms(i + 1), 0L) + c
        }
      }
      if (counts.nonEmpty) {
        val (p, c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }(
          Ordering.Tuple3(Ordering.Long,
            Ordering.comparatorToOrdering(utf8Cmp), Ordering.comparatorToOrdering(utf8Cmp)))
        out += ((rank, p._1, p._2, c))
        words = words.map { case (syms, cc) => (Bpe.applyMerge(syms, p._1, p._2), cc) }
      }
    }
    out.result()
  }
  private val utf8Cmp: java.util.Comparator[String] = (a: String, b: String) =>
    if (a == b) 0 else if (Bpe.utf8Less(a, b)) -1 else 1

  test("training runs a constant number of Spark jobs, not one per merge") {
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = jobs.incrementAndGet()
    }
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    spark.sparkContext.addSparkListener(listener)
    try {
      val merges = Bpe.learnMerges(docs, "text", merges = 20).collect()
      Thread.sleep(1500) // listener bus is async; let job-start events drain
      assert(merges.length == 20)
      // one vocab collect + one createDataset materialization is the
      // budget; the old design needed >= 20 (one top-1 job per merge)
      assert(jobs.get() <= 4, s"expected O(1) jobs, saw ${jobs.get()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("incremental trainer == per-round full recount on the real corpus vocab") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val vocab = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toSeq
    val fast = Bpe.learnMerges(docs, "text", merges = 40)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(fast == naiveTrain(vocab, 40))
  }

  test("incremental trainer == full recount under heavy tie pressure") {
    // every word same count → every round is decided by the utf8
    // tie-break; overlapping runs (aaaa) stress the greedy recount
    val vocab = Seq("aaaa", "aaab", "abab", "bbbb", "ba", "ab", "émü", "émé")
      .map((_, 3L))
    val fast = Bpe.trainInMemory(vocab.toArray, 25)
    assert(fast == naiveTrain(vocab, 25))
  }

  test("maxVocab caps the collected vocabulary deterministically") {
    val docs = Seq.fill(50)("top top top mid mid rare").toDF("text")
    // cap keeps {top, mid} only; merges learned from the capped vocab
    val m = Bpe.learnMerges(docs, "text", merges = 3, maxVocab = 2)
      .as[(Int, String, String, Long)].collect().sortBy(_._1)
    assert(m.nonEmpty && m.forall { case (_, l, r, _) =>
      !(l + r).contains("rare".substring(0, 2) + "re") })
    // and an uncapped run on the same corpus still sees 'rare'
    val full = Bpe.learnMerges(docs, "text", merges = 12)
      .as[(Int, String, String, Long)].collect()
    assert(full.exists { case (_, l, r, _) => (l + r).contains("ra") })
  }

  test("PQ encoder == sequential rank scan on trained merge lists") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val merges = Bpe.learnMerges(docs, "text", merges = 30)
      .orderBy("rank").as[(Int, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    assert(Bpe.isCreationOrdered(merges))
    val ranks = new java.util.HashMap[(String, String), Integer]()
    merges.zipWithIndex.foreach { case (p, i) => ranks.putIfAbsent(p, i) }
    val words = docs.select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(length(col("w")) > 0).distinct().as[String].collect()
    words.foreach { w =>
      var syms = Bpe.charSymbols(w)
      merges.foreach { case (l, r) => syms = Bpe.applyMerge(syms, l, r) }
      val pq = Bpe.encodeWordPQ(Bpe.charSymbols(w), ranks)
      assert(pq == syms.length, s"word '$w': pq=$pq seq=${syms.length}")
    }
  }

  test("adversarial (non-creation-ordered) lists are detected") {
    // (aa,b) before (a,a): 'aa' does not exist yet → not orderly
    assert(!Bpe.isCreationOrdered(Seq(("aa", "b"), ("a", "a"))))
    assert(Bpe.isCreationOrdered(Seq(("a", "a"), ("aa", "b"))))
    // Eow is a base symbol even though it is multi-char
    assert(Bpe.isCreationOrdered(Seq(("b", Bpe.Eow), ("a", "b" + Bpe.Eow))))
  }

  test("re-arming lists (product == earlier rule's operand) take the scan path") {
    // every operand here is base or previously created, yet PQ order
    // diverges: on "abcd" the rank scan never fires (abc,d) — no `abc`
    // exists when its turn comes — and ends at [abc, d] via (ab,c);
    // lowest-rank-first would merge (ab,c) and then RE-FIRE the
    // earlier (abc,d) on the product, ending at [abcd]. The guard must
    // reject the list so encodeTokenCounts stays on the definitional
    // sequential semantics.
    val rearming = Seq(("a", "b"), ("b", "c"), ("a", "bc"),
      ("abc", "d"), ("ab", "c"))
    assert(!Bpe.isCreationOrdered(rearming),
      "a later rule re-creating an earlier rule's operand must disqualify PQ")
    // end-to-end: the counted tokens follow the sequential semantics
    val docs = Seq((1L, "abcd")).toDF("doc_id", "text")
    val n = Bpe.encodeTokenCounts(docs, "doc_id", "text", rearming)
      .collect().head.getLong(1)
    var syms = Bpe.charSymbols("abcd")
    rearming.foreach { case (l, r) => syms = Bpe.applyMerge(syms, l, r) }
    assert(n == syms.length,
      s"encodeTokenCounts must match the rank scan: got $n want ${syms.length}")
  }
}
