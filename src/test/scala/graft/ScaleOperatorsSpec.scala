package graft

import graft.operators.{Dedup, IvfIndex, Skew}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOperatorsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("salted join equals plain join (inner + left), fans hot key") {
    val large = (1 to 1000).map(i => (if (i % 10 == 0) 7L else i.toLong, i))
      .toDF("k", "v") // key 7 is hot
    val small = Seq((7L, "hot"), (3L, "cold")).toDF("k", "tag")
    val plain = large.join(small, Seq("k")).select("k", "v", "tag")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(large, small, Seq("k"), n = 8,
      discriminators = Seq("v")).select("k", "v", "tag")
      .collect().map(_.toSeq).toSet
    assert(salted == plain && plain.nonEmpty)
    val plainLeft = large.join(small, Seq("k"), "left").select("k", "v", "tag")
      .collect().map(_.toSeq).toSet
    val saltedLeft = Skew.saltedJoin(large, small, Seq("k"), 8, "left", Seq("v"))
      .select("k", "v", "tag").collect().map(_.toSeq).toSet
    assert(saltedLeft == plainLeft)
    // the hot key actually spreads across salts
    val spread = large.filter($"k" === 7)
      .select(Skew.salt(8, col("v"))).distinct().count()
    assert(spread > 1)
  }

  test("IVF search finds the same top neighbours as brute force (high recall)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val centroids = IvfIndex.train(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    assert(centroids.size == 8 && centroids.head.size == 64)
    val path = "target/ivf_index_spec"
    IvfIndex.writeIndex(emb, "vec_id", "embedding", centroids, path)
    val indexed = IvfIndex.readIndex(spark, path)
    val ivf = IvfIndex.searchIndexed(indexed, "vec_id", "embedding", centroids,
      queryId = 0L, k = 10, nprobe = 8) // probe all cells → exact
      .collect().map(_.getLong(0)).toSeq
    val brute = graft.operators.Similarity
      .bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .collect().map(_.getLong(0)).toSeq
    assert(ivf == brute) // nprobe = nlist ⇒ must match exactly
    val partial = IvfIndex.searchIndexed(indexed, "vec_id", "embedding",
      centroids, queryId = 0L, k = 10, nprobe = 2).collect()
    assert(partial.length == 10) // recall path returns k results
    // the search plan reads only the probed cells (partition pruning)
    val pruned = indexed.filter(col("ivf_cell").isin(
      IvfIndex.probeCells(
        indexed.filter(col("vec_id") === 0L)
          .select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toSeq,
        centroids, 2): _*))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [ivf_cell"))
  }

  test("MinHash LSH candidate recall >= 0.9 against the exact pair set") {
    // ground truth: the prefix-filtered EXACT Jaccard join (100% recall
    // by construction, DuckDB-oracled as q91); measure what fraction of
    // true J>=0.8 pairs the banded MinHash candidates recover
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = Dedup.prefixFilterJaccardPairs(docs, "doc_id", "text",
        shingleWords = 3, minJaccard = 0.8)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.size >= 20) // sf0.001 plants ~28 true near-dup pairs
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text",
        shingleWords = 3, k = 64, bands = 16, minEstJaccard = 0.0)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.count(cand.contains) / exact.size.toDouble
    assert(recall >= 0.9, s"LSH recall $recall over ${exact.size} exact pairs")
  }

  test("dedupCorpus drops near-dup higher ids, keeps everything else") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different content about other things entirely now"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota")
    ).toDF("doc_id", "text")
    val kept = Dedup.dedupCorpus(docs, "doc_id", "text", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.contains(0L) && kept.contains(2L))
    assert(!kept.contains(1L)) // exact dup of 0
  }
}
