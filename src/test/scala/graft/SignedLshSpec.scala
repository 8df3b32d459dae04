package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Signed-projection LSH (the FULL-oracle twin of the Gaussian
  * lshPairs): determinism, subset-of-exact, and identical-vector
  * guarantees. */
class SignedLshSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private lazy val emb =
    Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("identical vectors always collide (every table, every bit)") {
    // clone vec 0 under a fresh id: sign projections are a function of
    // the vector alone, so the clone shares all 4 table buckets
    val clone = emb.filter(col("vec_id") === 0)
      .select(lit(999999L).as("vec_id"), col("embedding"), col("label"))
    val pairs = Similarity.signedLshPairs(emb.unionByName(clone), "vec_id",
        "embedding", bits = 6, dim = 64, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val hit = pairs.find(p => p._1 == 0L && p._2 == 999999L)
    assert(hit.nonEmpty, "identical pair missed by signed LSH")
    assert(hit.get._3 == 1.0)
  }

  test("pair scores equal the exact cosine; pair set is deterministic") {
    val run1 = Similarity.signedLshPairs(emb, "vec_id", "embedding",
      bits = 6, dim = 64, tables = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val run2 = Similarity.signedLshPairs(emb, "vec_id", "embedding",
      bits = 6, dim = 64, tables = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(run1 == run2 && run1.nonEmpty)
    // every emitted score matches the brute-force rounded cosine
    val exact = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(Similarity.cosine(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")), 4))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    run1.foreach { case (a, b, c) =>
      assert(exact((a, b)) == c, s"score mismatch on ($a,$b)")
    }
  }

  test("recall against brute-force high-cosine pairs at the operating point") {
    // signed projection preserves the Charikar collision geometry:
    // P[bit agrees] = 1 - theta/pi. On this corpus's top-cosine pairs
    // the 4x6-bit configuration must recover a usable fraction
    val exact = emb.as("a").join(emb.as("b"),
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        round(Similarity.cosine(col("a.embedding").cast("array<double>"),
          col("b.embedding").cast("array<double>")), 4).as("cos"))
      .orderBy(col("cos").desc, col("id_a"), col("id_b")).limit(20)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = Similarity.signedLshPairs(emb, "vec_id", "embedding",
        bits = 6, dim = 64, tables = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.3, f"recall $recall%.2f collapsed at 4x6 bits")
  }
}
