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

  test("LshSignatures kernel == the composed array-dot fold, bit for bit") {
    // the fused kernel must reproduce the fold spelling it replaced —
    // per-bit dot sign over the SAME planes, including the float →
    // double per-element promotion order — or bucket assignment (and
    // the qAT oracle replay) silently drifts
    val (tables, bits, dim) = (4, 6, 64)
    val planes = Similarity.signedPlanes(tables, bits, dim)
    val planesArr = planes.map(_._3.toArray).toArray
    val kernel = graft.functions.ArrayDot.lsh_signatures(
      col("embedding"), planesArr, tables, bits)
    val v = col("embedding").cast("array<double>")
    val fold = array((0 until tables).map { t =>
      planes.collect { case (`t`, b, s) => (b, s) }
        .foldLeft(lit(0)) { case (acc, (b, s)) =>
          acc.bitwiseOR(shiftleft(
            when(graft.functions.ArrayDot.array_dot(v, typedLit(s)) > 0, 1)
              .otherwise(0), b))
        }
    }: _*)
    emb.select(col("vec_id"), kernel.as("k"), fold.as("f")).collect()
      .foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"signature mismatch for vec ${r.getLong(0)}")
      }
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

  test("LshSignatures type discipline: int arrays coerce, non-arrays fail analysis") {
    val (tables, bits, dim) = (2, 4, 3)
    val planes = Similarity.signedPlanes(tables, bits, dim)
      .map(_._3.toArray).toArray
    // integral element types implicitly cast to array<double> (the old
    // signedLshPairs cast-to-double behavior), not misread as doubles
    val ints = Seq((1L, Seq(1, -2, 3)), (2L, Seq(-1, 2, -3)))
      .toDF("id", "v")
    val viaInt = ints.select(col("id"), graft.functions.ArrayDot
      .lsh_signatures(col("v"), planes, tables, bits).as("sig")).collect()
    val viaDouble = ints.select(col("id"), graft.functions.ArrayDot
      .lsh_signatures(col("v").cast("array<double>"), planes, tables, bits)
      .as("sig")).collect()
    assert(viaInt.map(_.getSeq[Int](1)).toSeq ==
      viaDouble.map(_.getSeq[Int](1)).toSeq)
    // a non-array child is an ANALYSIS error (type check), not an
    // executor ClassCastException
    val bad = intercept[org.apache.spark.sql.AnalysisException] {
      ints.select(graft.functions.ArrayDot
        .lsh_signatures(col("id"), planes, tables, bits)).collect()
    }
    assert(bad.getMessage.toLowerCase.contains("type"))
  }

  test("LshSignatures value equality survives separate construction (CSE-able)") {
    // Array-typed constructor params would make two separately built
    // but identical instances reference-unequal and defeat
    // semanticEquals / subexpression elimination. Use a stable child
    // (a Column-wrapped child carries an Origin stack trace that
    // legitimately differs per construction site).
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    def expr() = graft.functions.LshSignatures(
      BoundReference(0, ArrayType(DoubleType), nullable = false),
      Similarity.signedPlanes(2, 4, 3).map(_._3), 2, 4)
    assert(expr() == expr())
    assert(expr().semanticEquals(expr()))
  }
}
