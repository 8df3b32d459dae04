package graft

import graft.functions.ExactMoments
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused int128 moments aggregator behind Pca.eigenExact /
  * powerIteration: carries, merges, refusals, and a property run
  * against sequential BigInt sums across partitionings. */
class ExactMomentsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def run(vecs: Seq[Seq[Long]], parts: Int, maxDim: Int = 128) = {
    val agg = udaf(new ExactMoments("test", maxDim),
      ExpressionEncoder[Seq[Long]]())
    val df =
      if (parts > 0) vecs.toDF("v").repartition(parts) else vecs.toDF("v")
    df.agg(agg(col("v")).as("m"))
      .select(col("m.n"), col("m.dim"), col("m.sums"), col("m.gram"))
      .head()
  }

  private def reference(vecs: Seq[Seq[Long]]) = {
    val d = vecs.head.size
    val sums = (0 until d).map(i => vecs.map(v => BigInt(v(i))).sum)
    val gram = for { i <- 0 until d; j <- i until d }
      yield vecs.map(v => BigInt(v(i)) * BigInt(v(j))).sum
    (sums.map(_.toString), gram.map(_.toString))
  }

  test("int128 carries: gram and sums exceed signed-64 without wrap") {
    // products of 3e9·3e9 = 9e18 per row sit just under Long.Max;
    // four rows force low-limb carries in both signs
    val vecs = Seq(Seq(3000000000L, -3000000000L),
      Seq(3000000000L, 3000000000L),
      Seq(-3000000000L, 3000000000L),
      Seq(3000000000L, -3000000000L))
    val r = run(vecs, parts = 3)
    val (es, eg) = reference(vecs)
    assert(r.getLong(0) == 4 && r.getInt(1) == 2)
    assert(r.getSeq[String](2) == es, "sums")
    assert(r.getSeq[String](3) == eg, "gram")
    // the diagonal really did exceed signed-64
    assert(BigInt(r.getSeq[String](3).head) > BigInt(Long.MaxValue))
  }

  test("property: random signed corpora match sequential BigInt sums " +
      "at every partitioning") {
    (0 until 3).foreach { seed =>
      val rnd = new scala.util.Random(104729 * (seed + 1))
      val n = 30 + rnd.nextInt(40); val d = 3 + rnd.nextInt(5)
      // the Pca grid: quantized 1e-6 longs, |x| <= 1e7
      val vecs = Seq.fill(n)(Seq.fill(d)(
        rnd.nextLong() % 10000000L))
      val (es, eg) = reference(vecs)
      Seq(1, 7, 64).foreach { p =>
        val r = run(vecs, p)
        assert(r.getLong(0) == n && r.getInt(1) == d, s"seed $seed p=$p")
        assert(r.getSeq[String](2) == es, s"seed $seed p=$p sums")
        assert(r.getSeq[String](3) == eg, s"seed $seed p=$p gram")
      }
    }
  }

  test("sustained carries: 200 near-max products across 64 partitions " +
      "exercise reduce AND merge carry paths against BigInt") {
    // every row's diagonal product is 9e18 (just under Long.Max), so
    // the low limb wraps roughly every other row inside partitions
    // AND during partial-buffer merges; signs alternate so borrows
    // (negative carries) run too
    val vecs = (0 until 200).map { i =>
      val s = if (i % 3 == 0) -1L else 1L
      Seq(3000000000L * s, -3000000000L)
    }
    val (es, eg) = reference(vecs)
    val r = run(vecs, parts = 64)
    assert(r.getLong(0) == 200 && r.getSeq[String](2) == es &&
      r.getSeq[String](3) == eg, "carry chain diverged from BigInt")
    assert(BigInt(r.getSeq[String](3).head).abs > BigInt(Long.MaxValue) * 90,
      "fixture failed to push the accumulator far past signed-64")
  }

  test("empty corpus finishes dim = -1; nulls are skipped") {
    val r = run(Seq.empty[Seq[Long]], parts = 0)
    assert(r.getLong(0) == 0L && r.getInt(1) == -1)
    val withNull = Seq(Seq(1L, 2L), null, Seq(3L, 4L))
    val r2 = run(withNull, parts = 2)
    assert(r2.getLong(0) == 2 && r2.getInt(1) == 2)
    assert(r2.getSeq[String](2) == Seq("4", "6"))
  }

  test("refusals: mixed dimensions and the dim cap throw loudly") {
    val e1 = intercept[Exception] {
      run(Seq(Seq(1L), Seq(1L, 2L)), parts = 1)
    }
    assert(e1.getMessage.contains("mixed dimensions"), e1.getMessage)
    val e2 = intercept[Exception] {
      run(Seq(Seq(1L, 2L, 3L)), parts = 1, maxDim = 2)
    }
    assert(e2.getMessage.contains("outside [1, 2]"), e2.getMessage)
  }
}
