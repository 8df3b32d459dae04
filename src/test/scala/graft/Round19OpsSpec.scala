package graft

import graft.operators.{ProductQuantizer, Retention}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round19OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  test("changepointMean: contrast-safe bound refuses the 2x case") {
    // r18 ADVICE case: n=2, x = [4.6e18, -9.2e18]. |C_1| = 4.6e18
    // passes the old (2^63-1)/n bound (4.61e18) but the contrast
    // n*C_1 - 1*C_2 = 9.2e18 + 4.6e18 ~ 1.38e19 overflows signed-64.
    // The halved bound must refuse it with the CURATED error, not an
    // uncurated ANSI ArithmeticException.
    val d = Seq(("g", 1L, 4600000000000000000L),
      ("g", 2L, -9200000000000000000L)).toDF("g", "seq", "x")
    val e = intercept[Exception] {
      Retention.changepointMean(d, "g", "seq", "x").collect()
    }
    assert(e.getMessage.contains("overflows signed-64"), e.getMessage)
    // just inside the new bound: (2^63-1)/(2n) with n=4 is ~1.15e18;
    // prefix sums stay below it and the contrast computes exactly
    val ok = Seq(("g", 1L, 1000000000000000000L), ("g", 2L, -999999999999999999L),
      ("g", 3L, 1L), ("g", 4L, -2L)).toDF("g", "seq", "x")
    val r = Retention.changepointMean(ok, "g", "seq", "x").collect().head
    assert(r.getBoolean(7), "in-bound series must compute")
  }

  test("pq encode/encodeExact drop null vectors; shortlist unpoisoned") {
    // one null-embedding row: ascending approx_dist sorts nulls
    // FIRST, so pre-fix it would displace a real shortlist candidate
    val base = emb.select(col("vec_id"), col("embedding")).limit(40)
    val withNull = base.unionByName(
      Seq((9999L, null.asInstanceOf[Seq[Double]]))
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast(
          base.schema("embedding").dataType)))

    val cb = ProductQuantizer.train(base, "vec_id", "embedding",
      m = 8, ksub = 4)
    val enc = ProductQuantizer.encode(withNull, "embedding", cb)
    assert(!enc.select(col("vec_id")).collect().map(_.getLong(0))
      .contains(9999L), "encode must drop null vectors")
    val top = ProductQuantizer.searchRerank(enc, "vec_id", "embedding",
      cb, queryId = 0L, k = 5, shortlist = 10).collect()
    assert(top.nonEmpty && !top.map(_.getLong(0)).contains(9999L))

    val cbx = ProductQuantizer.trainExact(base, "vec_id", "embedding",
      m = 8, ksub = 4)
    val encx = ProductQuantizer.encodeExact(withNull, "embedding", cbx)
    assert(!encx.select(col("vec_id")).collect().map(_.getLong(0))
      .contains(9999L), "encodeExact must drop null vectors")
    val codes = encx.select(col("vec_id"), col("pq_codes"))
    val topx = ProductQuantizer.searchRerankExact(codes, withNull,
      "vec_id", "embedding", cbx, queryId = 0L, k = 5, shortlist = 10)
      .collect()
    assert(topx.nonEmpty && !topx.map(_.getLong(0)).contains(9999L))
    // exact results identical with and without the null row present
    val codesClean = ProductQuantizer.encodeExact(base, "embedding", cbx)
      .select(col("vec_id"), col("pq_codes"))
    val topClean = ProductQuantizer.searchRerankExact(codesClean, base,
      "vec_id", "embedding", cbx, queryId = 0L, k = 5, shortlist = 10)
      .collect()
    assert(topx.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      topClean.map(r => (r.getLong(0), r.getLong(1))).toSeq,
      "a null row must not perturb the exact shortlist")
  }
}
