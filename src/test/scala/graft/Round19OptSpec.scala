package graft

import graft.operators.{Pca, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r19 optimization pins: each fused kernel must be a bit-identical
  * respelling of the composable chain it replaced. */
class Round19OptSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  /** The pre-r19 Pca.project spelling, verbatim (broadcast model
    * crossJoin + three HOFs) — the reference the kernel is pinned
    * against. */
  private def projectChain(emb: org.apache.spark.sql.DataFrame,
                           idCol: String, vecCol: String, model: Pca.Model,
                           whiten: Boolean, scale: Int) = {
    val eps = 1e-9
    val scales =
      if (whiten) model.eigenvalues.map(l => 1.0 / math.sqrt(math.max(l, 0.0) + eps))
      else model.eigenvalues.map(_ => 1.0)
    val modelDf = Seq((model.mean.toSeq,
        model.components.map(_.toSeq).toSeq, scales.toSeq))
      .toDF("__mean", "__comps", "__scales")
    emb.filter(col(vecCol).isNotNull &&
        size(col(vecCol)) >= lit(model.mean.length))
      .crossJoin(broadcast(modelDf))
      .select(col(idCol),
        zip_with(slice(col(vecCol).cast("array<double>"), 1,
            model.mean.length), col("__mean"),
          (a, b) => a - b).as("__c"),
        col("__comps"), col("__scales"))
      .select(col(idCol),
        zip_with(
          transform(col("__comps"), c => Similarity.dot(col("__c"), c)),
          col("__scales"),
          (s, sc) => graft.functions.GateRound(s * sc, scale)).as("pc"))
  }

  private def pinEqual(emb: org.apache.spark.sql.DataFrame, idCol: String,
                       vecCol: String, model: Pca.Model, whiten: Boolean,
                       label: String): Unit = {
    val fused = Pca.project(emb, idCol, vecCol, model, whiten = whiten)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val chain = projectChain(emb, idCol, vecCol, model, whiten, scale = 6)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(fused.keySet == chain.keySet, s"$label: row sets differ")
    fused.foreach { case (id, pc) =>
      val old = chain(id)
      assert(pc.length == old.length, s"$label id=$id: lengths differ")
      pc.zip(old).zipWithIndex.foreach { case ((n, o), j) =>
        assert(java.lang.Double.doubleToRawLongBits(n) ==
          java.lang.Double.doubleToRawLongBits(o),
          s"$label id=$id dim=$j: $n != $o (bitwise)")
      }
    }
  }

  test("ProjectDots == the composable Pca.project chain (fitted model)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val model = Pca.fit(emb, "embedding", dim = 64, k = 8)
    pinEqual(emb, "vec_id", "embedding", model, whiten = false, "plain")
    pinEqual(emb, "vec_id", "embedding", model, whiten = true, "whiten")
  }

  test("ProjectDots == chain on double arrays, short/long/null-element rows") {
    // mean nonzero so centering matters; one component with trailing
    // coords so min(dim, comp.length) is exercised; rows: exact dim,
    // longer (sliced), shorter (dropped), null element (reads 0.0),
    // null vector (dropped)
    val model = Pca.Model(Array(0.5, -0.25, 0.125),
      Array(2.0, 0.5),
      Array(Array(1.0, -2.0, 3.0), Array(-0.5, 0.25)))
    val rows = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0)),
      (2L, Seq[java.lang.Double](1.0, 2.0, 3.0, 9.0)),
      (3L, Seq[java.lang.Double](1.0, 2.0)),
      (4L, Seq[java.lang.Double](1.0, null, 3.0)),
      (5L, null.asInstanceOf[Seq[java.lang.Double]]),
      (6L, Seq[java.lang.Double](-1e-7, 1e-7, -0.0)))
    val df = rows.toDF("vec_id", "embedding")
    pinEqual(df, "vec_id", "embedding", model, whiten = false, "synthetic")
    pinEqual(df, "vec_id", "embedding", model, whiten = true, "synthetic-w")
  }
}
