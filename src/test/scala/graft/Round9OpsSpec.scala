package graft

import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round9OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("hardNegatives equals the window (row_number) formulation") {
    // the bounded-heap partial aggregate claims exact parity with the
    // canonical window top-k — pin it on the real embeddings table,
    // including rounded-score ties (round(...,4) manufactures them)
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        col("vec_id") < 20, k = 5)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4))).toSet

    val q = emb.select(col("vec_id").as("q_id"), col("embedding").as("qv"),
      col("label").as("ql")).filter(col("q_id") < 20)
    val scored = emb.join(q, col("label") =!= col("ql"))
      .select(col("q_id"),
        col("vec_id").as("n_id"), col("label").as("n_label"),
        round(Similarity.cosine(col("embedding"), col("qv")), 4).as("cos_sim"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos_sim").desc, col("n_id"))
    val want = scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
      .select(col("q_id"), col("rank").cast("int"), col("n_id"),
        col("n_label"), col("cos_sim"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getInt(3), r.getDouble(4))).toSet

    assert(got == want && got.nonEmpty)
    // the mined set is label-disjoint from its query by construction
    val labels = emb.collect().map(r =>
      r.getLong(0) -> r.getInt(2)).toMap
    got.foreach { case (qid, _, nid, nlabel, _) =>
      assert(nid != qid, "self pair leaked")
      assert(labels(nid) == nlabel && nlabel != labels(qid),
        s"same-label negative leaked: q=$qid n=$nid")
    }
  }

  test("TopKByScore: partial/final merge and NaN ordering are exact") {
    // 40 groups x 500 candidates over 16 partitions: every merge path
    // runs. Scores collide on purpose (i % 7) so the id tie-break is
    // load-bearing; group 0 gets NaN scores which must rank LAST and
    // never displace real candidates.
    val rows = (0 until 40).flatMap { g =>
      (0 until 500).map { i =>
        val s = if (g == 0 && i < 450) Double.NaN else (i % 7).toDouble
        (g.toLong, s, (i * 13 % 500).toLong)
      }
    }
    val df = rows.toDF("g", "score", "id").repartition(16)
    val topk = org.apache.spark.sql.functions.udaf(
      new graft.functions.TopKByScore(10))
    val got = df
      .groupBy("g").agg(topk(col("score"), col("id"), lit(0L)).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("pos", "n")))
      .select(col("g"), col("pos"), col("n.score"), col("n.id"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))

    val want = rows.groupBy(_._1).flatMap { case (g, rs) =>
      rs.map(t => (t._2, t._3))
        .sortWith { (a, b) =>
          if (a._1.isNaN && b._1.isNaN) a._2 < b._2
          else if (a._1.isNaN) false
          else if (b._1.isNaN) true
          else if (a._1 != b._1) a._1 > b._1
          else a._2 < b._2
        }
        .take(10).zipWithIndex
        .map { case ((s, id), i) => (g, i, s, id) }
    }.toSet
    assert(got.toSet == want)
    // group 0 has only 50 real-scored candidates; NaNs must not appear
    // before real scores in its top-10
    val g0 = got.filter(_._1 == 0L).sortBy(_._2)
    assert(g0.length == 10 && g0.forall(!_._3.isNaN))
  }

  test("hardNegatives plans as a partial/final aggregate (map-side combine)") {
    // the operator's scale claim is that each map task reduces its
    // corpus slice to <= k candidates per query BEFORE the shuffle —
    // i.e. the physical plan carries a partial-mode TopKByScore below
    // the exchange and a final above it, exactly like a sum. Pin it so
    // a refactor to a window (full scored-stream shuffle) fails here.
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plan = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        col("vec_id") < 20, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial_topkbyscore"),
      s"expected a partial-mode TopKByScore below the exchange:\n$plan")
    assert(!plan.contains("Window"),
      "hardNegatives must not degrade to a window over the scored stream")
  }
}
