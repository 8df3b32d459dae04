package graft

import graft.operators.{IvfIndex, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class Round18OpsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")

  /** Pure-driver BigInt replica of the exact Lloyd contract — the
    * same math the DuckDB oracle replays as chained CTEs. */
  private def lloydReplica(vecs: Seq[(Long, Seq[Double])], nlist: Int,
                           iters: Int): Seq[Seq[Long]] = {
    val qv = vecs.sortBy(_._1).map { case (id, v) =>
      id -> v.map(x => math.floor(x * 1e6 + 0.5).toLong)
    }
    var cents: Seq[Seq[Long]] = qv.take(nlist).map(_._2)
    def sqd(a: Seq[Long], b: Seq[Long]): BigInt =
      a.zip(b).foldLeft(BigInt(0)) { case (s, (x, y)) =>
        s + BigInt(x - y) * BigInt(x - y)
      }
    for (_ <- 0 until iters) {
      val assign = qv.map { case (_, v) =>
        (cents.zipWithIndex.map { case (c, j) => (sqd(v, c), j) }.min._2, v)
      }
      cents = cents.indices.map { c =>
        val members = assign.filter(_._1 == c).map(_._2)
        if (members.isEmpty) cents(c)
        else {
          val n = BigInt(members.size)
          (0 until cents(c).size).map { i =>
            (members.foldLeft(BigInt(0))((s, m) => s + BigInt(m(i))) / n)
              .toLong
          }
        }
      }
    }
    cents
  }

  test("trainExact: matches the BigInt replica, partition-invariant") {
    val vecs = emb.select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    val expect = lloydReplica(vecs, nlist = 4, iters = 2)
    val got1 = IvfIndex.trainExact(emb.repartition(1), "vec_id",
      "embedding", nlist = 4, iters = 2)
    val got17 = IvfIndex.trainExact(emb.repartition(17), "vec_id",
      "embedding", nlist = 4, iters = 2)
    assert(got1 == expect, "trainExact != driver BigInt replica")
    assert(got17 == expect, "trainExact is partition-order dependent")
  }

  test("trainExact: refusals and empty-cell retention") {
    // |x| >= 10 refused loudly
    val bad = Seq((1L, Seq(0.5, 11.0))).toDF("id", "v")
    val e = intercept[Exception] {
      IvfIndex.trainExact(bad, "id", "v", nlist = 1, iters = 1)
    }
    assert(e.getMessage.contains("fixed-point"), e.getMessage)
    // mixed dims refused
    val ragged = Seq((1L, Seq(0.1, 0.2)), (2L, Seq(0.3))).toDF("id", "v")
    val e2 = intercept[IllegalArgumentException] {
      IvfIndex.trainExact(ragged, "id", "v", nlist = 1, iters = 1)
    }
    assert(e2.getMessage.contains("mixed dimensions"))
    // duplicate seed vectors: every point ties to the LOWEST cell
    // index, so cell 1 goes empty and must keep its seed centroid
    val dup = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(0.0, 0.0)),
      (3L, Seq(0.001, 0.0))).toDF("id", "v")
    val cents = IvfIndex.trainExact(dup, "id", "v", nlist = 2, iters = 1)
    assert(cents(1) == Seq(0L, 0L), s"empty cell must keep its seed: $cents")
    assert(cents(0) == Seq(333L, 0L), // (0 + 0 + 1000) / 3 truncating
      s"cell 0 mean of all three members: $cents")
  }

  test("assignExact + probeCellsExact: min-dist then min-index ties") {
    val cents = Seq(Seq(0L, 0L), Seq(1000000L, 0L), Seq(0L, 0L))
    val df = Seq((1L, Seq(0.0, 0.0)), (2L, Seq(1.0, 0.0)),
      (3L, Seq(0.5, 0.0))).toDF("id", "v")
    val cells = IvfIndex.assignExact(df, "id", "v", cents)
      .select(col("id"), col("ivf_cell")).as[(Long, Int)].collect().toMap
    assert(cells(1L) == 0) // exact tie between cells 0 and 2 -> 0
    assert(cells(2L) == 1)
    assert(cells(3L) == 0) // equidistant 0/1/2 -> lowest index
    assert(IvfIndex.probeCellsExact(Seq(0L, 0L), cents, 2) == Seq(0, 2))
  }

  test("semanticDedupExact: nlist=1 equals the exact all-pairs path") {
    // one cell = no candidate pruning: components must equal q9G's
    // exact allPairsAbove + CC semantics (the q9X precedent pin)
    val viaCells = Similarity.semanticDedupExact(emb, "vec_id",
        "embedding", minCos = 0.40, nlist = 1)
      .orderBy(col("vec_id")).collect().toSeq
    val pairs = Similarity.allPairsAbove(emb, "vec_id", "embedding", 0.40)
    val cc = graft.operators.ConnectedComponents.run(pairs, "id_a", "id_b")
    val exact = emb.select(col("vec_id"))
      .join(cc.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("canonical_id"))
      .withColumn("is_canonical", col("vec_id") === col("canonical_id"))
      .orderBy(col("vec_id")).collect().toSeq
    assert(viaCells == exact)
  }

  test("qE3 capstone: rejected set AND a rescued rank are both non-empty") {
    // the step-up property in data: a rank failing its OWN criterion
    // p(i) <= q*i/m is rejected anyway because a later rank accepts
    val rows = graft.queries.Pipeline.queries("qE3_significance_capstone")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 20)
    val k = rows.head.getLong(7)
    assert(k == 5L, s"step-up cutoff moved: $k")
    val rejected = rows.filter(_.getBoolean(8))
    assert(rejected.length == 5)
    val rescued = rejected.filter { r =>
      // fails its own criterion: pq * m * 100 > q% * rank * 1e9
      math.round(r.getDouble(4) * 1e9) * r.getLong(6) * 100L >
        10L * r.getLong(5) * 1000000000L
    }
    assert(rescued.map(_.getLong(5)).toSeq == Seq(4L),
      s"exactly rank 4 must be rescued: ${rescued.mkString(",")}")
    assert(rows.count(!_.getBoolean(8)) == 15)
  }

  test("PQ exact: codes partition-invariant, ADC sums match a BigInt replica") {
    import graft.operators.{IvfIndex, ProductQuantizer => PQ}
    val cb = PQ.trainExact(emb, "vec_id", "embedding", m = 16, ksub = 8)
    assert(cb.dsub == 4 && cb.tables.size == 16)
    def codes(df: org.apache.spark.sql.DataFrame) =
      PQ.encodeExact(df, "embedding", cb)
        .select(col("vec_id").cast("long"), col("pq_codes"))
        .as[(Long, Seq[Int])].collect().toMap
    val c1 = codes(emb.repartition(1))
    val c13 = codes(emb.repartition(13))
    assert(c1 == c13, "exact PQ codes are partition-order dependent")
    // ADC replica: engine approx_dist == driver BigInt sum of
    // per-subspace squared distances to the CODED centroid
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toSeq
    val qfp = IvfIndex.quantizeFpDriver(q)
    val got = PQ.encodeExact(emb, "embedding", cb)
      .filter(col("vec_id") =!= 0)
      .select(col("vec_id").cast("long"),
        PQ.adcDistanceExact(cb, qfp).as("d"))
      .as[(Long, Long)].collect().toMap
    got.foreach { case (id, d) =>
      val expect = (0 until 16).map { s =>
        // distance of the QUERY sub-vector to the CODED centroid
        val qv = qfp.slice(s * 4, s * 4 + 4)
        cb.tables(s)(c1(id)(s)).zip(qv).foldLeft(BigInt(0)) {
          case (acc, (cc, qq)) => acc + BigInt(qq - cc) * BigInt(qq - cc)
        }
      }.sum
      assert(BigInt(d) == expect, s"ADC mismatch for $id: $d vs $expect")
    }
  }

  test("changepointMean: hand split, constant-series tie, degenerates") {
    import graft.operators.Retention
    // planted shift 0,0,0 -> 10,10,10: g_k = |6*C_k - k*30| peaks at
    // k=3 (g=90); means 0 / 10 exactly
    val shift = (1L to 6L).map(i => ("a", i, if (i <= 3) 0L else 10L))
    val r = Retention.changepointMean(shift.toDF("g", "seq", "x"),
      "g", "seq", "x").collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getDouble(5), r.getDouble(6), r.getBoolean(7)) ==
      ((6L, 3L, 3L, 90L, 0.0, 10.0, true)))
    // constant series: every g = 0, tie -> smallest k = 1
    val const = (1L to 3L).map(i => ("c", i, 5L))
    val rc = Retention.changepointMean(const.toDF("g", "seq", "x"),
      "g", "seq", "x").collect().head
    assert((rc.getLong(2), rc.getLong(3), rc.getLong(4),
      rc.getDouble(5), rc.getDouble(6)) == ((1L, 1L, 0L, 5.0, 5.0)))
    // n = 1: nulls, defined = false
    val r1 = Retention.changepointMean(Seq(("s", 1L, 7L))
      .toDF("g", "seq", "x"), "g", "seq", "x").collect().head
    assert(r1.isNullAt(2) && r1.isNullAt(3) && r1.isNullAt(4) &&
      !r1.getBoolean(7))
    // duplicate seq refused
    val dup = Seq(("d", 1L, 1L), ("d", 1L, 2L)).toDF("g", "seq", "x")
    val e = intercept[Exception] {
      Retention.changepointMean(dup, "g", "seq", "x").collect()
    }
    assert(e.getMessage.contains("duplicate sequence"), e.getMessage)
    // prefix-sum overflow refused (|C| > (2^63-1)/n)
    val big = Seq(("o", 1L, 4000000000000000000L), ("o", 2L, 1L),
      ("o", 3L, 1L)).toDF("g", "seq", "x")
    val e2 = intercept[Exception] {
      Retention.changepointMean(big, "g", "seq", "x").collect()
    }
    assert(e2.getMessage.contains("overflows signed-64"), e2.getMessage)
  }

  test("funnel: greedy chain, strict compares, cascades, depth-0 users") {
    import graft.operators.Retention
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 5L), (1L, "purchase", 20L),
      (2L, "view", 1L), (2L, "click", 2L), (2L, "purchase", 2L),
      (3L, "view", 1L), (3L, "click", 2L), (3L, "purchase", 3L),
      (4L, "click", 7L),
      (5L, "view", 9L), (5L, "view", 1L), (5L, "click", 4L),
      (5L, "purchase", 6L)
    ).toDF("u", "t", "ts")
    val out = Retention.funnel(ev, "u", "t", "ts",
        Seq("view", "click", "purchase"))
      .orderBy(col("u")).collect()
      .map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)), r.getLong(4)))).toMap
    // user 1: click precedes view -> no chainable click -> depth 1
    assert(out(1L) == ((Some(10L), None, None, 1L)))
    // user 2: purchase ties click's ts -> STRICT > drops it -> depth 2
    assert(out(2L) == ((Some(1L), Some(2L), None, 2L)))
    // user 3: full conversion
    assert(out(3L) == ((Some(1L), Some(2L), Some(3L), 3L)))
    // user 4: no step-1 event, still visible at depth 0
    assert(out(4L) == ((None, None, None, 0L)))
    // user 5: the GREEDY chain (earliest view at 1) admits click@4 and
    // purchase@6 — a latest-view strategy would convert nothing
    assert(out(5L) == ((Some(1L), Some(4L), Some(6L), 3L)))
  }

  test("knnJoinExact: self excluded, ordering contract, recall vs brute") {
    val sub = emb.filter(col("vec_id") < 100)
    val got = Similarity.knnJoinExact(sub, "vec_id", "embedding", k = 3,
      nlist = 8, probeCells = 4)
    val rows = got.orderBy(col("id"), col("rank")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (id, rs) =>
      assert(rs.forall(_.getLong(1) != id), s"self-match for $id")
      val scores = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse, s"rank order broke for $id")
    }
    // recall vs brute-force top-1 (cells bound recall; at 8 cells /
    // probe 4 over 100 vectors it should stay high)
    val brute = sub.as("a").join(sub.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("id"),
        (Similarity.dot(col("a.embedding"), col("b.embedding")) /
          (Similarity.norm(col("a.embedding")) *
            Similarity.norm(col("b.embedding")))).as("cos"),
        col("b.vec_id").cast("long").as("nn"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
          .orderBy(col("cos").desc, col("nn"))))
      .filter(col("rn") === 1)
      .select(col("id").cast("long"), col("nn")).as[(Long, Long)]
      .collect().toMap
    val gotTop1 = rows.filter(_.getInt(3) == 1)
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = brute.count { case (id, nn) =>
      gotTop1.get(id).contains(nn)
    }.toDouble / brute.size
    assert(recall >= 0.5, s"top-1 recall $recall collapsed")
  }
}
