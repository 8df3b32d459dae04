package graft

import graft.operators.{ContextLayout, Packing, Sampling}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ContextLayoutSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  private def ords(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  test("contextOrder: greedy walk follows max-weight edges, jumps when stuck") {
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("id")
    // degrees: 3 has three edges -> start; from 3 the .8 edge beats
    // .7 and .5; from 2 only 1 is unvisited; 1 is then stuck (2, 3
    // visited) -> jump lands on 4. Expected walk: 3, 2, 1, 4.
    val edges = Seq((1L, 2L, 0.9), (2L, 3L, 0.8), (1L, 3L, 0.5),
      (3L, 4L, 0.7)).toDF("a", "b", "w")
    val out = ContextLayout.contextOrder(nodes, "id", edges, "a", "b", "w")
    val byOrd = out.orderBy("ord").collect()
      .map(r => (r.getLong(0), r.getBoolean(3)))
    assert(byOrd.map(_._1).toSeq == Seq(3L, 2L, 1L, 4L),
      byOrd.mkString(","))
    assert(byOrd.forall(_._2), "small component must be walked")
    assert(out.select("component").distinct().collect()
      .map(_.getLong(0)).toSeq == Seq(1L), "one component, min-label 1")
  }

  test("contextOrder: equal weights degrade to hash40 order; components by min hash") {
    // two complete components with ALL-EQUAL weights: within each the
    // walk must visit members in ascending (hash40, id); the two
    // components order by their min member hash40
    val nodes = (1L to 10L).toDF("id")
    val edges = (for {
      lo <- Seq(1L, 6L); a <- lo until lo + 5; b <- (a + 1) until (lo + 5)
    } yield (a, b, 1.0)).toDF("a", "b", "w")
    val out = ContextLayout.contextOrder(nodes, "id", edges, "a", "b", "w")
    val hash = nodes.select(col("id"),
        Sampling.hash40(Seq(col("id")), "s0").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Seq(1L to 5L, 6L to 10L)
      .map(g => (g.map(hash).min, g.sortBy(id => (hash(id), id))))
      .sortBy(_._1).flatMap(_._2)
    val got = out.orderBy("ord").collect().map(_.getLong(0)).toSeq
    assert(got == expected, s"got $got expected $expected")
    // ordinals are a dense 0-based total order
    assert(out.select("ord").collect().map(_.getLong(0)).sorted.toSeq
      == (0L until 10L))
  }

  test("contextOrder: singleton nodes, over-cap fallback flagged not silent") {
    val nodes = (1L to 6L).toDF("id")
    val edges = (for {
      a <- 1L until 5L; b <- (a + 1) to 5L
    } yield (a, b, 1.0)).toDF("a", "b", "w")
    val out = ContextLayout.contextOrder(nodes, "id", edges, "a", "b", "w",
      maxComponent = 3)
    val rows = out.collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(3)))).toMap
    // the 5-node component exceeds the cap -> hash-order fallback,
    // flagged per row; the singleton 6 is its own walked component
    (1L to 5L).foreach(id => assert(rows(id) == ((1L, false)), rows(id)))
    assert(rows(6L) == ((6L, true)))
    val hash = nodes.select(col("id"),
        Sampling.hash40(Seq(col("id")), "s0").as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fallback = out.filter(!col("walked")).orderBy("ord")
      .collect().map(_.getLong(0)).toSeq
    assert(fallback == (1L to 5L).sortBy(id => (hash(id), id)),
      s"fallback must be (hash, id) order: $fallback")
  }

  test("contextOrder: negative ids refused loudly at entry, node or edge side") {
    // a negative id would reach the walked path's require via its
    // component min-label — but an OVER-CAP component bypasses the
    // walk task entirely, and %019d zero-pads negative longs into
    // keys whose string order reverses among negatives: a silent
    // wrong order without the entry guard. Both frames are guarded:
    // an edge endpoint absent from nodes can still become a
    // component's min-label.
    val edges = Seq((1L, 2L, 0.5)).toDF("a", "b", "w")
    val badNodes = intercept[Exception] {
      ContextLayout.contextOrder(Seq(1L, -7L).toDF("id"), "id",
        edges, "a", "b", "w").collect()
    }
    assert(badNodes.getMessage.contains("non-negative"),
      badNodes.getMessage)
    val badEdges = intercept[Exception] {
      ContextLayout.contextOrder(Seq(1L, 2L).toDF("id"), "id",
        Seq((1L, -2L, 0.5)).toDF("a", "b", "w"), "a", "b", "w").collect()
    }
    assert(badEdges.getMessage.contains("non-negative"),
      badEdges.getMessage)
  }

  test("contextOrder: multi-weight duplicate neighbor holds ONE maxDegree slot") {
    // the 1-2 edge arrives under TWO distinct weights (raw input, not
    // forced through inContextLayout's symmetrize/max groupBy); at
    // maxDegree=2 node 1's capped list must collapse the duplicate so
    // the (3, .6) edge keeps the second slot. Walk trace (hash40:
    // 9→21B, 8→245B, 1→481B, 2→868B, 3→897B; start = 9, hash-min of
    // the degree-2 tie {9, 2, 1}): 9 → 2 (.95) → 1 (.9), then at 1
    // the RETAINED 3-edge continues the walk before the jump pool
    // takes 8 — walk 9,2,1,3,8. Pre-fix, 1's capped list was
    // [(2,.9),(2,.8)] (both slots spent on 2), the walk was stuck at
    // 1 and the jump-hash order put 8 BEFORE 3: 9,2,1,8,3.
    val nodes = Seq(1L, 2L, 3L, 8L, 9L).toDF("id")
    val edges = Seq((9L, 2L, 0.95), (9L, 8L, 0.2),
      (1L, 2L, 0.9), (1L, 2L, 0.8), (1L, 3L, 0.6)).toDF("a", "b", "w")
    val out = ContextLayout.contextOrder(nodes, "id", edges, "a", "b", "w",
      maxDegree = 2)
    val walk = out.orderBy("ord").collect().map(_.getLong(0)).toSeq
    assert(walk == Seq(9L, 2L, 1L, 3L, 8L), walk.mkString(","))
    // the load-bearing position: 3 follows 1 VIA THE RETAINED EDGE —
    // the duplicate-evicted adjacency left 1 stuck and put 8 (the
    // jump pool's hash-minimum) there instead
    assert(walk(3) == 3L,
      s"duplicate neighbor evicted 3 from the capped adjacency: $walk")
  }

  test("packSequencesBy: spans cut along the caller's order, negatives refused") {
    val df = Seq((10L, 3L, 0L), (11L, 4L, 1L), (12L, 5L, 2L), (13L, 0L, 3L))
      .toDF("id", "w", "ord")
    val out = Packing.packSequencesBy(df, "id", "w", "ord", seqLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(t => (t._1, t._2)).toSeq
    // stream: 10 occupies [0,3), 11 [3,7), 12 [7,12); seqLen 4 cuts at
    // 4 and 8; zero-weight 13 is dropped
    assert(out == Seq((10L, 0L, 0L, 3L), (11L, 0L, 0L, 1L),
      (11L, 1L, 1L, 4L), (12L, 1L, 0L, 1L), (12L, 2L, 1L, 5L)), out)
    val neg = Seq((1L, 2L, -1L)).toDF("id", "w", "ord")
    val ex = intercept[Exception] {
      Packing.packSequencesBy(neg, "id", "w", "ord", seqLen = 4).collect()
    }
    assert(ex.getMessage != null)
  }

  test("contextOrder: random graphs — permutation, component-contiguous, layout-invariant") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 3) {
      val n = 40 + rnd.nextInt(40)
      val ids = (0L until n.toLong).toDF("id")
      val edges = Seq.fill(2 * n)((rnd.nextInt(n).toLong,
          rnd.nextInt(n).toLong, (rnd.nextInt(10) + 1) / 10.0))
        .filter(e => e._1 != e._2).toDF("a", "b", "w")
      val rows = ContextLayout.contextOrder(ids, "id", edges, "a", "b", "w")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      // a LAYOUT is a permutation: every id exactly once, dense ords
      assert(rows.map(_._1).toSet == (0L until n.toLong).toSet)
      assert(rows.map(_._3).sorted.toSeq == (0L until n.toLong))
      // a component never splits across the layout (related docs
      // stay contiguous — the property the operator exists for)
      val compsInOrder = rows.sortBy(_._3).map(_._2)
      val runs = compsInOrder.foldLeft(List.empty[Long]) { (acc, c) =>
        if (acc.headOption.contains(c)) acc else c :: acc
      }
      assert(runs.distinct.size == runs.size,
        s"component split across the layout: ${compsInOrder.mkString(",")}")
      // partitioning must not change a single ordinal
      val relaid = ContextLayout.contextOrder(ids.repartition(13), "id",
          edges.repartition(7), "a", "b", "w")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      assert(relaid == rows.map(r => (r._1, r._3)).toSet,
        "partition layout changed the walk")
    }
  }

  test("packingReport: hand-computed audit; split docs and tail fill exact") {
    // the packSequencesBy hand case: stream 10(3) 11(4) 12(5) at
    // seqLen 4 -> 3 full sequences, docs 11 and 12 split, 5 spans
    val df = Seq((10L, 3L, 0L), (11L, 4L, 1L), (12L, 5L, 2L))
      .toDF("id", "w", "ord")
    val packed = Packing.packSequencesBy(df, "id", "w", "ord", seqLen = 4)
    val r = Packing.packingReport(packed, "id", seqLen = 4).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((3L, 3L, 12L, 3L, 2L)), r.toString)
    assert(r.getDouble(5) == 0.666667 && r.getDouble(6) == 1.666667,
      r.toString)
    assert(r.getLong(7) == 4L, s"tail fill: $r")
    // empty input: zero counts, null fractions — never a crash
    val empty = Packing.packingReport(packed.limit(0), "id", seqLen = 4)
      .collect().head
    assert(empty.getLong(0) == 0L && empty.getLong(1) == 0L &&
      empty.isNullAt(5) && empty.isNullAt(6) && empty.isNullAt(7))
  }

  test("inContextLayout: retrieval neighbors pack adjacent, beats the md5 shuffle") {
    // planted corpus: 4 clusters interleaved across ids (the IvfIndex
    // lowest-id-seed convention), one-hot embeddings so within-cluster
    // cosine is exactly 1 and across exactly 0
    val n = 64
    val docs = (0L until n).map(i => (i, 5L + i % 3)).toDF("id", "w")
    val emb = (0L until n).map { i =>
      (i, Seq.tabulate(4)(d => if (d == (i % 4).toInt) 1.0 else 0.0))
    }.toDF("id", "emb")
    val out = ContextLayout.inContextLayout(docs, "id", "w", emb, "emb",
      seqLen = 16, k = 4, nlist = 4, probeCells = 2)
    // every doc appears, each exactly once per overlapped sequence
    assert(out.select("id").distinct().count() == n)
    val ordOf = out.select("id", "ord").distinct().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def adjacency(order: Seq[Long]): Double =
      order.sliding(2).count { case Seq(a, b) => a % 4 == b % 4 }
        .toDouble / (order.size - 1)
    val walk = (0L until n).sortBy(ordOf)
    val md5Order = (0L until n)
      .sortBy(i => java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val walkAdj = adjacency(walk)
    val shuffleAdj = adjacency(md5Order)
    assert(walkAdj >= 0.9,
      s"in-context adjacency $walkAdj: related docs not co-packed")
    assert(shuffleAdj <= 0.6, s"md5 baseline suspiciously clustered")
    assert(walkAdj > shuffleAdj + 0.3,
      s"walk $walkAdj must clearly beat shuffle $shuffleAdj")
    // the packed spans are a valid dense cut of the walk-ordered stream
    val spans = out.select("id", "seq_id", "tok_start", "tok_end")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val totalToks = spans.map(s => s._4 - s._3).sum
    assert(totalToks == (0L until n).map(i => 5L + i % 3).sum,
      "every token placed exactly once")
  }
}
