package graft

import graft.operators.Graphs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Integer-PageRank semantics pins — the qBS oracle checks the exact
  * replay; these check the MATH means what PageRank means. */
class GraphsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  private def ranks(edges: Seq[(Long, Long)],
                    iters: Int = 20): Map[Long, Long] = {
    import spark.implicits._
    Graphs.pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("cycle symmetry, star authority, hub-vs-leaf ordering") {
    // 3-cycle: perfect symmetry -> identical ranks
    val cyc = ranks(Seq((0L, 1L), (1L, 2L), (2L, 0L)))
    assert(cyc.values.toSet.size == 1, s"cycle ranks diverged: $cyc")
    // star: every leaf points at the center (and the center back at
    // leaf 1 so it is not dangling) — the center must dominate
    val star = ranks(Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)))
    assert((2L to 4L).forall(l => star(0L) > star(l)),
      s"center not authoritative: $star")
    assert(star(2L) == star(3L) && star(3L) == star(4L),
      s"symmetric leaves diverged: $star")
    // leaf 1 receives the center's whole mass: above its siblings
    assert(star(1L) > star(2L), s"back-edge target not boosted: $star")
  }

  test("mass accounting and determinism across partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(13)
    val edges = (0 until 200).flatMap { i =>
      Seq((i.toLong, rnd.nextInt(200).toLong),
        (i.toLong, rnd.nextInt(200).toLong))
    }
    val base = 1000000000000L
    val a = ranks(edges)
    val n = a.size
    // teleport floor and (leaky) conservation ceiling
    assert(a.values.forall(_ >= 15L * base / 100), "below teleport floor")
    assert(a.values.sum <= n.toLong * base, "mass created from nothing")
    assert(a.values.sum > n.toLong * base / 2,
      "integer leakage ate the graph") // DIV leaks units, not halves
    // bit-exact across partitionings: integer arithmetic has no
    // accumulation-order envelope to hide in
    val b = Graphs.pageRankInt(edges.toDF("src", "dst").repartition(17),
        "src", "dst", 20)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, "partitioning changed an integer rank")
    // guards fire loudly
    intercept[IllegalArgumentException] {
      Graphs.pageRankInt(Seq.empty[(Long, Long)].toDF("src", "dst"),
        "src", "dst")
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRankInt(edges.toDF("src", "dst"), "src", "dst", iters = 0)
    }
  }
}
