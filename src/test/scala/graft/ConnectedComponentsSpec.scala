package graft

import graft.operators.ConnectedComponents
import org.scalatest.funsuite.AnyFunSuite

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  /** Driver-side union-find ground truth. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def check(edges: Seq[(Long, Long)]): Unit = {
    val want = unionFind(edges)
    // representative must be the component MINIMUM, not just consistent
    val mins = want.groupBy(_._2).map { case (root, m) => root -> m.keys.min }
    val expect = want.map { case (k, r) => k -> math.min(mins(r), r) }
    // driver union-find fast path (default threshold)
    val got = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // distributed min-label loop (threshold 0 disables the fast path)
    val gotDist = ConnectedComponents.run(edges.toDF("a", "b"), "a", "b",
        driverEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotDist == expect)
    val gotStars = ConnectedComponents.runStars(edges.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotStars == expect)
  }

  test("random graph matches union-find ground truth") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    check(edges)
  }

  test("path graph needs diameter rounds and still converges") {
    check((0L until 25L).map(i => (i, i + 1))) // single 26-node chain
    // and fails loudly when maxIter is below the diameter
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(
        (0L until 25L).map(i => (i, i + 1)).toDF("a", "b"), "a", "b",
        maxIter = 3, driverEdgeThreshold = 0L)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("disjoint cliques, self-loops, empty input") {
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L)))
    assert(ConnectedComponents.run(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").isEmpty)
    assert(ConnectedComponents.runStars(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").isEmpty)
  }

  test("null edge endpoints are dropped, not propagated or crashed on") {
    val edges = Seq((Some(1L), Some(2L)), (None, Some(3L)), (Some(4L), None))
      .toDF("a", "b")
    for (thr <- Seq(0L, 1000L)) {
      val got = ConnectedComponents.run(edges, "a", "b", driverEdgeThreshold = thr)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(1L -> 1L, 2L -> 1L), s"threshold=$thr")
    }
  }

  test("star rounds contract a long chain in O(log n), not O(diameter)") {
    // 200-node path: label propagation would need 200 rounds; the
    // alternating star rounds must finish within 12 (~log2 + slack)
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = ConnectedComponents.runStars(chain.toDF("a", "b"), "a", "b",
        maxIter = 12)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 201 && got.values.forall(_ == 0L))
  }

  test("q97 semantics: clusters canonicalize transitively, greedy does not") {
    // pairs {1,3},{2,3}: greedy keeps 1 AND 2 (neither pair relates
    // them); components put all three in component 1
    val cc = ConnectedComponents.run(
      Seq((1L, 3L), (2L, 3L)).toDF("id_a", "id_b"), "id_a", "id_b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
