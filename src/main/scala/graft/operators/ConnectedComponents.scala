package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed connected components over an edge list, by iterative
 * min-label propagation: every node starts labelled with its own id;
 * each round a node takes the minimum label among itself and its
 * neighbours; fixpoint = each node carries the minimum id reachable
 * from it (its component representative).
 *
 * This is the transitive-closure companion to the greedy pairwise
 * policies in [[Dedup.dedupCorpus]]: greedy drops the higher id of
 * every near-dup PAIR (so {1,2},{2,3} keeps 1 but {1,3},{2,3} keeps
 * 1 AND 2), while components canonicalize each CLUSTER to one
 * representative regardless of which pairs happened to be observed.
 *
 * Scale shape: each round is one equi-join (labels ⋈ edges, shuffled
 * on node id) plus one min-aggregate — no driver-side graph state;
 * `localCheckpoint` truncates lineage every round so the plan does
 * not grow with iterations. Rounds needed = graph diameter, which for
 * near-dup clusters is small (dup clusters are dense); a worst-case
 * path graph needs O(n) rounds — for adversarial diameters prefer the
 * O(log n) large-star/small-star variant from the MapReduce-CC
 * literature. The run fails loudly if `maxIter` rounds do not reach
 * the fixpoint rather than returning a silently-partial labelling.
 *
 * Cross-ref: reference's ecosystem handles dedup outside the querier;
 * this operator exists for the training-data-pipeline family.
 */
object ConnectedComponents {

  /** @return one row per node appearing in `edges`: (id, component)
    *
    * The symmetrized edge list is counted first: at or below
    * `driverEdgeThreshold` edges the components are solved by a driver
    * union-find over the collected list. A near-dup graph's edge count
    * is bounded by duplicate density, not corpus size — at the point
    * CC runs, the heavy joins that PRODUCED the pairs are done, and an
    * iterative distributed loop over a driver-sized edge list is pure
    * scheduling overhead (measured: ~3 s of localCheckpoint+converge
    * jobs for a 920-edge graph). Beyond the threshold the min-label
    * propagation loop below takes over unchanged. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 30,
          driverEdgeThreshold: Long = 1_000_000L): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      // a null endpoint identifies no node — drop the edge explicitly
      // (the join path ignored them silently; the union-find path
      // would NPE on getLong)
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .localCheckpoint(true) // reused every round — cut off the source plan
    val nEdges = sym.count()
    if (nEdges <= driverEdgeThreshold) return unionFindLocal(sym)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = nEdges == 0L
    while (iter < maxIter && !converged) {
      val viaNeighbour = sym
        .join(labels, sym("a") === labels("id"))
        .select(col("b").as("id"), col("component"))
      val next = labels.unionByName(viaNeighbour)
        .groupBy("id").agg(min("component").as("component"))
        .localCheckpoint(true)
      converged = next.as("n")
        .join(labels.as("p"), col("n.id") === col("p.id"))
        .filter(col("n.component") =!= col("p.component"))
        .isEmpty
      labels = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIter rounds — " +
        "graph diameter exceeds maxIter; raise it or use runStars, " +
        "which converges in O(log n) rounds on path-like graphs")
    labels
  }

  /** Union-find (union-by-min + path compression) over a collected
    * symmetric edge list; root IS the component minimum because union
    * always attaches the larger root beneath the smaller. */
  private def unionFindLocal(sym: DataFrame): DataFrame = {
    val spark = sym.sparkSession
    import spark.implicits._
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x
      while (c != r) { val n = parent.getOrElse(c, c); parent(c) = r; c = n }
      r
    }
    val nodes = scala.collection.mutable.SortedSet.empty[Long]
    sym.collect().foreach { row =>
      val (a, b) = (row.getLong(0), row.getLong(1))
      nodes += a; nodes += b
      val (ra, rb) = (find(a), find(b))
      if (ra < rb) parent(rb) = ra
      else if (rb < ra) parent(ra) = rb
    }
    nodes.toSeq.map(id => (id, find(id))).toDF("id", "component")
  }

  /**
   * Alternating large-star / small-star connected components (the
   * MapReduce-CC formulation): each round every node links its
   * neighbourhood to the neighbourhood minimum — large-star moves the
   * LARGER neighbours, small-star the smaller — which contracts paths
   * exponentially, reaching the star-graph fixpoint in O(log n)
   * rounds where min-label propagation ([[run]]) needs O(diameter).
   * Use for graphs that may contain long chains; `run` round-trips
   * less state per iteration on dense, small-diameter dup clusters.
   *
   * Both emit rules keep (u, m) alongside the moved neighbours, so
   * every round preserves connectivity; at the fixpoint each
   * component is a star whose centre is the component minimum, and
   * the label of a node is min(neighbourhood ∪ self).
   */
  def runStars(edges: DataFrame, srcCol: String, dstCol: String,
               maxIter: Int = 20): DataFrame = {
    def canon(e: DataFrame): DataFrame =
      e.select(least(col("a"), col("b")).as("a"),
          greatest(col("a"), col("b")).as("b"))
        .filter(col("a") =!= col("b")).distinct()
    var e = canon(edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b")))
      .localCheckpoint(true)
    val allNodes = edges
      .select(explode(array(col(srcCol).cast("long"),
        col(dstCol).cast("long"))).as("id"))
      .distinct().localCheckpoint(true)

    // one star round: gather each node's neighbourhood minimum m and
    // re-link the selected neighbours (larger for large-star, smaller
    // for small-star) plus the node itself to m
    def star(edgesNow: DataFrame, large: Boolean): DataFrame = {
      val nbrs = edgesNow.unionByName(
        edgesNow.select(col("b").as("a"), col("a").as("b")))
      val mins = nbrs.groupBy(col("a").as("u"))
        .agg(least(min(col("b")), first(col("a"))).as("m"))
      val moved = nbrs.join(mins, nbrs("a") === mins("u"))
        .filter(if (large) col("b") > col("a") else col("b") <= col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      val self = mins.select(col("u").as("a"), col("m").as("b"))
      canon(moved.unionByName(self))
    }

    var iter = 0
    var converged = e.isEmpty
    while (iter < maxIter && !converged) {
      val next = star(star(e, large = true), large = false)
        .localCheckpoint(true)
      converged =
        next.count() == e.count() && next.exceptAll(e).isEmpty
      e = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star rounds did not converge in $maxIter iterations")
    val labels = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .groupBy(col("a").as("id"))
      .agg(least(min(col("b")), first(col("a"))).as("component"))
    allNodes.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }
}
