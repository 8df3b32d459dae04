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

  /** @return one row per node appearing in `edges`: (id, component) */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 30): DataFrame = {
    val sym = edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b"))
      .union(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
      .distinct()
      .localCheckpoint(true) // reused every round — cut off the source plan
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint(true)
    var iter = 0
    var converged = sym.isEmpty
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
        "graph diameter exceeds maxIter; raise it or use a " +
        "pointer-jumping formulation for path-like graphs")
    labels
  }
}
