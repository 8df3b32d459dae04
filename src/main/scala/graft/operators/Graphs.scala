package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Link-graph analytics over edge lists — the crawl-side authority
 * signals next to [[ConnectedComponents]]'s equivalence closure:
 * Common-Crawl-lineage pipelines rank hosts by centrality to
 * prioritize the fetch frontier and to weight domain quality, and a
 * near-dup graph's high-authority nodes are the canonical-candidate
 * tiebreak the min-id rule ignores.
 */
object Graphs {

  /**
   * PageRank over INTEGER mass — the iterative operator with a FULL
   * hash oracle: every arithmetic step is integer (`DIV`, `SUM`,
   * `%`-free), so Spark's partial/final aggregation order cannot
   * perturb a single bit and any engine replaying the recurrence
   * lands on identical longs — no float-iteration rows-only
   * compromise (contrast q72/q9A). The recurrence is the standard
   * damped walk discretized to integer mass:
   *
   *   r₀(v) = base;   rₜ₊₁(v) = (100−damp)·base DIV 100
   *                            + damp · Σ_{u→v} (rₜ(u) DIV out(u)) DIV 100
   *
   * Integer division leaks ≤ out(u)−1 mass units per node per round
   * and dangling nodes (no out-edges) retain nothing — both
   * deterministic, both ≤ 1e-10 relative at the default `base`; ranks
   * ORDER like real PageRank (spec-pinned: cycle symmetry, star
   * authority, hub vs leaf).
   *
   * Scale shape: each round is one broadcast-or-shuffle join of the
   * rank table (|V| rows) with the edge list and one partial/final
   * sum by destination — the contribution stream is |E|-sized and
   * map-side-combined; `localCheckpoint` every 3 rounds truncates the
   * growing plan (the [[ConnectedComponents]] convention). Multi-
   * edges are honored (each parallel edge carries its share).
   * Overflow bound: |V|·base must stay below 2^63/damp — require'd
   * loudly rather than wrapped silently.
   */
  def pageRankInt(edges: DataFrame, srcCol: String, dstCol: String,
                  iters: Int = 10, damp: Long = 85,
                  base: Long = 1000000000000L): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters must be in [1, 100], got $iters")
    require(damp >= 0 && damp <= 100, s"damp is a percentage, got $damp")
    require(base > 0, s"base mass must be positive, got $base")
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    val nNodes = nodes.count()
    require(nNodes > 0, "pageRankInt: empty graph")
    require(nNodes <= Long.MaxValue / math.max(1L, base) / 100,
      s"pageRankInt: $nNodes nodes x base $base risks 64-bit overflow")
    // outdeg folds into the edge table ONCE — it never changes, and
    // joining it per round would re-pay a third join every iteration
    val eOut = e.join(
        e.groupBy(col("src")).agg(count(lit(1)).as("__out")), "src")
      .localCheckpoint(true)
    val teleport = (100 - damp) * base / 100
    var ranks = nodes.withColumn("rank", lit(base))
    var t = 0
    while (t < iters) {
      val contrib = ranks.join(eOut, col("node") === col("src"))
        .select(col("dst").as("node"),
          expr("rank DIV __out").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($damp * coalesce(__s, 0L)) DIV 100")).as("rank"))
      t += 1
      // truncate the 2-join-per-round plan before it dominates
      // scheduling (the ConnectedComponents convention)
      if (t % 3 == 0 || t == iters) ranks = ranks.localCheckpoint(true)
    }
    ranks
  }
}
