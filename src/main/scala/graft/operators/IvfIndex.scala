package graft.operators

import graft.functions.ArrayDot.array_dot
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) index for approximate nearest-neighbour search:
 * Lloyd-iterated centroids partition the corpus into `nlist` cells;
 * a query probes only the `nprobe` nearest cells.
 *
 * Scale shape: centroids are tiny (nlist × dim doubles) and live on
 * the driver / in broadcasts — the corpus itself is only ever touched
 * by (1) one assign pass per Lloyd iteration (narrow, codegen'd
 * ArrayDot distances against a broadcast literal) and (2) the final
 * bucketed write. Search touches ~nprobe/nlist of the data — the
 * standard recall/cost dial. All seeding is deterministic (lowest-id
 * vectors), no RNG.
 */
object IvfIndex {

  private def sqDist(v: Column, c: Seq[Double]): Column = {
    val lit_c = typedLit(c)
    // |v|² - 2 v·c + |c|²  — one ArrayDot per centroid
    array_dot(v, v) - lit(2.0) * array_dot(v, lit_c) +
      lit(c.map(x => x * x).sum)
  }

  /** argmin over centroids — array_min + array_position keeps the
    * expression tree LINEAR in nlist (a case-when fold would duplicate
    * each distance subtree per step: 2^nlist nodes, which stalls
    * analysis/codegen beyond ~10 centroids). */
  private def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val dArr = array(centroids.map(sqDist(v, _)): _*)
    (array_position(dArr, array_min(dArr)) - 1).cast("int")
  }

  /** Deterministic Lloyd iterations; returns the trained centroids. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            nlist: Int, iters: Int = 3): Seq[Seq[Double]] = {
    val dv = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    // seed: the nlist lowest-id vectors (deterministic, no RNG)
    var centroids: Seq[Seq[Double]] = dv.orderBy(col("id")).limit(nlist)
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    val dim = centroids.head.size
    // typed Aggregator: partial/final centroid means, one shuffle of
    // dim doubles per cell (graft.functions.VectorMean)
    val vm = org.apache.spark.sql.functions.udaf(
      new graft.functions.VectorMean(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]())
    for (_ <- 0 until iters) {
      val assigned = dv.withColumn("cell", nearestCentroid(col("v"), centroids))
      val means = assigned.groupBy(col("cell"))
        .agg(vm(col("v")).as("centroid"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toSeq).toMap
      centroids = centroids.indices.map(i => means.getOrElse(i, centroids(i)))
    }
    centroids
  }

  /** Corpus with its IVF cell assignment attached. */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[Seq[Double]]): DataFrame =
    emb.withColumn("ivf_cell",
      nearestCentroid(col(vecCol).cast("array<double>"), centroids))

  /**
   * Top-k by cosine among vectors in the `nprobe` cells nearest to the
   * query vector (queryId's own vector). Probed fraction ≈ nprobe/nlist.
   */
  def search(emb: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[Seq[Double]], queryId: Long,
             k: Int, nprobe: Int): DataFrame = {
    val indexed = assign(emb, idCol, vecCol, centroids)
    val q = indexed.filter(col(idCol) === queryId)
      .select(col(vecCol).as("__qvec"), col("ivf_cell").as("__qcell"))
    // cells to probe: by distance of the QUERY to each centroid —
    // computed on the 1-row broadcast side, no corpus pass
    val withProbe = indexed.join(broadcast(q))
    val probeCells = centroids.indices
      .map(i => struct(sqDist(col("__qvec").cast("array<double>"), centroids(i)).as("d"),
        lit(i).as("cell")))
    val probed = withProbe.withColumn("__probe",
        slice(array_sort(array(probeCells: _*)), 1, nprobe))
      .filter(array_contains(transform(col("__probe"), p => p("cell")), col("ivf_cell")))
    probed
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(Similarity.cosine(col(vecCol), col("__qvec")), 4).as("cos_sim"),
        col("ivf_cell"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
