package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Product quantization (PQ) for embedding search — the memory side of
 * the canonical IVF-PQ billion-scale ANN design: each vector is split
 * into `m` subspaces of dim/m dimensions, every subspace is k-means
 * quantized to `ksub` centroids, and a vector is stored as its m
 * centroid indices (m small ints instead of dim floats — 8 codes for
 * a 64-float vector is a 32× compression). Search is ASYMMETRIC
 * distance computation (ADC): the query stays exact; its per-subspace
 * distances to every centroid form an m×ksub lookup table computed
 * ONCE on the driver, and a candidate's approximate distance is m
 * table lookups + adds — no per-pair float math at all.
 *
 * Execution shape: the ADC expression is a LINEAR chain of
 * `element_at` lookups into one flattened literal table, fully
 * whole-stage-codegen'd (no higher-order lambdas — Spark interprets
 * those per element), feeding TakeOrderedAndProject for the
 * shortlist; the exact re-rank touches only the shortlist's vectors.
 * Training is deterministic (Lloyd with lowest-id seeding, no RNG).
 */
object ProductQuantizer {

  /** [subspace][centroid][component] codebooks. */
  case class Codebooks(m: Int, dsub: Int, ksub: Int,
                       tables: Seq[Seq[Seq[Double]]])

  private def subVec(vecCol: Column, i: Int, dsub: Int): Column =
    slice(vecCol.cast("array<double>"), i * dsub + 1, dsub)

  /** Train per-subspace codebooks (m small Lloyd runs). */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            m: Int, ksub: Int = 16, iters: Int = 2): Codebooks = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val tables = (0 until m).map { i =>
      val sub = emb.select(col(idCol).as("id"),
        subVec(col(vecCol), i, dsub).as("v"))
      IvfIndex.train(sub, "id", "v", ksub, iters)
    }
    Codebooks(m, dsub, ksub, tables)
  }

  /** Persist trained codebooks as the offline PQ artifact (one row per
    * (subspace, centroid)) — the [[IvfIndex.saveCentroids]] precedent:
    * reload beats retraining m Lloyd runs, and an encoded corpus is
    * unreadable without the exact codebooks that produced its codes.
    * m × ksub × dsub doubles — driver metadata, one tiny file. */
  def saveCodebooks(spark: SparkSession, cb: Codebooks, path: String): Unit = {
    import spark.implicits._
    (for {
      i <- 0 until cb.m; c <- cb.tables(i).indices
    } yield (i, c, cb.tables(i)(c)))
      .toDF("subspace", "centroid", "components").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Reload [[saveCodebooks]]' artifact, subspace/centroid order
    * restored (ragged tables — a subspace can train < ksub centroids
    * on a small corpus — round-trip intact). */
  def loadCodebooks(spark: SparkSession, path: String): Codebooks = {
    val rows = spark.read.parquet(path)
      .select("subspace", "centroid", "components").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toIndexedSeq))
    require(rows.nonEmpty, s"no PQ codebooks at $path")
    val tables = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (_, cs) =>
      cs.sortBy(_._2).map(_._3).toIndexedSeq
    }.toIndexedSeq
    Codebooks(tables.size, tables.head.head.size,
      tables.map(_.size).max, tables)
  }

  /** Attach the `pq_codes` column (array of m centroid indices). */
  def encode(emb: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    emb.withColumn("pq_codes", array((0 until cb.m).map(i =>
      IvfIndex.nearestCentroid(subVec(col(vecCol), i, cb.dsub),
        cb.tables(i))): _*))

  /** Approximate distance of every encoded row to `query` via the ADC
    * lookup table; ascending = most similar first (squared L2). */
  def adcDistance(cb: Codebooks, query: Seq[Double]): Column = {
    require(query.size == cb.m * cb.dsub)
    def sq(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // flattened m×ksub driver-side table; one element_at per subspace
    val flat: Seq[Double] = for {
      i <- 0 until cb.m
      j <- 0 until cb.ksub
    } yield sq(query.slice(i * cb.dsub, (i + 1) * cb.dsub), cb.tables(i)(j))
    val t = typedLit(flat)
    (0 until cb.m).map(i =>
      element_at(t, element_at(col("pq_codes"), i + 1) + i * cb.ksub + 1))
      .reduce(_ + _)
  }

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, Codebooks]()

  /** Memoized training (one per JVM per cache key): codebooks are an
    * OFFLINE index artifact, like [[IvfIndex.buildCached]] — queries
    * pay encode+search cost only. */
  def trainCached(emb: DataFrame, idCol: String, vecCol: String,
                  m: Int, ksub: Int, cacheKey: String): Codebooks =
    cache.computeIfAbsent(s"$cacheKey|$m|$ksub",
      _ => train(emb, idCol, vecCol, m, ksub))

  /**
   * Two-stage search: ADC shortlist of `shortlist` candidates over the
   * codes (compressed domain — no vectors touched), then exact cosine
   * re-rank of only those candidates. Returns top `k` by exact cosine.
   */
  def searchRerank(encoded: DataFrame, idCol: String, vecCol: String,
                   cb: Codebooks, queryId: Long, k: Int,
                   shortlist: Int = 50): DataFrame = {
    val query: Seq[Double] = encoded.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).head().getSeq[Double](0).toSeq
    val cands = encoded.filter(col(idCol) =!= queryId)
      .select(col(idCol), col(vecCol),
        adcDistance(cb, query).as("approx_dist"))
      .orderBy(col("approx_dist"), col(idCol)) // TakeOrderedAndProject
      .limit(shortlist)
    cands
      .select(col(idCol), round(
        Similarity.cosine(col(vecCol), typedLit(query)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
