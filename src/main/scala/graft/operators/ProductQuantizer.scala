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

  /** Attach the `pq_codes` column (array of m centroid indices).
    * Null vectors are DROPPED, not encoded: a null vector would get
    * null codes and therefore a null ADC distance, which ascending
    * sort places FIRST — one null row would displace a real
    * candidate from every shortlist it touches. */
  def encode(emb: DataFrame, vecCol: String, cb: Codebooks): DataFrame =
    emb.filter(col(vecCol).isNotNull)
      .withColumn("pq_codes", array((0 until cb.m).map(i =>
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
    // null-coded rows sort FIRST under ascending approx_dist and
    // would displace real candidates from the shortlist
    val cands = encoded
      .filter(col(idCol) =!= queryId && col("pq_codes").isNotNull)
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

  // ---------------------------------------------------------------
  // Exact fixed-point PQ — the FULL-hash-oracle twin of the float
  // path (the IvfIndex.trainExact precedent crossed onto per-subspace
  // codebooks): every index decision — sub-vector quantization, m
  // Lloyd runs, code assignment, the ADC table and the shortlist
  // order — is exact integer arithmetic, SQL-replayable with
  // subspace as a PARTITION column (one CTE chain covers all m
  // codebooks). Only the final re-rank cosine is float, under the
  // q54/q55 round-4 margin-bound convention.
  // ---------------------------------------------------------------

  /** [subspace][centroid][component] codebooks on the 1e-6 grid. */
  case class CodebooksFp(m: Int, dsub: Int, ksub: Int,
                         tables: Seq[Seq[Seq[Long]]])

  /** Train exact per-subspace codebooks — m [[IvfIndex.trainExact]]
    * runs over the sliced sub-vectors. */
  def trainExact(emb: DataFrame, idCol: String, vecCol: String,
                 m: Int, ksub: Int = 16, iters: Int = 2): CodebooksFp = {
    val dim = emb.select(size(col(vecCol))).head().getInt(0)
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val dsub = dim / m
    val tables = (0 until m).map { i =>
      val sub = emb.select(col(idCol).as("id"),
        subVec(col(vecCol), i, dsub).as("v"))
      IvfIndex.trainExact(sub, "id", "v", ksub, iters)
    }
    CodebooksFp(m, dsub, ksub, tables)
  }

  private val exactCache =
    new java.util.concurrent.ConcurrentHashMap[String, CodebooksFp]()

  /** Memoized [[trainExact]] — the [[trainCached]] shape; for
    * lake-backed corpora the codebooks also persist as an
    * [[ArtifactStore]] generation (one row per (subspace, centroid),
    * long components). */
  def trainExactCached(emb: DataFrame, idCol: String, vecCol: String,
                       m: Int, ksub: Int, cacheKey: String): CodebooksFp =
    exactCache.computeIfAbsent(s"$cacheKey|$m|$ksub", _ =>
      if (emb.inputFiles.isEmpty) trainExact(emb, idCol, vecCol, m, ksub)
      else {
        val spark = emb.sparkSession
        import spark.implicits._
        val rows = ArtifactStore.readOrBuild(spark, cacheKey,
          "pqexactcb-" + ArtifactStore.md5(
            s"$idCol|$vecCol|$m|$ksub").take(12), Seq(emb)) {
          val cb = trainExact(emb, idCol, vecCol, m, ksub)
          (for { i <- 0 until cb.m; c <- cb.tables(i).indices }
            yield (i, c, cb.tables(i)(c)))
            .toDF("subspace", "centroid", "components")
        }.select("subspace", "centroid", "components").collect()
          .map(r => (r.getInt(0), r.getInt(1),
            r.getSeq[Long](2).toIndexedSeq))
        val tables = rows.groupBy(_._1).toSeq.sortBy(_._1)
          .map { case (_, cs) => cs.sortBy(_._2).map(_._3).toIndexedSeq }
          .toIndexedSeq
        CodebooksFp(tables.size, tables.head.head.size,
          tables.map(_.size).max, tables)
      })

  /** Attach `pq_codes` via the exact-integer argmin per subspace.
    * Null vectors are DROPPED (the [[encode]] rule, and the qE4
    * oracle's `q` CTE parity: `WHERE embedding IS NOT NULL`): null
    * codes would yield a null ADC distance, which Spark's ascending
    * sort places FIRST, displacing real shortlist candidates.
    * NaN/Inf components need no extra filter here — they are refused
    * loudly by [[IvfIndex.quantizeFp]]'s 1e-6 fixed-point bound. */
  def encodeExact(emb: DataFrame, vecCol: String,
                  cb: CodebooksFp): DataFrame =
    emb.filter(col(vecCol).isNotNull)
      .withColumn("pq_codes", array((0 until cb.m).map(i =>
        IvfIndex.nearestCentroidExact(
          IvfIndex.quantizeFp(subVec(col(vecCol), i, cb.dsub)),
          cb.tables(i))): _*))

  /** EXACT-long ADC distance: the m×ksub lookup table holds exact
    * integer squared distances of the 1e-6-quantized query
    * sub-vectors to each codebook centroid; a candidate's distance
    * is m element_at lookups + an exact-long sum — bit-identical in
    * any engine. Per-entry bound dsub·(2·10⁷)² ≈ 4·10¹⁴·dsub and the
    * m-term sum both sit far inside signed-64 for any dim ≤ 2·10⁴. */
  def adcDistanceExact(cb: CodebooksFp, queryFp: Seq[Long]): Column = {
    require(queryFp.size == cb.m * cb.dsub,
      s"query dim ${queryFp.size} != ${cb.m * cb.dsub}")
    def sq(a: Seq[Long], b: Seq[Long]): Long = {
      var s = BigInt(0); var i = 0
      while (i < a.length) {
        val d = BigInt(a(i)) - BigInt(b(i)); s += d * d; i += 1
      }
      require(s.isValidLong, s"ADC entry overflows signed-64: $s")
      s.toLong
    }
    val flat: Seq[Long] = for {
      i <- 0 until cb.m
      j <- 0 until cb.ksub
    } yield
      if (j < cb.tables(i).size)
        sq(queryFp.slice(i * cb.dsub, (i + 1) * cb.dsub), cb.tables(i)(j))
      else Long.MaxValue // ragged table: never assigned, never looked up
    val t = typedLit(flat)
    (0 until cb.m).map(i =>
      element_at(t, element_at(col("pq_codes"), i + 1) + i * cb.ksub + 1))
      .reduce(_ + _)
  }

  /** Memoized EXACT encode — the codes are the index's second
    * offline artifact beside the codebooks (a real IVF-PQ deployment
    * writes codes once per corpus, queries read them): for
    * lake-backed corpora the (id, pq_codes) frame persists via
    * [[ArtifactStore]], so a query pays ADC lookups only — the
    * interpreted zip_with argmin (the exact path's per-row encode
    * kernel is a HOF, not codegen'd like the float ArrayDot) runs
    * once per lake generation, not once per query. In-memory
    * corpora fall back to a localCheckpointed live encode. */
  def encodeExactCached(emb: DataFrame, idCol: String, vecCol: String,
                        cb: CodebooksFp, cacheKey: String): DataFrame =
    if (emb.inputFiles.isEmpty)
      encodeExact(emb, vecCol, cb).select(col(idCol), col("pq_codes"))
        .localCheckpoint(true)
    else
      ArtifactStore.readOrBuild(emb.sparkSession, cacheKey,
        "pqexactcodes-" + ArtifactStore.md5(
          s"$idCol|$vecCol|${cb.m}|${cb.ksub}").take(12), Seq(emb)) {
        encodeExact(emb, vecCol, cb).select(col(idCol), col("pq_codes"))
      }

  /** [[searchRerank]]'s FULL-hash-oracle twin: exact-integer ADC
    * shortlist (ascending approx_dist, id ties) over the CODES frame
    * only — vectors never enter the compressed-domain sort — then a
    * float re-rank under GateRound-4 joining the source vectors for
    * just the `shortlist` survivors. Returns (idCol, approx_dist —
    * the exact long — and cos_sim), top k by exact cosine. */
  def searchRerankExact(codes: DataFrame, emb: DataFrame, idCol: String,
                        vecCol: String, cb: CodebooksFp, queryId: Long,
                        k: Int, shortlist: Int = 50): DataFrame = {
    val query: Seq[Double] = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).head()
      .getSeq[Double](0).toSeq
    val qfp = IvfIndex.quantizeFpDriver(query)
    // null-coded rows (possible only in an externally-supplied codes
    // frame — encodeExact drops null vectors) would sort FIRST under
    // ascending approx_dist and displace real candidates
    val cands = codes
      .filter(col(idCol) =!= queryId && col("pq_codes").isNotNull)
      .select(col(idCol), adcDistanceExact(cb, qfp).as("approx_dist"))
      .orderBy(col("approx_dist"), col(idCol)) // TakeOrderedAndProject
      .limit(shortlist)
    cands
      .join(emb.select(col(idCol), col(vecCol)), Seq(idCol))
      .select(col(idCol), col("approx_dist"), graft.functions.GateRound(
        Similarity.cosine(col(vecCol), typedLit(query)), 4).as("cos_sim"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }
}
