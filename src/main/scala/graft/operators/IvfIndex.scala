package graft.operators

import graft.functions.ArrayDot.array_dot
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * IVF (inverted-file) index for approximate nearest-neighbour search:
 * Lloyd-iterated centroids partition the corpus into `nlist` cells;
 * a query probes only the `nprobe` nearest cells.
 *
 * Scale shape — an INDEX, not a per-query scan:
 *  - `train` caches the projected corpus across Lloyd iterations (each
 *    iteration is one assign pass + one tiny means collect; nothing is
 *    re-read from parquet);
 *  - `writeIndex` persists the cell assignment ONCE, Hive-partitioned
 *    by `ivf_cell` — the expensive nlist-wide distance evaluation
 *    happens exactly once per corpus, at build time;
 *  - `searchIndexed` selects the probe cells on the DRIVER (pure local
 *    math over nlist tiny centroids — no corpus pass at all) and reads
 *    only those cells: against the written index that is directory-
 *    level partition pruning, ~nprobe/nlist of the data touched.
 * All seeding is deterministic (lowest-id vectors), no RNG.
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
  private[operators] def nearestCentroid(v: Column, centroids: Seq[Seq[Double]]): Column = {
    val dArr = array(centroids.map(sqDist(v, _)): _*)
    (array_position(dArr, array_min(dArr)) - 1).cast("int")
  }

  /** Deterministic Lloyd iterations; returns the trained centroids. */
  def train(emb: DataFrame, idCol: String, vecCol: String,
            nlist: Int, iters: Int = 3): Seq[Seq[Double]] = {
    // cache across iterations: every Lloyd pass re-uses this projection
    // instead of re-scanning the source parquet
    val dv = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .cache()
    try {
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
    } finally dv.unpersist()
  }

  /** Corpus with its IVF cell assignment attached (the one nlist-wide
    * distance pass — build-time cost, paid once per corpus). */
  def assign(emb: DataFrame, idCol: String, vecCol: String,
             centroids: Seq[Seq[Double]]): DataFrame =
    emb.withColumn("ivf_cell",
      nearestCentroid(col(vecCol).cast("array<double>"), centroids))

  /** Persist the index: cell assignment written Hive-partitioned by
    * `ivf_cell`, so a search's cell filter becomes directory-level
    * partition pruning. */
  def writeIndex(emb: DataFrame, idCol: String, vecCol: String,
                 centroids: Seq[Seq[Double]], path: String): Unit =
    assign(emb, idCol, vecCol, centroids)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(path)

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Persist trained centroids next to the cell-partitioned index —
    * the query-time half of the offline artifact: [[probeCells]] and
    * [[searchIndexed]] need them, and reloading beats retraining k
    * Lloyd iterations over the corpus. nlist × dim doubles — driver
    * metadata, one tiny file. */
  def saveCentroids(spark: SparkSession, centroids: Seq[Seq[Double]],
                    path: String): Unit = {
    import spark.implicits._
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid").coalesce(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Reload [[saveCentroids]]' artifact, cell order restored. */
  def loadCentroids(spark: SparkSession, path: String): Seq[Seq[Double]] =
    spark.read.parquet(path).select("cell", "centroid").collect()
      .sortBy(_.getInt(0)).map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq

  /** The `nprobe` cells nearest to the query vector — pure driver-side
    * math over nlist × dim doubles; the corpus is never touched. */
  def probeCells(query: Seq[Double], centroids: Seq[Seq[Double]],
                 nprobe: Int): Seq[Int] = {
    def sq(a: Seq[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    centroids.zipWithIndex
      .map { case (c, i) => (sq(query, c), i) }
      .sortBy(identity).take(nprobe).map(_._2)
  }

  /**
   * A built, queryable index: trained centroids, the cell-partitioned
   * corpus, and an id→cell sidecar (2 narrow columns — a point lookup
   * scans it instead of the 64-float vectors, then reads the one cell
   * partition that holds the vector). Built once per (corpus, params)
   * via [[buildCached]]; queries only pay search cost.
   */
  case class Index(centroids: Seq[Seq[Double]], data: DataFrame,
                   idToCell: DataFrame)

  // memoizes SESSION-FREE artifacts only (centroids + on-disk path):
  // caching the DataFrames themselves would pin them to the session
  // that built the index, and a later session (Bench rebuilds its
  // session between passes) would read through a stopped context
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, (Seq[Seq[Double]], String)]()
  private val centroidCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Double]]]()

  /** Memoized centroid training (k-means is an OFFLINE artifact —
    * queries pay assignment/search cost only, as with [[buildCached]]).
    * For lake-backed corpora the trained centroids also persist as an
    * [[ArtifactStore]] generation — `(cell, vec)` rows, order
    * restored by cell — so a FRESH JVM loads the stored index instead
    * of re-running Lloyd's (and, a correctness bonus: every process
    * serving one lake searches the SAME centroids, removing the
    * float-iteration-order jitter between their k-means runs). */
  def trainCached(emb: DataFrame, idCol: String, vecCol: String,
                  nlist: Int, iters: Int, cacheKey: String): Seq[Seq[Double]] =
    centroidCache.computeIfAbsent(s"$cacheKey|$nlist|$iters", _ =>
      if (emb.inputFiles.isEmpty) train(emb, idCol, vecCol, nlist, iters)
      else {
        val spark = emb.sparkSession
        import spark.implicits._
        ArtifactStore.readOrBuild(spark, cacheKey,
          "ivfcentroids-" + ArtifactStore.md5(
            s"$idCol|$vecCol|$nlist|$iters").take(12), Seq(emb)) {
          train(emb, idCol, vecCol, nlist, iters)
            .zipWithIndex.map { case (v, i) => (i, v) }.toDF("cell", "vec")
        }.orderBy(col("cell")).collect()
          .map(_.getSeq[Double](1).toIndexedSeq).toIndexedSeq
      })

  /**
   * Memoized build (one per JVM per cache key, like `Tables.load`):
   * train + persist the cell-partitioned index + sidecar under a
   * per-run temp directory — unique per JVM, so two processes
   * benchmarking the same workspace never race on one path. On a real
   * cluster the path would live on shared storage; the layout
   * (Hive-partitioned by cell + narrow sidecar) is the part that
   * carries to 100 TB.
   */
  def buildCached(emb: DataFrame, idCol: String, vecCol: String,
                  nlist: Int, iters: Int, cacheKey: String): Index = {
    val (centroids, path) =
      cache.computeIfAbsent(s"$cacheKey|$nlist|$iters", _ => {
        val cs = train(emb, idCol, vecCol, nlist, iters)
        val base = java.nio.file.Paths.get("target")
        java.nio.file.Files.createDirectories(base)
        val p = java.nio.file.Files
          .createTempDirectory(base, "ivf_index_").toString
        writeIndex(emb, idCol, vecCol, cs, s"$p/cells")
        readIndex(emb.sparkSession, s"$p/cells")
          .select(col(idCol), col("ivf_cell"))
          .write.mode("overwrite").parquet(s"$p/ids")
        (cs, p)
      })
    val spark = emb.sparkSession
    Index(centroids, readIndex(spark, s"$path/cells"),
      spark.read.parquet(s"$path/ids"))
  }

  /**
   * Top-k by cosine over a PRE-ASSIGNED corpus (from `assign` or
   * `readIndex`): one point lookup for the query vector, driver-side
   * probe-cell selection, then a cell-pruned cosine top-k. Probed
   * fraction ≈ nprobe/nlist. With `idToCell` the query-vector lookup
   * reads the narrow sidecar + one cell partition instead of scanning
   * every cell's vectors.
   */
  def searchIndexed(indexed: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Double]], queryId: Long,
                    k: Int, nprobe: Int,
                    idToCell: Option[DataFrame] = None): DataFrame = {
    val qRows = idToCell match {
      case Some(sidecar) =>
        val qCell = sidecar.filter(col(idCol) === queryId)
          .select(col("ivf_cell")).head().getInt(0)
        indexed.filter(col("ivf_cell") === qCell) // partition-pruned point read
      case None => indexed
    }
    val qv: Seq[Double] = qRows.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).head().getSeq[Double](0).toSeq
    val cells = probeCells(qv, centroids, nprobe)
    indexed
      .filter(col("ivf_cell").isin(cells: _*)) // partition-pruned on the index
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        round(cosine(col(vecCol).cast("array<double>"), typedLit(qv)), 4).as("cos_sim"),
        col("ivf_cell"))
      .orderBy(col("cos_sim").desc, col(idCol))
      .limit(k)
  }

  private def cosine(a: Column, b: Column): Column =
    array_dot(a, b) / (sqrt(array_dot(a, a)) * sqrt(array_dot(b, b)))

  // ---------------------------------------------------------------
  // Exact fixed-point Lloyd path — the FULL-hash-oracle twin of
  // `train`. Float k-means is rows-only under a byte-hash oracle
  // (iteration order flips nothing semantically but everything
  // bitwise); THIS path quantizes coordinates ONCE to the 1e-6 grid
  // (the Pca.powerIteration / qCC axis) and keeps every Lloyd
  // quantity an exact integer: squared distances are exact-long
  // sums, assignment ties break (min distance, then min centroid
  // index), and each new centroid coordinate is one TRUNCATING
  // BigInt division of exact sums (Scala BigInt `/` ≡ DuckDB `//`
  // — both truncate toward zero, probed by the qCJ oracle). k
  // iterations replay in SQL as k chained CTEs, so the centroids —
  // and everything downstream of them — are hash-oracle-able.
  // ---------------------------------------------------------------

  /** 1e-6 fixed-point quantization with the qCC/powerIteration guard:
    * null, NaN, or |x| ≥ 10 coordinates are refused loudly (a silent
    * clamp would bend cell geometry). ≤ 1e7 per coordinate keeps the
    * per-pair squared distance under 4e14·dim — exact in signed-64
    * for any dim ≤ 2·10⁴. */
  private[operators] def quantizeFp(vecCol: Column): Column =
    transform(vecCol, x =>
      when(abs(x.cast("double")) < lit(10.0),
        floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long"))
        .otherwise(raise_error(concat(
          lit("trainExact: coordinate is null, NaN, or >= 10 in " +
            "magnitude - breaks the 1e-6 fixed-point contract: "),
          coalesce(x.cast("string"), lit("null"))))))

  private def sqDistExact(v: Column, c: Seq[Long]): Column =
    aggregate(zip_with(v, typedLit(c), (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** argmin over exact-long distances: array_position of array_min
    * returns the FIRST minimal index — the (min dist, min cell)
    * tie-break the oracle replays as `ORDER BY dist, cell LIMIT 1`. */
  private[operators] def nearestCentroidExact(
      v: Column, centroids: Seq[Seq[Long]]): Column = {
    val dArr = array(centroids.map(sqDistExact(v, _)): _*)
    (array_position(dArr, array_min(dArr)) - 1).cast("int")
  }

  /**
   * Deterministic EXACT Lloyd iterations over 1e-6 fixed-point
   * coordinates; returns the quantized centroids (longs on the 1e-6
   * grid). Seeding, iteration count and empty-cell retention mirror
   * [[train]]; unlike it, the result is bit-identical in ANY
   * execution order and SQL-replayable.
   *
   * Exact contract: per-row assignment distances are exact-long sums
   * (bound above); per-cell per-coordinate sums ride DECIMAL(38,0)
   * (no corpus-size bound); the new coordinate is BigInt-truncating
   * `sum / n`. Uniform dimension is REQUIRED (a ragged corpus would
   * zip_with-null the distance — refused loudly, the powerIteration
   * convention).
   *
   * Scale shape: per iteration, one corpus assign pass (nlist
   * exact-distance kernels, codegen'd HOFs) + one posexplode →
   * (cell, dim) partial/final aggregate collecting nlist×dim rows
   * (metadata). The projected corpus caches across iterations.
   */
  def trainExact(emb: DataFrame, idCol: String, vecCol: String,
                 nlist: Int, iters: Int = 2): Seq[Seq[Long]] = {
    require(nlist >= 1 && iters >= 1, "nlist and iters must be >= 1")
    val dv = emb.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), quantizeFp(col(vecCol)).as("qv"))
      .cache()
    try {
      val dims = dv.select(size(col("qv")).as("d")).distinct()
        .collect().map(_.getInt(0))
      if (dims.isEmpty) return Seq.empty
      require(dims.length == 1,
        s"trainExact: mixed dimensions ${dims.sorted.mkString(",")} — " +
          "a ragged corpus breaks the exact zip_with distance")
      var centroids: Seq[Seq[Long]] = dv.orderBy(col("id")).limit(nlist)
        .collect().map(_.getSeq[Long](1).toSeq).toSeq
      for (_ <- 0 until iters) {
        val sums = dv
          .withColumn("cell", nearestCentroidExact(col("qv"), centroids))
          .select(col("cell"), posexplode(col("qv")).as(Seq("i", "x")))
          .groupBy(col("cell"), col("i"))
          .agg(sum(col("x").cast("decimal(38,0)")).as("s"),
            count(lit(1)).as("n"))
          .collect()
        val byCell = sums.groupBy(_.getInt(0))
        centroids = centroids.indices.map { c =>
          byCell.get(c) match {
            case Some(rows) =>
              val n = BigInt(rows.head.getLong(3))
              rows.sortBy(_.getInt(1))
                .map(r => (BigInt(r.getDecimal(2).toBigInteger) / n).toLong)
                .toSeq
            case None => centroids(c) // empty cell keeps its centroid
          }
        }
      }
      centroids
    } finally dv.unpersist()
  }

  /** Memoized [[trainExact]] — the [[trainCached]] shape: in-JVM memo
    * always; for lake-backed corpora the centroids also persist as an
    * [[ArtifactStore]] generation so a fresh JVM loads, not retrains. */
  def trainExactCached(emb: DataFrame, idCol: String, vecCol: String,
                       nlist: Int, iters: Int,
                       cacheKey: String): Seq[Seq[Long]] =
    exactCache.computeIfAbsent(s"$cacheKey|$nlist|$iters", _ =>
      if (emb.inputFiles.isEmpty) trainExact(emb, idCol, vecCol, nlist, iters)
      else {
        val spark = emb.sparkSession
        import spark.implicits._
        ArtifactStore.readOrBuild(spark, cacheKey,
          "ivfexactcent-" + ArtifactStore.md5(
            s"$idCol|$vecCol|$nlist|$iters").take(12), Seq(emb)) {
          trainExact(emb, idCol, vecCol, nlist, iters)
            .zipWithIndex.map { case (v, i) => (i, v) }.toDF("cell", "vec")
        }.orderBy(col("cell")).collect()
          .map(_.getSeq[Long](1).toIndexedSeq).toIndexedSeq
      })

  private val exactCache =
    new java.util.concurrent.ConcurrentHashMap[String, Seq[Seq[Long]]]()

  /** Corpus with its exact-cell assignment attached — [[assign]]'s
    * twin over [[trainExact]] centroids (quantize, then exact-long
    * argmin). */
  def assignExact(emb: DataFrame, idCol: String, vecCol: String,
                  centroids: Seq[Seq[Long]]): DataFrame =
    emb.withColumn("ivf_cell",
      nearestCentroidExact(quantizeFp(col(vecCol)), centroids))

  /** Memoized exact ASSIGNMENT sidecar — (idCol, ivf_cell) only, the
    * durable twin of [[writeIndex]]'s cell layout for the exact
    * path: the per-row exact argmin is an interpreted zip_with HOF
    * (not codegen'd like the float ArrayDot), so a lake-backed
    * corpus pays it once per generation and queries join the narrow
    * sidecar back by id (the [[Index.idToCell]] shape). In-memory
    * corpora fall back to a localCheckpointed live assignment. */
  def assignExactCached(emb: DataFrame, idCol: String, vecCol: String,
                        centroids: Seq[Seq[Long]],
                        cacheKey: String): DataFrame =
    if (emb.inputFiles.isEmpty)
      assignExact(emb, idCol, vecCol, centroids)
        .select(col(idCol), col("ivf_cell")).localCheckpoint(true)
    else
      ArtifactStore.readOrBuild(emb.sparkSession, cacheKey,
        "ivfexactassign-" + ArtifactStore.md5(
          s"$idCol|$vecCol|${centroids.size}|" +
            centroids.map(_.hashCode).mkString(",")).take(12), Seq(emb)) {
        assignExact(emb, idCol, vecCol, centroids)
          .select(col(idCol), col("ivf_cell"))
      }

  /** [[probeCells]]' exact twin: the nprobe nearest cells by EXACT
    * integer squared distance, ties → lowest cell index — pure
    * driver math over nlist × dim longs. */
  def probeCellsExact(query: Seq[Long], centroids: Seq[Seq[Long]],
                      nprobe: Int): Seq[Int] = {
    def sq(a: Seq[Long], b: Seq[Long]): BigInt = {
      var s = BigInt(0); var i = 0
      while (i < a.length) {
        val d = BigInt(a(i)) - BigInt(b(i)); s += d * d; i += 1
      }
      s
    }
    centroids.zipWithIndex
      .map { case (c, i) => (sq(query, c), i) }
      .sortBy(identity).take(nprobe).map(_._2)
  }

  /** Driver-side 1e-6 quantization of one query vector — the same
    * floor(x·1e6 + 0.5) IEEE dag [[quantizeFp]] evaluates per row. */
  def quantizeFpDriver(v: Seq[Double]): Seq[Long] = {
    v.foreach(x => require(!x.isNaN && math.abs(x) < 10.0,
      s"quantizeFpDriver: coordinate $x is NaN or >= 10 in magnitude"))
    v.map(x => math.floor(x * 1e6 + 0.5).toLong)
  }
}
