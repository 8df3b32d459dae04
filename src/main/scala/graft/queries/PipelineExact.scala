package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Similarity, TextAnalysis}

/**
 * Exact fixed-point twin + capstone query family (split from
 * Pipeline.scala, round 19): the qE* block - integer-Lloyd index twins
 * (qE0-qE2, qE4), the significance capstone (qE3), changepoint (qE5)
 * and the event funnel (qE6), with their chained-CTE DuckDB oracles.
 */
object PipelineExact {
  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, Q] = Map(

    // EXACT fixed-point IVF search — q72's FULL-hash-oracle twin
    // (the qBS/qCA/qCJ precedent crossed onto k-means): integer
    // Lloyd centroids + exact-integer probe selection replay in
    // DuckDB as chained CTEs; only the final cosine score is float,
    // under the q54/q55 round-4 margin-bound convention
    "qE0_ivf_search_exact" -> ((s, dir) => {
      val ivf = graft.operators.IvfIndex
      val emb = T(s, dir)("embeddings")
      val cents = ivf.trainExactCached(emb, "vec_id", "embedding",
        nlist = 16, iters = 2, cacheKey = dir)
      val assigned = emb.join(ivf.assignExactCached(emb, "vec_id",
        "embedding", cents, cacheKey = dir), Seq("vec_id"))
      val qv = emb.filter(col("vec_id") === 0)
        .select(col("embedding").cast("array<double>"))
        .head().getSeq[Double](0).toSeq
      val cells = ivf.probeCellsExact(ivf.quantizeFpDriver(qv), cents, 4)
      assigned
        .filter(col("ivf_cell").isin(cells: _*) && col("vec_id") =!= 0)
        .select(col("vec_id"), graft.functions.GateRound(
          Similarity.cosine(col("embedding").cast("array<double>"),
            typedLit(qv)), 4).as("cos_sim"),
          col("ivf_cell"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(10)
    }),

    // EXACT fixed-point kNN self-join — q9B's FULL-hash-oracle twin:
    // same linear cell-bounded candidate shape + bounded-heap top-k,
    // index decisions all exact-integer and SQL-replayed
    "qE1_knn_join_exact" -> ((s, dir) => {
      Similarity.knnJoinExact(
          T(s, dir)("embeddings").filter(col("vec_id") < 100),
          "vec_id", "embedding", k = 3, nlist = 8, probeCells = 4,
          cacheKey = Some(s"$dir|knn100"))
        .orderBy(col("id"), col("rank"))
    }),

    // eval-significance CAPSTONE — the significance family COMPOSED
    // end-to-end the way qB2/qAD/q89 compose the curation stages:
    // paired A/B scores -> tie exclusion -> per-source sign-test
    // p-values (exact O(n^2) tail fold) -> ONE BH family at q=10% ->
    // rejected-set scorecard. The planted win ladder (w_s by source
    // index) makes BOTH the rejected set and a genuinely RESCUED
    // rank non-empty at the gate SF: rank 4 (p=.022656 > crit .02)
    // fails its own step-up criterion but rank 5 accepts, so the
    // step-up cutoff k=5 rescues it — the property that separates
    // BH from Holm, exercised in data
    "qE3_significance_capstone" -> ((s, dir) => {
      val P = graft.operators.Preference
      val d = T(s, dir)("documents")
      val sIdx = col("doc_id") % 20
      val r = expr("(doc_id div 20) % 25")
      val w = when(sIdx === 0, 21L)
        .when(sIdx.isin(1, 2), 19L)
        .when(sIdx.isin(3, 4), 18L)
        .when(sIdx.between(5, 12), 14L)
        .otherwise(13L)
      val a = when(r < w, 2L).otherwise(0L)
      val pairs = d.select(col("source"), a.as("score_a"),
          when(r === 24, a).otherwise(1L).as("score_b"))
        .filter(col("score_a") =!= col("score_b")) // sign test: drop ties
      val st = P.signTest(pairs.select(col("source"),
        (col("score_a") > col("score_b")).as("win")), "source", "win")
      val verdicts = P.bhFdr(st.select(lit("ab").as("family"),
          col("source").as("test_id"), col("p_two")),
        "family", "test_id", "p_two", qPct = 10)
      st.join(verdicts.select(col("test_id").as("source"), col("rank"),
          col("m"), col("k"), col("reject")), Seq("source"))
        .select(col("source"), col("n"), col("wins"), col("losses"),
          col("p_two"), col("rank"), col("m"), col("k"), col("reject"))
        .orderBy(col("source"))
    }),

    // EXACT fixed-point IVF-PQ search — q9A's FULL-hash-oracle twin:
    // per-subspace integer Lloyd codebooks, exact-long ADC lookup
    // table and shortlist order, all replayed in DuckDB with
    // subspace as a PARTITION column (one CTE chain covers all 16
    // codebooks); only the re-rank cosine is float (round-4
    // margin-bound convention)
    "qE4_pq_search_exact" -> ((s, dir) => {
      val pq = graft.operators.ProductQuantizer
      val emb = T(s, dir)("embeddings")
      val cb = pq.trainExactCached(emb, "vec_id", "embedding",
        m = 16, ksub = 16, cacheKey = dir)
      val codes = pq.encodeExactCached(emb, "vec_id", "embedding", cb,
        cacheKey = dir)
      pq.searchRerankExact(codes, emb, "vec_id", "embedding", cb,
        queryId = 0L, k = 10, shortlist = 50)
    }),

    // single mean-shift changepoint per source over a PLANTED shift
    // (x jumps +5 at the 13th row of each source's doc_id order):
    // all-integer contrast g_k = |n*C_k - k*C_n|, struct-max argmax
    // with min-k ties — "WHERE did it drift", qDX's companion
    "qE5_changepoint" -> ((s, dir) => {
      graft.operators.Retention.changepointMean(
          T(s, dir)("documents").select(col("source"), col("doc_id"),
            (col("doc_id") % 7 +
              when(expr("doc_id div 20") % 25 >= 12, 5L).otherwise(0L))
              .as("x")),
          "source", "doc_id", "x")
        .orderBy(col("source"))
    }),

    // ordered 3-step event funnel per user (view -> click ->
    // purchase, strictly increasing timestamps): the earliest
    // greedy chain — per-step hash aggregates + user-frame joins,
    // no windows, the event stream never sorts
    "qE6_event_funnel" -> ((s, dir) => {
      val ev = T(s, dir)("events")
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      graft.operators.Retention.funnel(ev, "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"))
        .orderBy(col("user_id"))
    }),

    // EXACT fixed-point SemDeDup — q9X's FULL-hash-oracle twin: the
    // same cell-bounded edge search + min-label components, over
    // exact-integer k-means cells the oracle replays bit-for-bit
    "qE2_semantic_dedup_exact" -> ((s, dir) => {
      Similarity.semanticDedupExact(T(s, dir)("embeddings"), "vec_id",
          "embedding", minCos = 0.40, nlist = 4,
          cacheKey = Some(s"semdedupx|$dir"))
        .orderBy(col("vec_id"))
    }),

    // interpolated Kneser-Ney TRIGRAM model with continuation
    // backoff — qCU one order up (the order LM-data tooling actually
    // scores with): all lower-order stats derive from the ONE
    // trigram census, every count an exact long, one shared float
    // dag, the top-k cut a total integer order
    "qE9_kn_trigram" -> ((s, dir) => {
      TextAnalysis.kneserNeyTrigrams(T(s, dir)("documents"), "text",
          topK = 50, cacheKey = Some(dir))
        .orderBy(col("w1"), col("w2"), col("w3"))
    }),

    // held-out TRIGRAM cross-entropy — qDP one order up: train on
    // the even docs, score the odd docs' trigram events, coverage
    // reported honestly beside the entropy (unseen-w3 events never
    // fold in as -inf); decimal(38,0) cross-type sum
    "qEA_kn_trigram_ce" -> ((s, dir) => {
      val d = T(s, dir)("documents")
      TextAnalysis.kneserNeyTrigramCrossEntropy(
        d.filter(col("doc_id") % 2 === 0).select(col("text")),
        d.filter(col("doc_id") % 2 === 1).select(col("text")),
        "text", cacheKey = Some(dir))
    }),

    // WINDOWED event funnel — qE6 with the product-analytics
    // conversion window: steps 2..k must land within maxSpan of the
    // first-touch anchor t1 ("purchase within ~2.3 days of the first
    // view", chosen to bisect the corpus's span distribution so the
    // bound genuinely bites); greedy stays optimal because the
    // window end is FIXED by the anchor (Retention.funnel docstring
    // carries the proof and the maxGap counterexample)
    "qE8_windowed_funnel" -> ((s, dir) => {
      val ev = T(s, dir)("events")
        .withColumn("ts", col("ts") - pmod(col("ts"), lit(1000L)))
      graft.operators.Retention.funnel(ev, "user_id", "event_type",
          "ts", Seq("view", "click", "purchase"),
          maxSpan = Some(QE8_SPAN_NS))
        .orderBy(col("user_id"))
    }),

    // EXACT fixed-point PCA whitening — qBO's FULL-hash-oracle twin
    // and the r18 verdict's #1 ask: top-4 eigensystem via integer
    // power iteration + Hotelling deflation on the centered scatter
    // matrix (the qCJ single-direction precedent generalized), then
    // per-row whitened scores as ONE exact integer + one IEEE divide
    // each — 48 chained HUGEINT CTEs replay the whole model
    "qE7_pca_whiten_exact" -> ((s, dir) => {
      val emb = T(s, dir)("embeddings")
      val model = graft.operators.Pca.eigenExactCached(emb, "embedding",
        k = 4, iters = 12, cacheKey = dir)
      graft.operators.Pca.whitenExact(emb, "vec_id", "embedding", model)
        .orderBy(col("vec_id"))
    }),

    // EXACT-replayable HyperLogLog — q09's FULL-hash-oracle twin
    // (the exact-twin program crossed onto sketches): per-source
    // distinct WORD-TRIGRAM cardinality (the shingle space dedup
    // reasons over — ~10k distinct per source at sf0.1, so the raw
    // harmonic regime is exercised, not just linear counting) from
    // md5-driven registers, exact integer register maxima and
    // harmonic numerator, one IEEE division; DuckDB rebuilds the
    // identical sketch
    "qEB_hll_exact" -> ((s, dir) => {
      val sh = qEDShingles(T(s, dir)("documents"))
      graft.operators.Sketches.hllExact(sh, "source", "shingle", p = 12)
        .orderBy(col("source"))
    }),

    // HDR-histogram quantile sketch — q87's deterministic scale-path
    // twin (KLL's randomized compaction is engine-internal; this
    // log-bucket sketch is 100% integer): per-source document-length
    // percentiles as exact bucket lower bounds, no float anywhere
    "qEC_hdr_quantiles" -> ((s, dir) => {
      graft.operators.Sketches.hdrQuantiles(
          T(s, dir)("documents"), "source", "n_chars",
          permilles = Seq(500, 900, 990, 999), subBits = 5)
        .orderBy(col("source"), col("permille"))
    }),

    // Cross-source vocabulary overlap from MERGED HLL registers —
    // the dedup-planning matrix ("how much shingle space do two
    // crawls share?") without ever joining values: union = register
    // max, intersection = inclusion-exclusion, p=16 so the ~1.4k
    // vocabularies sit in the near-exact linear-counting regime
    "qED_hll_overlap" -> ((s, dir) => {
      val sh = qEDShingles(T(s, dir)("documents")
        .filter(col("source").isin("src0", "src1", "src2", "src3")))
      graft.operators.Sketches.hllOverlap(sh, "source", "shingle",
          p = 16)
        .orderBy(col("source_a"), col("source_b"))
    })
  )

  /** (source, shingle) word-trigram stream for qEB/qED, via the
    * codegen'd TokenGrams kernel (one tokenizer pass per doc; the
    * earlier staged-toks HOF needed explicit materialization to stop
    * `element_at` re-running the regexp per gram — the kernel
    * obsoletes the staging entirely). */
  private def qEDShingles(docs: DataFrame): DataFrame =
    // codegen'd one-pass trigram kernel: same \S+ tokens, same space
    // join, no grams when len < 3 (null text → null array, which
    // explode drops like the old empty-array branch) — replaces the
    // staged-toks transform/element_at lambda, which boxed three
    // ArrayData reads per gram
    docs.select(col("source"),
      explode(graft.functions.ShingleExprs.token_grams(
        col("text"), 3, overlapping = true)).as("shingle"))


  /** Chained exact-Lloyd CTEs — the DuckDB replica of
    * [[graft.operators.IvfIndex.trainExact]]: 1e-6 quantization,
    * lowest-id seeds, exact-integer distances with (min dist, min
    * cell) ties, truncating `//` centroid means (≡ BigInt `/` — the
    * qCJ-probed parity), empty cells retained via LEFT JOIN +
    * COALESCE. Emits CTEs `q` (quantized corpus: vec_id, fv, qv),
    * `c<iters>` (final centroids) and `a<iters+1>` (final
    * assignment); interpolate inside WITH [RECURSIVE]. */
  private def exactLloydCtes(source: String, nlist: Int, iters: Int,
                             dim: Int = 64): String = {
    def assignSql(prev: Int, cur: Int): String = s"""
      d$cur AS (SELECT q.vec_id, q.qv, c.cell,
             list_sum(list_transform(range(1, ${dim + 1}),
               i -> (q.qv[i] - c.cv[i]) * (q.qv[i] - c.cv[i]))) AS dist
           FROM q, c$prev c),
      a$cur AS (SELECT vec_id, qv, cell FROM
             (SELECT vec_id, qv, cell, row_number() OVER
                (PARTITION BY vec_id ORDER BY dist, cell) AS rn
              FROM d$cur) WHERE rn = 1)"""
    def meanSql(cur: Int): String = s"""
      s$cur AS (SELECT cell, i, SUM(qv[i]) AS s, COUNT(*) AS n
           FROM a$cur, range(1, ${dim + 1}) t(i) GROUP BY cell, i),
      c$cur AS (SELECT c${cur - 1}.cell, COALESCE(nc.cv, c${cur - 1}.cv) AS cv
           FROM c${cur - 1} LEFT JOIN
             (SELECT cell, list(CAST(s // n AS BIGINT) ORDER BY i) AS cv
              FROM s$cur GROUP BY cell) nc USING (cell))"""
    val iterations = (1 to iters)
      .map(c => assignSql(c - 1, c) + "," + meanSql(c)).mkString(",")
    s"""
      q AS MATERIALIZED (
        SELECT src.vec_id, CAST(src.embedding AS DOUBLE[]) AS fv,
               list_transform(src.embedding, x ->
                 CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
                 AS qv
        FROM $source src WHERE src.embedding IS NOT NULL),
      c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
                    qv AS cv
             FROM q ORDER BY vec_id LIMIT $nlist),
      $iterations,
      ${assignSql(iters, iters + 1)}"""
  }

  private def qE0Sql: String = s"""
      WITH ${exactLloydCtes("embeddings", nlist = 16, iters = 2)},
      q0 AS (SELECT qv AS q0v, fv AS q0f FROM q WHERE vec_id = 0),
      pc AS (SELECT cell FROM (
              SELECT c.cell, list_sum(list_transform(range(1, 65),
                i -> (q0.q0v[i] - c.cv[i]) * (q0.q0v[i] - c.cv[i])))
                AS dist
              FROM c2 c, q0) ORDER BY dist, cell LIMIT 4)
      SELECT a3.vec_id,
             round(list_cosine_similarity(q.fv, q0.q0f), 4) + 0 AS cos_sim,
             CAST(a3.cell AS INT) AS ivf_cell
      FROM a3 JOIN q USING (vec_id), q0
      WHERE a3.cell IN (SELECT cell FROM pc) AND a3.vec_id <> 0
      ORDER BY cos_sim DESC, vec_id LIMIT 10"""

  private def qE1Sql: String = s"""
      WITH ${exactLloydCtes("(SELECT * FROM embeddings WHERE vec_id < 100)",
        nlist = 8, iters = 2)},
      qn AS (SELECT vec_id, fv FROM q
             WHERE sqrt(list_sum(list_transform(fv, x -> x * x))) > 0
               AND sqrt(list_sum(list_transform(fv, x -> x * x)))
                   <= 1.7976931348623157e308),
      cp AS (SELECT cell_a, cell_b FROM (
              SELECT a.cell AS cell_a, b.cell AS cell_b,
                     row_number() OVER (PARTITION BY a.cell ORDER BY
                       list_sum(list_transform(range(1, 65),
                         i -> (a.cv[i] - b.cv[i]) * (a.cv[i] - b.cv[i]))),
                       b.cell) AS rn
              FROM c2 a, c2 b) WHERE rn <= 4),
      cand AS (SELECT x.vec_id AS id, y.vec_id AS nid,
                 round(list_cosine_similarity(xq.fv, yq.fv), 4) + 0 AS score
               FROM a3 x JOIN cp ON x.cell = cp.cell_a
                 JOIN a3 y ON y.cell = cp.cell_b AND x.vec_id <> y.vec_id
                 JOIN qn xq ON xq.vec_id = x.vec_id
                 JOIN qn yq ON yq.vec_id = y.vec_id)
      SELECT CAST(id AS BIGINT) AS id, CAST(nid AS BIGINT) AS nn_id,
             score AS cos_sim, CAST(rn AS INT) AS rank
      FROM (SELECT id, nid, score, row_number() OVER
              (PARTITION BY id ORDER BY score DESC, nid) AS rn FROM cand)
      WHERE rn <= 3 ORDER BY id, rank"""

  private def qE2Sql: String = s"""
      WITH RECURSIVE ${exactLloydCtes("embeddings", nlist = 4, iters = 2)},
      qn AS (SELECT vec_id, fv FROM q
             WHERE sqrt(list_sum(list_transform(fv, x -> x * x))) > 0
               AND sqrt(list_sum(list_transform(fv, x -> x * x)))
                   <= 1.7976931348623157e308),
      p AS (SELECT x.vec_id AS id_a, y.vec_id AS id_b
            FROM a3 x JOIN a3 y ON x.cell = y.cell AND x.vec_id < y.vec_id
              JOIN qn xq ON xq.vec_id = x.vec_id
              JOIN qn yq ON yq.vec_id = y.vec_id
            WHERE list_cosine_similarity(xq.fv, yq.fv) >= 0.40),
      edges AS (SELECT id_a AS a, id_b AS b FROM p
                UNION ALL SELECT id_b, id_a FROM p),
      reach(id, r) AS (SELECT vec_id, vec_id FROM embeddings
                       UNION
                       SELECT e.b, reach.r
                       FROM reach JOIN edges e ON e.a = reach.id)
      SELECT id AS vec_id, min(r) AS canonical_id,
             (min(r) = id) AS is_canonical
      FROM reach GROUP BY id ORDER BY vec_id"""

  private def qE3Sql: String = """
      WITH base AS (SELECT source, doc_id % 20 AS s,
                      (doc_id // 20) % 25 AS r FROM documents),
      sc AS (SELECT source, r,
               CASE WHEN r < (CASE WHEN s = 0 THEN 21
                                   WHEN s IN (1, 2) THEN 19
                                   WHEN s IN (3, 4) THEN 18
                                   WHEN s BETWEEN 5 AND 12 THEN 14
                                   ELSE 13 END)
                 THEN 2 ELSE 0 END AS a0
             FROM base),
      pr AS (SELECT source, a0 AS score_a,
               CASE WHEN r = 24 THEN a0 ELSE 1 END AS score_b FROM sc),
      r2 AS (SELECT source, score_a > score_b AS w FROM pr
             WHERE score_a <> score_b),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT)
                 AS wins,
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
                 AS losses
             FROM r2 GROUP BY 1),
      v AS (SELECT *, greatest(wins, losses) AS kmax FROM st),
      pv AS (SELECT source, n, wins, losses,
               CASE WHEN n > 0 THEN round(least(1.0, 2.0 *
                 list_reduce(list_transform(range(kmax, n + 1),
                   i -> pow(0.5, CAST(n AS DOUBLE)) * list_reduce(
                          list_transform(range(1, i + 1),
                            j -> (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)
                                  + CAST(j AS DOUBLE))
                                 / CAST(j AS DOUBLE)),
                          (a, b) -> a * b)),
                   (a, b) -> a + b)), 6) ELSE 0.0 END AS p_two
             FROM v),
      q AS (SELECT *, CAST(floor(p_two * 1000000000 + 0.5) AS BIGINT)
              AS pq FROM pv),
      wn AS (SELECT *, CAST(row_number() OVER (ORDER BY pq, source)
               AS BIGINT) AS rnk,
               CAST(COUNT(*) OVER () AS BIGINT) AS m FROM q),
      acc AS (SELECT *, CASE WHEN pq * m * 100 <= 10 * rnk * 1000000000
                THEN rnk ELSE 0 END AS a FROM wn),
      kk AS (SELECT MAX(a) AS k FROM acc)
      SELECT source, n, wins, losses, p_two, rnk AS rank, m, k,
             rnk <= k AS reject
      FROM acc, kk ORDER BY source"""

  /** [[qE0Sql]]'s subspace-partitioned sibling: the exact per-subspace
    * Lloyd chain for qE4 — subspace `s` rides every CTE as a
    * partition column, so ONE chain replays all m codebooks. */
  private def qE4Sql: String = {
    def assignSql(prev: Int, cur: Int): String = s"""
      d$cur AS (SELECT b.vec_id, b.s, b.sv, c.cell,
             list_sum(list_transform(range(1, 5),
               i -> (b.sv[i] - c.cv[i]) * (b.sv[i] - c.cv[i]))) AS dist
           FROM sub b JOIN c$prev c ON c.s = b.s),
      a$cur AS (SELECT vec_id, s, sv, cell FROM
             (SELECT vec_id, s, sv, cell, row_number() OVER
                (PARTITION BY vec_id, s ORDER BY dist, cell) AS rn
              FROM d$cur) WHERE rn = 1)"""
    def meanSql(cur: Int): String = s"""
      s$cur AS (SELECT s, cell, i, SUM(sv[i]) AS t, COUNT(*) AS n
           FROM a$cur, range(1, 5) r(i) GROUP BY 1, 2, 3),
      c$cur AS (SELECT c${cur - 1}.s, c${cur - 1}.cell,
                  COALESCE(nc.cv, c${cur - 1}.cv) AS cv
           FROM c${cur - 1} LEFT JOIN
             (SELECT s, cell, list(CAST(t // n AS BIGINT) ORDER BY i)
                AS cv
              FROM s$cur GROUP BY 1, 2) nc USING (s, cell))"""
    s"""
      WITH q AS MATERIALIZED (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS fv,
               list_transform(embedding, x ->
                 CAST(floor(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT))
                 AS qv
        FROM embeddings WHERE embedding IS NOT NULL),
      sub AS MATERIALIZED (
        SELECT vec_id, s, list_slice(qv, s * 4 + 1, s * 4 + 4) AS sv
        FROM q, range(0, 16) t(s)),
      c0 AS (SELECT s, cell, sv AS cv FROM (
              SELECT s, sv, row_number() OVER
                (PARTITION BY s ORDER BY vec_id) - 1 AS cell
              FROM sub) WHERE cell < 16),
      ${assignSql(0, 1)},${meanSql(1)},
      ${assignSql(1, 2)},${meanSql(2)},
      ${assignSql(2, 3)},
      q0 AS (SELECT qv AS q0v, fv AS q0f FROM q WHERE vec_id = 0),
      q0s AS (SELECT s, list_slice(q0v, s * 4 + 1, s * 4 + 4) AS qsv
              FROM q0, range(0, 16) t(s)),
      dt AS (SELECT c.s, c.cell,
               list_sum(list_transform(range(1, 5),
                 i -> (q0s.qsv[i] - c.cv[i]) * (q0s.qsv[i] - c.cv[i])))
                 AS dist
             FROM c2 c JOIN q0s ON q0s.s = c.s),
      ad AS (SELECT a3.vec_id, CAST(SUM(dt.dist) AS BIGINT)
               AS approx_dist
             FROM a3 JOIN dt ON dt.s = a3.s AND dt.cell = a3.cell
             WHERE a3.vec_id <> 0 GROUP BY 1),
      sl AS (SELECT vec_id, approx_dist FROM ad
             ORDER BY approx_dist, vec_id LIMIT 50)
      SELECT sl.vec_id, sl.approx_dist,
             round(list_cosine_similarity(q.fv, q0.q0f), 4) + 0 AS cos_sim
      FROM sl JOIN q USING (vec_id), q0
      ORDER BY cos_sim DESC, vec_id LIMIT 10"""
  }

  private def qE5Sql: String = """
      WITH base AS (SELECT source AS g, doc_id AS i,
              CAST(doc_id % 7 + CASE WHEN ((doc_id // 20) % 25) >= 12
                THEN 5 ELSE 0 END AS BIGINT) AS x
            FROM documents),
      o AS (SELECT g, i,
              CAST(SUM(x) OVER (PARTITION BY g ORDER BY i
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS c,
              CAST(row_number() OVER (PARTITION BY g ORDER BY i)
                AS BIGINT) AS k,
              CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
              CAST(SUM(x) OVER (PARTITION BY g) AS BIGINT) AS s
            FROM base),
      gk AS (SELECT *, abs(n * c - k * s) AS gval FROM o WHERE k < n),
      best AS (SELECT * FROM (SELECT g, i, k, c, gval,
                 row_number() OVER (PARTITION BY g
                   ORDER BY gval DESC, k) AS rn FROM gk)
               WHERE rn = 1),
      st AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sall FROM base GROUP BY 1)
      SELECT st.g AS source, st.n,
             CASE WHEN st.n >= 2 THEN best.i END AS split_seq,
             CASE WHEN st.n >= 2 THEN best.k END AS split_pos,
             CASE WHEN st.n >= 2 THEN CAST(best.gval AS BIGINT) END
               AS g_stat,
             COALESCE(CASE WHEN st.n >= 2 THEN
               round(CAST(best.c AS DOUBLE) / CAST(best.k AS DOUBLE), 6)
                 + 0 END, 0.0) AS mean_before,
             COALESCE(CASE WHEN st.n >= 2 THEN
               round(CAST(st.sall - best.c AS DOUBLE)
                 / CAST(st.n - best.k AS DOUBLE), 6) + 0 END, 0.0)
               AS mean_after,
             st.n >= 2 AS defined
      FROM st LEFT JOIN best ON st.g = best.g ORDER BY source"""

  private def qE6Sql: String = """
      WITH e AS (SELECT user_id AS u, event_type AS t, ts FROM events
                 WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                   AND ts IS NOT NULL),
      s1 AS (SELECT u, MIN(ts) AS t1 FROM e WHERE t = 'view' GROUP BY 1),
      s2 AS (SELECT s1.u, s1.t1,
               MIN(CASE WHEN e2.ts > s1.t1 THEN e2.ts END) AS t2
             FROM s1 LEFT JOIN e e2 ON e2.u = s1.u AND e2.t = 'click'
             GROUP BY 1, 2),
      s3 AS (SELECT s2.u, s2.t1, s2.t2,
               MIN(CASE WHEN e3.ts > s2.t2 THEN e3.ts END) AS t3
             FROM s2 LEFT JOIN e e3 ON e3.u = s2.u AND e3.t = 'purchase'
             GROUP BY 1, 2, 3),
      users AS (SELECT DISTINCT u FROM e)
      SELECT users.u AS user_id, epoch_ns(s3.t1) AS t1,
             epoch_ns(s3.t2) AS t2, epoch_ns(s3.t3) AS t3,
             CAST(CASE WHEN s3.t1 IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN s3.t2 IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS depth
      FROM users LEFT JOIN s3 ON users.u = s3.u ORDER BY user_id"""


  /** The shared trigram spine of the qE9/qEA oracles: tokenize,
    * unnest token triples, the trigram type census and every
    * lower-order KN marginal — verbatim
    * [[graft.operators.TextAnalysis.kneserNeyTrigrams]]' statistics
    * (nc23 = continuation count of (w2,w3), ncmid2/n1fmid2 the
    * mid-order denominator/type count, n1b3/ntm the unigram
    * continuation distribution). */
  private def knTriCtes(source: String): String = s"""
      tk AS (SELECT regexp_extract_all(text, '\\S+') AS t FROM $source),
      tg AS (SELECT unnest(list_transform(range(1, len(t) - 1),
               i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t) - 1),
               i -> t[i + 1])) AS w2,
             unnest(list_transform(range(1, len(t) - 1),
               i -> t[i + 2])) AS w3
             FROM tk WHERE len(t) >= 3),
      c AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS c123
            FROM tg GROUP BY 1, 2, 3),
      ctx AS (SELECT w1, w2, CAST(SUM(c123) AS BIGINT) AS c12,
                CAST(COUNT(*) AS BIGINT) AS n1f12 FROM c GROUP BY 1, 2),
      m AS (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS nc23
            FROM c GROUP BY 1, 2),
      m2 AS (SELECT w2, CAST(SUM(nc23) AS BIGINT) AS ncmid2,
               CAST(COUNT(*) AS BIGINT) AS n1fmid2 FROM m GROUP BY 1),
      m3 AS (SELECT w3, CAST(COUNT(*) AS BIGINT) AS n1b3
             FROM m GROUP BY 1),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntm FROM m)"""

  /** The shared trigram-KN probability dag of the qE9/qEA oracles —
    * the verbatim SQL mirror of TextAnalysis.pknTrigram. */
  private val PKN_TRI_SQL = """
      greatest(CAST(COALESCE(c123, 0) AS DOUBLE) - 0.75, 0.0)
          / CAST(c12 AS DOUBLE)
        + (0.75 * CAST(n1f12 AS DOUBLE) / CAST(c12 AS DOUBLE))
          * (greatest(CAST(COALESCE(nc23, 0) AS DOUBLE) - 0.75, 0.0)
                / CAST(ncmid2 AS DOUBLE)
             + (0.75 * CAST(n1fmid2 AS DOUBLE)
                 / CAST(ncmid2 AS DOUBLE))
               * (CAST(n1b3 AS DOUBLE) / CAST(ntm AS DOUBLE)))"""

  private def qE9Sql: String = s"""
      WITH ${knTriCtes("documents")},
      top AS (SELECT c.w1, c.w2, c.w3, c.c123, ctx.c12, ctx.n1f12,
                m.nc23, m2.ncmid2, m2.n1fmid2, m3.n1b3,
                nt.ntm AS n_mid_types,
                round($PKN_TRI_SQL, 6) + 0 AS p_kn
              FROM c JOIN ctx USING (w1, w2) JOIN m USING (w2, w3)
                JOIN m2 USING (w2) JOIN m3 USING (w3) CROSS JOIN nt
              ORDER BY c123 DESC, w1, w2, w3 LIMIT 50)
      SELECT * FROM top ORDER BY w1, w2, w3"""

  private def qEASql: String = s"""
      WITH ${knTriCtes("documents WHERE doc_id % 2 = 0")},
      tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt3 FROM c),
      hk AS (SELECT regexp_extract_all(text, '\\S+') AS t
             FROM documents WHERE doc_id % 2 = 1),
      hg AS (SELECT unnest(list_transform(range(1, len(t) - 1),
               i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t) - 1),
               i -> t[i + 1])) AS w2,
             unnest(list_transform(range(1, len(t) - 1),
               i -> t[i + 2])) AS w3
             FROM hk WHERE len(t) >= 3),
      ho AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS hc
             FROM hg GROUP BY 1, 2, 3),
      j AS (SELECT ho.hc, c.c123, ctx.c12, ctx.n1f12, m.nc23,
              m2.ncmid2, m2.n1fmid2, m3.n1b3, nt.ntm, tt.nt3
            FROM ho LEFT JOIN c USING (w1, w2, w3)
              LEFT JOIN ctx USING (w1, w2)
              LEFT JOIN m USING (w2, w3)
              LEFT JOIN m2 USING (w2)
              LEFT JOIN m3 USING (w3)
              CROSS JOIN nt CROSS JOIN tt),
      sc AS (SELECT hc,
              CASE WHEN c12 IS NOT NULL AND n1b3 IS NOT NULL THEN hc
                ELSE 0 END AS hcov,
              CASE WHEN c12 IS NOT NULL AND n1b3 IS NOT NULL
                THEN hc * CAST(floor(ln($PKN_TRI_SQL)
                  * 1000000000 + 0.5) AS BIGINT)
                ELSE 0 END AS num,
              nt3 FROM j),
      ag AS (SELECT MAX(nt3) AS n_train_types,
               COALESCE(CAST(SUM(hc) AS BIGINT), 0) AS n_eval,
               COALESCE(CAST(SUM(hcov) AS BIGINT), 0) AS n_covered,
               COALESCE(CAST(SUM(num) AS BIGINT), 0) AS nums FROM sc)
      SELECT COALESCE(n_train_types, 0) AS n_train_types, n_eval,
             n_covered,
             CASE WHEN n_eval > 0 THEN round(CAST(n_covered AS DOUBLE)
               / CAST(n_eval AS DOUBLE), 6) ELSE 0.0 END AS coverage,
             CASE WHEN n_covered > 0
               THEN round(-(CAST(nums AS DOUBLE) / 1000000000.0)
                 / CAST(n_covered AS DOUBLE), 6) + 0
               ELSE 0.0 END AS cross_entropy,
             CASE WHEN n_covered > 0
               THEN round(exp(-(CAST(nums AS DOUBLE) / 1000000000.0)
                 / CAST(n_covered AS DOUBLE)), 6)
               ELSE 0.0 END AS perplexity,
             n_covered > 0 AS defined
      FROM ag"""

  /** qE8's conversion window (ns) — ONE definition feeding the query
    * lambda and the oracle SQL (the qBS shared-definition rule). */
  private val QE8_SPAN_NS = 200000L * 1000000000L

  private def qE8Sql: String = s"""
      WITH e AS (SELECT user_id AS u, event_type AS t, epoch_ns(ts) AS ts
                 FROM events
                 WHERE user_id IS NOT NULL AND event_type IS NOT NULL
                   AND ts IS NOT NULL),
      s1 AS (SELECT u, MIN(ts) AS t1 FROM e WHERE t = 'view' GROUP BY 1),
      s2 AS (SELECT s1.u, s1.t1,
               MIN(CASE WHEN e2.ts > s1.t1
                     AND e2.ts <= s1.t1 + $QE8_SPAN_NS
                   THEN e2.ts END) AS t2
             FROM s1 LEFT JOIN e e2 ON e2.u = s1.u AND e2.t = 'click'
             GROUP BY 1, 2),
      s3 AS (SELECT s2.u, s2.t1, s2.t2,
               MIN(CASE WHEN e3.ts > s2.t2
                     AND e3.ts <= s2.t1 + $QE8_SPAN_NS
                   THEN e3.ts END) AS t3
             FROM s2 LEFT JOIN e e3 ON e3.u = s2.u AND e3.t = 'purchase'
             GROUP BY 1, 2, 3),
      users AS (SELECT DISTINCT u FROM e)
      SELECT users.u AS user_id, s3.t1, s3.t2, s3.t3,
             CAST(CASE WHEN s3.t1 IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN s3.t2 IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN s3.t3 IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS depth
      FROM users LEFT JOIN s3 ON users.u = s3.u ORDER BY user_id"""

  /** The qE7 oracle: the FULL [[graft.operators.Pca.eigenExact]] /
    * [[graft.operators.Pca.whitenExact]] chain in HUGEINT — centered
    * integer scatter, `// 1e12` truncating matrix rescale, `iters`
    * chained power CTEs per component at iterate scale 1e5, Hotelling
    * deflation den²·B − num·vvᵀ between components (all bounds inside
    * int128 — Pca.eigenExact's docstring carries the arithmetic), and
    * one IEEE divide + round(6) per (row, component) with the same
    * left-associated denominator ((num·D₁)·n)/(n−1) the engine uses. */
  private def qE7Sql(k: Int, iters: Int): String = {
    def power(c: Int, mat: String): String = {
      val steps = (1 to iters).map { t =>
        val prev = s"p${c}_${t - 1}"
        s"""w${c}_$t AS MATERIALIZED (SELECT b.i,
               CAST(SUM(b.b * p.p) AS HUGEINT) AS w
             FROM $mat b JOIN $prev p ON p.i = b.j GROUP BY 1),
        m${c}_$t AS (SELECT MAX(ABS(w)) AS m FROM w${c}_$t),
        p${c}_$t AS MATERIALIZED (SELECT w${c}_$t.i,
               CASE WHEN m${c}_$t.m = 0 THEN CAST(0 AS HUGEINT)
                    ELSE (w${c}_$t.w * 100000) // m${c}_$t.m END AS p
             FROM w${c}_$t CROSS JOIN m${c}_$t)"""
      }.mkString(",\n        ")
      s"""p${c}_0 AS (SELECT range AS i, CAST(100000 AS HUGEINT) AS p
             FROM range(0, 64)),
        $steps,
        pk$c AS (SELECT p FROM p${c}_$iters
                 ORDER BY ABS(p) DESC, i ASC LIMIT 1),
        f$c AS MATERIALIZED (SELECT i,
               CASE WHEN (SELECT p FROM pk$c) < 0 THEN -p ELSE p END AS p
             FROM p${c}_$iters),
        r$c AS (SELECT
               (SELECT CAST(SUM(a.p * b.b * c.p) AS HUGEINT)
                FROM b1 b JOIN f$c a ON a.i = b.i
                  JOIN f$c c ON c.i = b.j) AS num,
               (SELECT CAST(SUM(a.p * b.b * c.p) AS HUGEINT)
                FROM $mat b JOIN f$c a ON a.i = b.i
                  JOIN f$c c ON c.i = b.j) AS numb,
               (SELECT CAST(SUM(p * p) AS HUGEINT) FROM f$c) AS den),
        fl$c AS (SELECT list(p ORDER BY i) AS v FROM f$c)"""
    }
    def deflate(c: Int, mat: String): String = s"""
        mm${c + 1} AS MATERIALIZED (SELECT b.i, b.j,
               r$c.den * r$c.den * b.b - r$c.numb * a.p * c.p AS a
             FROM $mat b JOIN f$c a ON a.i = b.i
               JOIN f$c c ON c.i = b.j CROSS JOIN r$c),
        d${c + 1} AS (SELECT greatest(CAST(1 AS HUGEINT),
               (SELECT MAX(ABS(a)) FROM mm${c + 1}) // 1000000000000)
               AS d),
        b${c + 1} AS MATERIALIZED (SELECT i, j, a // d${c + 1}.d AS b
             FROM mm${c + 1}, d${c + 1})"""
    val chain = (1 to k).map { c =>
      val mat = if (c == 1) "b1" else s"b$c"
      power(c, mat) + (if (c < k) "," + deflate(c, mat) else "")
    }.mkString(",\n        ")
    def z(c: Int): String = s"""
             CASE WHEN r$c.num <= 0 THEN 0.0
                  ELSE round(CAST(nv.n * CAST(list_sum(list_transform(
                         range(1, 65), ii -> q.qv[ii] * fl$c.v[ii]))
                         AS HUGEINT) - kc.k$c AS DOUBLE)
                       / sqrt(CAST(r$c.num AS DOUBLE)
                              * CAST(d1.d AS DOUBLE)
                              * CAST(nv.n AS DOUBLE)
                              / (CAST(nv.n AS DOUBLE) - 1.0)), 6) + 0
             END AS z$c"""
    val kcs = (1 to k).map(c =>
      s"""(SELECT CAST(SUM(sq.s * f$c.p) AS HUGEINT)
          FROM sq JOIN f$c ON f$c.i = sq.i) AS k$c""").mkString(",\n        ")
    val joins = (1 to k).map(c => s"CROSS JOIN r$c CROSS JOIN fl$c")
      .mkString(" ")
    s"""
      WITH q AS MATERIALIZED (
        SELECT vec_id, list_transform(CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
        FROM embeddings WHERE embedding IS NOT NULL),
      nv AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM q),
      sq AS MATERIALIZED (SELECT t1.range AS i,
             CAST(SUM(qv[CAST(t1.range AS INT) + 1]) AS HUGEINT) AS s
           FROM q, range(0, 64) t1 GROUP BY 1),
      gg AS MATERIALIZED (SELECT t1.range AS i, t2.range AS j,
             CAST(SUM(qv[CAST(t1.range AS INT) + 1]
                    * qv[CAST(t2.range AS INT) + 1]) AS HUGEINT) AS g
           FROM q, range(0, 64) t1, range(0, 64) t2 GROUP BY 1, 2),
      am AS MATERIALIZED (SELECT gg.i, gg.j,
             nv.n * gg.g - si.s * sj.s AS a
           FROM gg JOIN sq si ON si.i = gg.i
             JOIN sq sj ON sj.i = gg.j CROSS JOIN nv),
      d1 AS (SELECT greatest(CAST(1 AS HUGEINT),
             (SELECT MAX(ABS(a)) FROM am) // 1000000000000) AS d),
      b1 AS MATERIALIZED (SELECT i, j, a // d1.d AS b FROM am, d1),
      $chain,
      kc AS (SELECT
        $kcs)
      SELECT q.vec_id,${(1 to k).map(z).mkString(",")}
      FROM q CROSS JOIN nv CROSS JOIN d1 CROSS JOIN kc $joins
      ORDER BY vec_id"""
  }

  /** The shared word-trigram → HLL-register CTE spine (tk/tok/hx/jr/
    * rr/reg), mirrored from [[graft.operators.Sketches.drawFrame]] —
    * ONE definition feeding the qEB and qED oracles (the knTriCtes /
    * exactLloydCtes convention: a drift between twin oracles would
    * only surface as an opaque hash mismatch). The `source IS NOT
    * NULL` filter replays hllExact's null-group drop. */
  private def hllRegisterCtes(p: Int, salt: String,
                              srcFilter: String): String = {
    val hexChars = p / 4
    s"""tk AS (SELECT source AS g,
             regexp_extract_all(text, '\\S+') AS ts
           FROM documents
           WHERE text IS NOT NULL AND source IS NOT NULL$srcFilter),
      tok AS (SELECT g, unnest(list_transform(
               range(1, len(ts) - 1),
               i -> ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2])) AS v
             FROM tk),
      hx AS (SELECT g, md5(v || ' $salt') AS h
             FROM tok WHERE v IS NOT NULL),
      jr AS (SELECT g,
               CAST(list_reduce(list_transform(
                 regexp_extract_all(substring(h, 1, $hexChars), '.'),
                 c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
                 (a, b) -> a * 16 + b) AS BIGINT) AS j,
               ltrim(substring(h, ${hexChars + 1}, 10), '0') AS st
             FROM hx),
      rr AS (SELECT g, j, CASE WHEN st = '' THEN 41
               ELSE 4 * (10 - length(st)) +
                 CASE WHEN instr('0123456789abcdef',
                        substring(st, 1, 1)) - 1 >= 8 THEN 0
                      WHEN instr('0123456789abcdef',
                        substring(st, 1, 1)) - 1 >= 4 THEN 1
                      WHEN instr('0123456789abcdef',
                        substring(st, 1, 1)) - 1 >= 2 THEN 2
                      ELSE 3 END + 1 END AS rho
             FROM jr),
      reg AS (SELECT g, j, MAX(rho) AS mj FROM rr GROUP BY 1, 2)"""
  }

  /** The qEB oracle: the FULL [[graft.operators.Sketches.hllExact]]
    * draw + estimate chain — the identical md5 hex slices (register
    * index from the first p/4 chars, the string-wise leading-zero ρ
    * from the next 10), exact-long register maxima and harmonic
    * numerator S41, the same α·m²·2⁴¹ double literal divided once,
    * and the 1e-9-grid-quantized linear-counting branch. */
  private def qEBSql(p: Int, salt: String): String = {
    val m = 1 << p
    val a2 = graft.operators.Sketches.alphaM2(m).toString
    val two41 = 2199023255552L
    s"""
      WITH ${hllRegisterCtes(p, salt, "")},
      ag AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_hit,
               CAST(SUM(1::BIGINT << (41 - mj)) AS BIGINT) AS sp
             FROM reg GROUP BY 1),
      fin AS (SELECT g, n_hit, $m - n_hit AS v_empty,
               sp + ($m - n_hit) * $two41 AS s41,
               $a2 / CAST(sp + ($m - n_hit) * $two41 AS DOUBLE) AS er
             FROM ag)
      SELECT g AS source, CAST($m AS BIGINT) AS m_registers, n_hit,
             CAST(v_empty AS BIGINT) AS v_empty,
             CAST(s41 AS BIGINT) AS s41,
             round(er, 6) + 0 AS est_raw,
             round(CASE WHEN er <= ${2.5 * m} AND v_empty > 0
               THEN CAST($m * CAST(floor(ln(CAST($m AS DOUBLE)
                      / CAST(v_empty AS DOUBLE)) * 1000000000 + 0.5)
                    AS BIGINT) AS DOUBLE) / 1000000000.0
               ELSE er END, 6) + 0 AS estimate,
             (er <= ${2.5 * m} AND v_empty > 0) AS small_range
      FROM fin ORDER BY source"""
  }

  /** The qEC oracle: the FULL [[graft.operators.Sketches
    * .hdrQuantiles]] chain — the identical bin()-derived log buckets
    * (bin() emits the same minimal binary string in both engines,
    * probed), integer cumulative walk, ⌈n·p/1000⌉ integer rank, and
    * min-representative answer. No float anywhere on either side. */
  private def qECSql(permilles: Seq[Int], k: Int): String = {
    val m = 1 << k
    val plist = permilles.mkString(", ")
    s"""
      WITH v AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS v
           FROM documents
           WHERE source IS NOT NULL AND n_chars IS NOT NULL),
      b AS (SELECT g, CASE WHEN v < $m THEN v
               ELSE (length(bin(v)) - $k) * $m + (v >> (length(bin(v))
                 - 1 - $k)) - $m END AS id
             FROM v),
      c AS (SELECT g, id, CAST(COUNT(*) AS BIGINT) AS cnt
             FROM b GROUP BY 1, 2),
      w AS (SELECT g, id, cnt,
               SUM(cnt) OVER (PARTITION BY g ORDER BY id) AS cum,
               SUM(cnt) OVER (PARTITION BY g) AS n FROM c),
      p AS (SELECT unnest([$plist]) AS p),
      r AS (SELECT w.g, w.id, w.cum, w.n, p.p,
               (w.n * p.p + 999) // 1000 AS rk FROM w, p)
      SELECT g AS source, CAST(p AS INT) AS permille,
             CAST(MAX(n) AS BIGINT) AS n,
             CAST(MIN(CASE WHEN id < $m THEN id
               ELSE ($m + (id % $m)) << (CAST(id // $m AS INT) - 1)
               END) AS BIGINT) AS est
      FROM r WHERE cum >= rk GROUP BY 1, 2
      ORDER BY source, permille"""
  }

  /** The qED oracle: [[graft.operators.Sketches.hllOverlap]] replayed
    * end-to-end — the qEB register CTEs at p = 16, per-source and
    * register-max union sketches through the IDENTICAL estimate CASE,
    * then inclusion–exclusion and the clamped Jaccard ratio. */
  private def qEDSql(p: Int, salt: String): String = {
    val m = 1 << p
    val a2 = graft.operators.Sketches.alphaM2(m).toString
    val two41 = 2199023255552L
    def est(nh: String, sp: String): String = {
      val er = s"$a2 / CAST($sp + ($m - $nh) * $two41 AS DOUBLE)"
      s"""round(CASE WHEN $er <= ${2.5 * m} AND $m - $nh > 0
           THEN CAST($m * CAST(floor(ln(CAST($m AS DOUBLE)
                  / CAST($m - $nh AS DOUBLE)) * 1000000000 + 0.5)
                AS BIGINT) AS DOUBLE) / 1000000000.0
           ELSE $er END, 6) + 0"""
    }
    s"""
      WITH ${hllRegisterCtes(p, salt,
        " AND source IN ('src0', 'src1', 'src2', 'src3')")},
      per AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nh,
               CAST(SUM(1::BIGINT << (41 - mj)) AS BIGINT) AS sp
             FROM reg GROUP BY 1),
      pere AS (SELECT g, ${est("nh", "sp")} AS e FROM per),
      gs AS (SELECT DISTINCT g FROM reg),
      pairs AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b
                WHERE a.g < b.g),
      ur AS (SELECT ga, gb, j, MAX(mj) AS mj FROM (
               SELECT p.ga, p.gb, r.j, r.mj
               FROM pairs p JOIN reg r ON r.g = p.ga
               UNION ALL
               SELECT p.ga, p.gb, r.j, r.mj
               FROM pairs p JOIN reg r ON r.g = p.gb)
             GROUP BY 1, 2, 3),
      ua AS (SELECT ga, gb, CAST(COUNT(*) AS BIGINT) AS nh,
               CAST(SUM(1::BIGINT << (41 - mj)) AS BIGINT) AS sp
             FROM ur GROUP BY 1, 2),
      ue AS (SELECT ga, gb, ${est("nh", "sp")} AS eu FROM ua)
      SELECT ga AS source_a, gb AS source_b,
             ea.e AS est_a, eb.e AS est_b, eu AS est_union,
             round(ea.e + eb.e - eu, 6) + 0 AS est_intersect,
             round(greatest(ea.e + eb.e - eu, 0.0) / eu, 6) + 0
               AS jaccard_est
      FROM ue JOIN pere ea ON ea.g = ue.ga
        JOIN pere eb ON eb.g = ue.gb
      ORDER BY source_a, source_b"""
  }

  val oracleSql: Map[String, String] = Map(
    "qE3_significance_capstone" -> qE3Sql,
    "qE4_pq_search_exact" -> qE4Sql,
    "qE5_changepoint" -> qE5Sql,
    "qE6_event_funnel" -> qE6Sql,
    "qE0_ivf_search_exact" -> qE0Sql,
    "qE1_knn_join_exact" -> qE1Sql,
    "qE2_semantic_dedup_exact" -> qE2Sql,
    "qE7_pca_whiten_exact" -> qE7Sql(k = 4, iters = 12),
    "qE8_windowed_funnel" -> qE8Sql,
    "qE9_kn_trigram" -> qE9Sql,
    "qEA_kn_trigram_ce" -> qEASql,
    "qEB_hll_exact" -> qEBSql(p = 12, salt = "s0"),
    "qEC_hdr_quantiles" -> qECSql(Seq(500, 900, 990, 999), k = 5),
    "qED_hll_overlap" -> qEDSql(p = 16, salt = "s0")
  ).map { case (k, v) => k -> v.trim.replaceAll("\\s+", " ") }
}
