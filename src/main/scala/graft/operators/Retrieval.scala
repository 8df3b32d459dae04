package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Retrieval-evaluation metrics — the audit loop for the retriever
 * feeding a RAG training pipeline (or the ANN family in
 * [[Similarity]]): given a ranked run and graded relevance
 * judgments, score every query with recall@k, reciprocal rank, and
 * nDCG@k (Järvelin & Kekäläinen 2002). A corpus-scale retriever is
 * only as good as this table says it is, so the metrics must be
 * exact and cheap at eval scale.
 *
 * Cite: reference `querier/` has no retrieval surface — this family
 * exists for the training-data pipeline mandate.
 */
object Retrieval {

  /**
   * Per-query ranking metrics over a ranked run and graded qrels.
   *
   * Exact contract: counts are exact integers; recall and RR are ONE
   * division each. DCG's float sum is the cross-entity axis (the
   * qCC/qCE discipline): each term gain/log2(rank+1) is one IEEE
   * division of exact integers over a deterministic log2 (the
   * suite's established cross-engine log family), quantized to a
   * 1e-9 long — so per-query DCG and ideal DCG are exact integer
   * sums in any partition order, and nDCG is ONE division of two
   * exact longs. Ranks must be integral ≥ 1 and gains integral ≥ 0 —
   * both ENFORCED in the plan via raise_error; a duplicate rank
   * within a query is refused too (it would silently double-count a
   * position).
   *
   * Coverage contract: judged-but-unretrieved queries emit zeros
   * visibly; retrieved-but-unjudged queries emit with n_judged = 0
   * and defined = false (the empty-bin convention — silence hides
   * eval holes).
   *
   * Scale shape: the run prunes to rank ≤ k before anything joins;
   * one (query, doc) equi-join against qrels; two per-query
   * aggregates (run side, qrels side) full-outer-joined at |queries|
   * rows. The ideal-DCG side collects each query's judged gains into
   * one sorted array — judgment sets are eval-sized and the
   * `maxJudged` guard refuses a query whose qrels would not fit a
   * task (the fan-out convention).
   *
   * @return (queryCol, n_judged, n_retrieved, n_rel_at_k,
   *         recall_at_k, rr, dcg_at_k, idcg_at_k, ndcg_at_k,
   *         ap_at_k rounded 6 — AP uses the TREC denominator (all
   *         judged-positive docs), defined, k)
   */
  def rankingMetrics(run: DataFrame, qrels: DataFrame, queryCol: String,
                     docCol: String, rankCol: String, gainCol: String,
                     k: Int, maxJudged: Int = 65536): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(maxJudged > 0, s"maxJudged must be positive, got $maxJudged")
    require(org.apache.spark.sql.graftbridge.ColumnBridge
        .isIntegral(run.schema(rankCol).dataType),
      s"rankingMetrics: $rankCol must be integral (got " +
        s"${run.schema(rankCol).dataType.simpleString})")
    require(org.apache.spark.sql.graftbridge.ColumnBridge
        .isIntegral(qrels.schema(gainCol).dataType),
      s"rankingMetrics: $gainCol must be integral (got " +
        s"${qrels.schema(gainCol).dataType.simpleString}) — graded " +
        "relevance quantizes upstream")
    // per-term quantized discount: one IEEE division of exact
    // integers, then the 1e-9 grid — sums become order-free longs
    def dcgTerm(gain: Column, pos: Column): Column =
      floor(gain.cast("double") /
        log2((pos + 1).cast("double")) * lit(1e9) + lit(0.5))
    val rankG = {
      val r = col(rankCol).cast("long")
      when(r >= 1L, r).otherwise(raise_error(concat(
        lit("rankingMetrics: rank must be >= 1, got "),
        coalesce(r.cast("string"), lit("null")))))
    }
    val gainG = {
      val g = col(gainCol).cast("long")
      when(g >= 0L, g).otherwise(raise_error(concat(
        lit("rankingMetrics: gain must be >= 0, got "),
        coalesce(g.cast("string"), lit("null")))))
    }
    val topk = run
      .filter(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(rankCol).isNotNull)
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        rankG.as("__r"))
      .filter(col("__r") <= k)
    val judged = qrels
      .filter(col(queryCol).isNotNull && col(docCol).isNotNull &&
        col(gainCol).isNotNull)
      .select(col(queryCol).as("__q"), col(docCol).as("__d"),
        gainG.as("__g"))
    val runSide = topk
      .join(judged.select(col("__q"), col("__d"), col("__g")),
        Seq("__q", "__d"), "left")
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("n_retrieved"),
        countDistinct(col("__r")).as("__nr_distinct"),
        sum(when(coalesce(col("__g"), lit(0L)) > 0L, 1L).otherwise(0L))
          .as("n_rel_at_k"),
        min(when(coalesce(col("__g"), lit(0L)) > 0L, col("__r")))
          .as("__first_rel"),
        sum(when(coalesce(col("__g"), lit(0L)) > 0L,
          dcgTerm(col("__g"), col("__r"))).otherwise(0L)).as("__dcg_fp"),
        // ranks of the relevant hits, ascending (collect_list skips
        // the nulls of non-relevant rows) — AP's precision points
        sort_array(collect_list(
          when(coalesce(col("__g"), lit(0L)) > 0L, col("__r"))))
          .as("__rel_ranks"))
      // duplicate ranks inside a query would double-count a position
      .select(col("__q"),
        when(col("__nr_distinct") === col("n_retrieved"),
          col("n_retrieved"))
          .otherwise(raise_error(concat(
            lit("rankingMetrics: query "), col("__q").cast("string"),
            lit(" repeats a rank position in its run — a run is one " +
              "doc per rank")))).as("n_retrieved"),
        col("n_rel_at_k"), col("__first_rel"), col("__dcg_fp"),
        // AP@k numerator: the j-th relevant hit at rank r_j
        // contributes precision j/r_j — each term one IEEE division
        // of exact integers, quantized (the DCG discipline). The
        // no-hit branch short-circuits before sequence(1, 0) would
        // DESCEND (the Spark sequence gotcha).
        when(size(col("__rel_ranks")) === 0, lit(0L))
          .otherwise(aggregate(
            sequence(lit(1), size(col("__rel_ranks"))), lit(0L),
            (acc, j) => acc + floor(j.cast("double") /
              element_at(col("__rel_ranks"), j).cast("double") *
              lit(1e9) + lit(0.5)))).as("__ap_fp"))
    val goldSide = judged
      .groupBy(col("__q"))
      .agg(count(lit(1)).as("__n_judged"),
        sum(when(col("__g") > 0L, 1L).otherwise(0L)).as("__n_gold_pos"),
        sort_array(collect_list(col("__g")), asc = false).as("__gs"))
      .select(col("__q"),
        when(col("__n_judged") <= maxJudged, col("__n_judged"))
          .otherwise(raise_error(concat(
            lit("rankingMetrics: query "), col("__q").cast("string"),
            lit(" has "), col("__n_judged").cast("string"),
            lit(s" judgments (maxJudged=$maxJudged) - the ideal-DCG " +
              "sort is per-task; shard or dedup the qrels"))))
          .as("n_judged"),
        col("__n_gold_pos").as("__gold_pos"),
        // ideal DCG: the top-k judged gains in descending order,
        // each term quantized — a long fold, exact in any order
        aggregate(
          sequence(lit(1), least(size(col("__gs")), lit(k))), lit(0L),
          (acc, i) => acc +
            when(element_at(col("__gs"), i) > 0L,
              dcgTerm(element_at(col("__gs"), i), i)).otherwise(0L))
          .as("__idcg_fp"))
    val joined = goldSide.join(runSide, Seq("__q"), "full_outer")
    val dcgFp = coalesce(col("__dcg_fp"), lit(0L))
    val idcgFp = coalesce(col("__idcg_fp"), lit(0L))
    val goldPos = coalesce(col("__gold_pos"), lit(0L))
    val defined = goldPos > 0L && idcgFp > 0L
    joined.select(col("__q").as(queryCol),
      coalesce(col("n_judged"), lit(0L)).as("n_judged"),
      coalesce(col("n_retrieved"), lit(0L)).as("n_retrieved"),
      coalesce(col("n_rel_at_k"), lit(0L)).as("n_rel_at_k"),
      when(goldPos > 0L,
        round(coalesce(col("n_rel_at_k"), lit(0L)).cast("double") /
          goldPos.cast("double"), 6)).otherwise(lit(0.0))
        .as("recall_at_k"),
      when(col("__first_rel").isNotNull,
        round(lit(1.0) / col("__first_rel").cast("double"), 6))
        .otherwise(lit(0.0)).as("rr"),
      round(dcgFp.cast("double") / lit(1e9), 6).as("dcg_at_k"),
      round(idcgFp.cast("double") / lit(1e9), 6).as("idcg_at_k"),
      when(defined,
        round(dcgFp.cast("double") / idcgFp.cast("double"), 6))
        .otherwise(lit(0.0)).as("ndcg_at_k"),
      // AP@k with the TREC denominator (ALL judged-positive docs,
      // not min(R, k) — a truncated run pays for what it missed)
      when(goldPos > 0L,
        round(coalesce(col("__ap_fp"), lit(0L)).cast("double") /
          (goldPos * 1000000000L).cast("double"), 6))
        .otherwise(lit(0.0)).as("ap_at_k"),
      defined.as("defined"), lit(k).as("k"))
  }

  /**
   * Ranking overlap@k between two scorers per group — the cheapest
   * honest answer to "did the reranker / new embedding model change
   * the HEAD" (full rank correlations weight the tail; retrieval
   * consumers only ever see the top k): the two top-k sets' exact
   * intersection over a TOTAL tie order (score DESC, id ASC — the
   * [[graft.operators.TextAnalysis]] ranking convention), so both
   * engines cut identical sets. Both scores must be integral.
   *
   * Exact contract: membership flags come from row_number over the
   * total order, the intersection count is an exact long, and the
   * overlap fraction is ONE division by min(k, n) (a group smaller
   * than k compares its whole order — fraction 1 means "heads
   * identical", never "group too small"). Groups of any size stay
   * visible.
   *
   * Scale shape: one exchange on the group key + two in-partition
   * sorts (the two rank windows share the exchange), one
   * partial/final aggregate. No joins.
   *
   * @return (byCol, n, k, n_top, overlap, overlap_frac rounded 6)
   */
  def overlapAtK(df: DataFrame, byCol: String, idCol: String,
                 scoreACol: String, scoreBCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    Seq(idCol, scoreACol, scoreBCol).foreach { c =>
      require(org.apache.spark.sql.graftbridge.ColumnBridge
          .isIntegral(df.schema(c).dataType),
        s"overlapAtK: $c must be integral (got " +
          s"${df.schema(c).dataType.simpleString}) — the total tie " +
          "order needs exact comparisons")
    }
    val clean = df.filter(col(byCol).isNotNull && col(idCol).isNotNull &&
        col(scoreACol).isNotNull && col(scoreBCol).isNotNull)
      .select(col(byCol).as("__g"), col(idCol).cast("long").as("__i"),
        col(scoreACol).cast("long").as("__a"),
        col(scoreBCol).cast("long").as("__b"))
    val g = Window.partitionBy(col("__g"))
    val rnA = row_number().over(g.orderBy(col("__a").desc, col("__i")))
    val rnB = row_number().over(g.orderBy(col("__b").desc, col("__i")))
    val stats = clean.select(col("__g"),
        (rnA <= k).as("__ta"), (rnB <= k).as("__tb"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("__ta") && col("__tb"), 1L).otherwise(0L))
          .as("overlap"))
    val nTop = least(lit(k.toLong), col("n"))
    stats.select(col("__g").as(byCol), col("n"), lit(k).as("k"),
      nTop.as("n_top"), col("overlap"),
      round(col("overlap").cast("double") / nTop.cast("double"), 6)
        .as("overlap_frac"))
  }
}
