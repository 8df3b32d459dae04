package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Preference-pair (DPO/RLHF) data preparation — the pairwise twin of
 * the SFT block ([[TextAnalysis.chatTurns]]/`sftMaskStats`): reward-
 * model and DPO training want, per prompt, one (chosen, rejected)
 * response pair, guarded against degenerate pairs (near-identical
 * responses teach nothing and leak label noise) and audited for the
 * classic LENGTH BIAS (if chosen is systematically longer, the model
 * learns verbosity, not preference). The reference engine has no
 * preference operators (gigapi-querier's surface is SQL passthrough,
 * `querier/query.go:1`); this family exists for the training-data
 * pipeline bar.
 *
 * Selection contract (total, engine-independent): chosen = the
 * response with the HIGHEST score, ties to the LOWEST response id;
 * rejected = the LOWEST score, ties to the HIGHEST id — so a
 * two-response prompt with equal scores still yields a well-defined
 * (min-id, max-id) pair. Both legs resolve in ONE groupBy via
 * `max_by`/`min_by` over a (score, ∓id) struct key — the packed-key
 * argmax convention (qAS) — carrying (id, text) through the
 * aggregation so the corpus shuffles exactly once; every later step
 * is per-pair row arithmetic.
 *
 * Null scores are excluded from the pool (and from n_resp) — a null
 * inside the selection key would make the argmax engine-dependent. A
 * float NaN score, by Spark's ordering, sorts LARGEST and would be
 * chosen — filter NaN scores upstream if the score column can carry
 * them (the operator cannot: isnan is undefined on integral types).
 *
 * Near-dup guard: exact token-set Jaccard between chosen and
 * rejected, |∩| and |∪| = |A|+|B|−|∩| as exact integers and ONE
 * float division (the round-14 float-contract rule); two empty
 * responses are identical by convention (jaccard 1). keep = at least
 * 2 responses AND distinct legs AND jaccard < `maxJaccard`.
 *
 * @return (promptCol, chosen_id, rejected_id, n_resp, chosen_tokens,
 *         rejected_tokens, delta_tokens, jaccard rounded 4, keep)
 *         + `carry` columns taken from the CHOSEN row.
 */
object Preference {

  def preferencePairs(resp: DataFrame, promptCol: String, respIdCol: String,
                      textCol: String, scoreCol: String,
                      maxJaccard: Double = 0.9,
                      carry: Seq[String] = Nil): DataFrame = {
    require(maxJaccard > 0.0 && maxJaccard <= 1.0,
      s"maxJaccard must be in (0, 1], got $maxJaccard")
    require(org.apache.spark.sql.graftbridge.ColumnBridge
        .isIntegral(resp.schema(respIdCol).dataType),
      s"preferencePairs: $respIdCol must be integral (got " +
        s"${resp.schema(respIdCol).dataType.simpleString}) — the ∓id " +
        "tie-break needs exact negation")
    val id = col(respIdCol).cast("long")
    val payload = struct((col(respIdCol).cast("long").as("id") +:
      col(textCol).as("text") +: carry.map(col)): _*)
    val pairs = resp
      // an UNSCORED response can be neither chosen nor rejected, and a
      // null inside the max_by struct key would make the selection
      // engine-dependent — exclude it from the pool (and from n_resp)
      .filter(col(promptCol).isNotNull && col(respIdCol).isNotNull &&
        col(scoreCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(count(lit(1)).as("n_resp"),
        max_by(payload, struct(col(scoreCol), (-id).as("nid"))).as("__c"),
        min_by(payload, struct(col(scoreCol), (-id).as("nid"))).as("__r"))
    val ca = array_distinct(TextAnalysis.tokens(col("__c.text")))
    val ra = array_distinct(TextAnalysis.tokens(col("__r.text")))
    val inter = size(array_intersect(ca, ra)).cast("long")
    val uni = (size(ca) + size(ra)).cast("long") - inter
    // ONE exact-integer division; |∪| = 0 (two token-less responses)
    // reads as identical, not as a kept pair
    val jac = when(uni > 0, inter.cast("double") / uni.cast("double"))
      .otherwise(lit(1.0))
    pairs.select((col(promptCol) +: col("n_resp") +:
      col("__c.id").as("chosen_id") +: col("__r.id").as("rejected_id") +:
      TextAnalysis.tokenCount(col("__c.text")).cast("long")
        .as("chosen_tokens") +:
      TextAnalysis.tokenCount(col("__r.text")).cast("long")
        .as("rejected_tokens") +:
      round(jac, 4).as("jaccard") +:
      carry.map(c => col(s"__c.$c").as(c)): _*))
      .select((col(promptCol) +: col("n_resp") +: col("chosen_id") +:
        col("rejected_id") +: col("chosen_tokens") +: col("rejected_tokens") +:
        (col("chosen_tokens") - col("rejected_tokens")).as("delta_tokens") +:
        col("jaccard") +:
        (col("n_resp") >= 2 && col("chosen_id") =!= col("rejected_id") &&
          col("jaccard") < lit(maxJaccard)).as("keep") +:
        carry.map(col)): _*)
  }

  /**
   * Length-bias audit over [[preferencePairs]] output: per group
   * (source/template/model), how much longer the chosen response
   * runs. A strongly positive mean Δtokens or a chosen-longer
   * fraction far from 0.5 flags verbosity bias before it trains in
   * (Singhal et al. 2023, "A Long Way to Go: Investigating Length
   * Correlations in RLHF"). Only KEPT pairs count — dropped pairs
   * never reach the trainer. Exact integer sums divided once (the
   * float-contract rule); one metadata-sized aggregate.
   *
   * @return (byCol, n_pairs, sum_delta, avg_delta rounded 6,
   *         frac_chosen_longer rounded 6)
   */
  def lengthBias(pairs: DataFrame, byCol: String): DataFrame =
    pairs.filter(col("keep"))
      .groupBy(col(byCol))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("delta_tokens")).cast("long").as("sum_delta"),
        sum(when(col("delta_tokens") > 0, 1L).otherwise(0L))
          .cast("long").as("__longer"))
      .select(col(byCol), col("n_pairs"), col("sum_delta"),
        // GateRound: sum_delta can be a tiny negative whose rounded
        // zero must not keep DuckDB's sign bit (the qBQ class)
        graft.functions.GateRound(col("sum_delta").cast("double") /
          col("n_pairs").cast("double"), 6).as("avg_delta"),
        round(col("__longer").cast("double") /
          col("n_pairs").cast("double"), 6).as("frac_chosen_longer"))
}
