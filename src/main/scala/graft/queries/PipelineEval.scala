package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{Similarity, TextAnalysis}

/**
 * Eval/preference/statistics query family (split from Pipeline.scala,
 * round 19): chat/SFT/preference fixtures (qBT-qBZ subset), the qC*
 * eval-analytics block, and the qD* significance/statistics block.
 */
object PipelineEval {
  type Q = (SparkSession, String) => DataFrame

  private def T(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  val queries: Map[String, Q] = Map(

    // SFT chat-turn parsing: role-marked transcripts (salted onto the
    // prose corpus from doc_id arithmetic) explode into (doc, turn,
    // role, tokens) rows — the instruction-data twin of the
    // pretraining battery; RE2-safe so the whole parse replays in SQL
    "qBU_chat_turns" -> ((s, dir) => {
      TextAnalysis.chatTurns(chatFixture(T(s, dir)("documents")),
          "doc_id", "text")
        .select(col("doc_id"), col("turn_idx"), col("role"),
          TextAnalysis.tokenCount(col("turn_text")).cast("int")
            .as("turn_tokens"))
        .orderBy(col("doc_id"), col("turn_idx"))
    }),

    // SFT loss-mask accounting over the same transcripts: trainable
    // (assistant) vs masked token mass per doc and the keep decision
    "qBV_sft_mask" -> ((s, dir) => {
      TextAnalysis.sftMaskStats(chatFixture(T(s, dir)("documents")),
          "doc_id", "text", minTrainableFrac = SFT_MIN_TRAINABLE)
        .orderBy(col("doc_id"))
    }),

    // in-context pretraining layout (Shi et al. 2023): similarity-walk
    // document ordering + sequence packing along the walk. The gate
    // fixture is a closed-form instance — complete graphs over
    // div-8 id groups with EQUAL weights, where the walk contract
    // provably reduces to (min-hash component key, hash40, id) order —
    // so the oracle replays the ENTIRE layout (walk + two-phase
    // prefix sum + sequence cuts) in pure SQL; the non-degenerate
    // greedy-walk and knnJoin-composed paths are pinned in
    // ContextLayoutSpec (adjacency beats the md5 shuffle)
    "qBW_incontext_layout" -> ((s, dir) =>
      inContextFixture(s, dir).orderBy(col("ord"), col("seq_id"))),

    // packing-efficiency audit of the SAME layout: split-doc
    // fraction, sequence fill, docs-per-sequence mixing — the
    // acceptance report a layout change is judged by; one row of
    // exact integer counts + two single divisions
    "qBZ_packing_report" -> ((s, dir) =>
      graft.operators.Packing.packingReport(inContextFixture(s, dir),
        "doc_id", seqLen = 64)),

    // DPO preference-pair extraction: per prompt (div-4 id groups,
    // score = doc_id % 7 so ties exercise the ∓id tie-break), the
    // (chosen, rejected) legs via one packed-key max_by/min_by
    // aggregate, exact token-set Jaccard near-dup guard, length delta
    "qBX_preference_pairs" -> ((s, dir) => {
      graft.operators.Preference.preferencePairs(prefFixture(s, dir),
          "prompt_id", "doc_id", "text", "score", maxJaccard = PREF_MAX_JAC,
          carry = Seq("source"))
        .orderBy(col("prompt_id"))
    }),

    // best-of-n / rejection-sampling prep (RAFT): per prompt the top-3
    // responses by (score desc, id asc) via the TopKByScore bounded
    // heap — O(prompts × n) shuffle, never a per-prompt row_number
    // window — with the qBX near-dup guard applied against the rank-1
    // response; FULL oracle = row_number() replay (the qAM precedent)
    "qC0_best_of_n" -> ((s, dir) => {
      graft.operators.Preference.bestOfN(prefFixture(s, dir),
          "prompt_id", "doc_id", "text", "score", n = 3,
          maxJaccard = PREF_MAX_JAC, carry = Seq("source"))
        .orderBy(col("prompt_id"), col("rank"))
    }),

    // GRPO group-relative advantage (Shao et al. 2024): per prompt,
    // (score − μ_g)/σ_g with population σ from exact BIGINT moments —
    // the critic-free RL baseline; zero-variance groups emit 0, never
    // NaN; advantage is gateRounded (tiny-negative by construction)
    "qC1_grpo_advantage" -> ((s, dir) => {
      graft.operators.Preference.groupAdvantage(
          prefFixture(s, dir), "prompt_id", "doc_id", "score")
        .orderBy(col("prompt_id"), col("doc_id"))
    }),

    // unbiased pass@k (Chen et al. 2021 eq. 1) at k=3 over a
    // deterministic pass flag: exact (n, c) counts, the stable
    // product form in ONE fixed fold order both engines share
    "qC2_pass_at_k" -> ((s, dir) => {
      graft.operators.Preference.passAtK(
          T(s, dir)("documents")
            .select(expr("doc_id div 4").as("prompt_id"),
              (col("doc_id") % 3 === 0).as("passed")),
          "prompt_id", "passed", k = 3)
        .orderBy(col("prompt_id"))
    }),

    // self-consistency majority vote (Wang et al. 2023): modal
    // extracted answer per prompt, ties to the lexicographically
    // smallest — packed min_by on (−count, answer), no windows
    "qC3_majority_vote" -> ((s, dir) => {
      graft.operators.Preference.majorityVote(
          T(s, dir)("documents")
            .select(expr("doc_id div 4").as("prompt_id"),
              ((col("doc_id") * col("doc_id")) % 3).cast("string")
                .as("answer")),
          "prompt_id", "answer")
        .orderBy(col("prompt_id"))
    }),

    // reward-calibration audit: per-source Pearson r between score
    // and token length (the response-level confound check beside
    // qBY) — five exact BIGINT sums, per-group float in one shared
    // association order, gateRounded
    "qC4_score_length_corr" -> ((s, dir) => {
      graft.operators.Preference.scoreCorrelation(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 7).as("score"),
            TextAnalysis.tokenCount(col("text")).cast("long")
              .as("n_tokens")),
          "source", "score", "n_tokens")
        .orderBy(col("source"))
    }),

    // arena-style pairwise win-rate matrix between sources: per
    // prompt every cross pair, strict-win counts, ties split 0.5 —
    // exact integers, one division; join volume bounded by the
    // per-prompt sampling fan-out
    "qC5_winrate_matrix" -> ((s, dir) => {
      graft.operators.Preference.winRateMatrix(
          T(s, dir)("documents").select(
            expr("doc_id div 4").as("prompt_id"), col("source"),
            (col("doc_id") % 7).as("score")),
          "prompt_id", "source", "score")
        .orderBy(col("player_a"), col("player_b"))
    }),

    // distinct-2 response diversity (Li et al. 2016): per prompt,
    // distinct/total bigram ratio across the response set — the
    // sampling-temperature collapse audit; exact gram counts, one
    // division, texts never shuffle (only grams do)
    "qC6_response_diversity" -> ((s, dir) => {
      graft.operators.Preference.responseDiversity(
          T(s, dir)("documents").select(
            expr("doc_id div 4").as("prompt_id"), col("text")),
          "prompt_id", "text", n = 2)
        .orderBy(col("prompt_id"))
    }),

    // Cohen's kappa between two synthetic binary judges per source:
    // the annotation/judge-ensemble agreement audit — exact 2x2
    // contingency, integer-numerator p_o/p_e divisions, gateRounded
    // signed kappa
    "qC7_judge_agreement" -> ((s, dir) => {
      graft.operators.Preference.judgeAgreement(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 7 > 3).as("judge_a"),
            (col("doc_id") % 5 > 2).as("judge_b")),
          "source", "judge_a", "judge_b")
        .orderBy(col("source"))
    }),

    // reliability-diagram bins (Guo et al. 2017): integer-percent
    // confidence vs binary outcome in 10 equal bins — exact counts,
    // one division each for accuracy/confidence, abs gap; ECE is one
    // weighted sum downstream of this long form
    "qC8_calibration_bins" -> ((s, dir) => {
      graft.operators.Preference.calibrationBins(
          T(s, dir)("documents").select(
            (col("doc_id") % 101).as("pct"),
            (col("doc_id") % 3 === 0).as("correct")),
          "pct", "correct", bins = 10)
        .orderBy(col("bin"))
    }),

    // expected calibration error over the qC8 long form with a
    // densified spine (empty bins visible): per-bin exact BIGINT
    // |100·Σy − Σpct| telescopes the weighted sum, ECE is ONE
    // division of two exact integers — no cross-bin float fold
    "qC9_calibration_ece" -> ((s, dir) => {
      graft.operators.Preference.expectedCalibrationError(
          T(s, dir)("documents").select(
            (col("doc_id") % 101).as("pct"),
            (col("doc_id") % 3 === 0).as("correct")),
          "pct", "correct", bins = 10)
        .orderBy(col("bin"))
    }),

    // embedding-space response diversity (the semantic twin of qC6 —
    // lexical distinct-n misses paraphrase collapse): per prompt the
    // mean pairwise cosine over the response embeddings — 1e-6
    // quantized coordinates, exact integer dots/norms, per-pair 1e-9
    // quantized cosine so the cross-pair sum is order-free
    "qCC_embedding_diversity" -> ((s, dir) => {
      graft.operators.Preference.embeddingDiversity(
          T(s, dir)("embeddings").select(
            expr("vec_id div 4").as("prompt_id"), col("vec_id"),
            col("embedding")),
          "prompt_id", "vec_id", "embedding")
        .orderBy(col("prompt_id"))
    }),

    // Wilson-score 95% intervals over the arena rates (Brown et al.
    // 2001: Wald lies at small n — the arena regime): exact (w2, n2)
    // half-unit integers into a fixed IEEE dag mirrored verbatim;
    // ci_lo gateRounded (floating −ε on analytic 0)
    "qCD_winrate_wilson" -> ((s, dir) => {
      graft.operators.Preference.winRateConfidence(
          T(s, dir)("documents").select(
            expr("doc_id div 4").as("prompt_id"), col("source"),
            (col("doc_id") % 7).as("score")),
          "prompt_id", "source", "score")
        .orderBy(col("player_a"), col("player_b"))
    }),

    // Fleiss' kappa per source over a 3-judge synthetic panel (qC7
    // generalized past 2 judges / binary labels): exact per-item
    // contingency, integer-numerator Pbar/Pe, gateRounded signed
    // kappa; constant-m enforced in the plan
    "qCB_fleiss_kappa" -> ((s, dir) => {
      graft.operators.Preference.fleissKappa(
          T(s, dir)("documents").select(col("source"),
            col("doc_id").as("item"),
            explode(array(
              (col("doc_id") % 5).cast("string"),
              ((col("doc_id") * 2 + 1) % 5).cast("string"),
              ((col("doc_id") * 3 + 2) % 5).cast("string"))).as("cat")),
          "source", "item", "cat")
        .orderBy(col("source"))
    }),

    // exact fixed-point top principal direction (power iteration on
    // the quantized gram matrix): the qBS/qCA integer-iteration
    // precedent crossed onto spectra — eigen iterations were the
    // canonical rows-only excuse (qBO); this path is FULL-oracled as
    // 20 chained HUGEINT CTEs
    "qCJ_power_iteration" -> ((s, dir) => {
      graft.operators.Pca.powerIteration(
          T(s, dir)("embeddings").select(col("embedding")),
          "embedding", iters = 20)
        .orderBy(col("dim_idx"))
    }),

    // retrieval-eval metrics (Jarvelin & Kekalainen 2002): per-query
    // recall@5 / MRR / nDCG@5 over a ranked run vs graded qrels —
    // per-term 1e-9-quantized DCG so the sums are order-free longs;
    // judged-but-unretrieved and unjudged queries stay visible
    "qCI_ranking_metrics" -> ((s, dir) => {
      val docs = T(s, dir)("documents")
      graft.operators.Retrieval.rankingMetrics(
          docs.select(expr("doc_id div 10").as("query_id"),
            col("doc_id").as("doc"), (col("doc_id") % 10 + 1).as("rank")),
          docs.filter(col("doc_id") % 3 === 0)
            .select(expr("doc_id div 10").as("query_id"),
              col("doc_id").as("doc"), (col("doc_id") % 4).as("gain")),
          "query_id", "doc", "rank", "gain", k = 5)
        .orderBy(col("query_id"))
    }),

    // best-of-n scaling curve (Nakano et al. 2021 App. I): unbiased
    // E[best-of-j] for j = 1..8 per prompt from sorted order
    // statistics — binomial-free ratio products in fixed shared fold
    // order; prices a sampling budget without re-sampling
    "qCH_best_of_n_curve" -> ((s, dir) => {
      graft.operators.Preference.bestOfNCurve(
          T(s, dir)("documents").select(
            expr("doc_id div 4").as("prompt_id"),
            (col("doc_id") % 7).as("score")),
          "prompt_id", "score", maxJ = 8)
        .orderBy(col("prompt_id"), col("j"))
    }),

    // maximum calibration error (Guo et al. 2017 eq. 5 — ECE's
    // worst-case twin): the argmax bin by the telescoped exact-integer
    // gap, ties to the lowest bin — one global max_by over the bins
    "qCG_calibration_mce" -> ((s, dir) => {
      graft.operators.Preference.maxCalibrationError(
          T(s, dir)("documents").select(
            (col("doc_id") % 101).as("pct"),
            (col("doc_id") % 3 === 0).as("correct")),
          "pct", "correct", bins = 10)
    }),

    // judge position-bias audit (Zheng et al. 2023): each pair judged
    // in both orders, classified consistent / first-biased /
    // second-biased by winner IDENTITY across the swap; doc_id%7==0
    // pairs lose their swapped judgment -> visibly incomplete
    "qCF_position_bias" -> ((s, dir) => {
      graft.operators.Preference.positionBias(
          T(s, dir)("documents").select(col("source"),
            col("doc_id").as("pair"),
            explode(array(
              struct(lit(0L).as("o"), (col("doc_id") % 2 + 1).as("w")),
              struct(lit(1L).as("o"),
                when(col("doc_id") % 7 =!= 0,
                  expr("doc_id div 3") % 2 + 1).as("w")))).as("j"))
            .select(col("source"), col("pair"), col("j.o").as("ord"),
              col("j.w").as("win")),
          "source", "pair", "ord", "win")
        .orderBy(col("source"))
    }),

    // Krippendorff's alpha over a RAGGED judge panel (the data shape
    // qCB refuses by design): judge 2 rates evens, judge 3 rates
    // multiples of 3 — m varies 1..3, singleton items excluded; the
    // per-item rational disagreement quantizes to the 1e-9 grid so
    // the cross-item sum is exact (the qCC axis)
    "qCE_krippendorff_alpha" -> ((s, dir) => {
      graft.operators.Preference.krippendorffAlpha(
          T(s, dir)("documents").select(col("source"),
            col("doc_id").as("item"),
            explode(array(
              (col("doc_id") % 5).cast("string"),
              when(col("doc_id") % 2 === 0,
                ((col("doc_id") * 2 + 1) % 5).cast("string")),
              when(col("doc_id") % 3 === 0,
                ((col("doc_id") * 3 + 2) % 5).cast("string")))).as("cat")),
          "source", "item", "cat")
        .orderBy(col("source"))
    }),

    // Kendall's tau-b between two synthetic judges per 20-item group:
    // the rank twin of qC4 — exact pair classification (concordant /
    // discordant / three tie classes), tau in one shared association
    // order, gateRounded; pair volume bounded by the group fan-out
    "qCK_kendall_tau" -> ((s, dir) => {
      graft.operators.Preference.kendallTau(
          T(s, dir)("documents").select(
            expr("doc_id div 20").as("grp"), col("doc_id"),
            (col("doc_id") % 7).as("x"),
            ((col("doc_id") * 3) % 11).as("y")),
          "grp", "doc_id", "x", "y")
        .orderBy(col("grp"))
    }),

    // Spearman's rho per 50-item group: rank correlation WITHOUT the
    // quadratic pair space — doubled average ranks are exact longs,
    // then the qC4 exact-BIGINT Pearson dag verbatim
    "qCL_spearman_rho" -> ((s, dir) => {
      graft.operators.Preference.spearmanRho(
          T(s, dir)("documents").select(
            expr("doc_id div 50").as("grp"),
            (col("doc_id") % 7).as("x"),
            ((col("doc_id") * 5) % 13).as("y")),
          "grp", "x", "y")
        .orderBy(col("grp"))
    }),

    // top-k mass coverage per source ("how many docs are 50/90/99% of
    // the characters"): exact descending cumulatives, integer-compare
    // thresholds, min/min_by selection — Gini's actionable companion
    "qDC_mass_coverage" -> ((s, dir) => {
      graft.operators.Quantiles.massCoverage(
          T(s, dir)("documents").select(col("source"), col("n_chars")),
          "source", "n_chars")
        .orderBy(col("source"))
    }),

    // ranking overlap@10 between two scorers per source: did the
    // reranker change the HEAD — exact top-k set intersection over a
    // total (score desc, id) tie order
    "qDD_overlap_at_k" -> ((s, dir) => {
      graft.operators.Retrieval.overlapAtK(
          T(s, dir)("documents").select(col("source"), col("doc_id"),
            (col("doc_id") % 97).as("score_a"),
            ((col("doc_id") * 7) % 97).as("score_b")),
          "source", "doc_id", "score_a", "score_b", k = 10)
        .orderBy(col("source"))
    }),

    // Benjamini-Hochberg step-up FDR over a sign-test family (two win
    // rules x sources — the many-simultaneous-A/B-cells reality the
    // per-group significance operators create): integer acceptance
    // compares over 1e-9-grid p longs, step-up cutoff as a window max
    "qDE_bh_fdr" -> ((s, dir) => {
      val d = T(s, dir)("documents")
      def fam(name: String, win: org.apache.spark.sql.Column) =
        graft.operators.Preference.signTest(
            d.select(col("source"), win.as("win")), "source", "win")
          .select(lit(name).as("family"), col("source").as("test_id"),
            col("p_two"))
      graft.operators.Preference.bhFdr(
          fam("m7", col("doc_id") % 7 > 3)
            .unionByName(fam("m5", col("doc_id") % 5 > 1)),
          "family", "test_id", "p_two", qPct = 10)
        .orderBy(col("family"), col("test_id"))
    }),

    // deterministic paired-bootstrap 95% CI for the mean score delta
    // per source (two judges score every doc): Poisson(1) resample
    // weights from the 40-bit md5 draw — any engine replays the same
    // B=200 resamples — exact integer resample sums, percentile-rank
    // selection over the resample means
    "qDF_bootstrap_ci" -> ((s, dir) => {
      graft.operators.Preference.pairedBootstrapCi(
          T(s, dir)("documents").select(col("source"), col("doc_id"),
            (col("doc_id") % 101).as("score_a"),
            (col("doc_id") % 97).as("score_b")),
          "source", "doc_id", "score_a", "score_b", b = 200,
          alphaPct = 5)
        .orderBy(col("source"))
    }),

    // Holm-Bonferroni step-down FWER control over the same sign-test
    // family as qDE: the strict any-false-positive-is-fatal sibling —
    // integer acceptance compares, first-failure stop rank as a
    // window min
    "qDG_holm" -> ((s, dir) => {
      val d = T(s, dir)("documents")
      def fam(name: String, win: org.apache.spark.sql.Column) =
        graft.operators.Preference.signTest(
            d.select(col("source"), win.as("win")), "source", "win")
          .select(lit(name).as("family"), col("source").as("test_id"),
            col("p_two"))
      graft.operators.Preference.holmBonferroni(
          fam("m7", col("doc_id") % 7 > 3)
            .unionByName(fam("m5", col("doc_id") % 5 > 1)),
          "family", "test_id", "p_two", alphaPct = 5)
        .orderBy(col("family"), col("test_id"))
    }),

    // deterministic paired permutation (sign-flip) test per source
    // over the qDF judge-delta fixture: all-integer decision — exact
    // long permutation sums, integer extremeness compares, one
    // add-one division
    "qDH_permutation_test" -> ((s, dir) => {
      graft.operators.Preference.permutationTest(
          T(s, dir)("documents").select(col("source"), col("doc_id"),
            (col("doc_id") % 101).as("score_a"),
            (col("doc_id") % 97).as("score_b")),
          "source", "doc_id", "score_a", "score_b", p = 200)
        .orderBy(col("source"))
    }),

    // jackknife SE of the chars-per-unit ratio per source: delete-one
    // replicates from window totals (no resampling), 1e-9-grid
    // quantized replicate sums, computational-identity variance
    "qDI_jackknife_ratio" -> ((s, dir) => {
      graft.operators.Quantiles.jackknifeRatioSe(
          T(s, dir)("documents").select(col("source"), col("n_chars"),
            (col("doc_id") % 7 + 1).as("unit")),
          "source", "n_chars", "unit")
        .orderBy(col("source"))
    }),

    // one-way ANOVA F per language over source mean lengths: exact
    // cell moments, div/mod-split cross-cell sums (order-free at any
    // magnitude the squares permit), fixed F dag
    "qDJ_anova" -> ((s, dir) => {
      graft.operators.Classification.oneWayAnova(
          T(s, dir)("documents").select(col("lang"), col("source"),
            col("n_chars")),
          "lang", "source", "n_chars")
        .orderBy(col("lang"))
    }),

    // Kruskal-Wallis H per language across sources (the rank-based
    // ANOVA): doubled average ranks, 1e-9-grid quantized per-group H
    // terms, exact per-row tie sums, tie-corrected H
    "qDK_kruskal_wallis" -> ((s, dir) => {
      graft.operators.Classification.kruskalWallis(
          T(s, dir)("documents").select(col("lang"), col("source"),
            col("n_chars")),
          "lang", "source", "n_chars")
        .orderBy(col("lang"))
    }),

    // Cochran's Q per language over three synthetic binary judges on
    // the same docs (the k-treatment McNemar): Q is ONE division of
    // exact longs — integer numerator and denominator throughout
    "qDL_cochran_q" -> ((s, dir) => {
      val d = T(s, dir)("documents").select(col("lang"), col("doc_id"))
      val long = d.select(col("lang"), col("doc_id"),
        explode(array(
          struct(lit("c1").as("t"), (col("doc_id") % 3 === 0).as("x")),
          struct(lit("c2").as("t"), (col("doc_id") % 5 < 2).as("x")),
          struct(lit("c3").as("t"), (col("doc_id") % 7 < 3).as("x"))))
          .as("e"))
        .select(col("lang"), col("doc_id"), col("e.t").as("treat"),
          col("e.x").as("succ"))
      graft.operators.Classification.cochranQ(long, "lang", "doc_id",
          "treat", "succ")
        .orderBy(col("lang"))
    }),

    // Chao1 richness + Good-Turing unseen mass per source: "how much
    // vocabulary haven't we crawled" from the f1/f2 head — exact
    // frequency-of-frequency longs, three single divisions
    "qDM_chao1_richness" -> ((s, dir) => {
      TextAnalysis.chao1Richness(T(s, dir)("documents"), "source",
          "text")
        .orderBy(col("source"))
    }),

    // Zipf rank-frequency slope over the top-300 types: log-log OLS
    // with 1e-9-grid quantized regression sums — the corpus never
    // globally sorts, only the 300-row head does
    "qDN_zipf_slope" -> ((s, dir) => {
      TextAnalysis.zipfSlope(T(s, dir)("documents"), "text", topR = 300)
    }),

    // capture-recapture residual-duplicate estimate per source: two
    // synthetic detectors' catches -> Chapman N-hat + SE, the honest
    // "how many dups did we miss" number
    "qDY_capture_recapture" -> ((s, dir) => {
      graft.operators.Dedup.captureRecapture(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 7 < 2).as("in_a"),
            (col("doc_id") % 5 < 2).as("in_b")),
          "source", "in_a", "in_b")
        .orderBy(col("source"))
    }),

    // Newcombe hybrid-Wilson CI on the two-arm success-rate delta per
    // language: the closed-form companion to the qDF bootstrap —
    // per-arm Wilson bounds squared into the difference
    "qDZ_newcombe_ci" -> ((s, dir) => {
      graft.operators.Preference.newcombeDiffCi(
          T(s, dir)("documents").select(col("lang"),
            (col("doc_id") % 2 === 0).as("arm"),
            (col("doc_id") % 3 === 0).as("succ")),
          "lang", "arm", "succ")
        .orderBy(col("lang"))
    }),

    // two-sample log-rank per language (even vs odd docs as arms over
    // the qDO durations): are the two survival curves the same —
    // exact at-risk cumulatives, 1e-9-grid O-E and variance terms
    "qDV_log_rank" -> ((s, dir) => {
      graft.operators.Retention.logRank(
          T(s, dir)("documents").select(col("lang"),
            (col("doc_id") % 2 === 0).as("arm"),
            (col("doc_id") % 50 + 1).as("dur"),
            (col("doc_id") % 4 =!= 0).as("obs")),
          "lang", "arm", "dur", "obs")
        .orderBy(col("lang"))
    }),

    // Mantel-Haenszel pooled odds ratio per language, stratified by
    // source (Simpson's-paradox-proof pooling): 1e-9-grid stratum
    // terms, one division of de-quantized sums
    "qDW_mantel_haenszel" -> ((s, dir) => {
      graft.operators.Preference.mantelHaenszel(
          T(s, dir)("documents").select(col("lang"), col("source"),
            (col("doc_id") % 2 === 0).as("exp"),
            (col("doc_id") % 3 === 0).as("succ")),
          "lang", "source", "exp", "succ")
        .orderBy(col("lang"))
    }),

    // Page's CUSUM drift monitor per source over a doc_id-ordered
    // synthetic metric: the recursion as cumsum minus clamped running
    // min — 100% integer detection path
    "qDX_cusum" -> ((s, dir) => {
      graft.operators.Retention.cusum(
          T(s, dir)("documents").select(col("source"), col("doc_id"),
            (col("doc_id") % 13).as("x")),
          "source", "doc_id", "x", target = 6L, threshold = 50L)
        .orderBy(col("source"))
    }),

    // term burstiness (Church-Gale VMR) over the top-40 terms: the
    // content-vs-function-word axis — exact per-doc moments, div/mod
    // mean-square split, TakeOrderedAndProject cut
    "qDT_burstiness" -> ((s, dir) => {
      TextAnalysis.termBurstiness(T(s, dir)("documents"), "doc_id",
        "text", topK = 40, minDf = 2L)
    }),

    // Benjamini-Yekutieli FDR over the qDE family: BH for arbitrary
    // dependence — the harmonic budget c(m) on the 1e-9 grid,
    // boundary compares on identical doubles
    "qDU_by_fdr" -> ((s, dir) => {
      val d = T(s, dir)("documents")
      def fam(name: String, win: org.apache.spark.sql.Column) =
        graft.operators.Preference.signTest(
            d.select(col("source"), win.as("win")), "source", "win")
          .select(lit(name).as("family"), col("source").as("test_id"),
            col("p_two"))
      graft.operators.Preference.byFdr(
          fam("m7", col("doc_id") % 7 > 3)
            .unionByName(fam("m5", col("doc_id") % 5 > 1)),
          "family", "test_id", "p_two", qPct = 10)
        .orderBy(col("family"), col("test_id"))
    }),

    // Brown-Forsythe robust spread test per language across sources:
    // qDJ's variance-homogeneity precondition — doubled exact medians,
    // integer deviations, the full ANOVA div/mod chain on top
    "qDR_brown_forsythe" -> ((s, dir) => {
      graft.operators.Classification.brownForsythe(
          T(s, dir)("documents").select(col("lang"), col("source"),
            col("n_chars")),
          "lang", "source", "n_chars")
        .orderBy(col("lang"))
    }),

    // Friedman matched-blocks rank test per language: every doc ranks
    // three synthetic scorers — between-doc level differences cancel;
    // doubled average ranks, 1e-9-grid treatment terms, Conover ties
    "qDS_friedman" -> ((s, dir) => {
      val d = T(s, dir)("documents").select(col("lang"), col("doc_id"))
      val long = d.select(col("lang"), col("doc_id"),
        explode(array(
          struct(lit("a").as("t"),
            ((col("doc_id") * 3) % 11).as("x")),
          struct(lit("b").as("t"),
            ((col("doc_id") * 5) % 11).as("x")),
          struct(lit("c").as("t"),
            ((col("doc_id") * 7) % 11).as("x")))).as("e"))
        .select(col("lang"), col("doc_id"), col("e.t").as("treat"),
          col("e.x").as("score"))
      graft.operators.Classification.friedman(long, "lang", "doc_id",
          "treat", "score")
        .orderBy(col("lang"))
    }),

    // Wilcoxon signed-rank z per source over the qDF judge deltas:
    // the magnitude-rank rung between sign test and permutation test
    // — doubled average ranks, exact integer numerator and 48-scaled
    // tie-corrected variance, one fixed z dag
    "qDQ_wilcoxon" -> ((s, dir) => {
      graft.operators.Preference.wilcoxonSignedRank(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 101).as("score_a"),
            (col("doc_id") % 97).as("score_b")),
          "source", "score_a", "score_b")
        .orderBy(col("source"))
    }),

    // held-out Kneser-Ney cross-entropy (train even docs, score odd):
    // coverage + per-event entropy over covered bigrams — the qCU
    // model's evaluation loop, hc-weighted 1e-9-grid quantized ln p
    "qDP_kn_cross_entropy" -> ((s, dir) => {
      val d = T(s, dir)("documents")
      TextAnalysis.kneserNeyCrossEntropy(
        d.filter(col("doc_id") % 2 === 0).select(col("text")),
        d.filter(col("doc_id") % 2 === 1).select(col("text")),
        "text", cacheKey = Some(dir))
    }),

    // Kaplan-Meier survival per source over synthetic censored
    // durations: exact at-risk DESC cumulatives, 1e-9-grid quantized
    // hazard logs cumulated ASC, extinction via an integer flag
    "qDO_kaplan_meier" -> ((s, dir) => {
      graft.operators.Retention.kaplanMeier(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 50 + 1).as("dur"),
            (col("doc_id") % 4 =!= 0).as("obs")),
          "source", "dur", "obs")
        .orderBy(col("source"), col("t"))
    }),

    // Cramer's V between source and a synthetic category per 4-way
    // shard: the normalized chi-square effect size — per-cell terms
    // n_ab^2/(n_a*n_b) quantize to the 1e-9 grid, phi^2/chi2/V fixed
    // dags, gateRounded
    "qDA_cramers_v" -> ((s, dir) => {
      graft.operators.Classification.cramersV(
          T(s, dir)("documents").select(
            (col("doc_id") % 4).as("shard"), col("source"),
            (col("doc_id") % 5).as("cat")),
          "shard", "source", "cat")
        .orderBy(col("shard"))
    }),

    // vocabulary churn between the even/odd snapshots: type-set
    // Jaccard + new-type rate — the tokenizer-retrain audit; one
    // token aggregate with conditional sums, two divisions
    "qDB_vocab_churn" -> ((s, dir) => {
      TextAnalysis.vocabChurn(
          T(s, dir)("documents").select(
            (col("doc_id") % 2 === 1).as("in_b"), col("text")),
          "in_b", "text")
    }),

    // population stability index per source (the credit-scoring drift
    // standard): Laplace-smoothed bin shares between the even/odd
    // score snapshots over a densified spine — per-bin terms quantize
    // to the 1e-9 grid, PSI is their order-free sum
    "qD7_psi" -> ((s, dir) => {
      graft.operators.Classification.psi(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 2 === 1).as("in_b"),
            (col("doc_id") % 101).as("score")),
          "source", "in_b", "score", bins = 10)
        .orderBy(col("source"), col("bin"))
    }),

    // lexical diversity per source: type/token ratio, Herdan's C and
    // hapax share — the template-collapse audit; exact counts, one
    // division or one ln/ln dag each
    "qD8_lexical_diversity" -> ((s, dir) => {
      TextAnalysis.lexicalDiversity(T(s, dir)("documents"), "source",
          "text")
        .orderBy(col("source"))
    }),

    // duplicate trigram rate (the memorization-risk scalar): what
    // fraction of gram occurrences belong to grams seen twice+ —
    // the number a dedup pass is judged by
    "qD9_dup_gram_rate" -> ((s, dir) => {
      TextAnalysis.dupGramRate(T(s, dir)("documents"), "text", n = 3)
    }),

    // standardized mean difference (Cohen's d + Hedges' g) between
    // the even/odd score samples per source: exact six-moment
    // contract, integer positivity decision, shared dag, gateRounded
    "qD4_effect_size" -> ((s, dir) => {
      graft.operators.Classification.effectSize(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 2 === 1).as("in_b"),
            (col("doc_id") % 97).as("x")),
          "source", "in_b", "x")
        .orderBy(col("source"))
    }),

    // two-sample Kolmogorov-Smirnov statistic per source: the exact
    // integer sup-norm numerator max|cumA*nB - cumB*nA| maxed over
    // exact longs, one final division
    "qD5_ks_test" -> ((s, dir) => {
      graft.operators.Classification.ksTest(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 2 === 1).as("in_b"),
            (col("doc_id") % 97).as("x")),
          "source", "in_b", "x")
        .orderBy(col("source"))
    }),

    // Gini concentration of character mass per source: the "is 1% of
    // the crawl 90% of the tokens" audit — exact rank-weighted
    // numerator (tie-order-invariant), one division
    "qD6_gini" -> ((s, dir) => {
      graft.operators.Quantiles.gini(
          T(s, dir)("documents").select(col("source"), col("n_chars")),
          "source", "n_chars")
        .orderBy(col("source"))
    }),

    // trimmed + winsorized means per source (robust reward
    // aggregation): rank-based trim with integer k, exact kept sums
    // and boundary clamps, one division each; the plain-vs-trimmed
    // gap is the tail's leverage
    "qD2_trimmed_mean" -> ((s, dir) => {
      graft.operators.Quantiles.trimmedMean(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 997).as("score")),
          "source", "score", trimPct = 10)
        .orderBy(col("source"))
    }),

    // exact median + MAD per source: doubled/quadrupled order
    // statistics keep every intermediate an exact long — zero
    // transcendental arithmetic, divisions by binary powers only
    "qD3_median_mad" -> ((s, dir) => {
      graft.operators.Quantiles.medianMad(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 997).as("score")),
          "source", "score")
        .orderBy(col("source"))
    }),

    // rank-sum AUC / Mann-Whitney U (Hanley & McNeil 1982): the
    // threshold-free scorer quality per source WITHOUT the quadratic
    // pair space — doubled average ranks make 2U an exact long, AUC
    // is one division
    "qCZ_rank_auc" -> ((s, dir) => {
      graft.operators.Classification.rankSumAuc(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 97).as("score"),
            (col("doc_id") % 3 === 0).as("label")),
          "source", "score", "label")
        .orderBy(col("source"))
    }),

    // confusion-matrix scorecard per source: exact cells, harmonic
    // F1, balanced accuracy, and the imbalance-honest MCC (signed,
    // gateRounded)
    "qD0_classifier_report" -> ((s, dir) => {
      graft.operators.Classification.classifierReport(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 7 > 3).as("pred"),
            (col("doc_id") % 3 === 0).as("truth")),
          "source", "pred", "truth")
        .orderBy(col("source"))
    }),

    // threshold sweep (the PR-curve point table) per language: exact
    // TP/FP at every integer-percent operating point over a densified
    // 0..100 spine — the corpus is never range-joined, only its
    // <=101-row per-score summary
    "qD1_threshold_sweep" -> ((s, dir) => {
      graft.operators.Classification.thresholdSweep(
          T(s, dir)("documents").select(col("lang"),
            (col("doc_id") % 101).as("score"),
            (col("doc_id") % 3 === 0).as("label")),
          "lang", "score", "label")
        .orderBy(col("lang"), col("threshold"))
    }),

    // exact binomial sign test (the paired A/B significance check):
    // two-sided p under p=1/2 via the 2^-n ratio-product tail fold —
    // every fold shape shared bitwise with the oracle's list_reduce
    "qCX_sign_test" -> ((s, dir) => {
      graft.operators.Preference.signTest(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 7 > 3).as("win")),
          "source", "win")
        .orderBy(col("source"))
    }),

    // stratified (confound-controlled) win rate: equal-weight average
    // of per-length-bucket win rates beside the raw rate — the
    // AlpacaEval-2 length control without the logistic fit; per-stratum
    // rates quantize to the 1e-9 grid so the cross-stratum sum is exact
    "qCY_stratified_winrate" -> ((s, dir) => {
      graft.operators.Preference.stratifiedWinRate(
          T(s, dir)("documents").select(col("source"),
            expr("least(n_chars div 500, 3)").as("stratum"),
            (col("doc_id") % 7 > 3).as("win")),
          "source", "stratum", "win")
        .orderBy(col("source"))
    }),

    // interpolated Kneser-Ney bigram model table (Kneser & Ney 1995):
    // top-50 bigrams with the continuation-count backoff — every
    // count exact, D=0.75 a binary-exact literal, one shared dag;
    // the cut needs no quantization (c12 desc is an integer order)
    "qCU_kneser_ney" -> ((s, dir) => {
      TextAnalysis.kneserNeyBigrams(T(s, dir)("documents"), "text",
          topK = 50, cacheKey = Some(dir))
        .orderBy(col("w1"), col("w2"))
    }),

    // Wald's SPRT eval monitor (Wald 1945): per-source stop/continue
    // decision for an A/B win stream at (p0=50%, p1=60%, a=b=5%) —
    // integer-percent params, one shared llr dag, boundary compares
    // on identical doubles
    "qCV_sprt_monitor" -> ((s, dir) => {
      graft.operators.Preference.sprtMonitor(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 7 > 3).as("win")),
          "source", "win")
        .orderBy(col("source"))
    }),

    // cluster-label agreement (Manning et al. 2008 §16.3): purity +
    // NMI between a synthetic 8-way clustering and the source label —
    // exact contingency, 1e-9-grid quantized MI/entropy terms, one
    // fixed NMI dag
    "qCW_cluster_agreement" -> ((s, dir) => {
      graft.operators.TrainingDynamics.clusterLabelAgreement(
          T(s, dir)("documents").select(
            (col("doc_id") % 8).as("cluster"), col("source")),
          "cluster", "source")
    }),

    // Murphy decomposition of the Brier score (Murphy 1973): brier =
    // reliability - resolution + uncertainty over the qC8 fixture —
    // exact integer numerators per term, 1e-9-grid quantized cross-bin
    // sums, fixed division chains
    "qCS_brier_decomposition" -> ((s, dir) => {
      graft.operators.Preference.brierDecomposition(
          T(s, dir)("documents").select(
            (col("doc_id") % 101).as("pct"),
            (col("doc_id") % 3 === 0).as("correct")),
          "pct", "correct", bins = 10)
    }),

    // G^2 log-likelihood-ratio collocations (Dunning 1993): top-30
    // bigram phrases by the 2x2 adjacency contingency — exact long
    // cells, one shared four-term dag, total-order cut (1e-9 grid +
    // lexicographic ties) planned as TakeOrderedAndProject
    "qCT_collocations" -> ((s, dir) => {
      TextAnalysis.collocations(T(s, dir)("documents"), "text",
          topK = 30, minCount = 2, cacheKey = Some(dir))
        .orderBy(col("w1"), col("w2"))
    }),

    // chi-squared token-label feature selection (Manning et al. 2008
    // §13.5.2): top-10 terms per language by exact 2x2 presence
    // cells — one shared float dag over exact longs, 1e-9-grid
    // quantized ranking with term-asc ties (a total order)
    "qCN_chi2_terms" -> ((s, dir) => {
      TextAnalysis.chiSquaredTerms(T(s, dir)("documents"), "lang", "text",
          topK = 10, minDf = 2)
        .orderBy(col("lang"), col("rank"))
    }),

    // ROUGE-2 between even/odd paired documents (Lin 2004): clipped
    // bigram matches as exact longs, F1 via the harmonic identity
    // 2m/(tc+tr) — one division of exact integers, no p*r float path
    "qCP_rouge_n" -> ((s, dir) => {
      val d = T(s, dir)("documents")
      val ev = d.filter(col("doc_id") % 2 === 0)
        .select(expr("doc_id div 2").as("pair_id"),
          col("text").as("cand"))
      val od = d.filter(col("doc_id") % 2 === 1)
        .select(expr("doc_id div 2").as("pair_id"), col("text").as("ref"))
      TextAnalysis.rougeN(ev.join(od, Seq("pair_id")), "pair_id",
          "cand", "ref", n = 2)
        .orderBy(col("pair_id"))
    }),

    // Jensen-Shannon divergence between the even/odd corpus halves:
    // the symmetric, smoothing-free twin of qAN's KL matrix — each
    // token's term quantizes to a 1e-9-grid long (the qCC axis) so
    // the vocabulary sum is order-free; bits via a shared ln-2 literal
    "qCQ_js_divergence" -> ((s, dir) => {
      TextAnalysis.jsDivergence(
          T(s, dir)("documents").select(
            (col("doc_id") % 2 === 1).as("in_b"), col("text")),
          "in_b", "text")
    }),

    // dataset cartography (Swayamdipta et al. 2020): per-example
    // confidence / variability / correctness over a 3-epoch synthetic
    // trace — exact BIGINT moments, integer-compare region boundaries
    // (no float threshold edges)
    "qCM_cartography" -> ((s, dir) => {
      graft.operators.TrainingDynamics.cartography(
          T(s, dir)("documents").select(col("doc_id"),
            explode(array((0 to 2).map(e => struct(
              ((col("doc_id") * (e + 1)) % 101).as("p"),
              ((col("doc_id") + e) % 3 === 0).as("c"))): _*)).as("ep"))
            .select(col("doc_id"), col("ep.p").as("prob_pct"),
              col("ep.c").as("correct")),
          "doc_id", "prob_pct", "correct")
        .orderBy(col("doc_id"))
    }),

    // split-conformal calibration quantile per source (Angelopoulos &
    // Bates 2021 eq. 1): the exact ⌈(n+1)(1−α)⌉-th order statistic —
    // ZERO float arithmetic anywhere, integer rank selection only
    "qCO_conformal_quantile" -> ((s, dir) => {
      graft.operators.Quantiles.conformalQuantile(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 997).as("score"), col("doc_id")),
          "source", "score", "doc_id", alphaPct = 10)
        .orderBy(col("source"))
    }),

    // McNemar's paired-classifier audit per source: two synthetic
    // quality filters against a shared label — exact 2x2 discordant
    // cells, continuity-corrected statistic in ONE division
    "qCR_mcnemar" -> ((s, dir) => {
      graft.operators.Preference.mcnemar(
          T(s, dir)("documents").select(col("source"),
            (col("doc_id") % 7 > 3).as("pred_a"),
            (col("doc_id") % 5 > 2).as("pred_b"),
            (col("doc_id") % 3 === 0).as("truth")),
          "source", "pred_a", "pred_b", "truth")
        .orderBy(col("source"))
    }),

    // Bradley-Terry strength fit over the qC5 matrix (Hunter 2004 MM,
    // ties as half-wins): 10 fixed-point integer iterations at 1e-6
    // scale — bit-exact in any order, the qBS integer-PageRank
    // precedent — FULL-oracled as 10 chained HUGEINT CTEs
    "qCA_bradley_terry" -> ((s, dir) => {
      graft.operators.Preference.bradleyTerry(
          T(s, dir)("documents").select(
            expr("doc_id div 4").as("prompt_id"), col("source"),
            (col("doc_id") % 7).as("score")),
          "prompt_id", "source", "score", iters = 10)
        .orderBy(col("player"))
    }),

    // length-bias audit over the kept pairs: per source, mean Δtokens
    // and the chosen-longer fraction — the verbosity-bias alarm
    // (exact integer sums, one division, the float-contract rule)
    "qBY_length_bias" -> ((s, dir) => {
      graft.operators.Preference.lengthBias(
          graft.operators.Preference.preferencePairs(prefFixture(s, dir),
            "prompt_id", "doc_id", "text", "score",
            maxJaccard = PREF_MAX_JAC, carry = Seq("source")),
          "source")
        .orderBy(col("source"))
    }),

    // min-k% prob membership inference (Shi et al. 2023): score every
    // doc's 20% most-surprising tokens under a reference LM trained
    // on the doc_id%4==0 slice — member docs read anomalously LOW
    // (few surprising tokens); the model-based contamination detector
    // beside the exact-n-gram ones (q9D/q9J)
    "qBT_mink_contamination" -> ((s, dir) => {
      val d = T(s, dir)("documents")
      TextAnalysis.minKProbScore(d, d.filter(col("doc_id") % 4 === 0),
          "doc_id", "text", kFrac = MINK_KFRAC, threshold = MINK_THRESHOLD)
        .orderBy(col("doc_id"))
    })
  )


  /** qBT/qBV tuning constants — ONE definition feeding both the query
    * lambdas and the oracle SQL (the qBS shared-definition pattern):
    * retuning a threshold must not be able to drift the two sides
    * apart into an opaque hash mismatch. */
  private val MINK_KFRAC = 0.2
  private val MINK_THRESHOLD = 3.55
  private val SFT_MIN_TRAINABLE = 0.4

  /** qBU/qBV's synthetic chat transcripts: role markers wrapped
    * around doc-text slices, with an extra turn pair on even ids so
    * turn counts vary — the same construction the oracles replay. */
  /** qBW/qBZ's shared pipeline: the closed-form in-context layout —
    * complete div-8 id groups with equal weights, real operator code
    * paths (ConnectedComponents, the greedy walk, the two-phase
    * prefix sum, the sequence cuts). @return (doc_id, component,
    * ord, seq_id, tok_start, tok_end). */
  private def inContextFixture(s: org.apache.spark.sql.SparkSession,
                               dir: String): org.apache.spark.sql.DataFrame = {
    val d = T(s, dir)("documents")
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"),
        expr("doc_id div 8").as("g"))
    val edges = d.as("x").join(d.as("y"),
        col("x.g") === col("y.g") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"),
        lit(1.0).as("w"))
    // fused ordinal + token prefix sums: ONE range shuffle where the
    // contextOrder → packSequencesBy composition paid two (the
    // orderAndPackSequences doc; rows identical — oracle unchanged)
    graft.operators.ContextLayout.orderAndPackSequences(
        d.select("doc_id"), "doc_id", edges, "a", "b", "w",
        d, "n_tokens", seqLen = 64)
      .select(col("id").as("doc_id"), col("component"), col("ord"),
        col("seq_id"), col("tok_start"), col("tok_end"))
  }

  /** qBX/qBY's fixture: documents as a (prompt, response) table —
    * 4 responses per prompt, integer scores with deliberate ties. */
  private val PREF_MAX_JAC = 0.9
  private def prefFixture(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    T(s, dir)("documents")
      .select(expr("doc_id div 4").as("prompt_id"), col("doc_id"),
        col("text"), (col("doc_id") % 7).as("score"), col("source"))

  /** The shared SQL prelude of the qBW/qBZ oracles: the closed-form
    * in-context layout — on the equal-weight complete-group fixture
    * the walk contract reduces to (min-hash group key, hash40, id)
    * order, so the whole layout is a window + range unnest. */
  /** The qCA oracle: Bradley–Terry MM in fixed-point HUGEINT —
    * `iters` chained CTEs, each replaying one exact integer MM step
    * (per-edge floor divisions summed order-free, one normalization)
    * over the qC5 pair matrix. Mirrors
    * [[graft.operators.Preference.bradleyTerry]] verbatim: S = 1e6,
    * d_i = greatest(Σ_j ⌊N2·S²/(p_i+p_j)⌋, 1),
    * p'_i = greatest(⌊W2·S²/d_i⌋, 1), then
    * p_i = greatest(⌊p'_i·P·S/Σp'⌋, 1). */
  private def btOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      val prev = s"it${k - 1}"
      s"""d$k AS MATERIALIZED (SELECT e.i AS pl,
             greatest(SUM((e.n2 * 1000000 * 1000000) // (pi.p + pj.p)), 1)
               AS d
           FROM e JOIN $prev pi ON pi.pl = e.i
                  JOIN $prev pj ON pj.pl = e.j GROUP BY 1),
      u$k AS MATERIALIZED (SELECT pl.pl,
             greatest((pl.w2t * 1000000 * 1000000) // d$k.d, 1) AS pu
           FROM pl JOIN d$k USING (pl)),
      it$k AS MATERIALIZED (SELECT u$k.pl,
             greatest((pu * np.n * 1000000) // (SELECT SUM(pu) FROM u$k),
               1) AS p
           FROM u$k CROSS JOIN np)"""
    }.mkString(",\n      ")
    s"""
      WITH r AS MATERIALIZED (SELECT doc_id // 4 AS p, source AS pl,
                 doc_id % 7 AS s FROM documents),
      m AS MATERIALIZED (SELECT a.pl AS pa, b.pl AS pb,
              CAST(2 * COUNT(*) AS HUGEINT) AS n2,
              CAST(2 * SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END)
                 + SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS HUGEINT)
                AS w2a
            FROM r a JOIN r b ON a.p = b.p AND a.pl < b.pl GROUP BY 1, 2),
      e AS MATERIALIZED (SELECT pa AS i, pb AS j, n2, w2a AS w2 FROM m
            UNION ALL SELECT pb AS i, pa AS j, n2, n2 - w2a AS w2 FROM m),
      pl AS MATERIALIZED (SELECT i AS pl, CAST(SUM(n2) AS HUGEINT) AS n2t,
               CAST(SUM(w2) AS HUGEINT) AS w2t FROM e GROUP BY 1),
      np AS MATERIALIZED (SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM pl),
      it0 AS MATERIALIZED (SELECT pl, CAST(1000000 AS HUGEINT) AS p
            FROM pl),
      $steps
      SELECT pl.pl AS player, CAST(pl.n2t // 2 AS BIGINT) AS n_comparisons,
             CAST(pl.w2t AS BIGINT) AS w2,
             CAST(it$iters.p AS BIGINT) AS rating_fp,
             round(CAST(it$iters.p AS DOUBLE) / 1000000.0, 6) AS rating
      FROM pl JOIN it$iters USING (pl) ORDER BY player"""
  }

  /** The qCJ oracle: fixed-point power iteration in HUGEINT —
    * `iters` chained CTEs over the 1e-6-quantized gram matrix,
    * mirroring [[graft.operators.Pca.powerIteration]] verbatim
    * (TRUNCATING `//` ≡ BigInt `/`, probed; sign canonicalized at
    * the largest-|v| component, ties to the lowest index; Rayleigh
    * quotient as one HUGEINT→DOUBLE division). Fixture-specific:
    * dim 64 hardcoded. */
  private def powerIterOracleSql(iters: Int): String = {
    val steps = (1 to iters).map { k =>
      val prev = s"it${k - 1}"
      s"""w$k AS MATERIALIZED (SELECT g.i,
             CAST(SUM(g.gij * p.p) AS HUGEINT) AS w
           FROM g JOIN $prev p ON p.i = g.j GROUP BY 1),
      m$k AS MATERIALIZED (SELECT MAX(ABS(w)) AS m FROM w$k),
      it$k AS MATERIALIZED (SELECT w$k.i,
             CASE WHEN m$k.m = 0 THEN CAST(0 AS HUGEINT)
                  ELSE (w$k.w * 1000000) // m$k.m END AS p
           FROM w$k CROSS JOIN m$k)"""
    }.mkString(",\n      ")
    s"""
      WITH e2 AS MATERIALIZED (SELECT list_transform(
               CAST(embedding AS DOUBLE[]),
               x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
             FROM embeddings WHERE embedding IS NOT NULL),
      g AS MATERIALIZED (SELECT t1.range AS i, t2.range AS j,
             CAST(SUM(qv[CAST(t1.range AS INT) + 1]
                    * qv[CAST(t2.range AS INT) + 1]) AS HUGEINT) AS gij
           FROM e2, range(0, 64) t1, range(0, 64) t2 GROUP BY 1, 2),
      it0 AS MATERIALIZED (SELECT range AS i,
             CAST(1000000 AS HUGEINT) AS p FROM range(0, 64)),
      $steps,
      pick AS (SELECT p FROM it$iters ORDER BY ABS(p) DESC, i ASC
               LIMIT 1),
      fin AS MATERIALIZED (SELECT i,
             CASE WHEN (SELECT p FROM pick) < 0 THEN -p ELSE p END AS p
           FROM it$iters),
      nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e2),
      ray AS (SELECT CAST(SUM(f1.p * g.gij * f2.p) AS HUGEINT) AS num,
               (SELECT CAST(SUM(p * p) AS HUGEINT) FROM fin) AS den
             FROM g JOIN fin f1 ON f1.i = g.i JOIN fin f2 ON f2.i = g.j)
      SELECT CAST(fin.i AS INT) AS dim_idx, CAST(fin.p AS BIGINT) AS v_fp,
             round(CAST(fin.p AS DOUBLE) / 1000000.0, 6) + 0 AS v,
             CASE WHEN ray.den = 0 THEN 0.0
                  ELSE round(CAST(ray.num AS DOUBLE)
                             / CAST(ray.den AS DOUBLE), 6) END AS lambda,
             nv.n AS n_vectors, CAST($iters AS INT) AS iters
      FROM fin CROSS JOIN ray CROSS JOIN nv ORDER BY dim_idx"""
  }

  private val INCTX_PIECES = """
      WITH d AS (SELECT doc_id,
              CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
              doc_id // 8 AS g,
              CAST(list_reduce(list_transform(
                regexp_extract_all(substring(md5(CAST(doc_id AS VARCHAR) || ' s0'), 1, 10), '.'),
                c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
                (a, b) -> a * 16 + b) AS BIGINT) AS h
            FROM documents),
      k AS (SELECT doc_id, w, h,
              MIN(h) OVER (PARTITION BY g) AS gk,
              MIN(doc_id) OVER (PARTITION BY g) AS component
            FROM d),
      o AS (SELECT doc_id, w, component,
              row_number() OVER (ORDER BY gk, component, h, doc_id) - 1 AS ord
            FROM k),
      c AS (SELECT doc_id, component, ord, w,
              CAST(COALESCE(SUM(w) OVER (ORDER BY ord
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS cum
            FROM o),
      s AS (SELECT doc_id, component, ord, w, cum,
              unnest(range(cum // 64, (cum + w - 1) // 64 + 1)) AS seq_id
            FROM c WHERE w > 0),
      spans AS (SELECT doc_id, component, CAST(ord AS BIGINT) AS ord,
              CAST(seq_id AS BIGINT) AS seq_id,
              greatest(0, seq_id * 64 - cum) AS tok_start,
              least(w, (seq_id + 1) * 64 - cum) AS tok_end
            FROM s)"""

  /** The shared SQL prelude of the qBX/qBY oracles: the preference
    * fixture + chosen/rejected selection + exact Jaccard. */
  private val PREF_PIECES = """
    WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id, text,
                      doc_id % 7 AS score, source
               FROM documents),
    ch AS (SELECT prompt_id, doc_id, text, source,
             row_number() OVER (PARTITION BY prompt_id
               ORDER BY score DESC, doc_id ASC) AS rn FROM r),
    rj AS (SELECT prompt_id, doc_id, text,
             row_number() OVER (PARTITION BY prompt_id
               ORDER BY score ASC, doc_id DESC) AS rn FROM r),
    n AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_resp
          FROM r GROUP BY 1),
    p AS (SELECT c.prompt_id AS prompt_id, n.n_resp AS n_resp,
                 c.doc_id AS chosen_id, j.doc_id AS rejected_id,
                 c.text AS ct, j.text AS jt, c.source AS source
          FROM ch c
          JOIN rj j ON c.prompt_id = j.prompt_id AND j.rn = 1
          JOIN n ON n.prompt_id = c.prompt_id
          WHERE c.rn = 1),
    t AS (SELECT prompt_id, n_resp, chosen_id, rejected_id, source,
            list_distinct(regexp_extract_all(ct, '\S+')) AS ca,
            list_distinct(regexp_extract_all(jt, '\S+')) AS ra,
            CAST(len(regexp_extract_all(ct, '\S+')) AS BIGINT) AS ctoks,
            CAST(len(regexp_extract_all(jt, '\S+')) AS BIGINT) AS rtoks
          FROM p),
    u AS (SELECT prompt_id, n_resp, chosen_id, rejected_id, source,
            ctoks, rtoks,
            CAST(len(list_intersect(ca, ra)) AS BIGINT) AS inter,
            CAST(len(ca) + len(ra) AS BIGINT)
              - CAST(len(list_intersect(ca, ra)) AS BIGINT) AS uni
          FROM t),
    pairs AS (SELECT prompt_id, n_resp, chosen_id, rejected_id,
            ctoks AS chosen_tokens, rtoks AS rejected_tokens,
            ctoks - rtoks AS delta_tokens,
            round(CASE WHEN uni > 0
              THEN CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)
              ELSE 1.0 END, 4) AS jaccard,
            (n_resp >= 2 AND chosen_id != rejected_id AND
             round(CASE WHEN uni > 0
               THEN CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)
               ELSE 1.0 END, 4) < __PREF_MAX_JAC__) AS keep,
            source
          FROM u)"""

  private def chatFixture(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    // doc_id % 7 == 3 stays RAW prose — a transcript with no role
    // marker at all, so qBV's "no doc vanishes" contract (zero turns
    // ⇒ explicit keep=false row) is exercised at the gate, not just
    // in the spec
    docs.withColumn("text",
      when(col("doc_id") % 7 === 3, substring(col("text"), 1, 50))
        .otherwise(concat(
          lit("<|user|> "), substring(col("text"), 1, 60),
          lit(" <|assistant|> "), substring(col("text"), 61, 80),
          when(col("doc_id") % 2 === 0,
            concat(lit(" <|user|> again "), substring(col("text"), 141, 30),
              lit(" <|assistant|> done"))).otherwise(lit("")))))

  /** The shared SQL prelude of the qBU/qBV oracles: the chat fixture
    * plus the sentinel-based turn parse (chr(1)/chr(2) mirror the
    * operator's /). */
  private val CHAT_PIECES = """
    WITH t AS (SELECT doc_id,
        CASE WHEN doc_id % 7 = 3 THEN substr(text, 1, 50)
        ELSE '<|user|> ' || substr(text, 1, 60) ||
          ' <|assistant|> ' || substr(text, 61, 80) ||
          CASE WHEN doc_id % 2 = 0
            THEN ' <|user|> again ' || substr(text, 141, 30) ||
                 ' <|assistant|> done'
            ELSE '' END
        END AS text
      FROM documents),
    m AS (SELECT doc_id,
        regexp_replace(regexp_replace(text, '[\x01\x02]', '', 'g'),
          '<\|(user|assistant|system)\|>',
          chr(1) || '\1' || chr(2), 'g') AS s
      FROM t),
    p AS (SELECT doc_id,
        unnest(string_split(s, chr(1))) AS piece,
        generate_subscripts(string_split(s, chr(1)), 1) AS ord
      FROM m),
    turns AS (SELECT doc_id, CAST(ord - 2 AS INT) AS turn_idx,
        split_part(piece, chr(2), 1) AS role,
        CAST(len(regexp_extract_all(trim(split_part(piece, chr(2), 2)),
                                    '\S+')) AS INT) AS turn_tokens
      FROM p WHERE ord > 1)"""

  val oracleSql: Map[String, String] = Map(
    "qBU_chat_turns" -> s"""
      $CHAT_PIECES
      SELECT doc_id, turn_idx, role, turn_tokens
      FROM turns ORDER BY doc_id, turn_idx""",
    "qBV_sft_mask" -> s"""
      $CHAT_PIECES,
      agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_turns,
                CAST(SUM(CASE WHEN role = 'assistant'
                         THEN turn_tokens ELSE 0 END) AS BIGINT) AS ntr,
                CAST(SUM(CASE WHEN role != 'assistant'
                         THEN turn_tokens ELSE 0 END) AS BIGINT) AS nms
              FROM turns GROUP BY doc_id)
      SELECT doc_id, COALESCE(a.n_turns, 0) AS n_turns,
             COALESCE(a.ntr, 0) AS n_train_tokens,
             COALESCE(a.nms, 0) AS n_mask_tokens,
             CASE WHEN COALESCE(a.ntr, 0) + COALESCE(a.nms, 0) > 0
               THEN round(CAST(a.ntr AS DOUBLE)
                          / CAST(a.ntr + a.nms AS DOUBLE), 6)
             END AS trainable_frac,
             (COALESCE(a.ntr, 0) > 0
              AND CASE WHEN COALESCE(a.ntr, 0) + COALESCE(a.nms, 0) > 0
                THEN round(CAST(a.ntr AS DOUBLE)
                           / CAST(a.ntr + a.nms AS DOUBLE), 6)
                     >= __SFT_MIN__
                ELSE false END) AS keep
      FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"""
      .replace("__SFT_MIN__", SFT_MIN_TRAINABLE.toString),
    "qBW_incontext_layout" -> s"""
      $INCTX_PIECES
      SELECT doc_id, component, ord, seq_id, tok_start, tok_end
      FROM spans ORDER BY ord, seq_id""",
    "qBZ_packing_report" -> s"""
      $INCTX_PIECES,
      pd AS (SELECT doc_id, count(*) AS nsp FROM spans GROUP BY 1),
      ps AS (SELECT seq_id, CAST(SUM(tok_end - tok_start) AS BIGINT) AS fill,
                    CAST(count(*) AS BIGINT) AS docs FROM spans GROUP BY 1),
      da AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                    CAST(SUM(CASE WHEN nsp > 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS split_docs
             FROM pd),
      sa AS (SELECT CAST(count(*) AS BIGINT) AS n_seqs,
                    CAST(SUM(fill) AS BIGINT) AS n_tokens,
                    CAST(SUM(CASE WHEN fill = 64 THEN 1 ELSE 0 END) AS BIGINT)
                      AS full_seqs,
                    CAST(SUM(docs) AS BIGINT) AS n_spans
             FROM ps)
      SELECT n_seqs, n_docs, n_tokens, full_seqs, split_docs,
             round(CAST(split_docs AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
               AS split_doc_frac,
             round(CAST(n_spans AS DOUBLE) / CAST(n_seqs AS DOUBLE), 6)
               AS mean_docs_per_seq,
             n_tokens - (n_seqs - 1) * 64 AS tail_fill
      FROM da, sa""",
    "qBX_preference_pairs" -> s"""
      $PREF_PIECES
      SELECT prompt_id, n_resp, chosen_id, rejected_id, chosen_tokens,
             rejected_tokens, delta_tokens, jaccard, keep, source
      FROM pairs ORDER BY prompt_id"""
      .replace("__PREF_MAX_JAC__", "0.9"),
    "qC6_response_diversity" -> """
      WITH r AS (SELECT doc_id // 4 AS prompt_id,
                        regexp_extract_all(text, '\S+') AS t
                 FROM documents),
      nr AS (SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_resp
             FROM r GROUP BY 1),
      g AS (SELECT prompt_id,
              unnest(list_transform(range(1, len(t)),
                i -> t[i] || ' ' || t[i + 1])) AS gram
            FROM r WHERE len(t) >= 2),
      c AS (SELECT prompt_id, gram, COUNT(*) AS cnt FROM g GROUP BY 1, 2),
      s AS (SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_distinct,
              CAST(SUM(cnt) AS BIGINT) AS n_grams FROM c GROUP BY 1)
      SELECT nr.prompt_id, nr.n_resp,
             COALESCE(s.n_grams, 0) AS n_grams,
             COALESCE(s.n_distinct, 0) AS n_distinct,
             CASE WHEN COALESCE(s.n_grams, 0) = 0 THEN 0.0
                  ELSE round(CAST(s.n_distinct AS DOUBLE)
                             / CAST(s.n_grams AS DOUBLE), 6)
             END AS distinct_ratio
      FROM nr LEFT JOIN s USING (prompt_id) ORDER BY prompt_id""",

    "qC8_calibration_bins" -> """
      WITH r AS (SELECT doc_id % 101 AS pct, doc_id % 3 = 0 AS y
                 FROM documents)
      SELECT CAST(least(floor(pct * 10 / 100), 9) AS INT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS n,
             round(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy,
             round(CAST(SUM(pct) AS DOUBLE)
                   / CAST(COUNT(*) * 100 AS DOUBLE), 6) AS confidence,
             round(abs(CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE)
                     - CAST(SUM(pct) AS DOUBLE)
                       / CAST(COUNT(*) * 100 AS DOUBLE)), 6) AS gap
      FROM r GROUP BY 1 ORDER BY bin""",

    "qC9_calibration_ece" -> """
      WITH r AS (SELECT doc_id % 101 AS pct, doc_id % 3 = 0 AS y
                 FROM documents),
      s AS (SELECT CAST(least(floor(pct * 10 / 100), 9) AS INT) AS bin,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS sy,
              CAST(SUM(pct) AS BIGINT) AS sp
            FROM r GROUP BY 1),
      t AS (SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS n_total,
              COALESCE(CAST(SUM(abs(100 * sy - sp)) AS BIGINT), 0) AS dev
            FROM s),
      spine AS (SELECT CAST(range AS INT) AS bin FROM range(0, 10))
      SELECT bin, COALESCE(s.n, 0) AS n,
             round(CAST(s.sy AS DOUBLE) / CAST(s.n AS DOUBLE), 6)
               AS accuracy,
             round(CAST(s.sp AS DOUBLE) / CAST(s.n * 100 AS DOUBLE), 6)
               AS confidence,
             round(abs(CAST(s.sy AS DOUBLE) / CAST(s.n AS DOUBLE)
                     - CAST(s.sp AS DOUBLE) / CAST(s.n * 100 AS DOUBLE)),
               6) AS gap,
             COALESCE(CAST(abs(100 * s.sy - s.sp) AS BIGINT), 0)
               AS abs_dev,
             t.n_total,
             CASE WHEN t.n_total = 0 THEN 0.0
                  ELSE round(CAST(t.dev AS DOUBLE)
                             / CAST(t.n_total * 100 AS DOUBLE), 6)
             END AS ece
      FROM spine CROSS JOIN t LEFT JOIN s USING (bin) ORDER BY bin""",

    "qC7_judge_agreement" -> """
      WITH r AS (SELECT source, doc_id % 7 > 3 AS a, doc_id % 5 > 2 AS b
                 FROM documents),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_agree,
               CAST(SUM(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS a1,
               CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS b1
             FROM r GROUP BY 1),
      v AS (SELECT source, n, n_agree,
              CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE) AS po,
              CAST(a1 * b1 + (n - a1) * (n - b1) AS DOUBLE)
                / CAST(n * n AS DOUBLE) AS pe
            FROM st)
      SELECT source, n, n_agree,
             CASE WHEN n > 0 AND pe < 1.0
               THEN round((po - pe) / (1.0 - pe), 6) + 0
               ELSE 0.0 END AS kappa,
             (n > 0 AND pe < 1.0) AS defined
      FROM v ORDER BY source""",

    "qCK_kendall_tau" -> """
      WITH r AS (SELECT doc_id // 20 AS grp, doc_id AS i, doc_id % 7 AS x,
                   (doc_id * 3) % 11 AS y FROM documents),
      f AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_items
            FROM r GROUP BY 1),
      p AS (SELECT a.grp, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(SUM(CASE WHEN (a.x < b.x AND a.y < b.y)
                              OR (a.x > b.x AND a.y > b.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS c,
              CAST(SUM(CASE WHEN (a.x < b.x AND a.y > b.y)
                              OR (a.x > b.x AND a.y < b.y)
                       THEN 1 ELSE 0 END) AS BIGINT) AS d,
              CAST(SUM(CASE WHEN a.x = b.x AND a.y <> b.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS tx,
              CAST(SUM(CASE WHEN a.y = b.y AND a.x <> b.x
                       THEN 1 ELSE 0 END) AS BIGINT) AS ty,
              CAST(SUM(CASE WHEN a.x = b.x AND a.y = b.y
                       THEN 1 ELSE 0 END) AS BIGINT) AS txy
            FROM r a JOIN r b ON a.grp = b.grp AND a.i < b.i GROUP BY 1),
      j AS (SELECT f.grp, f.n_items, COALESCE(p.n_pairs, 0) AS n_pairs,
              COALESCE(p.c, 0) AS concordant,
              COALESCE(p.d, 0) AS discordant,
              COALESCE(p.tx, 0) AS n_tied_x,
              COALESCE(p.ty, 0) AS n_tied_y,
              COALESCE(p.txy, 0) AS n_tied_xy
            FROM f LEFT JOIN p USING (grp)),
      v AS (SELECT *, n_tied_x + n_tied_xy AS n1,
              n_tied_y + n_tied_xy AS n2 FROM j)
      SELECT grp, n_items, n_pairs, concordant, discordant, n_tied_x,
             n_tied_y, n_tied_xy,
             CASE WHEN n_pairs > n1 AND n_pairs > n2
               THEN round(CAST(concordant - discordant AS DOUBLE)
                          / (sqrt(CAST(n_pairs - n1 AS DOUBLE))
                             * sqrt(CAST(n_pairs - n2 AS DOUBLE))), 6) + 0
               ELSE 0.0 END AS tau_b,
             (n_pairs > n1 AND n_pairs > n2) AS defined
      FROM v ORDER BY grp""",

    "qCL_spearman_rho" -> """
      WITH r AS (SELECT doc_id // 50 AS grp, doc_id % 7 AS x,
                   (doc_id * 5) % 13 AS y FROM documents),
      rk AS (SELECT grp,
               2 * rank() OVER (PARTITION BY grp ORDER BY x)
                 + COUNT(*) OVER (PARTITION BY grp, x) - 1 AS rx,
               2 * rank() OVER (PARTITION BY grp ORDER BY y)
                 + COUNT(*) OVER (PARTITION BY grp, y) - 1 AS ry
             FROM r),
      st AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(rx) AS BIGINT) AS sx,
               CAST(SUM(ry) AS BIGINT) AS sy,
               CAST(SUM(rx * ry) AS BIGINT) AS sxy,
               CAST(SUM(rx * rx) AS BIGINT) AS sxx,
               CAST(SUM(ry * ry) AS BIGINT) AS syy
             FROM rk GROUP BY 1),
      v AS (SELECT grp, n,
              CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
              CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
              CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
            FROM st)
      SELECT grp, n,
             CASE WHEN n > 1 AND vx > 0 AND vy > 0
               THEN round(num / (sqrt(greatest(vx, 0.0))
                                 * sqrt(greatest(vy, 0.0))), 6) + 0
               ELSE 0.0 END AS rho,
             (n > 1 AND vx > 0 AND vy > 0) AS defined
      FROM v ORDER BY grp""",

    "qDC_mass_coverage" -> """
      WITH r AS (SELECT source AS g, n_chars AS w FROM documents),
      rk AS (SELECT g, w,
               CAST(row_number() OVER (PARTITION BY g ORDER BY w DESC)
                 AS BIGINT) AS rn,
               CAST(SUM(w) OVER (PARTITION BY g ORDER BY w DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cum,
               CAST(SUM(w) OVER (PARTITION BY g) AS BIGINT) AS tot
             FROM r),
      st AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(MAX(tot) AS BIGINT) AS total,
               MIN(CASE WHEN 100 * cum >= 50 * tot THEN rn END) AS k50,
               arg_min(cum, CASE WHEN 100 * cum >= 50 * tot THEN rn END)
                 AS c50,
               MIN(CASE WHEN 100 * cum >= 90 * tot THEN rn END) AS k90,
               arg_min(cum, CASE WHEN 100 * cum >= 90 * tot THEN rn END)
                 AS c90,
               MIN(CASE WHEN 100 * cum >= 99 * tot THEN rn END) AS k99,
               arg_min(cum, CASE WHEN 100 * cum >= 99 * tot THEN rn END)
                 AS c99
             FROM rk GROUP BY 1)
      SELECT g AS source, n, total,
             CASE WHEN total > 0 THEN k50 END AS k_50,
             CASE WHEN total > 0 THEN round(CAST(c50 AS DOUBLE)
                  / CAST(total AS DOUBLE), 6) ELSE 0.0 END AS share_50,
             CASE WHEN total > 0 THEN k90 END AS k_90,
             CASE WHEN total > 0 THEN round(CAST(c90 AS DOUBLE)
                  / CAST(total AS DOUBLE), 6) ELSE 0.0 END AS share_90,
             CASE WHEN total > 0 THEN k99 END AS k_99,
             CASE WHEN total > 0 THEN round(CAST(c99 AS DOUBLE)
                  / CAST(total AS DOUBLE), 6) ELSE 0.0 END AS share_99,
             total > 0 AS defined
      FROM st ORDER BY source""",

    "qDD_overlap_at_k" -> """
      WITH r AS (SELECT source AS g, doc_id AS i, doc_id % 97 AS a,
                   (doc_id * 7) % 97 AS b FROM documents),
      rk AS (SELECT g,
               row_number() OVER (PARTITION BY g ORDER BY a DESC, i)
                 <= 10 AS ta,
               row_number() OVER (PARTITION BY g ORDER BY b DESC, i)
                 <= 10 AS tb
             FROM r),
      st AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN ta AND tb THEN 1 ELSE 0 END)
                 AS BIGINT) AS overlap
             FROM rk GROUP BY 1)
      SELECT g AS source, n, CAST(10 AS INT) AS k,
             least(10, n) AS n_top, overlap,
             round(CAST(overlap AS DOUBLE)
                   / CAST(least(10, n) AS DOUBLE), 6) AS overlap_frac
      FROM st ORDER BY source""",

    "qDE_bh_fdr" -> """
      WITH r7 AS (SELECT source, doc_id % 7 > 3 AS w FROM documents),
      r5 AS (SELECT source, doc_id % 5 > 1 AS w FROM documents),
      st AS (SELECT 'm7' AS family, source AS test_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT)
                 AS wins,
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
                 AS losses
             FROM r7 GROUP BY 2
             UNION ALL
             SELECT 'm5', source, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
             FROM r5 GROUP BY 2),
      v AS (SELECT *, greatest(wins, losses) AS kmax FROM st),
      pv AS (SELECT family, test_id,
               CASE WHEN n > 0 THEN round(least(1.0, 2.0 *
                 list_reduce(list_transform(range(kmax, n + 1),
                   i -> pow(0.5, CAST(n AS DOUBLE)) * list_reduce(
                          list_transform(range(1, i + 1),
                            j -> (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)
                                  + CAST(j AS DOUBLE))
                                 / CAST(j AS DOUBLE)),
                          (a, b) -> a * b)),
                   (a, b) -> a + b)), 6) ELSE 0.0 END AS p
             FROM v),
      q AS (SELECT family, test_id, p,
              CAST(floor(p * 1000000000 + 0.5) AS BIGINT) AS pq
            FROM pv),
      wn AS (SELECT *, CAST(row_number() OVER (PARTITION BY family
               ORDER BY pq, test_id) AS BIGINT) AS rnk,
              CAST(COUNT(*) OVER (PARTITION BY family) AS BIGINT) AS m
             FROM q),
      ac AS (SELECT *, CASE WHEN pq * m * 100 <= 10 * rnk * 1000000000
               THEN rnk ELSE 0 END AS acc FROM wn),
      kc AS (SELECT *, MAX(acc) OVER (PARTITION BY family) AS k FROM ac)
      SELECT family, test_id, p, rnk AS rank, m, k, rnk <= k AS reject
      FROM kc ORDER BY family, test_id""",

    "qDF_bootstrap_ci" -> """
      WITH base AS (SELECT source AS g, doc_id AS id,
              CAST(doc_id % 101 AS BIGINT) - CAST(doc_id % 97 AS BIGINT)
                AS d
            FROM documents),
      sp AS (SELECT g, id, d, unnest(range(-1, 200)) AS r FROM base),
      uh AS (SELECT g, r, d, CAST(list_reduce(list_transform(
               regexp_extract_all(substring(md5(CAST(id AS VARCHAR)
                 || ' ' || CAST(r AS VARCHAR) || ' s0'), 1, 10), '.'),
               c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
               (a, b) -> a * 16 + b) AS BIGINT) AS u
             FROM sp),
      dr AS (SELECT g, r, d,
               CASE WHEN r = -1 THEN 1
                    WHEN u < 404487723187 THEN 0
                    WHEN u < 808975446375 THEN 1
                    WHEN u < 1011219307969 THEN 2
                    WHEN u < 1078633928500 THEN 3
                    WHEN u < 1095487583633 THEN 4
                    WHEN u < 1098858314660 THEN 5
                    WHEN u < 1099420103164 THEN 6
                    WHEN u < 1099500358665 THEN 7
                    ELSE 8 END AS w
             FROM uh),
      ag AS (SELECT g, r, CAST(SUM(w * d) AS BIGINT) AS num,
               CAST(SUM(w) AS BIGINT) AS den FROM dr GROUP BY 1, 2),
      es AS (SELECT g, den AS n, round(CAST(num AS DOUBLE)
               / CAST(den AS DOUBLE), 6) + 0 AS est
             FROM ag WHERE r = -1),
      rs AS (SELECT g, r,
               CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS s,
               CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE)
                 * 1000000000 + 0.5) AS BIGINT) AS sq
             FROM ag WHERE r >= 0 AND den > 0),
      rk AS (SELECT g, s,
               CAST(row_number() OVER (PARTITION BY g ORDER BY sq, r)
                 AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS beff
             FROM rs),
      ci AS (SELECT g, MAX(beff) AS b_eff,
               MIN(CASE WHEN rn = (beff * 5 + 199) // 200 THEN s END)
                 AS cl,
               MIN(CASE WHEN rn = beff + 1 - (beff * 5 + 199) // 200
                 THEN s END) AS ch
             FROM rk
             WHERE rn = (beff * 5 + 199) // 200
                OR rn = beff + 1 - (beff * 5 + 199) // 200
             GROUP BY 1)
      SELECT es.g AS source, es.n, CAST(200 AS BIGINT) AS b,
             COALESCE(ci.b_eff, 0) AS b_eff, es.est,
             round(ci.cl, 6) + 0 AS ci_lo, round(ci.ch, 6) + 0 AS ci_hi,
             ci.b_eff IS NOT NULL AS defined
      FROM es LEFT JOIN ci ON es.g = ci.g ORDER BY source""",

    "qDG_holm" -> """
      WITH r7 AS (SELECT source, doc_id % 7 > 3 AS w FROM documents),
      r5 AS (SELECT source, doc_id % 5 > 1 AS w FROM documents),
      st AS (SELECT 'm7' AS family, source AS test_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT)
                 AS wins,
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
                 AS losses
             FROM r7 GROUP BY 2
             UNION ALL
             SELECT 'm5', source, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
             FROM r5 GROUP BY 2),
      v AS (SELECT *, greatest(wins, losses) AS kmax FROM st),
      pv AS (SELECT family, test_id,
               CASE WHEN n > 0 THEN round(least(1.0, 2.0 *
                 list_reduce(list_transform(range(kmax, n + 1),
                   i -> pow(0.5, CAST(n AS DOUBLE)) * list_reduce(
                          list_transform(range(1, i + 1),
                            j -> (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)
                                  + CAST(j AS DOUBLE))
                                 / CAST(j AS DOUBLE)),
                          (a, b) -> a * b)),
                   (a, b) -> a + b)), 6) ELSE 0.0 END AS p
             FROM v),
      q AS (SELECT family, test_id, p,
              CAST(floor(p * 1000000000 + 0.5) AS BIGINT) AS pq
            FROM pv),
      wn AS (SELECT *, CAST(row_number() OVER (PARTITION BY family
               ORDER BY pq, test_id) AS BIGINT) AS rnk,
              CAST(COUNT(*) OVER (PARTITION BY family) AS BIGINT) AS m
             FROM q),
      ac AS (SELECT *, CASE WHEN pq * (m - rnk + 1) * 100
               > CAST(5000000000 AS BIGINT) THEN rnk END AS fl
             FROM wn),
      kc AS (SELECT *, COALESCE(MIN(fl) OVER (PARTITION BY family) - 1,
               m) AS k FROM ac)
      SELECT family, test_id, p, rnk AS rank, m, k, rnk <= k AS reject
      FROM kc ORDER BY family, test_id""",

    "qDH_permutation_test" -> """
      WITH base AS (SELECT source AS g, doc_id AS id,
              CAST(doc_id % 101 AS BIGINT) - CAST(doc_id % 97 AS BIGINT)
                AS d
            FROM documents),
      sp AS (SELECT g, id, d, unnest(range(-1, 200)) AS r FROM base),
      uh AS (SELECT g, r, d, CAST(list_reduce(list_transform(
               regexp_extract_all(substring(md5(CAST(id AS VARCHAR)
                 || ' ' || CAST(r AS VARCHAR) || ' s0'), 1, 10), '.'),
               c -> CAST(instr('0123456789abcdef', c) - 1 AS BIGINT)),
               (a, b) -> a * 16 + b) AS BIGINT) AS u
             FROM sp),
      sg AS (SELECT g, r, CASE WHEN r = -1 THEN d
               ELSE (1 - 2 * (u % 2)) * d END AS sd FROM uh),
      ag AS (SELECT g, r, CAST(SUM(sd) AS BIGINT) AS s,
               CAST(COUNT(*) AS BIGINT) AS n FROM sg GROUP BY 1, 2),
      ob AS (SELECT *, MAX(CASE WHEN r = -1 THEN s END)
               OVER (PARTITION BY g) AS obs FROM ag),
      fin AS (SELECT g, MAX(CASE WHEN r = -1 THEN n END) AS n,
                MAX(obs) AS sum_d,
                CAST(SUM(CASE WHEN r >= 0 AND abs(s) >= abs(obs)
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme
              FROM ob GROUP BY 1)
      SELECT g AS source, n, sum_d, n_extreme,
             round(CAST(n_extreme + 1 AS DOUBLE) / 201.0, 6) AS p_value,
             n > 0 AS defined
      FROM fin ORDER BY source""",

    "qDI_jackknife_ratio" -> """
      WITH base AS (SELECT source AS g, CAST(n_chars AS BIGINT) AS a,
              CAST(doc_id % 7 + 1 AS BIGINT) AS b FROM documents),
      w AS (SELECT g, a, b,
              CAST(SUM(a) OVER (PARTITION BY g) AS BIGINT) AS sa,
              CAST(SUM(b) OVER (PARTITION BY g) AS BIGINT) AS sb,
              CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
            FROM base),
      r AS (SELECT g, sa, sb, n,
              CASE WHEN sb - b = 0 THEN 0
                ELSE CAST(floor(CAST(sa - a AS DOUBLE)
                  / CAST(sb - b AS DOUBLE) * 1000000000 + 0.5)
                  AS BIGINT) END AS q,
              CASE WHEN sb - b = 0 THEN 0
                ELSE CAST(floor((CAST(sa - a AS DOUBLE)
                  / CAST(sb - b AS DOUBLE))
                  * (CAST(sa - a AS DOUBLE) / CAST(sb - b AS DOUBLE))
                  * 1000000000 + 0.5) AS BIGINT) END AS q2,
              CASE WHEN sb - b = 0 THEN 1 ELSE 0 END AS bad
            FROM w),
      st AS (SELECT g, MAX(n) AS n, MAX(sa) AS sum_num,
               MAX(sb) AS sum_den, CAST(SUM(q) AS BIGINT) AS sq,
               CAST(SUM(q2) AS BIGINT) AS sq2,
               CAST(SUM(bad) AS BIGINT) AS nbad
             FROM r GROUP BY 1)
      SELECT g AS source, n, sum_num, sum_den,
             CASE WHEN sum_den <> 0
               THEN round(CAST(sum_num AS DOUBLE)
                 / CAST(sum_den AS DOUBLE), 6) + 0
               ELSE 0.0 END AS ratio,
             CASE WHEN n > 1 AND sum_den <> 0 AND nbad = 0
               THEN round(sqrt(greatest(0.0,
                 (CAST(n AS DOUBLE) - 1.0) / CAST(n AS DOUBLE)
                 * (CAST(sq2 AS DOUBLE) / 1000000000.0
                    - CAST(n AS DOUBLE)
                      * (CAST(sq AS DOUBLE) / 1000000000.0
                         / CAST(n AS DOUBLE))
                      * (CAST(sq AS DOUBLE) / 1000000000.0
                         / CAST(n AS DOUBLE))))), 6)
               ELSE 0.0 END AS se_jack,
             n > 1 AND sum_den <> 0 AND nbad = 0 AS defined
      FROM st ORDER BY source""",

    "qDJ_anova" -> """
      WITH cells AS (SELECT lang AS fm, source AS g,
               CAST(COUNT(*) AS BIGINT) AS ng,
               CAST(SUM(n_chars) AS BIGINT) AS sg,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS qg
             FROM documents
             WHERE lang IS NOT NULL AND source IS NOT NULL
               AND n_chars IS NOT NULL
             GROUP BY 1, 2),
      t AS (SELECT fm, ng, sg, qg, (sg * sg) // ng AS ti,
              CAST(floor(CAST((sg * sg) % ng AS DOUBLE)
                / CAST(ng AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
                AS tf
            FROM cells),
      fam AS (SELECT fm, CAST(SUM(ng) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS k_groups,
                CAST(SUM(sg) AS BIGINT) AS s,
                CAST(SUM(qg) AS BIGINT) AS q,
                CAST(SUM(ti) AS BIGINT) AS tisum,
                CAST(SUM(tf) AS BIGINT) AS tfsum
              FROM t GROUP BY 1),
      fin AS (SELECT fm, n, k_groups,
                CAST(tisum AS DOUBLE)
                  + CAST(tfsum AS DOUBLE) / 1000000000.0 AS tt,
                CAST((s * s) // n AS DOUBLE)
                  + CAST(CAST(floor(CAST((s * s) % n AS DOUBLE)
                      / CAST(n AS DOUBLE) * 1000000000 + 0.5)
                      AS BIGINT) AS DOUBLE) / 1000000000.0 AS gg,
                CAST(q AS DOUBLE) AS qd
              FROM fam)
      SELECT fm AS lang, n, k_groups,
             round(tt - gg, 6) + 0 AS ss_between,
             round(qd - tt, 6) + 0 AS ss_within,
             CASE WHEN k_groups > 1 AND n > k_groups AND qd - tt > 0
               THEN round(((tt - gg) / CAST(k_groups - 1 AS DOUBLE))
                 / ((qd - tt) / CAST(n - k_groups AS DOUBLE)), 6) + 0
               ELSE 0.0 END AS f,
             k_groups > 1 AND n > k_groups AND qd - tt > 0 AS defined
      FROM fin ORDER BY lang""",

    "qDK_kruskal_wallis" -> """
      WITH base AS (SELECT lang AS fm, source AS g,
              CAST(n_chars AS BIGINT) AS x
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
              AND n_chars IS NOT NULL),
      w AS (SELECT fm, g, x,
              2 * CAST(rank() OVER (PARTITION BY fm ORDER BY x)
                AS BIGINT)
                + CAST(COUNT(*) OVER (PARTITION BY fm, x) AS BIGINT)
                - 1 AS r2,
              CAST(COUNT(*) OVER (PARTITION BY fm, x) AS BIGINT) AS t,
              CAST(COUNT(*) OVER (PARTITION BY fm) AS BIGINT) AS nn
            FROM base),
      cell AS (SELECT fm, g, CAST(SUM(r2) AS BIGINT) AS rg,
                CAST(COUNT(*) AS BIGINT) AS ng, MAX(nn) AS nn,
                CAST(SUM(t * t - 1) AS BIGINT) AS tie
              FROM w GROUP BY 1, 2),
      fam AS (SELECT fm, CAST(SUM(ng) AS BIGINT) AS n,
               CAST(COUNT(*) AS BIGINT) AS k_groups, MAX(nn) AS nn,
               CAST(SUM(CAST(floor(3.0 * CAST(rg AS DOUBLE)
                 * CAST(rg AS DOUBLE)
                 / (CAST(ng AS DOUBLE) * CAST(nn AS DOUBLE)
                    * CAST(nn + 1 AS DOUBLE))
                 * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS hqs,
               CAST(SUM(tie) AS BIGINT) AS ties
             FROM cell GROUP BY 1),
      fin AS (SELECT fm, n, k_groups,
               CAST(hqs AS DOUBLE) / 1000000000.0
                 - 3.0 * CAST(n + 1 AS DOUBLE) AS h,
               CASE WHEN n > 1 THEN 1.0 - CAST(ties AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                    * CAST(n AS DOUBLE) - CAST(n AS DOUBLE))
                 ELSE 0.0 END AS c
             FROM fam)
      SELECT fm AS lang, n, k_groups, round(h, 6) + 0 AS h,
             round(c, 6) + 0 AS tie_c,
             CASE WHEN k_groups > 1 AND n > 1 AND c > 0
               THEN round(h / c, 6) + 0 ELSE 0.0 END AS h_corrected,
             k_groups > 1 AND n > 1 AND c > 0 AS defined
      FROM fin ORDER BY lang""",

    "qDL_cochran_q" -> """
      WITH t AS (SELECT lang, doc_id, 'c1' AS treat,
               doc_id % 3 = 0 AS succ FROM documents
             UNION ALL SELECT lang, doc_id, 'c2', doc_id % 5 < 2
             FROM documents
             UNION ALL SELECT lang, doc_id, 'c3', doc_id % 7 < 3
             FROM documents),
      b AS (SELECT lang AS g, doc_id AS s, treat,
              CASE WHEN succ THEN 1 ELSE 0 END AS x
            FROM t WHERE lang IS NOT NULL),
      subj AS (SELECT g, s, CAST(SUM(x) AS BIGINT) AS li
               FROM b GROUP BY 1, 2),
      sa AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_subjects,
               CAST(SUM(li * li) AS BIGINT) AS l2 FROM subj GROUP BY 1),
      tr AS (SELECT g, treat, CAST(SUM(x) AS BIGINT) AS gj
             FROM b GROUP BY 1, 2),
      ta AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS k_treatments,
               CAST(SUM(gj) AS BIGINT) AS tt,
               CAST(SUM(gj * gj) AS BIGINT) AS g2 FROM tr GROUP BY 1)
      SELECT sa.g AS lang, n_subjects, k_treatments, tt AS t_success,
             CASE WHEN k_treatments > 1 AND k_treatments * tt - l2 > 0
               THEN round(CAST((k_treatments - 1)
                 * (k_treatments * g2 - tt * tt) AS DOUBLE)
                 / CAST(k_treatments * tt - l2 AS DOUBLE), 6)
               ELSE 0.0 END AS q,
             k_treatments > 1 AND k_treatments * tt - l2 > 0 AS defined
      FROM sa JOIN ta ON sa.g = ta.g ORDER BY lang""",

    "qDM_chao1_richness" -> """
      WITH tk AS (SELECT source AS g,
              unnest(regexp_extract_all(text, '\S+')) AS t
            FROM documents WHERE source IS NOT NULL),
      ct AS (SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c
             FROM tk GROUP BY 1, 2),
      st AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f1,
               CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                 AS f2
             FROM ct GROUP BY 1)
      SELECT g AS source, n_tokens, n_types, f1, f2,
             CASE WHEN n_tokens > 0 THEN round(CAST(n_types AS DOUBLE)
               + CAST(f1 * (f1 - 1) AS DOUBLE)
                 / CAST(2 * (f2 + 1) AS DOUBLE), 6)
               ELSE 0.0 END AS chao1,
             CASE WHEN n_tokens > 0 THEN round(CAST(f1 AS DOUBLE)
               / CAST(n_tokens AS DOUBLE), 6) ELSE 0.0 END
               AS unseen_mass,
             CASE WHEN n_tokens > 0 THEN round(1.0 - CAST(f1 AS DOUBLE)
               / CAST(n_tokens AS DOUBLE), 6) ELSE 0.0 END AS coverage,
             n_tokens > 0 AS defined
      FROM st ORDER BY source""",

    "qDN_zipf_slope" -> """
      WITH tk AS (SELECT unnest(regexp_extract_all(COALESCE(text, ''),
               '\S+')) AS t FROM documents),
      ct AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS c
             FROM tk GROUP BY 1),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_types FROM ct),
      hd AS (SELECT t, c FROM ct ORDER BY c DESC, t LIMIT 300),
      rk AS (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, t)
               AS BIGINT) AS r FROM hd),
      qq AS (SELECT CAST(floor(ln(CAST(r AS DOUBLE)) * 1000000000
                + 0.5) AS BIGINT) AS qx,
              CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000000 + 0.5)
                AS BIGINT) AS qy,
              CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(c AS DOUBLE))
                * 1000000000 + 0.5) AS BIGINT) AS qxy,
              CAST(floor(ln(CAST(r AS DOUBLE)) * ln(CAST(r AS DOUBLE))
                * 1000000000 + 0.5) AS BIGINT) AS qxx
             FROM rk),
      sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS r_used,
               CAST(SUM(qx) AS BIGINT) AS sx,
               CAST(SUM(qy) AS BIGINT) AS sy,
               CAST(SUM(qxy) AS BIGINT) AS sxy,
               CAST(SUM(qxx) AS BIGINT) AS sxx
             FROM qq),
      fin AS (SELECT n_types, r_used,
               CAST(r_used AS DOUBLE) AS rr,
               CAST(sx AS DOUBLE) / 1000000000.0 AS dx,
               CAST(sy AS DOUBLE) / 1000000000.0 AS dy,
               CAST(sxy AS DOUBLE) / 1000000000.0 AS dxy,
               CAST(sxx AS DOUBLE) / 1000000000.0 AS dxx
             FROM sm CROSS JOIN nt)
      SELECT n_types, r_used,
             CASE WHEN r_used > 1 AND rr * dxx - dx * dx > 0
               THEN round((rr * dxy - dx * dy)
                 / (rr * dxx - dx * dx), 6) + 0 ELSE 0.0 END AS slope,
             CASE WHEN r_used > 1 AND rr * dxx - dx * dx > 0
               THEN round((dy - (rr * dxy - dx * dy)
                 / (rr * dxx - dx * dx) * dx) / rr, 6) + 0
               ELSE 0.0 END AS intercept,
             r_used > 1 AND rr * dxx - dx * dx > 0 AS defined
      FROM fin""",

    "qDO_kaplan_meier" -> """
      WITH base AS (SELECT source AS g,
              CAST(doc_id % 50 + 1 AS BIGINT) AS t,
              CASE WHEN doc_id % 4 <> 0 THEN 1 ELSE 0 END AS e
            FROM documents),
      ct AS (SELECT g, t, CAST(SUM(e) AS BIGINT) AS d,
               CAST(SUM(1 - e) AS BIGINT) AS c FROM base GROUP BY 1, 2),
      rk AS (SELECT g, t, d, c,
               CAST(SUM(d + c) OVER (PARTITION BY g ORDER BY t DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n
             FROM ct),
      lnq AS (SELECT g, t, d, c, n,
               CASE WHEN d > 0 AND n > d
                 THEN CAST(floor(ln(CAST(n - d AS DOUBLE)
                   / CAST(n AS DOUBLE)) * 1000000000 + 0.5) AS BIGINT)
                 ELSE 0 END AS lq,
               CASE WHEN d > 0 AND n = d THEN 1 ELSE 0 END AS z,
               CASE WHEN d > 0
                 THEN CAST(floor(CAST(d AS DOUBLE) / CAST(n AS DOUBLE)
                   * 1000000000 + 0.5) AS BIGINT)
                 ELSE 0 END AS hq
             FROM rk),
      cm AS (SELECT g, t, d, c, n,
               CAST(SUM(lq) OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cl,
               CAST(SUM(z) OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS cz,
               CAST(SUM(hq) OVER (PARTITION BY g ORDER BY t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS ch
             FROM lnq)
      SELECT g AS source, t, n AS n_risk, d AS n_events,
             c AS n_censored,
             CASE WHEN cz > 0 THEN 0.0
               ELSE round(exp(CAST(cl AS DOUBLE) / 1000000000.0), 6)
               END AS survival,
             round(CAST(ch AS DOUBLE) / 1000000000.0, 6) AS cum_hazard
      FROM cm WHERE d > 0 ORDER BY source, t""",

    "qDY_capture_recapture" -> """
      WITH st AS (SELECT source,
               CAST(SUM(CASE WHEN doc_id % 7 < 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN doc_id % 5 < 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN doc_id % 7 < 2 AND doc_id % 5 < 2
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_both
             FROM documents WHERE source IS NOT NULL GROUP BY 1)
      SELECT source, n_a, n_b, n_both,
             CASE WHEN n_a > 0 AND n_b > 0
               THEN round(CAST(n_a + 1 AS DOUBLE)
                 * CAST(n_b + 1 AS DOUBLE)
                 / CAST(n_both + 1 AS DOUBLE) - 1.0, 6)
               ELSE 0.0 END AS n_hat,
             CASE WHEN n_a > 0 AND n_b > 0
               THEN round(sqrt(CAST(n_a + 1 AS DOUBLE)
                 * CAST(n_b + 1 AS DOUBLE)
                 * CAST(n_a - n_both AS DOUBLE)
                 * CAST(n_b - n_both AS DOUBLE)
                 / (CAST(n_both + 1 AS DOUBLE)
                    * CAST(n_both + 1 AS DOUBLE)
                    * (CAST(n_both + 1 AS DOUBLE) + 1.0))), 6)
               ELSE 0.0 END AS se,
             n_a > 0 AND n_b > 0 AS defined
      FROM st ORDER BY source""",

    "qDZ_newcombe_ci" -> """
      WITH st AS (SELECT lang,
               CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN doc_id % 2 = 0 AND doc_id % 3 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS wins_a,
               CAST(SUM(CASE WHEN doc_id % 2 <> 0 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b,
               CAST(SUM(CASE WHEN doc_id % 2 <> 0 AND doc_id % 3 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS wins_b
             FROM documents WHERE lang IS NOT NULL GROUP BY 1),
      w AS (SELECT *,
              CAST(wins_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p1,
              CAST(wins_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p2,
              CAST(n_a AS DOUBLE) AS na, CAST(n_b AS DOUBLE) AS nb
            FROM st),
      bnd AS (SELECT *,
               (p1 + 1.96 * 1.96 / (2.0 * na)
                 - 1.96 * sqrt(p1 * (1.0 - p1) / na
                   + 1.96 * 1.96 / (4.0 * na * na)))
                 / (1.0 + 1.96 * 1.96 / na) AS l1,
               (p1 + 1.96 * 1.96 / (2.0 * na)
                 + 1.96 * sqrt(p1 * (1.0 - p1) / na
                   + 1.96 * 1.96 / (4.0 * na * na)))
                 / (1.0 + 1.96 * 1.96 / na) AS u1,
               (p2 + 1.96 * 1.96 / (2.0 * nb)
                 - 1.96 * sqrt(p2 * (1.0 - p2) / nb
                   + 1.96 * 1.96 / (4.0 * nb * nb)))
                 / (1.0 + 1.96 * 1.96 / nb) AS l2,
               (p2 + 1.96 * 1.96 / (2.0 * nb)
                 + 1.96 * sqrt(p2 * (1.0 - p2) / nb
                   + 1.96 * 1.96 / (4.0 * nb * nb)))
                 / (1.0 + 1.96 * 1.96 / nb) AS u2
             FROM w)
      SELECT lang, n_a, n_b, wins_a, wins_b,
             CASE WHEN n_a > 0 AND n_b > 0
               THEN round(p1 - p2, 6) + 0 ELSE 0.0 END AS diff,
             CASE WHEN n_a > 0 AND n_b > 0
               THEN round(p1 - p2 - sqrt((p1 - l1) * (p1 - l1)
                 + (u2 - p2) * (u2 - p2)), 6) + 0
               ELSE 0.0 END AS ci_lo,
             CASE WHEN n_a > 0 AND n_b > 0
               THEN round(p1 - p2 + sqrt((u1 - p1) * (u1 - p1)
                 + (l2 - p2) * (l2 - p2)), 6) + 0
               ELSE 0.0 END AS ci_hi,
             n_a > 0 AND n_b > 0 AS defined
      FROM bnd ORDER BY lang""",

    "qDV_log_rank" -> """
      WITH base AS (SELECT lang AS g,
              CAST(doc_id % 50 + 1 AS BIGINT) AS t,
              CASE WHEN doc_id % 4 <> 0 THEN 1 ELSE 0 END AS e,
              CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS a
            FROM documents WHERE lang IS NOT NULL),
      ct AS (SELECT g, t, CAST(SUM(e) AS BIGINT) AS d,
               CAST(SUM(e * a) AS BIGINT) AS d1,
               CAST(COUNT(*) AS BIGINT) AS tot,
               CAST(SUM(a) AS BIGINT) AS tot1
             FROM base GROUP BY 1, 2),
      rk AS (SELECT *, CAST(SUM(tot) OVER (PARTITION BY g
               ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND
               CURRENT ROW) AS BIGINT) AS n,
              CAST(SUM(tot1) OVER (PARTITION BY g ORDER BY t DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS n1
             FROM ct),
      q AS (SELECT g, tot, tot1, d,
              CASE WHEN d > 0 THEN CAST(floor((CAST(d1 AS DOUBLE)
                - CAST(d AS DOUBLE)
                  * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)))
                * 1000000000 + 0.5) AS BIGINT) ELSE 0 END AS qoe,
              CASE WHEN d > 0 THEN CAST(floor((CASE WHEN n > 1
                THEN CAST(d AS DOUBLE)
                  * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE))
                ELSE 0.0 END) * 1000000000 + 0.5) AS BIGINT)
                ELSE 0 END AS qv
            FROM rk),
      st AS (SELECT g, CAST(SUM(tot) AS BIGINT) AS n,
               CAST(SUM(tot1) AS BIGINT) AS n_arm,
               CAST(SUM(d) AS BIGINT) AS n_events,
               CAST(SUM(qoe) AS BIGINT) AS soe,
               CAST(SUM(qv) AS BIGINT) AS sv
             FROM q GROUP BY 1)
      SELECT g AS lang, n, n_arm, n_events,
             round(CAST(soe AS DOUBLE) / 1000000000.0, 6) + 0
               AS o_minus_e,
             round(CAST(sv AS DOUBLE) / 1000000000.0, 6) AS var_sum,
             CASE WHEN sv > 0 THEN round(CAST(soe AS DOUBLE)
               / 1000000000.0 / sqrt(CAST(sv AS DOUBLE)
               / 1000000000.0), 6) + 0 ELSE 0.0 END AS z,
             CASE WHEN sv > 0 THEN round(CAST(soe AS DOUBLE)
               / 1000000000.0 / sqrt(CAST(sv AS DOUBLE) / 1000000000.0)
               * (CAST(soe AS DOUBLE) / 1000000000.0
                  / sqrt(CAST(sv AS DOUBLE) / 1000000000.0)), 6) + 0
               ELSE 0.0 END AS chi2,
             sv > 0 AS defined
      FROM st ORDER BY lang""",

    "qDW_mantel_haenszel" -> """
      WITH per AS (SELECT lang AS g, source AS st,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN doc_id % 2 = 0 AND doc_id % 3 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS a,
               CAST(SUM(CASE WHEN doc_id % 2 = 0 AND doc_id % 3 <> 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS b,
               CAST(SUM(CASE WHEN doc_id % 2 <> 0 AND doc_id % 3 = 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS c,
               CAST(SUM(CASE WHEN doc_id % 2 <> 0 AND doc_id % 3 <> 0
                 THEN 1 ELSE 0 END) AS BIGINT) AS dd
             FROM documents
             WHERE lang IS NOT NULL AND source IS NOT NULL
             GROUP BY 1, 2),
      q AS (SELECT g, n,
              CAST(floor(CAST(a AS DOUBLE) * CAST(dd AS DOUBLE)
                / CAST(n AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
                AS qn,
              CAST(floor(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                / CAST(n AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
                AS qd
            FROM per),
      st2 AS (SELECT g, CAST(SUM(n) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS n_strata,
                CAST(SUM(qn) AS BIGINT) AS sn,
                CAST(SUM(qd) AS BIGINT) AS sd FROM q GROUP BY 1)
      SELECT g AS lang, n, n_strata,
             CASE WHEN sd > 0 THEN round(CAST(sn AS DOUBLE)
               / CAST(sd AS DOUBLE), 6) ELSE 0.0 END AS or_mh,
             CASE WHEN sd > 0 AND sn > 0
               THEN round(ln(CAST(sn AS DOUBLE) / CAST(sd AS DOUBLE)),
                 6) + 0 ELSE 0.0 END AS ln_or,
             sd > 0 AS defined
      FROM st2 ORDER BY lang""",

    "qDX_cusum" -> """
      WITH base AS (SELECT source AS g, doc_id AS i,
              CAST(doc_id % 13 AS BIGINT) - 6 AS y FROM documents),
      c AS (SELECT g, i, CAST(SUM(y) OVER (PARTITION BY g ORDER BY i
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum FROM base),
      s AS (SELECT g, i, cum - least(0, CAST(MIN(cum) OVER (
              PARTITION BY g ORDER BY i ROWS BETWEEN UNBOUNDED
              PRECEDING AND CURRENT ROW) AS BIGINT)) AS sv FROM c)
      SELECT g AS source, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(MAX(sv) AS BIGINT) AS max_s,
             CAST(SUM(CASE WHEN sv > 50 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alarms,
             MIN(CASE WHEN sv > 50 THEN i END) AS first_alarm_seq,
             CAST(50 AS BIGINT) AS h,
             SUM(CASE WHEN sv > 50 THEN 1 ELSE 0 END) > 0 AS alarmed
      FROM s GROUP BY 1 ORDER BY source""",

    "qDT_burstiness" -> """
      WITH nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n
                  FROM documents WHERE doc_id IS NOT NULL),
      tk AS (SELECT doc_id,
              unnest(regexp_extract_all(COALESCE(text, ''), '\S+'))
                AS t
            FROM documents WHERE doc_id IS NOT NULL),
      pd AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS c
             FROM tk GROUP BY 1, 2),
      tm AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(SUM(c * c) AS BIGINT) AS c2
             FROM pd GROUP BY 1 HAVING COUNT(*) >= 2),
      j AS (SELECT tm.*, nd.n, (total * total) // n AS ti,
              CAST(floor(CAST((total * total) % n AS DOUBLE)
                / CAST(n AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
                AS tf
            FROM tm CROSS JOIN nd)
      SELECT t AS term, df, total,
             round(CAST(total AS DOUBLE) / CAST(n AS DOUBLE), 6)
               AS mean,
             CASE WHEN n > 1 AND total > 0
               THEN round(((CAST(c2 AS DOUBLE)
                 - (CAST(ti AS DOUBLE)
                    + CAST(tf AS DOUBLE) / 1000000000.0))
                 / CAST(n - 1 AS DOUBLE))
                 / (CAST(total AS DOUBLE) / CAST(n AS DOUBLE)), 6) + 0
               ELSE 0.0 END AS vmr,
             n > 1 AND total > 0 AS defined
      FROM j ORDER BY total DESC, term LIMIT 40""",

    "qDU_by_fdr" -> """
      WITH r7 AS (SELECT source, doc_id % 7 > 3 AS w FROM documents),
      r5 AS (SELECT source, doc_id % 5 > 1 AS w FROM documents),
      st AS (SELECT 'm7' AS family, source AS test_id,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT)
                 AS wins,
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
                 AS losses
             FROM r7 GROUP BY 2
             UNION ALL
             SELECT 'm5', source, CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
             FROM r5 GROUP BY 2),
      v AS (SELECT *, greatest(wins, losses) AS kmax FROM st),
      pv AS (SELECT family, test_id,
               CASE WHEN n > 0 THEN round(least(1.0, 2.0 *
                 list_reduce(list_transform(range(kmax, n + 1),
                   i -> pow(0.5, CAST(n AS DOUBLE)) * list_reduce(
                          list_transform(range(1, i + 1),
                            j -> (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)
                                  + CAST(j AS DOUBLE))
                                 / CAST(j AS DOUBLE)),
                          (a, b) -> a * b)),
                   (a, b) -> a + b)), 6) ELSE 0.0 END AS p
             FROM v),
      q AS (SELECT family, test_id, p,
              CAST(floor(p * 1000000000 + 0.5) AS BIGINT) AS pq
            FROM pv),
      wn AS (SELECT *, CAST(row_number() OVER (PARTITION BY family
               ORDER BY pq, test_id) AS BIGINT) AS rnk,
              CAST(COUNT(*) OVER (PARTITION BY family) AS BIGINT) AS m
             FROM q),
      hm AS (SELECT *, CAST(SUM(CAST(floor(1.0 / CAST(rnk AS DOUBLE)
               * 1000000000 + 0.5) AS BIGINT))
               OVER (PARTITION BY family) AS BIGINT) AS cmq
             FROM wn),
      ac AS (SELECT *, CASE WHEN CAST(pq * m * 100 AS DOUBLE)
               * (CAST(cmq AS DOUBLE) / 1000000000.0)
               <= CAST(10 * rnk AS DOUBLE) * 1000000000.0
               THEN rnk ELSE 0 END AS acc FROM hm),
      kc AS (SELECT *, MAX(acc) OVER (PARTITION BY family) AS k
             FROM ac)
      SELECT family, test_id, p, rnk AS rank, m,
             round(CAST(cmq AS DOUBLE) / 1000000000.0, 6) AS c_m,
             k, rnk <= k AS reject
      FROM kc ORDER BY family, test_id""",

    "qDR_brown_forsythe" -> """
      WITH clean AS (SELECT lang AS fm, source AS g,
              CAST(n_chars AS BIGINT) AS x
            FROM documents
            WHERE lang IS NOT NULL AND source IS NOT NULL
              AND n_chars IS NOT NULL),
      rk AS (SELECT fm, g, x,
              CAST(row_number() OVER (PARTITION BY fm, g ORDER BY x)
                AS BIGINT) AS rn,
              CAST(COUNT(*) OVER (PARTITION BY fm, g) AS BIGINT) AS n
            FROM clean),
      med AS (SELECT fm, g,
               CAST(SUM(CASE WHEN rn = (n + 1) // 2 THEN x ELSE 0 END
                 + CASE WHEN rn = (n + 2) // 2 THEN x ELSE 0 END)
                 AS BIGINT) AS m2
              FROM rk GROUP BY 1, 2),
      dev AS (SELECT clean.fm, clean.g,
               abs(2 * clean.x - med.m2) AS z
              FROM clean JOIN med ON clean.fm = med.fm
                AND clean.g = med.g),
      cells AS (SELECT fm, g, CAST(COUNT(*) AS BIGINT) AS ng,
                 CAST(SUM(z) AS BIGINT) AS sg,
                 CAST(SUM(z * z) AS BIGINT) AS qg
               FROM dev GROUP BY 1, 2),
      t AS (SELECT fm, ng, sg, qg, (sg * sg) // ng AS ti,
              CAST(floor(CAST((sg * sg) % ng AS DOUBLE)
                / CAST(ng AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
                AS tf
            FROM cells),
      fam AS (SELECT fm, CAST(SUM(ng) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS k_groups,
                CAST(SUM(sg) AS BIGINT) AS s,
                CAST(SUM(qg) AS BIGINT) AS q,
                CAST(SUM(ti) AS BIGINT) AS tisum,
                CAST(SUM(tf) AS BIGINT) AS tfsum
              FROM t GROUP BY 1),
      fin AS (SELECT fm, n, k_groups,
               CAST(tisum AS DOUBLE)
                 + CAST(tfsum AS DOUBLE) / 1000000000.0 AS tt,
               CAST((s * s) // n AS DOUBLE)
                 + CAST(CAST(floor(CAST((s * s) % n AS DOUBLE)
                     / CAST(n AS DOUBLE) * 1000000000 + 0.5)
                     AS BIGINT) AS DOUBLE) / 1000000000.0 AS gg,
               CAST(q AS DOUBLE) AS qd
             FROM fam)
      SELECT fm AS lang, n, k_groups,
             round(tt - gg, 6) + 0 AS ss_between,
             round(qd - tt, 6) + 0 AS ss_within,
             CASE WHEN k_groups > 1 AND n > k_groups AND qd - tt > 0
               THEN round(((tt - gg) / CAST(k_groups - 1 AS DOUBLE))
                 / ((qd - tt) / CAST(n - k_groups AS DOUBLE)), 6) + 0
               ELSE 0.0 END AS f,
             k_groups > 1 AND n > k_groups AND qd - tt > 0 AS defined
      FROM fin ORDER BY lang""",

    "qDS_friedman" -> """
      WITH t0 AS (SELECT lang, doc_id, 'a' AS treat,
               CAST((doc_id * 3) % 11 AS BIGINT) AS x FROM documents
             UNION ALL SELECT lang, doc_id, 'b',
               CAST((doc_id * 5) % 11 AS BIGINT) FROM documents
             UNION ALL SELECT lang, doc_id, 'c',
               CAST((doc_id * 7) % 11 AS BIGINT) FROM documents),
      cells AS (SELECT lang AS b, doc_id AS s, treat,
                 CAST(MAX(x) AS BIGINT) AS x
               FROM t0 WHERE lang IS NOT NULL GROUP BY 1, 2, 3),
      kf AS (SELECT b, CAST(COUNT(DISTINCT treat) AS BIGINT) AS k
             FROM cells GROUP BY 1),
      wk AS (SELECT cells.b, cells.s, cells.treat, cells.x, kf.k,
               CAST(COUNT(*) OVER (PARTITION BY cells.b, cells.s)
                 AS BIGINT) AS ns
             FROM cells JOIN kf USING (b)),
      inc AS (SELECT b, CAST(COUNT(DISTINCT s) AS BIGINT) AS ninc
              FROM wk WHERE ns <> k GROUP BY 1),
      comp AS (SELECT * FROM wk WHERE ns = k),
      rkd AS (SELECT b, treat, k,
               2 * CAST(rank() OVER (PARTITION BY b, s ORDER BY x)
                 AS BIGINT)
                 + CAST(COUNT(*) OVER (PARTITION BY b, s, x) AS BIGINT)
                 - 1 AS r2,
               CAST(COUNT(*) OVER (PARTITION BY b, s, x) AS BIGINT)
                 AS tt
             FROM comp),
      pt AS (SELECT b, treat, CAST(SUM(r2) AS BIGINT) AS rj,
               CAST(COUNT(*) AS BIGINT) AS n, MAX(k) AS k,
               CAST(SUM(tt * tt - 1) AS BIGINT) AS ties
             FROM rkd GROUP BY 1, 2),
      fm AS (SELECT b, MAX(n) AS n_subjects, MAX(k) AS k,
               CAST(SUM(CAST(floor(3.0 * CAST(rj AS DOUBLE)
                 * CAST(rj AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(k AS DOUBLE)
                    * CAST(k + 1 AS DOUBLE))
                 * 1000000000 + 0.5) AS BIGINT)) AS BIGINT) AS tqs,
               CAST(SUM(ties) AS BIGINT) AS tiesum
             FROM pt GROUP BY 1),
      fin AS (SELECT b, n_subjects, k,
               CAST(tqs AS DOUBLE) / 1000000000.0
                 - 3.0 * CAST(n_subjects AS DOUBLE)
                   * CAST(k + 1 AS DOUBLE) AS chi2,
               CASE WHEN n_subjects * k > 0
                 THEN 1.0 - CAST(tiesum AS DOUBLE)
                   / (CAST(n_subjects AS DOUBLE) * CAST(k AS DOUBLE)
                      * (CAST(k AS DOUBLE) * CAST(k AS DOUBLE) - 1.0))
                 ELSE 0.0 END AS c
             FROM fm)
      SELECT COALESCE(fin.b, inc.b) AS lang,
             COALESCE(n_subjects, 0) AS n_subjects,
             COALESCE(k, 0) AS k_treatments,
             COALESCE(inc.ninc, 0) AS n_incomplete,
             COALESCE(round(chi2, 6) + 0, 0.0) AS chi2_f,
             COALESCE(round(c, 6) + 0, 0.0) AS tie_c,
             COALESCE(CASE WHEN k > 1 AND n_subjects > 1 AND c > 0
               THEN round(chi2 / c, 6) + 0 ELSE 0.0 END, 0.0)
               AS chi2_corrected,
             COALESCE(CASE WHEN k > 1 AND n_subjects > 1 AND c > 0
               THEN round(chi2 / (CAST(n_subjects AS DOUBLE)
                 * CAST(k - 1 AS DOUBLE)), 6) + 0 ELSE 0.0 END, 0.0)
               AS kendall_w,
             COALESCE(k > 1 AND n_subjects > 1 AND c > 0, FALSE)
               AS defined
      FROM fin FULL OUTER JOIN inc ON fin.b = inc.b ORDER BY lang""",

    "qDQ_wilcoxon" -> """
      WITH base AS (SELECT source AS g,
              CAST(doc_id % 101 AS BIGINT) - CAST(doc_id % 97 AS BIGINT)
                AS d
            FROM documents),
      zc AS (SELECT g, CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_zero FROM base GROUP BY 1),
      nz AS (SELECT g, d, abs(d) AS ad FROM base WHERE d <> 0),
      w AS (SELECT g, d,
              2 * CAST(rank() OVER (PARTITION BY g ORDER BY ad)
                AS BIGINT)
                + CAST(COUNT(*) OVER (PARTITION BY g, ad) AS BIGINT)
                - 1 AS r2,
              CAST(COUNT(*) OVER (PARTITION BY g, ad) AS BIGINT) AS t
            FROM nz),
      st AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS nn,
               CAST(SUM(CASE WHEN d > 0 THEN r2 ELSE 0 END) AS BIGINT)
                 AS w2p,
               CAST(SUM(t * t - 1) AS BIGINT) AS ties
             FROM w GROUP BY 1)
      SELECT zc.g AS source, COALESCE(st.nn, 0) AS n_nonzero,
             zc.n_zero, COALESCE(st.w2p, 0) AS w2_plus,
             CASE WHEN st.nn > 0 AND 2 * st.nn * (st.nn + 1)
                 * (2 * st.nn + 1) - st.ties > 0
               THEN round((CAST(2 * st.w2p - st.nn * (st.nn + 1)
                 AS DOUBLE) / 4.0)
                 / sqrt(CAST(2 * st.nn * (st.nn + 1) * (2 * st.nn + 1)
                   - st.ties AS DOUBLE) / 48.0), 6) + 0
               ELSE 0.0 END AS z,
             COALESCE(st.nn > 0 AND 2 * st.nn * (st.nn + 1)
               * (2 * st.nn + 1) - st.ties > 0, FALSE) AS defined
      FROM zc LEFT JOIN st ON zc.g = st.g ORDER BY source""",

    "qDP_kn_cross_entropy" -> """
      WITH tr AS (SELECT regexp_extract_all(text, '\S+') AS t
                  FROM documents WHERE doc_id % 2 = 0),
      trb AS (SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i])) AS w1,
              unnest(list_transform(range(1, len(t)),
                i -> t[i + 1])) AS w2
              FROM tr WHERE len(t) >= 2),
      c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM trb GROUP BY 1, 2),
      ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                CAST(COUNT(*) AS BIGINT) AS n1f FROM c GROUP BY 1),
      cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
               FROM c GROUP BY 1),
      ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM c),
      ho0 AS (SELECT regexp_extract_all(text, '\S+') AS t
              FROM documents WHERE doc_id % 2 = 1),
      hob AS (SELECT unnest(list_transform(range(1, len(t)),
                i -> t[i])) AS w1,
              unnest(list_transform(range(1, len(t)),
                i -> t[i + 1])) AS w2
              FROM ho0 WHERE len(t) >= 2),
      ho AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS hc
             FROM hob GROUP BY 1, 2),
      j AS (SELECT ho.w1, ho.w2, ho.hc, c.c12, ctx.c1, ctx.n1f,
              cont.n1b, ty.nt
            FROM ho LEFT JOIN c USING (w1, w2)
            LEFT JOIN ctx USING (w1) LEFT JOIN cont USING (w2)
            CROSS JOIN ty),
      sc AS (SELECT hc,
              CASE WHEN c1 IS NOT NULL AND n1b IS NOT NULL THEN hc
                ELSE 0 END AS hcov,
              CASE WHEN c1 IS NOT NULL AND n1b IS NOT NULL
                THEN hc * CAST(floor(ln(
                  greatest(CAST(COALESCE(c12, 0) AS DOUBLE) - 0.75,
                    0.0) / CAST(c1 AS DOUBLE)
                  + (0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE))
                    * (CAST(n1b AS DOUBLE) / CAST(nt AS DOUBLE)))
                  * 1000000000 + 0.5) AS BIGINT)
                ELSE 0 END AS num,
              nt FROM j),
      ag AS (SELECT MAX(nt) AS n_train_types,
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
      FROM ag""",

    "qDA_cramers_v" -> """
      WITH r AS (SELECT doc_id % 4 AS g, source AS a,
                   CAST(doc_id % 5 AS VARCHAR) AS b FROM documents),
      cells AS (SELECT g, a, b, CAST(COUNT(*) AS BIGINT) AS nab
                FROM r GROUP BY 1, 2, 3),
      ma AS (SELECT g, a, CAST(SUM(nab) AS BIGINT) AS na
             FROM cells GROUP BY 1, 2),
      mb AS (SELECT g, b, CAST(SUM(nab) AS BIGINT) AS nb
             FROM cells GROUP BY 1, 2),
      st AS (SELECT cells.g, CAST(SUM(nab) AS BIGINT) AS n,
               CAST(SUM(CAST(floor(CAST(nab AS DOUBLE)
                    * CAST(nab AS DOUBLE)
                    / CAST(na * nb AS DOUBLE) * 1000000000 + 0.5)
                 AS BIGINT)) AS BIGINT) AS sq
             FROM cells JOIN ma USING (g, a) JOIN mb USING (g, b)
             GROUP BY 1),
      dims AS (SELECT ra.g, ra.n_rows, rb.n_cols
               FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_rows
                     FROM ma GROUP BY 1) ra
               JOIN (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_cols
                     FROM mb GROUP BY 1) rb USING (g)),
      v AS (SELECT st.g, st.n, dims.n_rows, dims.n_cols,
              CAST(sq AS DOUBLE) / 1000000000.0 - 1.0 AS phi2,
              least(dims.n_rows, dims.n_cols) AS md
            FROM st JOIN dims USING (g))
      SELECT g AS shard, n, n_rows, n_cols,
             CASE WHEN n > 0 AND md > 1
               THEN round(CAST(n AS DOUBLE) * phi2, 6) + 0
               ELSE 0.0 END AS chi2,
             CASE WHEN n > 0 AND md > 1
               THEN round(sqrt(greatest(phi2, 0.0)
                          / CAST(md - 1 AS DOUBLE)), 6) + 0
               ELSE 0.0 END AS cramers_v,
             n > 0 AND md > 1 AS defined
      FROM v ORDER BY shard""",

    "qDB_vocab_churn" -> """
      WITH tk AS (SELECT doc_id % 2 = 1 AS inb,
                    unnest(regexp_extract_all(text, '\S+')) AS t
                  FROM documents),
      pt AS (SELECT t,
               CAST(SUM(CASE WHEN NOT inb THEN 1 ELSE 0 END) AS BIGINT)
                 AS ca,
               CAST(SUM(CASE WHEN inb THEN 1 ELSE 0 END) AS BIGINT)
                 AS cb
             FROM tk GROUP BY 1),
      a AS (SELECT COALESCE(CAST(SUM(CASE WHEN ca > 0 THEN 1 ELSE 0 END)
              AS BIGINT), 0) AS n_types_a,
              COALESCE(CAST(SUM(CASE WHEN cb > 0 THEN 1 ELSE 0 END)
                AS BIGINT), 0) AS n_types_b,
              COALESCE(CAST(SUM(CASE WHEN ca > 0 AND cb > 0 THEN 1
                ELSE 0 END) AS BIGINT), 0) AS n_shared
            FROM pt)
      SELECT n_types_a, n_types_b, n_shared,
             CASE WHEN n_types_a > 0 AND n_types_b > 0
               THEN round(CAST(n_shared AS DOUBLE)
                    / CAST(n_types_a + n_types_b - n_shared AS DOUBLE), 6)
               ELSE 0.0 END AS jaccard,
             CASE WHEN n_types_a > 0 AND n_types_b > 0
               THEN round(CAST(n_types_b - n_shared AS DOUBLE)
                    / CAST(n_types_b AS DOUBLE), 6)
               ELSE 0.0 END AS new_type_rate,
             n_types_a > 0 AND n_types_b > 0 AS defined
      FROM a""",

    "qD7_psi" -> """
      WITH r AS (SELECT source AS g, doc_id % 2 = 1 AS inb,
                   doc_id % 101 AS s FROM documents),
      pb AS (SELECT g, CAST(least(floor(s * 10 / 100), 9) AS INT) AS b,
               CAST(SUM(CASE WHEN NOT inb THEN 1 ELSE 0 END) AS BIGINT)
                 AS ca,
               CAST(SUM(CASE WHEN inb THEN 1 ELSE 0 END) AS BIGINT)
                 AS cb
             FROM r GROUP BY 1, 2),
      tot AS (SELECT g, CAST(SUM(ca) AS BIGINT) AS ta,
                CAST(SUM(cb) AS BIGINT) AS tb FROM pb GROUP BY 1),
      sp AS (SELECT CAST(range AS INT) AS bin FROM range(0, 10)),
      dense AS (SELECT tot.g, sp.bin, tot.ta, tot.tb,
                  COALESCE(pb.ca, 0) AS na, COALESCE(pb.cb, 0) AS nb
                FROM tot CROSS JOIN sp
                LEFT JOIN pb ON pb.g = tot.g AND pb.b = sp.bin),
      tq AS (SELECT *, CAST(floor(
               (CAST(na + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE)
                - CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE))
               * ln((CAST(na + 1 AS DOUBLE) / CAST(ta + 10 AS DOUBLE))
                    / (CAST(nb + 1 AS DOUBLE) / CAST(tb + 10 AS DOUBLE)))
               * 1000000000 + 0.5) AS BIGINT) AS q
             FROM dense)
      SELECT g AS source, bin, na AS n_a, nb AS n_b,
             CASE WHEN ta > 0 AND tb > 0
               THEN round(CAST(q AS DOUBLE) / 1000000000.0, 6)
               ELSE 0.0 END AS term,
             CASE WHEN ta > 0 AND tb > 0
               THEN round(CAST(SUM(q) OVER (PARTITION BY g) AS DOUBLE)
                          / 1000000000.0, 6)
               ELSE 0.0 END AS psi,
             ta > 0 AND tb > 0 AS defined
      FROM tq ORDER BY source, bin""",

    "qD8_lexical_diversity" -> """
      WITH tk AS (SELECT source AS g,
                    unnest(regexp_extract_all(text, '\S+')) AS t
                  FROM documents WHERE source IS NOT NULL),
      pt AS (SELECT g, t, CAST(COUNT(*) AS BIGINT) AS c
             FROM tk GROUP BY 1, 2),
      st AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_types,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_hapax
             FROM pt GROUP BY 1)
      SELECT g AS source, n_tokens, n_types, n_hapax,
             round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
               AS ttr,
             CASE WHEN n_tokens > 1
               THEN round(ln(CAST(n_types AS DOUBLE))
                          / ln(CAST(n_tokens AS DOUBLE)), 6)
               ELSE 0.0 END AS herdan_c,
             round(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
               AS hapax_share,
             n_tokens > 1 AS defined
      FROM st ORDER BY source""",

    "qD9_dup_gram_rate" -> """
      WITH tk AS (SELECT regexp_extract_all(COALESCE(text, ''), '\S+')
                    AS t FROM documents),
      g3 AS (SELECT unnest(list_transform(range(1, len(t) - 1),
               i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])) AS g
             FROM tk WHERE len(t) >= 3),
      c AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS c FROM g3 GROUP BY 1),
      a AS (SELECT COALESCE(CAST(SUM(c) AS BIGINT), 0) AS n_occurrences,
              CAST(COUNT(*) AS BIGINT) AS n_types,
              COALESCE(CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                AS BIGINT), 0) AS n_dup_types,
              COALESCE(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
                AS BIGINT), 0) AS n_dup_occurrences
            FROM c)
      SELECT n_occurrences, n_types, n_dup_types, n_dup_occurrences,
             CASE WHEN n_occurrences > 0
               THEN round(CAST(n_dup_occurrences AS DOUBLE)
                          / CAST(n_occurrences AS DOUBLE), 6)
               ELSE 0.0 END AS dup_rate,
             n_occurrences > 0 AS defined
      FROM a""",

    "qD4_effect_size" -> """
      WITH r AS (SELECT source, doc_id % 2 = 1 AS b, doc_id % 97 AS x
                 FROM documents),
      st AS (SELECT source,
               CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                 AS na,
               CAST(SUM(CASE WHEN NOT b THEN x ELSE 0 END) AS BIGINT)
                 AS sa,
               CAST(SUM(CASE WHEN NOT b THEN x * x ELSE 0 END) AS BIGINT)
                 AS saa,
               CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS nb,
               CAST(SUM(CASE WHEN b THEN x ELSE 0 END) AS BIGINT) AS sb,
               CAST(SUM(CASE WHEN b THEN x * x ELSE 0 END) AS BIGINT)
                 AS sbb
             FROM r GROUP BY 1),
      v AS (SELECT *, na * saa - sa * sa AS va, nb * sbb - sb * sb AS vb
            FROM st),
      w AS (SELECT *,
              (na > 1 AND nb > 1 AND va * nb + vb * na > 0) AS def,
              CAST(sa AS DOUBLE) / CAST(na AS DOUBLE) AS ma,
              CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE) AS mb,
              (CAST(va AS DOUBLE) / CAST(na AS DOUBLE)
               + CAST(vb AS DOUBLE) / CAST(nb AS DOUBLE))
              / CAST(na + nb - 2 AS DOUBLE) AS pooled
            FROM v)
      SELECT source, na AS n_a, nb AS n_b,
             CASE WHEN na > 0 THEN round(ma, 6) ELSE 0.0 END AS mean_a,
             CASE WHEN nb > 0 THEN round(mb, 6) ELSE 0.0 END AS mean_b,
             CASE WHEN def THEN round((ma - mb) / sqrt(pooled), 6) + 0
               ELSE 0.0 END AS cohen_d,
             CASE WHEN def THEN round((ma - mb) / sqrt(pooled)
                  * (1.0 - 3.0 / CAST(4 * (na + nb) - 9 AS DOUBLE)), 6)
                  + 0
               ELSE 0.0 END AS hedges_g,
             def AS defined
      FROM w ORDER BY source""",

    "qD5_ks_test" -> """
      WITH r AS (SELECT source AS g, doc_id % 2 = 1 AS b, doc_id % 97 AS x
                 FROM documents),
      pv AS (SELECT g, x,
               CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT)
                 AS ca,
               CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS cb
             FROM r GROUP BY 1, 2),
      cm AS (SELECT g,
               SUM(ca) OVER (PARTITION BY g ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cuma,
               SUM(cb) OVER (PARTITION BY g ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS cumb,
               SUM(ca) OVER (PARTITION BY g) AS na,
               SUM(cb) OVER (PARTITION BY g) AS nb
             FROM pv),
      st AS (SELECT g, CAST(MAX(na) AS BIGINT) AS na,
               CAST(MAX(nb) AS BIGINT) AS nb,
               CAST(MAX(abs(cuma * nb - cumb * na)) AS BIGINT) AS dnum
             FROM cm GROUP BY 1)
      SELECT g AS source, na AS n_a, nb AS n_b,
             CASE WHEN na > 0 AND nb > 0 THEN dnum ELSE 0 END AS d_num,
             CASE WHEN na > 0 AND nb > 0
               THEN round(CAST(dnum AS DOUBLE)
                          / CAST(na * nb AS DOUBLE), 6)
               ELSE 0.0 END AS ks_d,
             na > 0 AND nb > 0 AS defined
      FROM st ORDER BY source""",

    "qD6_gini" -> """
      WITH r AS (SELECT source AS g, n_chars AS w FROM documents),
      rk AS (SELECT g, w,
               CAST(row_number() OVER (PARTITION BY g ORDER BY w)
                 AS BIGINT) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
             FROM r),
      st AS (SELECT g, CAST(MAX(n) AS BIGINT) AS n,
               CAST(SUM(w) AS BIGINT) AS total,
               CAST(SUM((2 * rn - n - 1) * w) AS BIGINT) AS num
             FROM rk GROUP BY 1)
      SELECT g AS source, n, total,
             CASE WHEN total > 0
               THEN round(CAST(num AS DOUBLE)
                          / CAST(n * total AS DOUBLE), 6)
               ELSE 0.0 END AS gini,
             total > 0 AS defined
      FROM st ORDER BY source""",

    "qD2_trimmed_mean" -> """
      WITH r AS (SELECT source AS g, doc_id % 997 AS s FROM documents),
      rk AS (SELECT g, s,
               row_number() OVER (PARTITION BY g ORDER BY s) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
             FROM r),
      v AS (SELECT *, (n * 10) // 100 AS k FROM rk),
      st AS (SELECT g, CAST(MAX(n) AS BIGINT) AS n,
               CAST(MAX(k) AS BIGINT) AS k,
               CAST(SUM(s) AS BIGINT) AS alls,
               CAST(SUM(CASE WHEN rn > k AND rn <= n - k THEN s ELSE 0
                 END) AS BIGINT) AS sm,
               CAST(SUM(CASE WHEN rn > k AND rn <= n - k THEN 1 ELSE 0
                 END) AS BIGINT) AS cnt,
               MIN(CASE WHEN rn > k AND rn <= n - k THEN s END) AS lo,
               MAX(CASE WHEN rn > k AND rn <= n - k THEN s END) AS hi
             FROM v GROUP BY 1)
      SELECT g AS source, n, k,
             round(CAST(alls AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean,
             CASE WHEN cnt > 0 THEN round(CAST(sm AS DOUBLE)
                  / CAST(cnt AS DOUBLE), 6) ELSE 0.0 END AS trimmed_mean,
             CASE WHEN cnt > 0 THEN round(CAST(sm + k * lo + k * hi
                  AS DOUBLE) / CAST(n AS DOUBLE), 6) ELSE 0.0 END
               AS winsorized_mean,
             cnt > 0 AS defined
      FROM st ORDER BY source""",

    "qD3_median_mad" -> """
      WITH r AS (SELECT source AS g, doc_id % 997 AS s FROM documents),
      rk AS (SELECT g, s,
               row_number() OVER (PARTITION BY g ORDER BY s) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
             FROM r),
      med AS (SELECT g, CAST(MAX(n) AS BIGINT) AS n,
                CAST(SUM((CASE WHEN rn = (n + 1) // 2 THEN s ELSE 0 END)
                     + (CASE WHEN rn = (n + 2) // 2 THEN s ELSE 0 END))
                  AS BIGINT) AS m2
              FROM rk GROUP BY 1),
      dv AS (SELECT r.g, abs(2 * r.s - med.m2) AS d
             FROM r JOIN med USING (g)),
      dk AS (SELECT g, d,
               row_number() OVER (PARTITION BY g ORDER BY d) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
             FROM dv),
      mad AS (SELECT g,
                CAST(SUM((CASE WHEN rn = (n + 1) // 2 THEN d ELSE 0 END)
                     + (CASE WHEN rn = (n + 2) // 2 THEN d ELSE 0 END))
                  AS BIGINT) AS m4
              FROM dk GROUP BY 1)
      SELECT med.g AS source, med.n,
             round(CAST(med.m2 AS DOUBLE) / 2.0, 6) AS median,
             round(CAST(mad.m4 AS DOUBLE) / 4.0, 6) AS mad
      FROM med JOIN mad USING (g) ORDER BY source""",

    "qCZ_rank_auc" -> """
      WITH r AS (SELECT source AS g, doc_id % 97 AS s, doc_id % 3 = 0 AS y
                 FROM documents),
      rk AS (SELECT g, y, 2 * rank() OVER (PARTITION BY g ORDER BY s)
               + COUNT(*) OVER (PARTITION BY g, s) - 1 AS r2 FROM r),
      st AS (SELECT g,
               CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS np,
               CAST(SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
                 AS nn,
               CAST(SUM(CASE WHEN y THEN r2 ELSE 0 END) AS BIGINT) AS rp
             FROM rk GROUP BY 1),
      v AS (SELECT *, rp - np * (np + 1) AS u2 FROM st)
      SELECT g AS source, np AS n_pos, nn AS n_neg,
             CASE WHEN np > 0 AND nn > 0 THEN u2 ELSE 0 END AS u2,
             CASE WHEN np > 0 AND nn > 0
               THEN round(CAST(u2 AS DOUBLE)
                          / CAST(2 * np * nn AS DOUBLE), 6)
               ELSE 0.0 END AS auc,
             np > 0 AND nn > 0 AS defined
      FROM v ORDER BY source""",

    "qD0_classifier_report" -> """
      WITH r AS (SELECT source, doc_id % 7 > 3 AS p, doc_id % 3 = 0 AS t
                 FROM documents),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN p AND t THEN 1 ELSE 0 END) AS BIGINT)
                 AS tp,
               CAST(SUM(CASE WHEN p AND NOT t THEN 1 ELSE 0 END)
                 AS BIGINT) AS fp,
               CAST(SUM(CASE WHEN NOT p AND t THEN 1 ELSE 0 END)
                 AS BIGINT) AS fn,
               CAST(SUM(CASE WHEN NOT p AND NOT t THEN 1 ELSE 0 END)
                 AS BIGINT) AS tn
             FROM r GROUP BY 1)
      SELECT source, n, tp, fp, fn, tn,
        CASE WHEN n > 0 THEN round(CAST(tp + tn AS DOUBLE)
             / CAST(n AS DOUBLE), 6) ELSE 0.0 END AS accuracy,
        CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE)
             / CAST(tp + fp AS DOUBLE), 6) ELSE 0.0 END AS precision,
        CASE WHEN tp + fn > 0 THEN round(CAST(tp AS DOUBLE)
             / CAST(tp + fn AS DOUBLE), 6) ELSE 0.0 END AS recall,
        CASE WHEN 2 * tp + fp + fn > 0 THEN round(CAST(2 * tp AS DOUBLE)
             / CAST(2 * tp + fp + fn AS DOUBLE), 6) ELSE 0.0 END AS f1,
        CASE WHEN tp + fn > 0 AND tn + fp > 0
          THEN round((CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE)
                      + CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE))
                     / 2.0, 6)
          ELSE 0.0 END AS balanced_accuracy,
        CASE WHEN tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0
              AND tn + fn > 0
          THEN round(CAST(tp * tn - fp * fn AS DOUBLE)
               / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                      * CAST(tn + fp AS DOUBLE)
                      * CAST(tn + fn AS DOUBLE)), 6) + 0
          ELSE 0.0 END AS mcc,
        tp + fp > 0 AND tp + fn > 0 AND tn + fp > 0 AND tn + fn > 0
          AS defined_mcc
      FROM st ORDER BY source""",

    "qD1_threshold_sweep" -> """
      WITH r AS (SELECT lang AS g, doc_id % 101 AS s, doc_id % 3 = 0 AS y
                 FROM documents),
      ps AS (SELECT g, s,
               CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pss,
               CAST(SUM(CASE WHEN NOT y THEN 1 ELSE 0 END) AS BIGINT)
                 AS nss
             FROM r GROUP BY 1, 2),
      tot AS (SELECT g, CAST(SUM(pss) AS BIGINT) AS tpos,
                CAST(SUM(nss) AS BIGINT) AS tneg FROM ps GROUP BY 1),
      sp AS (SELECT CAST(range AS BIGINT) AS threshold FROM range(0, 101)),
      cum AS (SELECT tot.g, sp.threshold, tot.tpos, tot.tneg,
                COALESCE(CAST(SUM(ps.pss) AS BIGINT), 0) AS tp,
                COALESCE(CAST(SUM(ps.nss) AS BIGINT), 0) AS fp
              FROM tot CROSS JOIN sp
              LEFT JOIN ps ON ps.g = tot.g AND ps.s >= sp.threshold
              GROUP BY 1, 2, 3, 4)
      SELECT g AS lang, threshold, tp, fp, tpos - tp AS fn,
             tneg - fp AS tn,
             CASE WHEN tp + fp > 0 THEN round(CAST(tp AS DOUBLE)
                  / CAST(tp + fp AS DOUBLE), 6) ELSE 0.0 END AS precision,
             CASE WHEN tpos > 0 THEN round(CAST(tp AS DOUBLE)
                  / CAST(tpos AS DOUBLE), 6) ELSE 0.0 END AS recall,
             tp + fp > 0 AS defined
      FROM cum ORDER BY lang, threshold""",

    "qCX_sign_test" -> """
      WITH r AS (SELECT source, doc_id % 7 > 3 AS w FROM documents),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT)
                 AS wins,
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
                 AS losses
             FROM r GROUP BY 1),
      v AS (SELECT *, greatest(wins, losses) AS k FROM st),
      p AS (SELECT *, list_reduce(list_transform(range(k, n + 1),
              i -> pow(0.5, CAST(n AS DOUBLE)) * list_reduce(
                     list_transform(range(1, i + 1),
                       j -> (CAST(n AS DOUBLE) - CAST(i AS DOUBLE)
                             + CAST(j AS DOUBLE)) / CAST(j AS DOUBLE)),
                     (a, b) -> a * b)),
              (a, b) -> a + b) AS tail
            FROM v)
      SELECT source, n, wins, losses,
             CASE WHEN n > 0 THEN round(least(1.0, 2.0 * tail), 6)
               ELSE 0.0 END AS p_two,
             n > 0 AS defined
      FROM p ORDER BY source""",

    "qCY_stratified_winrate" -> """
      WITH r AS (SELECT source, least(n_chars // 500, 3) AS stratum,
                   doc_id % 7 > 3 AS w FROM documents),
      per AS (SELECT source, stratum, CAST(COUNT(*) AS BIGINT) AS ns,
                CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT) AS ws
              FROM r GROUP BY 1, 2),
      q AS (SELECT source, ns, ws,
              CAST(floor(CAST(ws AS DOUBLE) / CAST(ns AS DOUBLE)
                   * 1000000000 + 0.5) AS BIGINT) AS rq
            FROM per)
      SELECT source, CAST(SUM(ns) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_strata,
             round(CAST(SUM(ws) AS DOUBLE) / CAST(SUM(ns) AS DOUBLE), 6)
               AS raw_rate,
             round(CAST(SUM(rq) AS DOUBLE) / 1000000000.0
                   / CAST(COUNT(*) AS DOUBLE), 6) AS stratified_rate
      FROM q GROUP BY 1 ORDER BY source""",

    "qCU_kneser_ney" -> """
      WITH tk AS (SELECT regexp_extract_all(text, '\S+') AS t
                  FROM documents),
      bg AS (SELECT unnest(list_transform(range(1, len(t)),
               i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)),
               i -> t[i + 1])) AS w2
             FROM tk WHERE len(t) >= 2),
      c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY 1, 2),
      ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1,
                CAST(COUNT(*) AS BIGINT) AS n1f FROM c GROUP BY 1),
      cont AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b
               FROM c GROUP BY 1),
      ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM c),
      s AS (SELECT c.w1, c.w2, c.c12, ctx.c1, ctx.n1f, cont.n1b, ty.nt
            FROM c JOIN ctx USING (w1) JOIN cont USING (w2)
            CROSS JOIN ty)
      SELECT w1, w2, c12, c1, n1f, n1b, nt AS n_types,
             round(greatest(CAST(c12 AS DOUBLE) - 0.75, 0.0)
                     / CAST(c1 AS DOUBLE)
                   + (0.75 * CAST(n1f AS DOUBLE) / CAST(c1 AS DOUBLE))
                     * (CAST(n1b AS DOUBLE) / CAST(nt AS DOUBLE)), 6)
               AS p_kn
      FROM s ORDER BY c12 DESC, w1, w2 LIMIT 50""",

    "qCV_sprt_monitor" -> """
      WITH r AS (SELECT source, doc_id % 7 > 3 AS w FROM documents),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT)
                 AS wins,
               CAST(SUM(CASE WHEN NOT w THEN 1 ELSE 0 END) AS BIGINT)
                 AS losses
             FROM r GROUP BY 1),
      v AS (SELECT *, CAST(wins AS DOUBLE) * ln(60.0 / 50.0)
              + CAST(losses AS DOUBLE) * ln(40.0 / 50.0) AS llr
            FROM st)
      SELECT source, n, wins, losses, round(llr, 6) + 0 AS llr,
             CASE WHEN llr >= ln(95.0 / 5.0) THEN 'accept_h1'
                  WHEN llr <= ln(5.0 / 95.0) THEN 'accept_h0'
                  ELSE 'continue' END AS decision
      FROM v ORDER BY source""",

    "qCW_cluster_agreement" -> """
      WITH a AS (SELECT CAST(doc_id % 8 AS VARCHAR) AS c, source AS l
                 FROM documents),
      cells AS (SELECT c, l, CAST(COUNT(*) AS BIGINT) AS ncl
                FROM a GROUP BY 1, 2),
      bc AS (SELECT c, CAST(SUM(ncl) AS BIGINT) AS nc,
               CAST(MAX(ncl) AS BIGINT) AS mx FROM cells GROUP BY 1),
      bl AS (SELECT l, CAST(SUM(ncl) AS BIGINT) AS nl
             FROM cells GROUP BY 1),
      tot AS (SELECT COALESCE(CAST(SUM(nc) AS BIGINT), 0) AS n,
                COALESCE(CAST(SUM(mx) AS BIGINT), 0) AS pur,
                CAST(COUNT(*) AS BIGINT) AS n_clusters FROM bc),
      mi AS (SELECT COALESCE(CAST(SUM(CAST(floor(
               CAST(ncl AS DOUBLE) / CAST(n AS DOUBLE)
               * ln(CAST(n AS DOUBLE) * CAST(ncl AS DOUBLE)
                    / (CAST(nc AS DOUBLE) * CAST(nl AS DOUBLE)))
               * 1000000000 + 0.5) AS BIGINT)) AS BIGINT), 0) AS miq
             FROM cells JOIN bc USING (c) JOIN bl USING (l)
             CROSS JOIN tot),
      hc AS (SELECT COALESCE(CAST(SUM(CAST(floor(
               -1.0 * (CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(nc AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000 + 0.5) AS BIGINT)) AS BIGINT), 0) AS hcq
             FROM bc CROSS JOIN tot),
      hl AS (SELECT COALESCE(CAST(SUM(CAST(floor(
               -1.0 * (CAST(nl AS DOUBLE) / CAST(n AS DOUBLE))
               * ln(CAST(nl AS DOUBLE) / CAST(n AS DOUBLE))
               * 1000000000 + 0.5) AS BIGINT)) AS BIGINT), 0) AS hlq
             FROM bl CROSS JOIN tot),
      lc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_labels FROM bl)
      SELECT tot.n, tot.n_clusters, lc.n_labels,
             CASE WHEN tot.n > 0 THEN round(CAST(tot.pur AS DOUBLE)
                  / CAST(tot.n AS DOUBLE), 6) ELSE 0.0 END AS purity,
             CASE WHEN tot.n > 0 THEN round(CAST(miq AS DOUBLE)
                  / 1000000000.0, 6) + 0 ELSE 0.0 END AS mi_nats,
             CASE WHEN tot.n > 0 AND hcq > 0 AND hlq > 0
               THEN round((CAST(miq AS DOUBLE) / 1000000000.0)
                    / sqrt((CAST(hcq AS DOUBLE) / 1000000000.0)
                           * (CAST(hlq AS DOUBLE) / 1000000000.0)), 6) + 0
               ELSE 0.0 END AS nmi,
             tot.n > 0 AND hcq > 0 AND hlq > 0 AS defined
      FROM mi CROSS JOIN tot CROSS JOIN hc CROSS JOIN hl CROSS JOIN lc""",

    "qCS_brier_decomposition" -> """
      WITH r AS (SELECT doc_id % 101 AS pct, doc_id % 3 = 0 AS y
                 FROM documents),
      st AS (SELECT CAST(least(floor(pct * 10 / 100), 9) AS INT) AS b,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS sy,
               CAST(SUM(pct) AS BIGINT) AS sp,
               CAST(SUM((pct - 100 * (CASE WHEN y THEN 1 ELSE 0 END))
                    * (pct - 100 * (CASE WHEN y THEN 1 ELSE 0 END)))
                 AS BIGINT) AS sq
             FROM r GROUP BY 1),
      tot AS (SELECT COALESCE(CAST(SUM(n) AS BIGINT), 0) AS tn,
                COALESCE(CAST(SUM(sy) AS BIGINT), 0) AS tsy,
                COALESCE(CAST(SUM(sq) AS BIGINT), 0) AS tsq FROM st),
      terms AS (SELECT
          CAST(floor(CAST(sp - 100 * sy AS DOUBLE)
               * CAST(sp - 100 * sy AS DOUBLE)
               / CAST(n AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS relq,
          CAST(floor(CAST(tn * sy - tsy * n AS DOUBLE)
               * CAST(tn * sy - tsy * n AS DOUBLE)
               / CAST(n AS DOUBLE) * 1000000000 + 0.5) AS BIGINT) AS resq
        FROM st CROSS JOIN tot),
      ta AS (SELECT COALESCE(CAST(SUM(relq) AS BIGINT), 0) AS rel,
               COALESCE(CAST(SUM(resq) AS BIGINT), 0) AS res FROM terms)
      SELECT tn AS n,
        CASE WHEN tn > 0 THEN round(CAST(tsq AS DOUBLE)
             / (10000.0 * CAST(tn AS DOUBLE)), 6) ELSE 0.0 END AS brier,
        CASE WHEN tn > 0 THEN round(CAST(rel AS DOUBLE) / 1000000000.0
             / 10000.0 / CAST(tn AS DOUBLE), 6) ELSE 0.0 END
          AS reliability,
        CASE WHEN tn > 0 THEN round(CAST(res AS DOUBLE) / 1000000000.0
             / CAST(tn AS DOUBLE) / CAST(tn AS DOUBLE)
             / CAST(tn AS DOUBLE), 6) ELSE 0.0 END AS resolution,
        CASE WHEN tn > 0 THEN round(CAST(tsy * (tn - tsy) AS DOUBLE)
             / (CAST(tn AS DOUBLE) * CAST(tn AS DOUBLE)), 6)
          ELSE 0.0 END AS uncertainty,
        tn > 0 AS defined
      FROM ta CROSS JOIN tot""",

    "qCT_collocations" -> """
      WITH tk AS (SELECT regexp_extract_all(text, '\S+') AS t
                  FROM documents),
      bg AS (SELECT unnest(list_transform(range(1, len(t)),
               i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)),
               i -> t[i + 1])) AS w2
             FROM tk WHERE len(t) >= 2),
      c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
            FROM bg GROUP BY 1, 2),
      m1 AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM c GROUP BY 1),
      m2 AS (SELECT w2, CAST(SUM(c12) AS BIGINT) AS c2 FROM c GROUP BY 1),
      nn AS (SELECT COALESCE(CAST(SUM(c12) AS BIGINT), 0) AS n FROM c),
      s AS (SELECT c.w1, c.w2, c.c12, m1.c1, m2.c2, nn.n
            FROM c JOIN m1 USING (w1) JOIN m2 USING (w2) CROSS JOIN nn
            WHERE c.c12 >= 2),
      g AS (SELECT *,
              2.0 * ((CASE WHEN c12 > 0
                  THEN CAST(c12 AS DOUBLE) * ln(CAST(c12 AS DOUBLE)
                       * CAST(n AS DOUBLE)
                       / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                  ELSE 0.0 END)
                + (CASE WHEN c1 - c12 > 0
                  THEN CAST(c1 - c12 AS DOUBLE) * ln(CAST(c1 - c12 AS DOUBLE)
                       * CAST(n AS DOUBLE)
                       / (CAST(c1 AS DOUBLE) * CAST(n - c2 AS DOUBLE)))
                  ELSE 0.0 END)
                + (CASE WHEN c2 - c12 > 0
                  THEN CAST(c2 - c12 AS DOUBLE) * ln(CAST(c2 - c12 AS DOUBLE)
                       * CAST(n AS DOUBLE)
                       / (CAST(n - c1 AS DOUBLE) * CAST(c2 AS DOUBLE)))
                  ELSE 0.0 END)
                + (CASE WHEN n - c1 - c2 + c12 > 0
                  THEN CAST(n - c1 - c2 + c12 AS DOUBLE)
                       * ln(CAST(n - c1 - c2 + c12 AS DOUBLE)
                            * CAST(n AS DOUBLE)
                            / (CAST(n - c1 AS DOUBLE)
                               * CAST(n - c2 AS DOUBLE)))
                  ELSE 0.0 END)) AS g2raw
            FROM s)
      SELECT w1, w2, c12, c1, c2, n AS n_bigrams,
             round(g2raw, 6) + 0 AS g2
      FROM g
      ORDER BY CAST(floor(g2raw) AS BIGINT) DESC,
               CAST(floor((g2raw - floor(g2raw)) * 1000000000 + 0.5)
                 AS BIGINT) DESC, w1, w2
      LIMIT 30""",

    "qCN_chi2_terms" -> """
      WITH base AS (SELECT lang AS l, text FROM documents
                    WHERE lang IS NOT NULL),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM base),
      lab AS (SELECT l, CAST(COUNT(*) AS BIGINT) AS nl
              FROM base GROUP BY 1),
      dt AS (SELECT l, unnest(list_distinct(
               regexp_extract_all(text, '\S+'))) AS t FROM base),
      pt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM dt
             GROUP BY 1 HAVING COUNT(*) >= 2),
      cl AS (SELECT t, l, CAST(COUNT(*) AS BIGINT) AS ntl
             FROM dt GROUP BY 1, 2),
      cand AS (SELECT pt.t, lab.l, pt.df, lab.nl,
                 COALESCE(cl.ntl, 0) AS ntl
               FROM pt CROSS JOIN lab
               LEFT JOIN cl ON cl.t = pt.t AND cl.l = lab.l),
      cells AS (SELECT l, t, ntl AS n11, df - ntl AS n01,
                  nl - ntl AS n10, nt - df - nl + ntl AS n00, nt
                FROM cand CROSS JOIN nn),
      sc AS (SELECT l, t, n11, n01, n10, n00,
               (n11 + n01 > 0 AND n11 + n10 > 0 AND n10 + n00 > 0
                AND n01 + n00 > 0) AS defined,
               CASE WHEN n11 + n01 > 0 AND n11 + n10 > 0
                     AND n10 + n00 > 0 AND n01 + n00 > 0
                 THEN (CAST(nt AS DOUBLE)
                       * CAST(n11 * n00 - n01 * n10 AS DOUBLE)
                       * CAST(n11 * n00 - n01 * n10 AS DOUBLE))
                      / (CAST(n11 + n01 AS DOUBLE)
                         * CAST(n11 + n10 AS DOUBLE)
                         * CAST(n10 + n00 AS DOUBLE)
                         * CAST(n01 + n00 AS DOUBLE))
                 ELSE 0.0 END AS chi2
             FROM cells),
      rk AS (SELECT *, row_number() OVER (PARTITION BY l
               ORDER BY CAST(floor(chi2) AS BIGINT) DESC,
                 CAST(floor((chi2 - floor(chi2)) * 1000000000 + 0.5)
                   AS BIGINT) DESC, t) AS rank
             FROM sc)
      SELECT l AS lang, t AS term, n11, n01, n10, n00,
             round(chi2, 6) AS chi2, rank, defined
      FROM rk WHERE rank <= 10 ORDER BY lang, rank""",

    "qCP_rouge_n" -> """
      WITH ev AS (SELECT doc_id // 2 AS pair_id, text AS cand
                  FROM documents WHERE doc_id % 2 = 0),
      od AS (SELECT doc_id // 2 AS pair_id, text AS ref
             FROM documents WHERE doc_id % 2 = 1),
      pr AS (SELECT ev.pair_id, cand, ref FROM ev JOIN od USING (pair_id)),
      g AS (SELECT pair_id, unnest(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1])) AS gr, 1 AS cc, 0 AS rc
            FROM (SELECT pair_id,
                    regexp_extract_all(COALESCE(cand, ''), '\S+') AS t
                  FROM pr) WHERE len(t) >= 2
            UNION ALL
            SELECT pair_id, unnest(list_transform(range(1, len(t)),
              i -> t[i] || ' ' || t[i + 1])), 0, 1
            FROM (SELECT pair_id,
                    regexp_extract_all(COALESCE(ref, ''), '\S+') AS t
                  FROM pr) WHERE len(t) >= 2),
      cnt AS (SELECT pair_id, gr, CAST(SUM(cc) AS BIGINT) AS cc,
                CAST(SUM(rc) AS BIGINT) AS rc FROM g GROUP BY 1, 2),
      st AS (SELECT pair_id, CAST(SUM(least(cc, rc)) AS BIGINT) AS m,
               CAST(SUM(cc) AS BIGINT) AS tc,
               CAST(SUM(rc) AS BIGINT) AS tr FROM cnt GROUP BY 1)
      SELECT p.pair_id, COALESCE(st.tc, 0) AS n_cand_grams,
             COALESCE(st.tr, 0) AS n_ref_grams,
             COALESCE(st.m, 0) AS n_matches,
             CASE WHEN COALESCE(st.tc, 0) > 0 AND COALESCE(st.tr, 0) > 0
               THEN round(CAST(st.m AS DOUBLE) / CAST(st.tc AS DOUBLE), 6)
               ELSE 0.0 END AS rouge_p,
             CASE WHEN COALESCE(st.tc, 0) > 0 AND COALESCE(st.tr, 0) > 0
               THEN round(CAST(st.m AS DOUBLE) / CAST(st.tr AS DOUBLE), 6)
               ELSE 0.0 END AS rouge_r,
             CASE WHEN COALESCE(st.tc, 0) > 0 AND COALESCE(st.tr, 0) > 0
               THEN round(2.0 * CAST(st.m AS DOUBLE)
                          / CAST(st.tc + st.tr AS DOUBLE), 6)
               ELSE 0.0 END AS rouge_f1,
             COALESCE(st.tc, 0) > 0 AND COALESCE(st.tr, 0) > 0 AS defined
      FROM (SELECT DISTINCT pair_id FROM pr) p
      LEFT JOIN st USING (pair_id) ORDER BY pair_id""",

    "qCQ_js_divergence" -> """
      WITH tok AS (SELECT doc_id % 2 = 1 AS b,
                     unnest(regexp_extract_all(text, '\S+')) AS t
                   FROM documents),
      c AS (SELECT t,
              CAST(SUM(CASE WHEN NOT b THEN 1 ELSE 0 END) AS BIGINT) AS a,
              CAST(SUM(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS bc
            FROM tok GROUP BY 1),
      tot AS (SELECT COALESCE(CAST(SUM(a) AS BIGINT), 0) AS ta,
                COALESCE(CAST(SUM(bc) AS BIGINT), 0) AS tb FROM c),
      pq AS (SELECT a, bc, CAST(a AS DOUBLE) / CAST(ta AS DOUBLE) AS pd,
               CAST(bc AS DOUBLE) / CAST(tb AS DOUBLE) AS qd
             FROM c CROSS JOIN tot),
      term AS (SELECT CAST(floor(
                 ((CASE WHEN a > 0
                     THEN 0.5 * pd * ln(2.0 * pd / (pd + qd))
                     ELSE 0.0 END)
                  + (CASE WHEN bc > 0
                       THEN 0.5 * qd * ln(2.0 * qd / (pd + qd))
                       ELSE 0.0 END)) * 1000000000 + 0.5) AS BIGINT)
                 AS tq
               FROM pq),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vocab,
                COALESCE(CAST(SUM(tq) AS BIGINT), 0) AS s FROM term)
      SELECT agg.n_vocab, tot.ta AS total_a, tot.tb AS total_b,
             CASE WHEN tot.ta > 0 AND tot.tb > 0
               THEN round(CAST(s AS DOUBLE) / 1000000000.0
                          / 0.6931471805599453, 6) + 0
               ELSE 0.0 END AS js_bits,
             tot.ta > 0 AND tot.tb > 0 AS defined
      FROM agg CROSS JOIN tot""",

    "qCM_cartography" -> """
      WITH e AS (SELECT doc_id, (doc_id * (e + 1)) % 101 AS p,
                   (doc_id + e) % 3 = 0 AS c
                 FROM documents, (SELECT unnest([0, 1, 2]) AS e)),
      st AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_epochs,
               CAST(SUM(p) AS BIGINT) AS sp,
               CAST(SUM(p * p) AS BIGINT) AS spp,
               CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS sc
             FROM e GROUP BY 1),
      v AS (SELECT *, n_epochs * spp - sp * sp AS vq FROM st)
      SELECT doc_id, n_epochs,
             round(CAST(sp AS DOUBLE)
                   / (100.0 * CAST(n_epochs AS DOUBLE)), 6) AS confidence,
             round(sqrt(CAST(vq AS DOUBLE))
                   / (100.0 * CAST(n_epochs AS DOUBLE)), 6) AS variability,
             round(CAST(sc AS DOUBLE) / CAST(n_epochs AS DOUBLE), 6)
               AS correctness,
             CASE WHEN vq >= 625 * n_epochs * n_epochs THEN 'ambiguous'
                  WHEN 2 * sp > 100 * n_epochs THEN 'easy_to_learn'
                  ELSE 'hard_to_learn' END AS region
      FROM v ORDER BY doc_id""",

    "qCO_conformal_quantile" -> """
      WITH r AS (SELECT source AS g, doc_id % 997 AS s, doc_id AS i
                 FROM documents),
      rk AS (SELECT g, s,
               row_number() OVER (PARTITION BY g ORDER BY s, i) AS rn,
               CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
             FROM r),
      v AS (SELECT *, ((n + 1) * 90 + 99) // 100 AS k FROM rk)
      SELECT g AS source, n, k,
             CASE WHEN k <= n THEN s END AS qhat,
             k <= n AS defined
      FROM v WHERE rn = least(k, n) ORDER BY source""",

    "qCR_mcnemar" -> """
      WITH r AS (SELECT source, doc_id % 7 > 3 AS a, doc_id % 5 > 2 AS b,
                   doc_id % 3 = 0 AS t FROM documents),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = t AND b = t THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_both_right,
               CAST(SUM(CASE WHEN a = t AND b <> t THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_a_only,
               CAST(SUM(CASE WHEN a <> t AND b = t THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_b_only,
               CAST(SUM(CASE WHEN a <> t AND b <> t THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_both_wrong
             FROM r GROUP BY 1)
      SELECT source, n, n_both_right, n_a_only, n_b_only, n_both_wrong,
             CASE WHEN n_a_only + n_b_only > 0
               THEN round(CAST(greatest(abs(n_a_only - n_b_only) - 1, 0)
                               * greatest(abs(n_a_only - n_b_only) - 1, 0)
                            AS DOUBLE)
                          / CAST(n_a_only + n_b_only AS DOUBLE), 6)
               ELSE 0.0 END AS mcnemar,
             (n_a_only + n_b_only > 0) AS defined
      FROM st ORDER BY source""",

    "qC4_score_length_corr" -> """
      WITH r AS (SELECT source, doc_id % 7 AS x,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS y
                 FROM documents
                 WHERE doc_id % 7 IS NOT NULL AND text IS NOT NULL),
      st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx,
               CAST(SUM(y * y) AS BIGINT) AS syy
             FROM r GROUP BY 1),
      v AS (SELECT source, n,
              CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
              CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vx,
              CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vy
            FROM st)
      SELECT source, n,
             CASE WHEN n > 1 AND vx > 0 AND vy > 0
               THEN round(num / (sqrt(greatest(vx, 0.0))
                                 * sqrt(greatest(vy, 0.0))), 6) + 0
               ELSE 0.0 END AS r,
             (n > 1 AND vx > 0 AND vy > 0) AS defined
      FROM v ORDER BY source""",

    "qC5_winrate_matrix" -> """
      WITH r AS (SELECT doc_id // 4 AS p, source AS pl, doc_id % 7 AS s
                 FROM documents)
      SELECT a.pl AS player_a, b.pl AS player_b,
             CAST(COUNT(*) AS BIGINT) AS n_comparisons,
             CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_wins_a,
             CAST(SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS BIGINT)
               AS n_ties,
             round((CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END)
                      AS DOUBLE)
                    + 0.5 * CAST(SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END)
                        AS DOUBLE))
                   / CAST(COUNT(*) AS DOUBLE), 6) AS win_rate_a
      FROM r a JOIN r b ON a.p = b.p AND a.pl < b.pl
      GROUP BY 1, 2 ORDER BY player_a, player_b""",

    "qCA_bradley_terry" -> btOracleSql(10),

    "qCJ_power_iteration" -> powerIterOracleSql(20),

    "qCD_winrate_wilson" -> """
      WITH r AS (SELECT doc_id // 4 AS p, source AS pl, doc_id % 7 AS s
                 FROM documents),
      m AS (SELECT a.pl AS player_a, b.pl AS player_b,
              CAST(COUNT(*) AS BIGINT) AS n_comparisons,
              CAST(SUM(CASE WHEN a.s > b.s THEN 1 ELSE 0 END) AS BIGINT)
                AS n_wins_a,
              CAST(SUM(CASE WHEN a.s = b.s THEN 1 ELSE 0 END) AS BIGINT)
                AS n_ties
            FROM r a JOIN r b ON a.p = b.p AND a.pl < b.pl GROUP BY 1, 2),
      v AS (SELECT *, CAST(n_comparisons AS DOUBLE) AS nd,
              CAST(n_wins_a * 2 + n_ties AS DOUBLE)
                / CAST(n_comparisons * 2 AS DOUBLE) AS ph,
              1.96 * 1.96 AS z2
            FROM m),
      w AS (SELECT *, ph + z2 / (2.0 * nd) AS center,
              1.96 * sqrt(ph * (1.0 - ph) / nd + z2 / (4.0 * nd * nd))
                AS margin,
              1.0 + z2 / nd AS den
            FROM v)
      SELECT player_a, player_b, n_comparisons, n_wins_a, n_ties,
             round((CAST(n_wins_a AS DOUBLE)
                    + 0.5 * CAST(n_ties AS DOUBLE))
                   / CAST(n_comparisons AS DOUBLE), 6) AS win_rate_a,
             round((center - margin) / den, 6) + 0 AS ci_lo,
             round((center + margin) / den, 6) AS ci_hi
      FROM w ORDER BY player_a, player_b""",

    "qCC_embedding_diversity" -> """
      WITH q AS (SELECT vec_id // 4 AS p, vec_id AS id,
               list_transform(CAST(embedding AS DOUBLE[]),
                 x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS qv
             FROM embeddings WHERE embedding IS NOT NULL),
      n AS (SELECT p, id, qv,
              CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT)
                AS nq
            FROM q),
      v AS (SELECT * FROM n WHERE nq > 0),
      nr AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_resp
             FROM v GROUP BY 1),
      pr AS (SELECT a.p,
               CAST(list_sum(list_transform(range(1, len(a.qv) + 1),
                 i -> a.qv[i] * b.qv[i])) AS BIGINT) AS dotq,
               a.nq AS na, b.nq AS nb
             FROM v a JOIN v b ON a.p = b.p AND a.id < b.id),
      c AS (SELECT p, CAST(floor(CAST(dotq AS DOUBLE)
              / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))
              * 1000000000 + 0.5) AS BIGINT) AS cfp
            FROM pr),
      g AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(SUM(cfp) AS BIGINT) AS s FROM c GROUP BY 1)
      SELECT nr.p AS prompt_id, nr.n_resp,
             COALESCE(g.n_pairs, 0) AS n_pairs,
             CASE WHEN COALESCE(g.n_pairs, 0) = 0 THEN 0.0
                  ELSE round(CAST(g.s AS DOUBLE)
                    / CAST(g.n_pairs * 1000000000 AS DOUBLE), 6) + 0
             END AS mean_cos
      FROM nr LEFT JOIN g ON g.p = nr.p ORDER BY prompt_id""",

    "qCI_ranking_metrics" -> """
      WITH run AS (SELECT doc_id // 10 AS q, doc_id AS d,
                     doc_id % 10 + 1 AS r FROM documents),
      topk AS (SELECT * FROM run WHERE r <= 5),
      qr AS (SELECT doc_id // 10 AS q, doc_id AS d, doc_id % 4 AS g
             FROM documents WHERE doc_id % 3 = 0),
      rs AS (SELECT t.q, CAST(COUNT(*) AS BIGINT) AS n_retrieved,
               CAST(SUM(CASE WHEN COALESCE(qr.g, 0) > 0 THEN 1 ELSE 0
                 END) AS BIGINT) AS n_rel_at_k,
               MIN(CASE WHEN COALESCE(qr.g, 0) > 0 THEN t.r END)
                 AS first_rel,
               CAST(SUM(CASE WHEN COALESCE(qr.g, 0) > 0
                 THEN CAST(floor(CAST(qr.g AS DOUBLE)
                   / log2(CAST(t.r + 1 AS DOUBLE)) * 1000000000 + 0.5)
                   AS BIGINT)
                 ELSE 0 END) AS BIGINT) AS dcg_fp,
               list_sort(list(t.r) FILTER (WHERE COALESCE(qr.g, 0) > 0))
                 AS rel_ranks
             FROM topk t LEFT JOIN qr ON qr.q = t.q AND qr.d = t.d
             GROUP BY 1),
      ra AS (SELECT q, n_retrieved, n_rel_at_k, first_rel, dcg_fp,
               CAST(COALESCE(list_sum(list_transform(
                 range(1, CAST(len(rel_ranks) AS BIGINT) + 1),
                 j -> CAST(floor(CAST(j AS DOUBLE)
                   / CAST(rel_ranks[j] AS DOUBLE) * 1000000000 + 0.5)
                   AS BIGINT))), 0) AS BIGINT) AS ap_fp
             FROM rs),
      gs AS (SELECT q, CAST(COUNT(*) AS BIGINT) AS n_judged,
               CAST(SUM(CASE WHEN g > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS gold_pos,
               list_sort(list(g), 'DESC') AS gl
             FROM qr GROUP BY 1),
      gi AS (SELECT q, n_judged, gold_pos,
               CAST(COALESCE(list_sum(list_transform(
                 range(1, CAST(least(len(gl), 5) AS BIGINT) + 1),
                 i -> CASE WHEN gl[i] > 0
                   THEN CAST(floor(CAST(gl[i] AS DOUBLE)
                     / log2(CAST(i + 1 AS DOUBLE)) * 1000000000 + 0.5)
                     AS BIGINT)
                   ELSE 0 END)), 0) AS BIGINT) AS idcg_fp
             FROM gs),
      j AS (SELECT COALESCE(gi.q, rs.q) AS q,
              COALESCE(n_judged, 0) AS n_judged,
              COALESCE(n_retrieved, 0) AS n_retrieved,
              COALESCE(n_rel_at_k, 0) AS n_rel_at_k, first_rel,
              COALESCE(dcg_fp, 0) AS dcg_fp,
              COALESCE(ap_fp, 0) AS ap_fp,
              COALESCE(idcg_fp, 0) AS idcg_fp,
              COALESCE(gold_pos, 0) AS gold_pos
            FROM gi FULL OUTER JOIN ra rs ON rs.q = gi.q)
      SELECT q AS query_id, n_judged, n_retrieved, n_rel_at_k,
             CASE WHEN gold_pos > 0
               THEN round(CAST(n_rel_at_k AS DOUBLE)
                          / CAST(gold_pos AS DOUBLE), 6)
               ELSE 0.0 END AS recall_at_k,
             CASE WHEN first_rel IS NOT NULL
               THEN round(1.0 / CAST(first_rel AS DOUBLE), 6)
               ELSE 0.0 END AS rr,
             round(CAST(dcg_fp AS DOUBLE) / 1000000000.0, 6) AS dcg_at_k,
             round(CAST(idcg_fp AS DOUBLE) / 1000000000.0, 6)
               AS idcg_at_k,
             CASE WHEN gold_pos > 0 AND idcg_fp > 0
               THEN round(CAST(dcg_fp AS DOUBLE)
                          / CAST(idcg_fp AS DOUBLE), 6)
               ELSE 0.0 END AS ndcg_at_k,
             CASE WHEN gold_pos > 0
               THEN round(CAST(ap_fp AS DOUBLE)
                          / CAST(gold_pos * 1000000000 AS DOUBLE), 6)
               ELSE 0.0 END AS ap_at_k,
             (gold_pos > 0 AND idcg_fp > 0) AS defined,
             CAST(5 AS INT) AS k
      FROM j ORDER BY query_id""",

    "qCH_best_of_n_curve" -> """
      WITH r AS (SELECT doc_id // 4 AS p, doc_id % 7 AS s
                 FROM documents),
      a AS (SELECT p, list_sort(list(s)) AS ss,
              CAST(COUNT(*) AS INT) AS n
            FROM r GROUP BY 1),
      jj AS (SELECT p, ss, n,
               CAST(unnest(range(1, CAST(least(n, 8) AS BIGINT) + 1))
                 AS INT) AS j
             FROM a),
      e AS (SELECT p, j, n,
              CAST(ss[n] AS DOUBLE) +
              CASE WHEN j = n THEN 0.0 ELSE
                list_reduce(list_transform(
                  range(CAST(j AS BIGINT), CAST(n AS BIGINT)), i ->
                    list_reduce(list_transform(
                      range(0, CAST(j AS BIGINT)), t ->
                        CAST(i - t AS DOUBLE) / CAST(n - t AS DOUBLE)),
                      (x, y) -> x * y)
                    * (CAST(ss[i] AS DOUBLE) - CAST(ss[i + 1] AS DOUBLE))),
                  (x, y) -> x + y)
              END AS eb
            FROM jj)
      SELECT p AS prompt_id, j, CAST(n AS BIGINT) AS n_resp,
             round(eb, 6) + 0 AS e_best
      FROM e ORDER BY prompt_id, j""",

    "qCG_calibration_mce" -> """
      WITH r AS (SELECT doc_id % 101 AS pct, doc_id % 3 = 0 AS y
                 FROM documents),
      s AS (SELECT CAST(least(floor(pct * 10 / 100), 9) AS INT) AS bin,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS sy,
              CAST(SUM(pct) AS BIGINT) AS sp
            FROM r GROUP BY 1),
      g AS (SELECT bin, n,
              CAST(abs(100 * sy - sp) AS DOUBLE)
                / CAST(n * 100 AS DOUBLE) AS gap
            FROM s),
      w AS (SELECT bin, n, gap,
              row_number() OVER (ORDER BY gap DESC, bin ASC) AS rn
            FROM g),
      t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins_nonempty,
              COALESCE(CAST(SUM(n) AS BIGINT), 0) AS n_total
            FROM g)
      SELECT COALESCE(round((SELECT gap FROM w WHERE rn = 1), 6), 0.0)
               AS mce,
             COALESCE((SELECT bin FROM w WHERE rn = 1), -1) AS mce_bin,
             COALESCE((SELECT n FROM w WHERE rn = 1), 0) AS mce_n,
             t.n_bins_nonempty, t.n_total
      FROM t""",

    "qCF_position_bias" -> """
      WITH raw AS (SELECT source, doc_id AS pair, unnest([
               {'o': 0, 'w': doc_id % 2 + 1},
               {'o': 1, 'w': CASE WHEN doc_id % 7 <> 0
                 THEN (doc_id // 3) % 2 + 1 END}]) AS j
             FROM documents),
      r AS (SELECT source, pair, j.o AS o, j.w AS w FROM raw
            WHERE j.w IS NOT NULL),
      pp AS (SELECT source, pair,
               SUM(CASE WHEN o = 0 THEN 1 ELSE 0 END) AS n0,
               SUM(CASE WHEN o = 1 THEN 1 ELSE 0 END) AS n1,
               MIN(CASE WHEN o = 0 THEN w END) AS p0,
               MIN(CASE WHEN o = 1 THEN w END) AS p1
             FROM r GROUP BY 1, 2),
      st AS (SELECT source,
               CAST(SUM(CASE WHEN n0 = 1 AND n1 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_pairs,
               CAST(SUM(CASE WHEN n0 = 1 AND n1 = 1 THEN 0 ELSE 1 END)
                 AS BIGINT) AS n_incomplete,
               CAST(SUM(CASE WHEN n0 = 1 AND n1 = 1
                   AND (p0 = 1) = (p1 = 2) THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_consistent,
               CAST(SUM(CASE WHEN n0 = 1 AND n1 = 1 AND p0 = 1
                   AND p1 = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_first_biased,
               CAST(SUM(CASE WHEN n0 = 1 AND n1 = 1 AND p0 = 2
                   AND p1 = 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_second_biased
             FROM pp GROUP BY 1)
      SELECT source, n_pairs, n_incomplete, n_consistent,
             n_first_biased, n_second_biased,
             CASE WHEN n_pairs = 0 THEN 0.0
               ELSE round(CAST(n_consistent AS DOUBLE)
                          / CAST(n_pairs AS DOUBLE), 6)
             END AS consistency_rate,
             CASE WHEN n_pairs = 0 THEN 0.0
               ELSE round(CAST(n_first_biased AS DOUBLE)
                          / CAST(n_pairs AS DOUBLE), 6)
             END AS first_bias_rate,
             CASE WHEN n_pairs = 0 THEN 0.0
               ELSE round(CAST(n_second_biased AS DOUBLE)
                          / CAST(n_pairs AS DOUBLE), 6)
             END AS second_bias_rate
      FROM st ORDER BY source""",

    "qCE_krippendorff_alpha" -> """
      WITH raw AS (SELECT source, doc_id AS item,
                     unnest([CAST(doc_id % 5 AS VARCHAR),
                             CASE WHEN doc_id % 2 = 0
                               THEN CAST((doc_id * 2 + 1) % 5 AS VARCHAR)
                             END,
                             CASE WHEN doc_id % 3 = 0
                               THEN CAST((doc_id * 3 + 2) % 5 AS VARCHAR)
                             END]) AS cat
                   FROM documents),
      r AS (SELECT * FROM raw WHERE cat IS NOT NULL),
      inc AS (SELECT source, item FROM r GROUP BY 1, 2
              HAVING COUNT(*) >= 2),
      ri AS (SELECT r.* FROM r JOIN inc USING (source, item)),
      nij AS (SELECT source, item, cat, CAST(COUNT(*) AS BIGINT) AS nij
              FROM ri GROUP BY 1, 2, 3),
      pi AS (SELECT source, item, CAST(SUM(nij) AS BIGINT) AS mi,
               CAST(SUM(nij * nij) AS BIGINT) AS si
             FROM nij GROUP BY 1, 2),
      pq AS (SELECT source, mi,
               CAST(floor(CAST(mi * mi - si AS DOUBLE)
                 / CAST(mi - 1 AS DOUBLE) * 1000000000 + 0.5) AS BIGINT)
                 AS qi
             FROM pi),
      pg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(mi) AS BIGINT) AS n_values,
               CAST(SUM(qi) AS BIGINT) AS sq
             FROM pq GROUP BY 1),
      mg AS (SELECT source, cat, CAST(COUNT(*) AS BIGINT) AS cj
             FROM ri GROUP BY 1, 2),
      cg AS (SELECT source, CAST(SUM(cj * cj) AS BIGINT) AS c2
             FROM mg GROUP BY 1),
      v AS (SELECT pg.source, n_items, n_values,
              CAST(sq AS DOUBLE)
                / CAST(n_values * 1000000000 AS DOUBLE) AS dobs,
              CAST(n_values * n_values - c2 AS DOUBLE)
                / CAST(n_values * (n_values - 1) AS DOUBLE) AS de,
              n_values * n_values - c2 AS denum
            FROM pg JOIN cg USING (source))
      SELECT source, n_items, n_values,
             CASE WHEN n_values > 1 AND denum > 0
               THEN round(1.0 - dobs / de, 6) + 0
               ELSE 0.0 END AS alpha,
             (n_values > 1 AND denum > 0) AS defined
      FROM v ORDER BY source""",

    "qCB_fleiss_kappa" -> """
      WITH r AS (SELECT source, doc_id AS item,
                   unnest([CAST(doc_id % 5 AS VARCHAR),
                           CAST((doc_id * 2 + 1) % 5 AS VARCHAR),
                           CAST((doc_id * 3 + 2) % 5 AS VARCHAR)]) AS cat
                 FROM documents),
      nij AS (SELECT source, item, cat, CAST(COUNT(*) AS BIGINT) AS nij
              FROM r GROUP BY 1, 2, 3),
      pi AS (SELECT source, item, CAST(SUM(nij) AS BIGINT) AS mi,
               CAST(SUM(nij * nij) AS BIGINT) AS si
             FROM nij GROUP BY 1, 2),
      pg AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(MIN(mi) AS BIGINT) AS m, CAST(SUM(si) AS BIGINT) AS s
             FROM pi GROUP BY 1),
      mg AS (SELECT source, cat, CAST(COUNT(*) AS BIGINT) AS cj
             FROM r GROUP BY 1, 2),
      cg AS (SELECT source, CAST(SUM(cj * cj) AS BIGINT) AS c
             FROM mg GROUP BY 1),
      v AS (SELECT pg.source, n_items, m,
              CAST(s - n_items * m AS DOUBLE)
                / CAST(n_items * m * (m - 1) AS DOUBLE) AS pbar,
              CAST(c AS DOUBLE) / (CAST(n_items * m AS DOUBLE)
                * CAST(n_items * m AS DOUBLE)) AS pe
            FROM pg JOIN cg USING (source))
      SELECT source, n_items, m,
             CASE WHEN m > 1 AND pe < 1.0
               THEN round((pbar - pe) / (1.0 - pe), 6) + 0
               ELSE 0.0 END AS kappa,
             (m > 1 AND pe < 1.0) AS defined
      FROM v ORDER BY source""",

    "qC1_grpo_advantage" -> """
      WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id,
                        doc_id % 7 AS score FROM documents),
      st AS (SELECT prompt_id, CAST(SUM(score) AS BIGINT) AS s1,
               CAST(SUM(score * score) AS BIGINT) AS s2,
               CAST(COUNT(*) AS BIGINT) AS n_resp
             FROM r GROUP BY 1),
      j AS (SELECT r.prompt_id, r.doc_id, r.score, st.n_resp,
              CAST(s1 AS DOUBLE) / CAST(n_resp AS DOUBLE) AS mu,
              (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                 / CAST(n_resp AS DOUBLE)) / CAST(n_resp AS DOUBLE) AS var
            FROM r JOIN st USING (prompt_id))
      SELECT prompt_id, doc_id, score, n_resp,
             CASE WHEN n_resp > 1 AND var > 0
               THEN round((CAST(score AS DOUBLE) - mu)
                          / sqrt(greatest(var, 0.0)), 6) + 0
               ELSE 0.0 END AS advantage,
             (n_resp > 1 AND var > 0) AS defined
      FROM j ORDER BY prompt_id, doc_id""",

    "qC2_pass_at_k" -> """
      WITH r AS (SELECT doc_id // 4 AS prompt_id,
                        doc_id % 3 = 0 AS passed FROM documents),
      a AS (SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_resp,
              CAST(SUM(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT)
                AS n_passed
            FROM r GROUP BY 1)
      SELECT prompt_id, n_resp, n_passed,
             round(CAST(n_passed AS DOUBLE) / CAST(n_resp AS DOUBLE), 6)
               AS pass_at_1,
             CASE WHEN n_resp < 3 THEN NULL
                  WHEN n_resp - n_passed < 3 THEN 1.0
                  ELSE round(1.0 - list_reduce(list_transform(range(0, 3),
                    j -> (CAST(n_resp AS DOUBLE) - CAST(n_passed AS DOUBLE)
                            - CAST(j AS DOUBLE))
                         / (CAST(n_resp AS DOUBLE) - CAST(j AS DOUBLE))),
                    (x, y) -> x * y), 6) END AS pass_at_k,
             CAST(3 AS INT) AS k
      FROM a ORDER BY prompt_id""",

    "qC3_majority_vote" -> """
      WITH r AS (SELECT doc_id // 4 AS prompt_id,
                        CAST((doc_id * doc_id) % 3 AS VARCHAR) AS a
                 FROM documents),
      n AS (SELECT prompt_id, CAST(COUNT(*) AS BIGINT) AS n_resp
            FROM r GROUP BY 1),
      c AS (SELECT prompt_id, a, CAST(COUNT(*) AS BIGINT) AS c
            FROM r GROUP BY 1, 2),
      w AS (SELECT prompt_id, a AS vote_answer, c AS n_votes,
              row_number() OVER (PARTITION BY prompt_id
                ORDER BY c DESC, a ASC) AS rn
            FROM c)
      SELECT n.prompt_id, w.vote_answer, w.n_votes, n.n_resp,
             round(CAST(w.n_votes AS DOUBLE) / CAST(n.n_resp AS DOUBLE), 6)
               AS vote_frac
      FROM n JOIN w ON w.prompt_id = n.prompt_id AND rn = 1
      ORDER BY n.prompt_id""",

    "qC0_best_of_n" -> """
      WITH r AS (SELECT doc_id // 4 AS prompt_id, doc_id, text,
                        doc_id % 7 AS score, source FROM documents),
      nn AS (SELECT prompt_id, CAST(count(*) AS BIGINT) AS n_resp
             FROM r GROUP BY 1),
      k AS (SELECT prompt_id, doc_id, text, score, source,
              CAST(row_number() OVER (PARTITION BY prompt_id
                ORDER BY score DESC, doc_id ASC) AS INT) AS rank
            FROM r QUALIFY rank <= 3),
      b AS (SELECT prompt_id, text AS btext FROM k WHERE rank = 1),
      t AS (SELECT k.prompt_id, k.rank, k.doc_id AS resp_id, k.score,
              nn.n_resp,
              CAST(len(regexp_extract_all(k.text, '\S+')) AS BIGINT)
                AS n_tokens,
              list_distinct(regexp_extract_all(k.text, '\S+')) AS ca,
              list_distinct(regexp_extract_all(b.btext, '\S+')) AS ba,
              k.source AS source
            FROM k JOIN b ON b.prompt_id = k.prompt_id
                 JOIN nn ON nn.prompt_id = k.prompt_id),
      u AS (SELECT *, CAST(len(list_intersect(ca, ba)) AS BIGINT) AS inter,
              CAST(len(ca) + len(ba) AS BIGINT)
                - CAST(len(list_intersect(ca, ba)) AS BIGINT) AS uni
            FROM t)
      SELECT prompt_id, rank, resp_id, score, n_resp, n_tokens,
             CASE WHEN rank > 1 THEN round(CASE WHEN uni > 0
               THEN CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)
               ELSE 1.0 END, 4) END AS jaccard_to_best,
             (rank = 1 OR round(CASE WHEN uni > 0
               THEN CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE)
               ELSE 1.0 END, 4) < __PREF_MAX_JAC__) AS keep,
             source
      FROM u ORDER BY prompt_id, rank"""
      .replace("__PREF_MAX_JAC__", "0.9"),

    "qBY_length_bias" -> s"""
      $PREF_PIECES
      SELECT source, CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(SUM(delta_tokens) AS BIGINT) AS sum_delta,
             round(CAST(CAST(SUM(delta_tokens) AS BIGINT) AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) + 0 AS avg_delta,
             round(CAST(SUM(CASE WHEN delta_tokens > 0 THEN 1 ELSE 0 END)
                     AS DOUBLE)
                   / CAST(count(*) AS DOUBLE), 6) AS frac_chosen_longer
      FROM pairs WHERE keep GROUP BY source ORDER BY source"""
      .replace("__PREF_MAX_JAC__", "0.9"),
    "qBT_mink_contamination" -> """
      WITH dt AS (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS tok
                  FROM documents),
      c AS (SELECT tok, COUNT(*) AS cnt FROM dt WHERE doc_id % 4 = 0
            GROUP BY tok),
      s AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v
            FROM c),
      j AS (SELECT doc_id,
              -ln((COALESCE(c.cnt, 0) + 0.5) / (s.n + 0.5 * (s.v + 1))) AS nll
            FROM dt LEFT JOIN c USING (tok) CROSS JOIN s),
      g AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   list_sort(list(nll), 'DESC') AS nlls
            FROM j GROUP BY doc_id),
      k AS (SELECT doc_id, n_tokens,
              CAST(CEIL(n_tokens * __MINK_KFRAC__) AS INT) AS kk, nlls FROM g)
      SELECT doc_id, n_tokens,
             round(list_reduce(list_slice(nlls, 1, kk), (a, b) -> a + b)
                   / CAST(kk AS DOUBLE), 6) AS mink_score,
             round(list_reduce(list_slice(nlls, 1, kk), (a, b) -> a + b)
                   / CAST(kk AS DOUBLE), 6) < __MINK_T__ AS flagged
      FROM k ORDER BY doc_id"""
      .replace("__MINK_KFRAC__", MINK_KFRAC.toString)
      .replace("__MINK_T__", MINK_THRESHOLD.toString)
  ).map { case (k, v) => k -> v.trim.replaceAll("\\s+", " ") }
}
