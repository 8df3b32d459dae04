package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * BPE vocabulary induction (tokenizer TRAINING) — the iterative
 * top-pair merge of Sennrich, Haddow & Birch, "Neural Machine
 * Translation of Rare Words with Subword Units" (ACL 2016): start
 * from per-word character sequences plus an explicit end-of-word
 * symbol, repeatedly count adjacent symbol pairs across the corpus
 * weighted by word frequency, and merge the winning pair everywhere
 * it occurs, left-to-right greedily. The learned merge list IS the
 * tokenizer — the one LLM-pipeline training stage upstream of the
 * token counting ([[TextAnalysis.bpeTokenCount]]) and packing
 * operators.
 *
 * Scale shape: ONE corpus-scale shuffle (word → count hash-agg with
 * map-side combine) reduces the corpus to its VOCABULARY; every merge
 * round after that is vocabulary-scale — a partial-aggregated
 * pair-count hash-agg feeding a single-row deterministic top-1
 * (TakeOrderedAndProject, never a global sort) collected to the
 * driver, then a map-side merge application with the winning pair
 * riding the task closure (the broadcast-merge-table analog for a
 * one-row table). k merges = k tiny vocab-scale jobs; the corpus is
 * never touched again. Lineage over the rounds is truncated by
 * localCheckpoint every [[CheckpointEvery]] merges so round k never
 * replays k map stages.
 *
 * Determinism: ties on pair count break lexicographically by (left,
 * right) symbol — binary string order, identical in Spark and the
 * SQL oracle.
 */
object Bpe {

  /** End-of-word symbol appended to every word's character sequence
    * (Sennrich §3.2) — lets learned subwords distinguish suffixes. */
  val Eow = "</w>"

  private val CheckpointEvery = 8

  /** Word → symbol list: one symbol per Unicode CODE POINT (a
    * non-BMP character is one symbol, never a surrogate pair split —
    * matching the oracle's character split), plus the [[Eow]] mark. */
  def charSymbols(w: String): IndexedSeq[String] = {
    val b = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      b += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    b += Eow
    b.result()
  }

  /** One merge applied left-to-right greedily: at each position the
    * pair (l, r) merges and the scan resumes AFTER the consumed pair
    * — so `a a a` under (a, a) becomes `aa a`, the reference BPE
    * semantics (and exactly a non-overlapping string replace over the
    * delimited symbol string, which is how the oracle applies it). */
  def applyMerge(syms: IndexedSeq[String], l: String,
                 r: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += l + r; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /**
   * Learn the first `merges` BPE merges from a whitespace-tokenized
   * text column. Returns (rank, lft, rgt, pair_count) — merge order,
   * the two merged symbols, and the corpus-wide (frequency-weighted,
   * all adjacent positions) pair count that won the round. Stops
   * early if the vocabulary runs out of pairs (every word fully
   * merged into a single symbol).
   */
  def learnMerges(docs: DataFrame, textCol: String,
                  merges: Int): DataFrame = {
    require(merges > 0, "merges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    var vocab: Dataset[(IndexedSeq[String], Long)] = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)]
      .map { case (w, c) => (charSymbols(w), c) }
      // eager: the rounds re-scan the vocab k times; without the
      // checkpoint each round would re-run the corpus shuffle
      .localCheckpoint(true)
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      val top = vocab
        .flatMap { case (syms, c) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), c))
        }
        .toDF("lft", "rgt", "c")
        .groupBy("lft", "rgt").agg(sum("c").as("pair_count"))
        .orderBy(desc("pair_count"), asc("lft"), asc("rgt"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val l = top.head.getString(0)
        val r = top.head.getString(1)
        learned += ((rank, l, r, top.head.getLong(2)))
        vocab = vocab.map { case (syms, c) => (applyMerge(syms, l, r), c) }
        if (rank % CheckpointEvery == 0) vocab = vocab.localCheckpoint(true)
        rank += 1
      }
    }
    spark.createDataset(learned.result())
      .toDF("rank", "lft", "rgt", "pair_count")
  }

  // Trained merge lists memoized per (cacheKey, merges) — a tokenizer
  // is an OFFLINE artifact (the IvfIndex.buildCached precedent): encode
  // queries pay encode cost, not training cost. qAH measures training
  // itself and deliberately bypasses this cache.
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[(String, String)]]()

  /** [[learnMerges]] collected to its rank-ordered (lft, rgt) list,
    * memoized per JVM. The key folds in the analyzed plan's semantic
    * hash and the text column, so two corpora sharing a `cacheKey`
    * (e.g. different tables of one lake dir) never share merges. */
  def learnMergesCached(docs: DataFrame, textCol: String, merges: Int,
                        cacheKey: String): Seq[(String, String)] = {
    val key = s"$cacheKey|$textCol|${docs.queryExecution.analyzed.semanticHash()}"
    mergeCache.computeIfAbsent((key, merges), { _ =>
      learnMerges(docs, textCol, merges).orderBy("rank")
        .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    })
  }

  /**
   * Tokenizer APPLICATION — encode the corpus with a trained merge
   * list and count BPE tokens per document (the budget unit of the
   * packing operators; [[TextAnalysis.bpeTokenCount]] is the regex
   * heuristic, this is the real trained tokenizer).
   *
   * Encode semantics match training exactly: per word, start from
   * [[charSymbols]] and apply every merge in RANK order with the
   * same greedy left-to-right [[applyMerge]] — so a word's encoding
   * equals its end-of-training vocabulary state.
   *
   * Scale shape: the corpus reduces to (doc, word, n_occ) with one
   * hash-agg shuffle; the VOCABULARY (distinct words) is encoded once
   * map-side with the merge list riding the closure (vocab-scale
   * work, O(merges · |word|) per distinct word — the classic rank-
   * scan; a priority-queue encoder is the constant-factor upgrade
   * when merges reach real-tokenizer size); per-doc counts come from
   * a broadcast-able vocab join + weighted sum. The corpus text is
   * read exactly once.
   */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val perWord = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("id", "w").agg(count(lit(1)).as("n_occ"))
    val wordToks = perWord.select("w").distinct().as[String]
      .map { w =>
        var syms = charSymbols(w)
        merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
        (w, syms.length.toLong)
      }.toDF("w", "n_toks")
    perWord.join(wordToks, "w")
      .groupBy(col("id").as(idCol))
      .agg(sum(col("n_occ") * col("n_toks")).as("n_bpe_tokens"))
  }

  /** SQL oracle text for [[learnMerges]] — `merges` scripted rounds
    * of (pair-count, top-1, greedy apply) as chained CTEs over the
    * `documents` view. The word state is a DECORATED symbol string
    * (every symbol carries its own surrounding spaces, so symbols
    * join with two spaces): a pair match then consumes both symbols'
    * decorations entirely and a plain non-overlapping `replace`
    * reproduces the greedy left-to-right merge exactly — `a a a a`
    * merges twice, `a a a` once, with no delimiter sharing between
    * adjacent matches. Every w-CTE is MATERIALIZED: each is
    * referenced twice (next round's pair count + next round's apply),
    * and inlining would double the `documents` scan per round —
    * 2^merges scans by the last round. */
  def oracleSql(merges: Int): String =
    mergeChainCtes(merges) +
      (1 to merges).map(i => s"SELECT * FROM b$i")
        .mkString("\n      ", "\n      UNION ALL ", "\n      ORDER BY rank")

  /** Encode oracle: the SAME scripted merge chain, then the final
    * per-word states (`w<merges>`) become the word→token-count table
    * — the original word is recovered by stripping the decoration
    * spaces and the [[Eow]] suffix — and per-doc counts are the
    * occurrence-weighted sum, mirroring [[encodeTokenCounts]]. */
  def encodeOracleSql(merges: Int): String =
    mergeChainCtes(merges) + s""",
      docw AS (SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS w
               FROM documents),
      wtok AS (SELECT left(replace(state, ' ', ''),
                          len(replace(state, ' ', '')) - ${Eow.length}) AS w,
                      len(string_split(trim(state), '  '))::BIGINT AS n_toks
               FROM w$merges)
      SELECT d.doc_id, sum(n_toks)::BIGINT AS n_bpe_tokens
      FROM docw d JOIN wtok USING (w)
      GROUP BY 1 ORDER BY 1"""

  /** The w-chain survives EARLY EXHAUSTION: when round i has no pairs
    * left, b$i is empty and the LEFT JOIN + coalesce pass w${"$"}{i-1}
    * through unchanged — a CROSS JOIN would empty every later w-CTE
    * and make the encode oracle emit zero rows on a small corpus
    * (training's b-union was already exhaustion-safe). */
  private def mergeChainCtes(merges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
      WITH w0 AS MATERIALIZED (
        SELECT ' ' || array_to_string(
                 list_append(string_split(w, ''), '$Eow'), '  ') || ' ' AS state,
               count(*)::BIGINT AS cnt
        FROM (SELECT unnest(regexp_extract_all(text, '\\S+')) AS w FROM documents)
        GROUP BY 1)"""
    for (i <- 1 to merges) {
      sb ++= s""",
      p$i AS (
        SELECT u[1] AS lft, u[2] AS rgt, sum(cnt)::BIGINT AS pair_count
        FROM (SELECT unnest(list_transform(range(1, len(s)),
                       j -> [s[j], s[j + 1]])) AS u, cnt
              FROM (SELECT string_split(trim(state), '  ') AS s, cnt
                    FROM w${i - 1}))
        GROUP BY 1, 2),
      b$i AS (
        SELECT CAST($i AS INT) AS rank, lft, rgt, pair_count
        FROM p$i ORDER BY pair_count DESC, lft, rgt LIMIT 1),
      w$i AS MATERIALIZED (
        SELECT coalesce(replace(state, ' ' || b.lft || '  ' || b.rgt || ' ',
                       ' ' || b.lft || b.rgt || ' '), state) AS state, cnt
        FROM w${i - 1} LEFT JOIN b$i b ON TRUE)"""
    }
    sb.result()
  }
}
