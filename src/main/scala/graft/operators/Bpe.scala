package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import scala.collection.mutable

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
 * map-side combine) reduces the corpus to its VOCABULARY, which is
 * collected once; every merge round after that is pure in-memory
 * INCREMENTAL maintenance — a pair→containing-words index plus a
 * lazy max-heap, so round k touches only the words containing the
 * winning pair, never the whole vocabulary (the fastBPE / HF-
 * tokenizers training shape). Training runs exactly ONE Spark job
 * regardless of merge count (BpeScaleSpec pins this), where the
 * previous round-per-merge design ran k vocabulary-scale jobs —
 * 30k merges meant 30k job round-trips. At open-web corpus scale the
 * distinct-word table is itself unbounded (URLs, typos), so
 * [[learnMerges]] takes a `maxVocab` cap — keep the top-N words by
 * (count, word) — the standard trainer mitigation (SentencePiece /
 * HF both prune rare words before merge induction); uncapped by
 * default, exact on the test lakes.
 *
 * Determinism: ties on pair count break lexicographically by (left,
 * right) symbol in UTF-8 BINARY order — [[utf8Less]] reproduces
 * Spark's `asc` over strings (UTF8String binary comparison) so the
 * in-memory trainer ranks ties exactly as the previous
 * `orderBy(desc(count), asc(lft), asc(rgt))` plan and the SQL oracle.
 */
object Bpe {

  /** End-of-word symbol appended to every word's character sequence
    * (Sennrich §3.2) — lets learned subwords distinguish suffixes. */
  val Eow = "</w>"

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

  /** Unsigned UTF-8 byte-order comparison — Spark's string `asc`. */
  private[graft] def utf8Less(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /**
   * Learn the first `merges` BPE merges from a whitespace-tokenized
   * text column. Returns (rank, lft, rgt, pair_count) — merge order,
   * the two merged symbols, and the corpus-wide (frequency-weighted,
   * all adjacent positions) pair count that won the round. Stops
   * early if the vocabulary runs out of pairs (every word fully
   * merged into a single symbol).
   *
   * `maxVocab` bounds the driver-side vocabulary: the top-N distinct
   * words by (count DESC, word ASC) are kept — a distributed
   * TakeOrdered, collected small. The DEFAULT is capped at 1M words
   * (~hundreds of MB of driver state) so the default path cannot
   * driver-OOM on an open-web corpus whose distinct-word table is
   * unbounded; rare-word pruning is how every production BPE trainer
   * bounds this same table, and words beyond the cap contribute
   * negligibly to pair counts. Pass `Int.MaxValue` explicitly for the
   * exact uncapped run on corpora known to fit.
   */
  def learnMerges(docs: DataFrame, textCol: String, merges: Int,
                  maxVocab: Int = 1000000): DataFrame = {
    require(merges > 0, "merges must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val counts = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
    val capped =
      if (maxVocab == Int.MaxValue) counts
      // TakeOrderedAndProject — never a global sort
      else counts.orderBy(desc("cnt"), asc("w")).limit(maxVocab)
    val vocab = capped.as[(String, Long)].collect()
    spark.createDataset(trainInMemory(vocab, merges))
      .toDF("rank", "lft", "rgt", "pair_count")
  }

  /**
   * The incremental trainer over a collected (word, count) vocabulary.
   *
   * State: per-pair corpus counts, a pair→word-indices occurrence
   * index, and a LAZY max-heap of (count, lft, rgt) — entries are
   * pushed on every count change and validated against the live count
   * map on pop (stale entries are discarded), the classic
   * priority-queue-with-decrease-key workaround. Each round re-counts
   * ONLY the words that contain the winning pair; every other word's
   * pairs are untouched. Complexity: O(Σ|word|) init plus, per merge,
   * O(affected words × their length) + O(log P) heap ops — at a real
   * 30k-merge vocabulary this is the published trainer shape (total
   * work ≈ corpus vocab size × average merges touching a word), vs
   * the naive k full vocabulary re-scans.
   */
  private[graft] def trainInMemory(vocab: Array[(String, Long)],
                                   merges: Int): Seq[(Int, String, String, Long)] = {
    val words: Array[IndexedSeq[String]] = vocab.map(v => charSymbols(v._1))
    val wcnt: Array[Long] = vocab.map(_._2)
    val pairCount = mutable.HashMap.empty[(String, String), Long]
    // append-only occurrence lists (deduped per word at append time);
    // entries go stale when a later merge removes the pair from the
    // word — each round re-checks membership during its re-count
    val pairWords = mutable.HashMap.empty[(String, String), mutable.ArrayBuffer[Int]]
    // max-heap: count DESC, then lft, rgt ASC in utf8 order — the
    // exact previous orderBy(desc, asc, asc). PriorityQueue pops the
    // Ordering-greatest element, so lt() returns "a ranks below b".
    val heap = mutable.PriorityQueue.empty[(Long, String, String)](
      new Ordering[(Long, String, String)] {
        def compare(a: (Long, String, String), b: (Long, String, String)): Int =
          if (a._1 != b._1) java.lang.Long.compare(a._1, b._1)
          else if (a._2 != b._2) { if (utf8Less(a._2, b._2)) 1 else -1 }
          else if (a._3 != b._3) { if (utf8Less(a._3, b._3)) 1 else -1 }
          else 0
      })
    val touched = mutable.HashSet.empty[(String, String)]
    def countPairs(wi: Int, sign: Long, index: Boolean): Unit = {
      val syms = words(wi)
      val seen = if (index) mutable.HashSet.empty[(String, String)] else null
      var i = 0
      while (i < syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        val c = pairCount.getOrElse(p, 0L) + sign * wcnt(wi)
        if (c == 0L) pairCount.remove(p) else pairCount.update(p, c)
        touched += p
        if (index && seen.add(p))
          pairWords.getOrElseUpdate(p, mutable.ArrayBuffer.empty) += wi
        i += 1
      }
    }
    words.indices.foreach(countPairs(_, 1L, index = true))
    touched.foreach(p => heap.enqueue((pairCount.getOrElse(p, 0L), p._1, p._2)))
    touched.clear()
    val learned = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var exhausted = false
    while (rank <= merges && !exhausted) {
      // pop to the first LIVE entry (count matches the current map)
      var top: Option[(Long, String, String)] = None
      while (top.isEmpty && heap.nonEmpty) {
        val e = heap.dequeue()
        if (e._1 > 0L && pairCount.getOrElse((e._2, e._3), 0L) == e._1) top = Some(e)
      }
      top match {
        case None => exhausted = true
        case Some((cnt, l, r)) =>
          learned += ((rank, l, r, cnt))
          val p = (l, r)
          val affected = pairWords.remove(p).getOrElse(mutable.ArrayBuffer.empty)
          val done = mutable.HashSet.empty[Int] // occurrence lists may repeat a word across rounds
          affected.foreach { wi =>
            if (done.add(wi) && hasPair(words(wi), l, r)) {
              countPairs(wi, -1L, index = false)
              words(wi) = applyMerge(words(wi), l, r)
              countPairs(wi, 1L, index = true)
            }
          }
          touched.foreach(q => heap.enqueue((pairCount.getOrElse(q, 0L), q._1, q._2)))
          touched.clear()
          rank += 1
      }
    }
    learned.result()
  }

  private def hasPair(syms: IndexedSeq[String], l: String, r: String): Boolean = {
    var i = 0
    while (i < syms.length - 1) {
      if (syms(i) == l && syms(i + 1) == r) return true
      i += 1
    }
    false
  }

  // Trained merge lists memoized per (cacheKey, merges) — a tokenizer
  // is an OFFLINE artifact (the IvfIndex.buildCached precedent): encode
  // queries pay encode cost, not training cost. qAH measures training
  // itself and deliberately bypasses this cache.
  private val mergeCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), Seq[(String, String)]]()
  private val MergeCacheMax = 64

  /** Fingerprint of the DataFrame's backing files (path, size, mtime)
    * — regenerating a lake in place within one JVM must not serve the
    * previous corpus's merges (the plan's semanticHash alone
    * fingerprints the PATHS, not the data). Non-file-backed plans
    * (in-memory test frames) fingerprint empty and fall back to the
    * semantic hash alone. Shared with the frame-artifact cache. */
  private def dataFingerprint(docs: DataFrame): String =
    FrameCache.frameFingerprint(docs)

  /** [[learnMerges]] collected to its rank-ordered (lft, rgt) list,
    * memoized per JVM. The key folds in the analyzed plan's semantic
    * hash, the text column, AND the backing files' (size, mtime)
    * fingerprint — so neither two corpora sharing a `cacheKey` nor an
    * in-place regenerated lake can be served stale merges. The cache
    * is crudely bounded: past [[MergeCacheMax]] entries it clears
    * (offline artifacts re-train; a server never grows unbounded). */
  def learnMergesCached(docs: DataFrame, textCol: String, merges: Int,
                        cacheKey: String): Seq[(String, String)] = {
    val key = s"$cacheKey|$textCol|${docs.queryExecution.analyzed.semanticHash()}" +
      s"|${dataFingerprint(docs)}"
    if (mergeCache.size > MergeCacheMax) mergeCache.clear()
    mergeCache.computeIfAbsent((key, merges), { _ =>
      // durable tier for lake-backed corpora: the trained merge list
      // IS the tokenizer (a deployment trains once, stores it, and
      // every later process loads it) — without this a fresh JVM
      // re-trained BPE just to derive the key of the already-stored
      // encoded corpus. Rank order restored explicitly on read.
      val frame =
        if (docs.inputFiles.isEmpty) learnMerges(docs, textCol, merges)
        else ArtifactStore.readOrBuild(docs.sparkSession, cacheKey,
          "bpeMerges-" + ArtifactStore.md5(s"$textCol|$merges").take(12),
          Seq(docs))(learnMerges(docs, textCol, merges))
      frame.orderBy("rank")
        .collect().map(r => (r.getAs[String]("lft"), r.getAs[String]("rgt")))
        .toSeq
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
   * map-side with the merge list riding the closure; per-doc counts
   * come from a broadcast-able vocab join + weighted sum. The corpus
   * text is read exactly once. When the merge list is CREATION-
   * ORDERED (every operand is a base symbol or the product of an
   * earlier rule — true of every list [[learnMerges]] emits), each
   * word is encoded with a PRIORITY-QUEUE merge over a linked symbol
   * list: O(|word| + applied·log|word|), independent of total merge
   * count — at a 30k-rule tokenizer the rank-order scan costs
   * O(30k·|word|) per word while the queue touches only the rules
   * that fire. An arbitrary (hand-built, non-creation-ordered) list
   * falls back to the rank-order scan, which is the DEFINITION of
   * the semantics (PropertySpecs pins PQ ≡ sequential on trained
   * lists; Round7OpsSpec pins the sequential semantics of adversarial
   * lists like `(aa,b) before (a,a)`).
   */
  def encodeTokenCounts(docs: DataFrame, idCol: String, textCol: String,
                        merges: Seq[(String, String)]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val orderly = isCreationOrdered(merges)
    val perWord = docs
      .select(col(idCol).as("id"), explode(split(col(textCol), "\\s+")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("id", "w").agg(count(lit(1)).as("n_occ"))
    val wordToks = perWord.select("w").distinct().as[String]
      .mapPartitions { it =>
        // rank table built once per task, first rule wins duplicates
        val ranks = new java.util.HashMap[(String, String), Integer]()
        merges.zipWithIndex.foreach { case (p, i) => ranks.putIfAbsent(p, i) }
        it.map { w =>
          val n =
            if (orderly) encodeWordPQ(charSymbols(w), ranks)
            else {
              var syms = charSymbols(w)
              merges.foreach { case (l, r) => syms = applyMerge(syms, l, r) }
              syms.length
            }
          (w, n.toLong)
        }
      }.toDF("w", "n_toks")
    perWord.join(wordToks, "w")
      .groupBy(col("id").as(idCol))
      .agg(sum(col("n_occ") * col("n_toks")).as("n_bpe_tokens"))
  }

  /** [[encodeTokenCounts]] memoized per JVM through [[FrameCache]] —
    * the encoded corpus is an OFFLINE artifact exactly like the merge
    * list that produced it (a deployment tokenizes once and stores
    * per-doc token counts next to the corpus; qAK/qAZ/packing queries
    * all consume the same encoding). The key folds in the same
    * ingredients as [[learnMergesCached]] plus the merge list itself,
    * so a different tokenizer or regenerated lake can never be served
    * a stale encoding. */
  def encodeTokenCountsCached(docs: DataFrame, idCol: String, textCol: String,
                              merges: Seq[(String, String)],
                              cacheKey: String): DataFrame = {
    val key = s"bpeEncode|$cacheKey|$idCol|$textCol" +
      s"|${docs.queryExecution.analyzed.semanticHash()}" +
      s"|${dataFingerprint(docs)}|${merges.hashCode()}"
    FrameCache.cached(docs.sparkSession, key) {
      if (docs.inputFiles.nonEmpty)
        // durable tier for lake-backed corpora: the encoded corpus is
        // a stored ingest product (qAK/qAZ/packing all consume it) —
        // a fresh JVM reads parquet instead of re-encoding. The
        // tokenizer's identity (columns + merge list, JVM-stable
        // string hashes) rides the artifact NAME since the store's
        // fingerprint covers data only.
        ArtifactStore.readOrBuild(docs.sparkSession, cacheKey,
          "bpeEncoded-" + ArtifactStore.md5(
            s"$idCol|$textCol|${merges.hashCode()}").take(12), Seq(docs))(
          encodeTokenCounts(docs, idCol, textCol, merges))
      else encodeTokenCounts(docs, idCol, textCol, merges)
    }
  }

  /** Tokenizer FERTILITY per source — BPE tokens per whitespace word,
    * the standard "how well does the tokenizer fit each domain" metric
    * (English prose near the trained distribution ≈ low fertility;
    * code/foreign-script sources fragment into more tokens and cost
    * proportionally more context budget). Rides [[encodeTokenCounts]]
    * (vocabulary encodes once map-side, corpus reduces to per-doc
    * sums) — or a caller-supplied precomputed encoding
    * ([[encodeTokenCountsCached]]), so fertility and per-doc counts
    * share ONE corpus encode — plus one partial-agg groupBy(source);
    * |sources| rows out.
    * Sources whose documents contain no words are absent (mirrors the
    * oracle's occurrence join). */
  def fertilityBySource(docs: DataFrame, idCol: String, textCol: String,
                        sourceCol: String,
                        merges: Seq[(String, String)],
                        encoded: Option[DataFrame] = None): DataFrame = {
    val enc = encoded.getOrElse(encodeTokenCounts(docs, idCol, textCol, merges))
    docs.select(col(idCol), col(sourceCol).as("source"),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__nw"))
      .join(enc, Seq(idCol), "left")
      .groupBy(col("source"))
      .agg(sum(col("__nw")).as("n_words"),
        sum(coalesce(col("n_bpe_tokens"), lit(0L))).as("n_bpe_tokens"))
      .filter(col("n_words") > 0)
      .select(col("source"), col("n_words"), col("n_bpe_tokens"),
        round(col("n_bpe_tokens").cast("double") /
          col("n_words").cast("double"), 6).as("fertility"))
  }

  /** Fertility oracle: the scripted merge chain again, per-word token
    * counts joined to the source-labelled word-occurrence stream. */
  def fertilityOracleSql(merges: Int): String =
    mergeChainCtes(merges) + s""",
      docw AS (SELECT source, unnest(regexp_extract_all(text, '\\S+')) AS w
               FROM documents),
      wtok AS (SELECT left(replace(state, ' ', ''),
                          len(replace(state, ' ', '')) - ${Eow.length}) AS w,
                      len(string_split(trim(state), '  '))::BIGINT AS n_toks
               FROM w$merges)
      SELECT d.source, COUNT(*)::BIGINT AS n_words,
             SUM(n_toks)::BIGINT AS n_bpe_tokens,
             round(CAST(SUM(n_toks) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
               AS fertility
      FROM docw d JOIN wtok USING (w)
      GROUP BY 1 ORDER BY 1"""

  /** A merge list is PQ-safe ("creation-ordered") when
    *
    *  1. every rule's operands are base symbols (one code point, or
    *     [[Eow]]) or the concatenation produced by a STRICTLY EARLIER
    *     rule, AND
    *  2. no rule's product equals a string an EARLIER rule consumes as
    *     an operand.
    *
    * (1) alone is NOT sufficient: a product can be created twice —
    * `[(a,b),(b,c),(a,bc),(abc,d),(ab,c)]` passes (1), but on "abcd"
    * the rank scan stops at [abc, d] (rule (abc,d) ran before any
    * `abc` existed) while lowest-rank-first merging applies (ab,c)
    * and then re-fires the earlier (abc,d) on its product — a
    * different, WRONG token count. Rejecting products that earlier
    * rules consume (2) closes that hole: a string created only by
    * rules later than every rule that consumes it can never re-arm an
    * already-passed rule. Rejected lists (hand-built, or the rare
    * trained list where both parses of one string win rounds in the
    * re-arming order) take the definitional sequential scan instead —
    * slower, never wrong (BpeScaleSpec pins the counterexample). */
  private[graft] def isCreationOrdered(merges: Seq[(String, String)]): Boolean = {
    val created = mutable.HashSet.empty[String]
    val consumed = mutable.HashSet.empty[String] // non-base operands so far
    def base(s: String): Boolean =
      s == Eow || (s.nonEmpty && s.codePointCount(0, s.length) == 1)
    merges.forall { case (l, r) =>
      val ok = (base(l) || created(l)) && (base(r) || created(r)) &&
        !consumed(l + r)
      if (!base(l)) consumed += l
      if (!base(r)) consumed += r
      created += (l + r)
      ok
    }
  }

  /** Priority-queue encode of one word: symbols as a doubly-linked
    * array list, candidate pairs heaped by (rank, left position) —
    * leftmost-first on rank ties reproduces the greedy left-to-right
    * scan. Entries are validated on pop (the pair at that position
    * must still match the popped rank); symbol growth makes stale
    * entries self-invalidating. Returns the final token count. */
  private[graft] def encodeWordPQ(syms: IndexedSeq[String],
                                  ranks: java.util.HashMap[(String, String), Integer]): Int = {
    val n = syms.length
    if (n <= 1) return n
    val sym = syms.toArray
    val nxt = Array.tabulate(n)(_ + 1)
    val prv = Array.tabulate(n)(_ - 1)
    val alive = Array.fill(n)(true)
    // min-heap on (rank, position): PriorityQueue pops the greatest,
    // so the ordering is reversed
    val pq = mutable.PriorityQueue.empty[(Int, Int)](
      Ordering.Tuple2(Ordering.Int.reverse, Ordering.Int.reverse))
    def push(i: Int): Unit =
      if (i >= 0 && nxt(i) < n) {
        val r = ranks.get((sym(i), sym(nxt(i))))
        if (r != null) pq.enqueue((r.intValue(), i))
      }
    (0 until n - 1).foreach(push)
    var tokens = n
    while (pq.nonEmpty) {
      val (r, i) = pq.dequeue()
      if (alive(i) && nxt(i) < n) {
        val j = nxt(i)
        val live = ranks.get((sym(i), sym(j)))
        if (live != null && live.intValue() == r) {
          sym(i) = sym(i) + sym(j)
          alive(j) = false
          nxt(i) = nxt(j)
          if (nxt(j) < n) prv(nxt(j)) = i
          tokens -= 1
          push(prv(i))
          push(i)
        }
      }
    }
    tokens
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
