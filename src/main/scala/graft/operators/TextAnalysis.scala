package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for training-data pipelines: tokenization
 * stats, quality scoring, language identification, fingerprinting.
 * All pure column expressions (codegen'd, no UDFs) — each row is
 * independent, so these scale embarrassingly: no shuffle at all
 * until an aggregation is asked for.
 */
object TextAnalysis {

  /** Standard text-cleaning pass for ingest: Unicode NFC composition
    * (native [[graft.functions.NfcNormalize]] kernel), control-char
    * strip, whitespace collapse, trim — all per-row/codegen'd, zero
    * shuffle. Idempotent. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.TextExprs.nfc_normalize(text),
        "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "\\s+", " "))

  /** Whitespace-delimited token array (regex matches non-space runs). */
  def tokens(text: Column): Column = regexp_extract_all(text, lit("\\S+"), lit(0))

  /** Token count WITHOUT materializing the token array — one codegen'd
    * `regexp_count` pass (same matches as `tokens`, no array alloc). */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** GPT-2-style pre-tokenizer pattern (simplified, lookahead-free so
    * it is valid in both Java regex and RE2): contraction suffixes,
    * space-prefixed letter/digit/punctuation runs, whitespace
    * remainder. Counting matches approximates the BPE token count a
    * subword tokenizer would produce — the budget unit for context
    * packing — in ONE codegen'd `regexp_count` pass. */
  // whitespace spelled as an explicit class: Java's \s and RE2's \s
  // disagree on vertical tab (U+000B), and this pattern must count
  // identically in Spark and the DuckDB oracle
  private val BPE_RE =
    "'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+|" +
      " ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+|[ \\t\\n\\x0B\\f\\r]+"

  /** BPE-ish subword token count (see [[BPE_RE]]); whitespace-token
    * count is [[tokenCount]]. */
  def bpeTokenCount(text: Column): Column = regexp_count(text, lit(BPE_RE))

  private val STOPWORDS = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** "Word W occurs as a whole whitespace-delimited token" as a regex:
    * not preceded and not followed by a non-space char. Counting hits
    * is then ONE codegen'd `regexp_count` pass over the text — no
    * token-array materialization and no interpreted higher-order
    * `filter` lambda (the interpreted-HOF-per-element trap that made
    * q57/q59 the slowest per-row queries in the round-2 bench). */
  private def tokenAlternationRe(words: Seq[String]): String =
    "(?<!\\S)(?:" + words.mkString("|") + ")(?!\\S)"

  private val STOPWORD_RE = tokenAlternationRe(STOPWORDS)

  /** Number of stopword tokens — single regex pass, fully codegen'd. */
  def stopwordHits(text: Column): Column =
    regexp_count(text, lit(STOPWORD_RE))

  /** Fraction of tokens that are stopwords (English marker set). */
  def stopwordRatio(text: Column): Column =
    stopwordHits(text) /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Mean token length in characters. */
  def avgTokenLen(text: Column): Column =
    (length(regexp_replace(text, "\\s+", "")) /
      greatest(tokenCount(text), lit(1)).cast("double"))

  /**
   * Heuristic quality score in [0,1]: combines length, stopword
   * presence and token-length sanity — the standard cheap pre-filter
   * before expensive model-based scoring. Counters ride ONE fused
   * [[graft.functions.LexicalStats]] codepoint pass (the regex
   * spelling stays in the DuckDB oracles; every IEEE operation keeps
   * its original association order for cross-engine parity).
   */
  def qualityScore(text: Column): Column =
    qualityFromStats(
      graft.functions.TextExprs.lexical_stats(text, Seq(STOPWORDS)))

  /** [[qualityScore]] off an existing [[graft.functions.LexicalStats]]
    * struct whose set 0 is [[STOPWORDS]] — lets table operators share
    * one kernel evaluation across all their stats columns. */
  private def qualityFromStats(ls: Column): Column = {
    val nTokSafe = greatest(ls.getField("n_tokens").cast("int"), lit(1))
      .cast("double")
    val lenScore = least(ls.getField("n_chars").cast("int").cast("double")
      / 400.0, lit(1.0))
    val stopScore = least(
      (ls.getField("set_hits").getItem(0).cast("int") / nTokSafe) * 5.0,
      lit(1.0))
    val tokLen = ls.getField("n_nonspace").cast("int") / nTokSafe
    val tokScore = when(tokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore * 0.4 + stopScore * 0.3 + tokScore * 0.3), 6)
  }

  /** Per-language marker words for the n-gram/stopword language-ID
    * heuristic (top function words of each language). */
  private val LANG_MARKERS: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "das", "und"),
    "fr" -> Seq("le", "la", "et", "les"),
    "es" -> Seq("el", "los", "que", "y"),
    "zh" -> Seq("的", "是", "了", "在"))

  /** Marker-hit count for one language — one regexp_count pass (the
    * markers are plain words, no regex metacharacters to escape). */
  def langScore(text: Column, lang: String): Column =
    regexp_count(text,
      lit(tokenAlternationRe(LANG_MARKERS.toMap.apply(lang)))).cast("long")

  /** argmax language by marker score (first language wins ties, in
    * LANG_MARKERS order — deterministic). All five marker sets are
    * counted by ONE fused [[graft.functions.LexicalStats]] pass
    * (whole-token membership ≡ the `(?<!\S)(?:…)(?!\S)` alternation
    * count, since a token equals at most one marker); the fold keeps
    * strictly-greater-wins so earlier languages keep ties. */
  def langId(text: Column): Column =
    langArgmax(graft.functions.TextExprs
      .lexical_stats(text, LANG_MARKERS.map(_._2)).getField("set_hits"))._1

  private def langArgmax(hits: Column): (Column, Column) =
    LANG_MARKERS.indices.tail.foldLeft(
      (lit(LANG_MARKERS.head._1), hits.getItem(0))) {
      case ((bestL, bestS), i) =>
        val s = hits.getItem(i)
        (when(s > bestS, LANG_MARKERS(i)._1).otherwise(bestL),
          greatest(s, bestS))
    }

  /**
   * Language-ID as a table transform: ONE fused
   * [[graft.functions.LexicalStats]] codepoint pass counts all five
   * marker sets per row, and the argmax is a per-row fold — NO
   * explode, NO join, NO window, zero shuffle (the previous
   * explode + broadcast-join + window plan shuffled a corpus-sized
   * token stream; per-row whole-token membership is the same count).
   * Docs with zero marker hits get the first language with score 0 —
   * `langId`'s deterministic tie rule, strictly-greater-wins in
   * LANG_MARKERS order.
   */
  def langIdTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hits = graft.functions.TextExprs
      .lexical_stats(col(textCol), LANG_MARKERS.map(_._2)).getField("set_hits")
    val (bestL, bestS) = langArgmax(hits)
    docs.select(col(idCol).as("doc_id"),
      bestL.as("pred_lang"), bestS.cast("long").as("score"))
  }

  /**
   * All per-document token/quality stats in ONE codegen'd projection —
   * no explode, no join, no shuffle: every stat reads a field of ONE
   * fused [[graft.functions.LexicalStats]] codepoint pass (shared
   * across all columns by whole-stage codegen's subexpression
   * elimination), so the operator is embarrassingly parallel and the
   * text is scanned once however many ratios are projected.
   */
  def textStatsTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val ls = graft.functions.TextExprs.lexical_stats(col(textCol), Seq(STOPWORDS))
    val nTokSafe = greatest(ls.getField("n_tokens").cast("int"), lit(1))
      .cast("double")
    docs.select(col(idCol),
      ls.getField("n_tokens").cast("int").as("n_tokens"),
      round(ls.getField("n_nonspace").cast("int") / nTokSafe, 6)
        .as("avg_token_len"),
      round(ls.getField("set_hits").getItem(0).cast("int") / nTokSafe, 6)
        .as("stopword_ratio"),
      qualityFromStats(ls).as("quality"))
  }

  /**
   * Gopher quality-rule battery (Rae et al. 2021, "Scaling Language
   * Models", appendix A1.1 — the MassiveText document filter; the
   * published constants are kept verbatim). Per document:
   *
   *   - `f_words`:     50 ≤ word count ≤ 100,000
   *   - `f_mean_len`:  3 ≤ mean word length ≤ 10 characters
   *   - `f_symbol`:    symbol-to-word ratio ≤ 0.1 ('#' and '...')
   *   - `f_alpha`:     ≥ 80% of words contain ≥ 1 alphabetic char
   *   - `f_stop`:      ≥ 2 hits from the small stopword marker set
   *   - `keep`:        conjunction of all five
   *
   * (Gopher's remaining rules — bullet/ellipsis LINE ratios and the
   * duplicate-line/top-n-gram repetition rates — are line-shape and
   * repetition signals; the full n = 2..10 repetition battery is
   * `functions.TextExprs.RepetitionNgrams` (qAA, q9E for the bigram
   * summary) and this corpus is single-line, so they live there.)
   *
   * Every rule is a per-row `regexp_count`/`length` aggregate in ONE
   * codegen'd projection — no token-array materialization, no
   * explode, no shuffle: embarrassingly parallel at any corpus size,
   * and the shared token count collapses under whole-stage codegen's
   * subexpression elimination. Ratios are IEEE divisions of
   * exactly-representable integers, so any SQL engine computing the
   * same expression orders and thresholds identically (the DuckDB
   * oracle for qA6 is bit-compatible).
   */
  def gopherRulesTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // every counter reads ONE fused LexicalStats codepoint pass (the
    // five regex scans this projection used to cost live on in the
    // DuckDB oracle spelling; n_alpha_words replicates the
    // one-match-per-qualifying-token `(?<!\S)[^\p{L}\s]*\p{L}\S*`
    // count — \p{L} ≡ Character.isLetter, CJK ideographs included)
    val ls = graft.functions.TextExprs.lexical_stats(col(textCol), Seq(STOPWORDS))
    val nw = ls.getField("n_tokens").cast("int")
    val nwSafe = greatest(nw, lit(1)).cast("double")
    val mwl = ls.getField("n_nonspace").cast("int") / nwSafe
    val symbolRatio =
      (ls.getField("n_hash").cast("int") + ls.getField("n_ellipsis").cast("int"))
        .cast("double") / nwSafe
    val alphaRatio =
      ls.getField("n_alpha_words").cast("int").cast("double") / nwSafe
    val stopHits = ls.getField("set_hits").getItem(0).cast("int")
    val fWords = nw.between(50, 100000)
    val fMeanLen = mwl.between(3.0, 10.0)
    val fSymbol = symbolRatio <= 0.1
    val fAlpha = alphaRatio >= 0.8
    val fStop = stopHits >= 2
    docs.select(col(idCol),
      nw.as("n_words"),
      round(mwl, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaRatio, 6).as("alpha_ratio"),
      stopHits.as("stop_hits"),
      fWords.as("f_words"),
      fMeanLen.as("f_mean_len"),
      fSymbol.as("f_symbol"),
      fAlpha.as("f_alpha"),
      fStop.as("f_stop"),
      (fWords && fMeanLen && fSymbol && fAlpha && fStop).as("keep"))
  }

  /**
   * HTML → text extraction for web-crawl ingest: drop `<script>` /
   * `<style>` blocks WITH their contents, strip every remaining tag,
   * decode the six ubiquitous entities (`&amp;` last, per the
   * standard unescape order), collapse whitespace. Chained codegen'd
   * `regexp_replace`/`replace` passes — per-row, zero shuffle,
   * embarrassingly parallel. Patterns are lazy-quantified but
   * LOOKAROUND- and BACKREFERENCE-free, so each is valid and
   * identical in Java regex (Spark codegen) and RE2 (the DuckDB
   * oracle) — script and style need separate passes because RE2 has
   * no backreferences.
   */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noStyle, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /**
   * URL canonicalization — the FIRST dedup key of every web-crawl
   * pipeline: lowercase scheme+host, strip default :80/:443 ports,
   * drop the fragment, remove tracking parameters (`utm_*`, `fbclid`,
   * `gclid`, `ref`), sort the surviving query parameters, normalize
   * an empty path to `/`. Pure column expressions; the one
   * higher-order `filter` runs over a handful of query params per
   * row (not the per-token interpreted-HOF trap). Patterns are
   * RE2-safe, so the DuckDB oracle runs the identical chain.
   */
  def normalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val host = lower(regexp_replace(regexp_extract(rest, "^([^/?]+)", 1),
      ":(80|443)$", ""))
    val pathq = regexp_replace(rest, "^[^/?]+", "")
    val path0 = regexp_extract(pathq, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(pathq, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"), p =>
      p =!= "" && !p.rlike("^(utm_[^=]*|fbclid|gclid|ref)="))
    val qs = array_join(array_sort(kept), "&")
    concat(scheme, lit("://"), host, path,
      when(qs === "", lit("")).otherwise(concat(lit("?"), qs)))
  }

  /** Host of a [[normalizeUrl]]-canonical URL. */
  def urlHost(urlNorm: Column): Column =
    regexp_extract(urlNorm, "^[a-z][a-z0-9+.-]*://([^/]+)", 1)

  /** Every label-aligned dot-suffix of a host — 'a.b.com' →
    * [a.b.com, b.com, com]: the bounded fan-out (≤ label count) that
    * turns subdomain-inclusive blocklist matching into a
    * broadcastable EQUI-join, and keeps matching label-aligned
    * ('notexample.com' never matches a blocked 'example.com' the way
    * a raw endswith would). */
  def hostSuffixes(host: Column): Column =
    // one right-to-left codegen'd pass ([[graft.functions.HostSuffixes]],
    // pinned in ShingleParitySpec ≡ transform(sequence(1, size(labels)),
    // i → array_join(slice(labels, i, size(labels)), ".")) over
    // split(host, "\\."), empty labels from consecutive/trailing dots
    // included); the relational chain re-split/re-sliced per suffix
    // position — O(labels²) interpreted lambda evaluations
    graft.functions.TextExprs.host_suffixes(host)

  /**
   * Crawl-hygiene domain filter: drop every document whose canonical
   * URL host is on the blocklist, INCLUDING subdomains of blocked
   * domains. Scale shape: each host explodes to its dot-suffixes (a
   * tiny bounded fan-out), semi-joins the BROADCAST blocklist on
   * suffix equality — map-side, the corpus never shuffles for the
   * match — and the resulting blocked-id set (spam-scale, not
   * corpus-scale) anti-joins back on the id, which AQE broadcasts
   * when it fits. Never a nested-loop endswith join.
   */
  def domainFilter(docs: DataFrame, idCol: String, urlNormCol: String,
                   blocklist: DataFrame): DataFrame = {
    val blockedIds = docs
      .select(col(idCol),
        explode(hostSuffixes(urlHost(col(urlNormCol)))).as("__suffix"))
      .join(broadcast(blocklist.select(lower(col("host")).as("__suffix"))),
        Seq("__suffix"), "left_semi")
      .select(idCol).distinct()
    docs.join(blockedIds, Seq(idCol), "left_anti")
  }

  /** Content-addressed fingerprint over whitespace-normalized text. */
  def fingerprintMd5(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    * SIGMOD 2003 — the MOSS scheme; distinct from q61's single
    * whole-document rolling-min hash): hash every overlapping
    * `k`-word gram, slide a `w`-gram window and keep each window's
    * MINIMUM hash with the RIGHTMOST tie-break, recording positions.
    * Guarantees any shared token run of ≥ w+k-1 tokens contributes at
    * least one shared (position-stamped) fingerprint — the standard
    * local fingerprint for plagiarism/near-dup detection.
    *
    * Scale shape: entirely per-row higher-order-function math inside
    * one codegen'd projection — ZERO shuffles at any corpus size
    * (selection over a size-w slice per window start, O(m·w) per doc).
    * The gram hash is the 40-bit md5 prefix (replayed exactly by the
    * DuckDB oracle); hash and position pack into one long
    * (h·2²⁰ + (2²⁰−1−pos)) so min-with-rightmost-tie-break is a
    * single `array_min`. A document beyond 2²⁰−1 grams fails LOUDLY
    * (raise_error) rather than fingerprinting wrongly — mirroring the
    * [[Multimodal]] frame-cap contract.
    *
    * Emits one row per selected fingerprint: (doc_id, pos, fp). */
  private val WinnowPosCap = 1L << 20

  /** The selected winnow KEY array (h·2²⁰ + (2²⁰−1−pos), distinct) for
    * one row's text — the shared per-row kernel behind the batch
    * [[winnowFingerprints]] and the streaming stateless stage
    * ([[graft.streaming.StreamingWinnow]]). Gram hashing is an O(m)
    * `transform` (each gram hashed ONCE — single consumer), selection
    * is the O(m) native [[graft.functions.WinnowSelect]] deque kernel;
    * the >2²⁰-gram cap fails loudly inside the kernel. */
  private[graft] def winnowKeyArray(textCol: Column, k: Int, w: Int): Column = {
    require(k >= 1 && w >= 1, "winnow gram size and window must be >= 1")
    val grams = coalesce(
      graft.functions.ShingleExprs.token_grams(textCol, k, overlapping = true),
      array().cast("array<string>"))
    val keys = transform(grams, (g, i) =>
      conv(substring(md5(g), 1, 10), 16, 10).cast("long") * lit(WinnowPosCap) +
        (lit(WinnowPosCap - 1) - i.cast("long")))
    graft.functions.WinnowSelect.winnow_select(keys, w)
  }

  def winnowFingerprints(docs: DataFrame, idCol: String, textCol: String,
                         k: Int = 3, w: Int = 4): DataFrame = {
    docs.select(col(idCol).as("doc_id"),
        winnowKeyArray(col(textCol), k, w).as("fps"))
      .select(col("doc_id"), explode(col("fps")).as("key"))
      .select(col("doc_id"),
        (lit(WinnowPosCap - 1) - col("key").bitwiseAND(lit(WinnowPosCap - 1)))
          .as("pos"),
        shiftright(col("key"), 20).as("fp"))
  }

  /** MOSS-style near-dup candidate pairs from shared winnowing
    * fingerprints: docs are paired iff they share ≥ `minShared`
    * selected fingerprint VALUES, scored by containment
    * (shared / min(|fp_a|, |fp_b|)). Because winnowing guarantees a
    * fingerprint inside every w-window, a pair sharing any
    * ≥ (w+k-1)-token run is guaranteed a shared fingerprint — local
    * plagiarism detection that Jaccard-style whole-doc measures dilute
    * away on long documents.
    *
    * Scale shape: fingerprinting is the zero-shuffle
    * [[winnowFingerprints]] kernel; pairing is the standard banded
    * spine — ONE shuffle by fingerprint value, hot fingerprints
    * (ubiquitous boilerplate grams) dropped loudly via
    * [[Dedup.capBuckets]] before the self-join, so the candidate
    * stream is Σ bucket² over CAPPED buckets, never all-pairs. */
  def winnowPairs(docs: DataFrame, idCol: String, textCol: String,
                  k: Int = 3, w: Int = 4, minShared: Int = 2,
                  maxFpBucket: Option[Int] = Some(100),
                  fingerprints: Option[DataFrame] = None): DataFrame = {
    require(minShared >= 1, "minShared must be >= 1")
    // `fingerprints` lets callers feed a precomputed (ingest-time)
    // winnow index — the MOSS deployment shape — instead of
    // re-fingerprinting the corpus per query
    val fps = fingerprints
      .getOrElse(winnowFingerprints(docs, idCol, textCol, k, w))
      .select(col("doc_id"), col("fp")).distinct()
    val sizes = fps.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    val capped = Dedup.capBuckets(fps, Seq("fp"), maxFpBucket, "winnowPairs")
    val shared = capped.as("x").join(capped.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
    shared
      .join(sizes.select(col("doc_id").as("id_a"), col("n_fp").as("n_a")),
        Seq("id_a"))
      .join(sizes.select(col("doc_id").as("id_b"), col("n_fp").as("n_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          least(col("n_a"), col("n_b")).cast("double"), 6).as("containment"))
  }

  /** Flesch reading-ease readability — the classic curation signal for
    * "is this prose or a keyword dump": 206.835 − 1.015·(words/sents)
    * − 84.6·(syllables/words), with the standard heuristics (sentences
    * = `[.!?]+` runs, syllables = vowel-group count). The counts ride
    * the fused [[graft.functions.TextProfile]] kernel (one codepoint
    * pass shared with the other profilers via codegen CSE) — its run
    * counters replicate the regex-count spelling the DuckDB oracle
    * keeps. Per-row, zero shuffle; divisions guard empty text via
    * greatest(1). Rounded 1e-6 for cross-engine float parity. */
  def fleschReadingEase(text: Column): (Seq[(String, Column)]) = {
    val p = graft.functions.TextExprs.text_profile(text)
    val words = greatest(p.getField("n_words"), lit(1L)).cast("double")
    val sents = greatest(p.getField("n_sentences"), lit(1L)).cast("double")
    val sylls = greatest(p.getField("n_syllables"), lit(1L)).cast("double")
    Seq(
      "n_words" -> words.cast("long"),
      "n_sentences" -> sents.cast("long"),
      "n_syllables" -> sylls.cast("long"),
      "flesch" -> graft.functions.GateRound(lit(206.835) -
        lit(1.015) * (words / sents) - lit(84.6) * (sylls / words), 6))
  }

  /** Encoding-damage ("mojibake") detection — the ingest-hygiene
    * battery for crawled text: U+FFFD replacement chars (decoder gave
    * up), C1 control chars U+0080–U+009F (latin-1/windows-1252 debris),
    * and the UTF-8-read-as-latin-1 digraph signature Ã + [U+0080–U+00BF]
    * (every two-byte UTF-8 sequence for U+00C0–U+00FF mis-decodes to
    * exactly that shape). Counted by the fused
    * [[graft.functions.TextProfile]] kernel in one codepoint pass (the
    * DuckDB oracle keeps the `\\x{...}` regex spelling, which the
    * kernel's counters replicate match-for-match). Per-row, zero
    * shuffle. */
  def mojibakeStats(text: Column): Seq[(String, Column)] = {
    val p = graft.functions.TextExprs.text_profile(text)
    val repl = p.getField("n_replacement")
    val c1 = p.getField("n_c1_controls")
    val digraph = p.getField("n_mojibake_digraphs")
    Seq(
      "n_replacement" -> repl,
      "n_c1_controls" -> c1,
      "n_mojibake_digraphs" -> digraph,
      "is_damaged" -> (repl + c1 + digraph > 0))
  }

  /** Unicode-script mix profile — multilingual-curation QA (a doc
    * labelled `en` that is 40% Han characters is a langid bug or a
    * crawler artifact): per-script character counts over the major
    * scripts + the dominant-script share. Counted by the fused
    * [[graft.functions.TextProfile]] kernel — ONE
    * `Character.UnicodeScript` walk (the tables Java regex `\\p{IsX}`
    * resolves to; RE2's `\\p{X}` in the oracle is the same script
    * property) instead of five full-text regex scans. Per-row, zero
    * shuffle. */
  def scriptProfile(text: Column): Seq[(String, Column)] = {
    val p = graft.functions.TextExprs.text_profile(text)
    val counts = Seq("latin", "cyrillic", "han", "arabic", "greek")
      .map(n => n -> p.getField(s"n_$n"))
    val total = counts.map(_._2).reduce(_ + _)
    counts.map { case (n, c) => s"n_$n" -> c } :+
      ("dominant_share" -> when(total === 0, lit(0.0))
        .otherwise(round(greatest(counts.map(_._2.cast("double")): _*) /
          total.cast("double"), 6)))
  }

  /** Per-SOURCE Zipf fit — corpus-health monitoring: natural language
    * follows freq ∝ rank^s with s ≈ −1; a source whose fitted slope
    * drifts far from −1 (template spam → flat head; key-value dumps →
    * cliff tails) is a curation red flag. Least squares of ln(freq) on
    * ln(rank) in CLOSED FORM: slope = (Σxy − ΣxΣy/n)/(Σx² − (Σx)²/n),
    * computed in exactly that association order in both engines.
    *
    * Scale shape: token counts are one map-side-combining hash agg;
    * the only window ranks WITHIN a source's vocabulary (deterministic
    * freq-desc/token-asc order), which is ≪ corpus size — the corpus
    * token stream itself never enters a window. The final per-source
    * moments are another partial agg. |sources| rows out. */
  def zipfSlopes(docs: DataFrame, sourceCol: String, textCol: String): DataFrame = {
    val counts = docs.select(col(sourceCol).as("source"),
        explode(coalesce(tokens(col(textCol)),
          array().cast("array<string>"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("c").desc, col("tok"))
    val xy = counts.withColumn("rank", row_number().over(w))
      .select(col("source"),
        log(col("rank").cast("double")).as("x"),
        log(col("c").cast("double")).as("y"))
    xy.groupBy(col("source"))
      .agg(count(lit(1)).as("n_types"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("source"), col("n_types"),
        when(col("n_types") < 2, lit(0.0))
          .otherwise(graft.functions.GateRound(
            (col("sxy") - col("sx") * col("sy") / col("n_types").cast("double")) /
              (col("sxx") - col("sx") * col("sx") / col("n_types").cast("double")),
            6)).as("zipf_slope"),
        when(col("n_types") < 2, lit(0.0))
          .otherwise(graft.functions.GateRound(
            (col("sy") - ((col("sxy") - col("sx") * col("sy") / col("n_types").cast("double")) /
              (col("sxx") - col("sx") * col("sx") / col("n_types").cast("double"))) * col("sx")) /
              col("n_types").cast("double"), 6)).as("intercept"))
  }

  /** Per-document unigram token ENTROPY + type-token ratio — the
    * classic lexical-diversity / degenerate-text signals (a crawler
    * trap repeating one token scores H≈0; natural prose scores near
    * ln(n_types)). H = ln n − (Σ c·ln c)/n computed in exactly that
    * association order in both engines for IEEE parity.
    *
    * Scale shape: explode → partial-agg by (doc, token) → partial-agg
    * by doc; both aggregations map-side combine, nothing wider than a
    * document's type count ever groups, and the corpus text itself is
    * never shuffled (only (doc_id, token) pairs). */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc_id"),
      explode(coalesce(tokens(col(textCol)),
        array().cast("array<string>"))).as("tok"))
    val per = tok.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast("double") * log(col("c").cast("double")))
          .as("clogc"))
    docs.select(col(idCol).as("doc_id"))
      .join(per, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_types"), lit(0L)).as("n_types"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(graft.functions.GateRound(log(col("n_tokens").cast("double")) -
            col("clogc") / col("n_tokens").cast("double"), 6)).as("entropy"),
        when(coalesce(col("n_tokens"), lit(0L)) === 0, lit(0.0))
          .otherwise(round(col("n_types").cast("double") /
            col("n_tokens").cast("double"), 6)).as("ttr"))
  }

  /**
   * Per-source z-score calibration of an INTEGER quality score — the
   * robust-thresholding stage between scoring and filtering: an
   * absolute cutoff (length, entropy bucket, classifier logit)
   * over-filters clean domains and under-filters noisy ones, so
   * production filters standardize within source first and trim by
   * |z| (length outliers per domain being the classic case). Emits
   * every row with its source mean/sigma-relative z (rounded 6) and
   * `keep = |z| ≤ zAbsMax`; single-member sources (sigma undefined)
   * and zero-variance sources emit null z and KEEP (no evidence of
   * outlierhood, and a NaN must never decide a filter — Spark orders
   * NaN largest).
   *
   * Exactness contract: the score must be integer-valued (token
   * counts, char counts, bucket ids). Moments come from exact BIGINT
   * Σx and Σx² (not a streaming stddev, whose accumulation order
   * differs per engine), so mu/sigma/z are fixed-form IEEE arithmetic
   * on identical operands — a SQL oracle hash-matches them. Σx² must
   * stay below 2^63 (|score| ≤ ~3e6 at a billion rows per source —
   * true for every per-doc count this engine emits).
   *
   * Shape: one |S|-row aggregate, broadcast join, map-side
   * projection; the corpus never shuffles.
   */
  def sourceZScores(docs: DataFrame, idCol: String, srcCol: String,
                    scoreCol: String, zAbsMax: Double = 3.0): DataFrame = {
    val x = col(scoreCol).cast("long")
    // count(x), not count(*): a null score must stay OUT of the
    // moments (sum already skips it — a mismatched n would bias mu
    // for every scored row in the source) and out of the row-level
    // decision below (its z is null evidence, so it KEEPS — the same
    // "null must never decide a filter" contract as the fractions in
    // [[lineStats]])
    val stats = docs.groupBy(col(srcCol)).agg(
      sum(x).as("__s1"), sum(x * x).as("__s2"), count(x).as("__n"))
    val nd = col("__n").cast("double")
    val s1d = col("__s1").cast("double")
    val mu = s1d / nd
    // sample variance from exact sums; clamp at 0 against the last-ulp
    // negative a constant source can produce
    val variance = (col("__s2").cast("double") - s1d * s1d / nd) / (nd - 1)
    val z = graft.functions.GateRound((x.cast("double") - mu) /
      sqrt(greatest(variance, lit(0.0))), 6)
    val defined = col("__n") > 1 && variance > 0 && x.isNotNull
    docs.select(col(idCol).as("doc_id"), col(srcCol), col(scoreCol))
      .join(broadcast(stats), Seq(srcCol))
      .select(col("doc_id"), col(srcCol), col(scoreCol),
        when(defined, z).as("z"),
        when(defined, abs(z) <= lit(zAbsMax))
          .otherwise(lit(true)).as("keep"))
  }

  /** PII patterns for [[redactPii]] — deliberately lookaround-free so
    * each is valid and IDENTICAL in Java regex (Spark codegen) and RE2
    * (the DuckDB oracle). Ordering matters and is fixed: emails first
    * (their local part may contain digits a later pass would touch),
    * then dotted-quad IPs, then international-format phone numbers. */
  val EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val IPV4_RE = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val PHONE_RE = "\\+\\d{1,2}[ -]\\d{3}[ -]\\d{3,4}[ -]\\d{3,4}"

  /** Redact emails / IPv4s / phone numbers to typed placeholder tokens
    * — the standard pre-training PII scrub. Three chained
    * `regexp_replace` passes in ONE codegen'd projection: per-row,
    * zero shuffle, embarrassingly parallel at any corpus size. */
  def redactPii(text: Column): Column =
    regexp_replace(regexp_replace(regexp_replace(text,
      EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"), PHONE_RE, "<PHONE>")

  /** Per-row PII hit counts (same patterns as [[redactPii]], applied
    * to the UNredacted text) — the audit metric next to the scrub. */
  def piiCounts(text: Column): Seq[(String, Column)] = Seq(
    "n_email" -> regexp_count(text, lit(EMAIL_RE)),
    "n_ip" -> regexp_count(text, lit(IPV4_RE)),
    "n_phone" -> regexp_count(text, lit(PHONE_RE)))

  /** Bare 13–19-digit runs, word-bounded — the PAN (payment-card
    * number) candidate shape. Lookaround-free, identical in Java
    * regex and RE2 (the [[EMAIL_RE]] contract). Candidates only:
    * a digit run is a card number iff it also passes [[luhnValid]] —
    * a plain regex scrub would eat order ids and timestamps. */
  val CC_RE = "\\b\\d{13,19}\\b"

  /** Luhn checksum (ISO/IEC 7812) of an all-digit string column, as a
    * pure column expression: from the RIGHT, double every second
    * digit (subtract 9 above 9) and require the sum ≡ 0 mod 10.
    * Exact integer arithmetic end to end, so any engine evaluating
    * the same formula agrees bit-for-bit. */
  def luhnValid(c: Column): Column = {
    val len = length(c)
    (aggregate(sequence(lit(1), len), lit(0),
      (acc, j) => {
        val d = c.substr(j, lit(1)).cast("int")
        val dbl = d * 2
        acc + when(((len - j) % 2) === 1,
          when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
      }) % 10 === 0)
  }

  /**
   * Credit-card redaction — the VALIDATED member of the PII family:
   * [[CC_RE]] digit runs are replaced with `<CC>` only when the Luhn
   * checksum confirms a plausible card number, so order ids, EANs
   * with a failing checksum, and timestamps survive while real PANs
   * do not (the precision/recall trade every published scrub makes).
   * Emits (doc_id, n_cards, redacted); null text redacts to the
   * empty string with 0 cards.
   *
   * Shape: per-row HOF chain — extract candidates, filter through
   * the integer-exact [[luhnValid]], fold a WORD-BOUNDED
   * `regexp_replace` over the validated list (a literal `replace`
   * would substitute the PAN everywhere its digits appear as a
   * substring — inside a longer non-candidate run like a 21-digit
   * order id — mangling text the candidate regex deliberately
   * excluded; the `\b` bounds pin each replacement to the exact
   * spans the extraction matched, and digits carry no regex
   * metacharacters to escape); zero shuffle, and the whole pipeline
   * (regex, checksum, fold) replays verbatim in the SQL oracle.
   */
  def redactCreditCards(docs: DataFrame, idCol: String,
                        textCol: String): DataFrame = {
    val text = coalesce(col(textCol), lit(""))
    val valid = filter(regexp_extract_all(text, lit(CC_RE), lit(0)),
      c => luhnValid(c))
    docs.select(col(idCol).as("doc_id"),
      size(valid).as("n_cards"),
      aggregate(valid, text, (acc, v) =>
        regexp_replace(acc, concat(lit("\\b"), v, lit("\\b")), lit("<CC>")))
        .as("redacted"))
  }

  /**
   * Top-k TF-IDF terms per document. Classic distributed shape: one
   * explode + two aggregations (term frequency per doc, document
   * frequency per term — both partial/final hash aggregates), idf
   * joined back (term-keyed, naturally broadcastable: vocabulary ≪
   * corpus), ranking via per-doc window. Ranking compares the ROUNDED
   * score so cross-engine libm ulp differences cannot reorder ties.
   */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("n_t"))
    val n = terms.agg(countDistinct(col("doc_id")).as("nd"))
    val df_ = terms.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("dfreq"))
    // NOTE: df_ (per-term document frequency) is NOT broadcast-hinted —
    // vocabulary grows with the corpus, and a forced broadcast OOMs at
    // 100 TB. AQE picks broadcast at small scale on its own; at large
    // scale both sides are already term-keyed for a shuffle join.
    val scored = tf.crossJoin(broadcast(n))
      .join(df_, "term")
      .withColumn("tfidf",
        round(col("n_t") * log(col("nd").cast("double") / col("dfreq")), 6))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rn"))
  }

  /**
   * CCNet-style LM quality scoring: a unigram language model with
   * add-alpha smoothing trained on a reference slice (e.g. the target
   * language's documents), each document scored by its average
   * negative log-likelihood under the model — low = fluent/in-domain,
   * high = out-of-domain or junk. Thresholding/bucketing `avg_nll` is
   * the classic LM quality-and-language filter (CCNet buckets by
   * perplexity tertile); perplexity itself is `exp(avg_nll)`.
   *
   * Model: p(tok) = (c(tok) + α) / (N + α·(V+1)) with one pooled OOV
   * bucket — every factor is a deterministic function of the train
   * slice, no RNG anywhere.
   *
   * Scale shape: the LM is a MODEL, not corpus metadata — it is
   * aggregated once (partial/final hash-agg over the train slice),
   * pruned by `minCount` (how CCNet keeps its KenLM bounded; a rare
   * token below the cutoff scores as OOV), collected, and broadcast.
   * Unlike [[tfidfTopTerms]]'s corpus-wide vocabulary, the broadcast
   * is bounded by the pruning knob, and the one driver round-trip
   * also yields the model constants (N over kept tokens, V) without a
   * second aggregation pass. Scoring is then explode → broadcast hash
   * join → per-doc partial/final aggregate: the only corpus-sized
   * shuffle carries (doc, partial-sum) rows. `avg_nll` is rounded
   * 1e-6 for cross-engine `ln` parity (see [[bm25Rank]]).
   */
  /** Shared LM model build: one partial/final hash-agg over the
    * exploded gram stream, pruned by `minCount`, collected once (the
    * driver round-trip also yields the model constants downstream).
    * `maxVocab` bounds the driver-side model — at the default
    * minCount=1 nothing prunes, and an unbounded vocabulary must fail
    * loudly, not OOM the driver: the collect itself is capped by the
    * limit, so the failure costs maxVocab rows, never the full vocab. */
  private def trainModel(grams: org.apache.spark.sql.DataFrame,
                         minCount: Long, maxVocab: Int, what: String,
                         allowEmpty: Boolean = false): Array[(String, Long)] = {
    val m = grams.toDF("g")
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .limit(maxVocab + 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(m.length <= maxVocab,
      s"$what: model exceeds maxVocab=$maxVocab surviving entries — " +
        "raise minCount (or maxVocab)")
    // an empty UNIGRAM model scores EVERY token p=1 / nll=0 — junk
    // would read as maximally fluent, so fail loudly (an empty bigram
    // table is legitimate: every transition backs off to OOV)
    require(allowEmpty || m.nonEmpty,
      s"$what: train slice has no grams with count >= $minCount")
    m
  }

  /** Shared per-token unigram-nll stream of [[lmScore]] and
    * [[minKProbScore]]: train the add-α model ONCE (broadcast), emit
    * (id [, carry...], nll) per token. This arithmetic must stay in
    * exact FP lockstep with the DuckDB oracles of BOTH consumers —
    * one definition so a smoothing/denominator change cannot leave
    * one of them silently on the old formula.
    *
    * Unseen tokens share one OOV bucket: denominator adds α·(V+1).
    * Long→Double is exact below 2^53 and α·(V+1) is one IEEE
    * multiply, so any engine computing this formula lands on the
    * same double. `carry`: columns functionally dependent on the id
    * (e.g. lang) ride the exploded stream, so a caller needing them
    * does not re-join the corpus after scoring. */
  private def unigramNll(docs: org.apache.spark.sql.DataFrame,
                         train: org.apache.spark.sql.DataFrame,
                         idCol: String, textCol: String, alpha: Double,
                         minCount: Long, maxVocab: Int, what: String,
                         carry: Seq[String] = Nil)
      : org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val model = trainModel(
      train.select(explode(tokens(col(textCol))).as("g")),
      minCount, maxVocab, what)
    val n = model.map(_._2).sum
    val v = model.length.toLong
    val denom = n + alpha * (v + 1)
    val counts = model.toSeq.toDF("tok", "cnt")
    val keyCols = col(idCol) +: carry.map(col)
    docs.select(keyCols :+ explode(tokens(col(textCol))).as("tok"): _*)
      .join(broadcast(counts), Seq("tok"), "left")
      .select(keyCols :+
        (-log((coalesce(col("cnt"), lit(0L)) + lit(alpha)) / lit(denom))).as("nll"): _*)
  }

  def lmScore(docs: org.apache.spark.sql.DataFrame,
              train: org.apache.spark.sql.DataFrame, idCol: String,
              textCol: String, alpha: Double = 0.5,
              minCount: Long = 1L, carry: Seq[String] = Nil,
              maxVocab: Int = 10000000): org.apache.spark.sql.DataFrame =
    unigramNll(docs, train, idCol, textCol, alpha, minCount, maxVocab,
        "lmScore", carry)
      .groupBy(col(idCol) +: carry.map(col): _*)
      .agg(round(avg(col("nll")), 6).as("avg_nll"),
        count(lit(1)).as("n_tokens"))

  /**
   * Chat-transcript turn parsing — the SFT/instruction-data twin of
   * the pretraining battery: fine-tuning corpora arrive as
   * role-marked transcripts (`<|user|> … <|assistant|> …`) and every
   * downstream stage (role-conditional stats, loss masking,
   * turn-count filters, per-role dedup keys) needs (doc, turn_idx,
   * role, text) rows. RE2-safe parse — no lookarounds, so the SQL
   * oracle replays it: markers rewrite to `\u0001role\u0002` (after
   * stripping any payload occurrence of the sentinels — a transcript
   * cannot forge a turn boundary), the text splits on `\u0001`, and
   * each piece splits role from content on `\u0002`. Text before the
   * first marker (normally empty in a well-formed transcript) is
   * dropped; turn text is trimmed. Per-row explode, zero shuffle.
   */
  /** The shared marker rewrite of [[chatTurns]] and [[sftMaskStats]]:
    * sentinel-strip then `<|role|>` -> `\u0001role\u0002` (forgery-
    * proof -- a transcript cannot fabricate a turn boundary). */
  private[graft] def chatMarked(textCol: Column, roles: Seq[String]): Column = {
    require(roles.nonEmpty && roles.forall(_.matches("[A-Za-z0-9_]+")),
      s"roles must be bare identifiers, got $roles")
    regexp_replace(
      regexp_replace(coalesce(textCol, lit("")),
        "[\u0001\u0002]", ""),
      s"<\\|(${roles.mkString("|")})\\|>", "\u0001$1\u0002")
  }

  def chatTurns(docs: DataFrame, idCol: String, textCol: String,
                roles: Seq[String] = Seq("user", "assistant", "system"))
      : DataFrame = {
    val marked = chatMarked(col(textCol), roles)
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(marked, "\u0001", -1)))
      .filter(col("pos") > 0)
      .select(col("doc_id"), (col("pos") - 1).cast("int").as("turn_idx"),
        split(col("col"), "\u0002", 2).as("__rc"))
      .select(col("doc_id"), col("turn_idx"),
        element_at(col("__rc"), 1).as("role"),
        trim(element_at(col("__rc"), 2)).as("turn_text"))
  }

  /**
   * SFT loss-mask accounting over [[chatTurns]] — what fraction of a
   * transcript actually trains: assistant turns carry loss, user/
   * system turns are masked context, and transcripts with no
   * assistant turn (or a degenerate trainable fraction) are dropped
   * before tokenization rather than discovered as wasted batch mass
   * later. Per doc: turn count, trainable (assistant) token count,
   * masked token count, trainable fraction (exact-integer IEEE
   * division rounded 6), keep = has ≥1 TRAINABLE TOKEN (an assistant
   * turn with empty content carries no loss and does not keep) AND
   * trainable_frac ≥ minTrainableFrac. The trainable role is an
   * explicit parameter and must be one of `roles` — a corpus using
   * "gpt"/"human" markers must say so, or every transcript would
   * silently read all-masked.
   *
   * EVERY input document emits exactly one row: a transcript with no
   * parseable turn (no role marker at all) surfaces as an explicit
   * (n_turns=0, trainable_frac=null, keep=false) row rather than
   * vanishing — a caller joining on keep must see the drop decision
   * (the round-13 advice finding). Since all of a transcript's turns
   * live in its ONE input row, the stats are a per-row kernel over
   * the split pieces ([[graft.operators.Dedup]]'s fuse-the-explode
   * lever) — zero shuffle, not even the per-doc aggregate.
   */
  def sftMaskStats(docs: DataFrame, idCol: String, textCol: String,
                   minTrainableFrac: Double = 0.1,
                   roles: Seq[String] = Seq("user", "assistant", "system"),
                   trainableRole: String = "assistant"): DataFrame = {
    require(roles.contains(trainableRole),
      s"trainableRole '$trainableRole' is not among the parsed roles " +
        s"$roles — every transcript would silently read all-masked")
    val pieces = filter(
      split(chatMarked(col(textCol), roles), "\u0001", -1),
      (_, i) => i > 0)
    val role = (p: Column) => element_at(split(p, "\u0002", 2), 1)
    // a piece always contains the role separator (only the marker
    // rewrite can mint one), but a null-safe fold costs nothing: one
    // null leg would otherwise poison the whole sum
    val toks = (p: Column) => coalesce(
      tokenCount(element_at(split(p, "\u0002", 2), 2)).cast("long"), lit(0L))
    def tokSum(pred: Column => Column): Column =
      aggregate(col("__turns"), lit(0L),
        (acc, p) => acc + when(pred(p), toks(p)).otherwise(lit(0L)))
    val total = col("n_train_tokens") + col("n_mask_tokens")
    val frac = when(total > 0,
      round(col("n_train_tokens").cast("double") / total.cast("double"), 6))
    docs
      .select(col(idCol).as("doc_id"), pieces.as("__turns"))
      .select(col("doc_id"),
        size(col("__turns")).cast("long").as("n_turns"),
        tokSum(p => role(p) === trainableRole).as("n_train_tokens"),
        tokSum(p => role(p) =!= trainableRole).as("n_mask_tokens"))
      .select(col("doc_id"), col("n_turns"), col("n_train_tokens"),
        col("n_mask_tokens"),
        frac.as("trainable_frac"),
        (col("n_train_tokens") > 0 &&
          coalesce(frac >= lit(minTrainableFrac), lit(false))).as("keep"))
  }

  /**
   * Min-k% prob membership-inference score (Shi et al. 2023,
   * "Detecting Pretraining Data from Large Language Models") — the
   * MODEL-BASED contamination detector next to the exact-n-gram ones
   * ([[graft.operators.Contamination]]): memorized/leaked text has
   * anomalously FEW surprising tokens under a reference LM, so the
   * mean negative-log-likelihood of each document's k% most
   * surprising tokens separates members from non-members far better
   * than the full-document perplexity (which fluent novel text also
   * lowers). Scores under the same add-α unigram reference model as
   * [[lmScore]] (train slice broadcast, [[lmScore]]'s exact
   * arithmetic); per document the token nlls sort DESCENDING and the
   * top ⌈kFrac·n⌉ average — `mink_score` rounded 1e-6, LOW scores =
   * familiar = flag. Emits every doc with ≥1 token:
   * (doc_id, n_tokens, mink_score, flagged = score < threshold).
   *
   * Scale shape: explode → broadcast model join → ONE per-doc
   * aggregate whose buffer is the doc's token-nll list (bounded by
   * document length — the same per-doc envelope as [[lineStats]]'s
   * line arrays; a corpus of context-window-sized docs keeps it a
   * few KB). The sort/slice/mean runs per row after the aggregate —
   * no second shuffle. Cross-engine: nll values differ in ulps
   * between engines' `ln`, but a boundary swap in the sorted list
   * moves the mean by ulps/n and the 1e-6 rounding absorbs it (the
   * q9Y precedent).
   */
  def minKProbScore(docs: org.apache.spark.sql.DataFrame,
                    train: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, kFrac: Double = 0.2,
                    threshold: Double = 4.0, alpha: Double = 0.5,
                    minCount: Long = 1L,
                    maxVocab: Int = 10000000): org.apache.spark.sql.DataFrame = {
    require(kFrac > 0.0 && kFrac <= 1.0, s"kFrac must be in (0, 1], got $kFrac")
    val kLen = ceil(col("n_tokens") * lit(kFrac)).cast("int")
    unigramNll(docs, train, idCol, textCol, alpha, minCount, maxVocab,
        "minKProbScore")
      .select(col(idCol).as("doc_id"), col("nll"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        reverse(sort_array(collect_list(col("nll")))).as("__nlls"))
      .select(col("doc_id"), col("n_tokens"),
        round(aggregate(slice(col("__nlls"), lit(1), kLen),
            lit(0.0), (acc, x) => acc + x) / kLen.cast("double"), 6)
          .as("mink_score"))
      .select(col("doc_id"), col("n_tokens"), col("mink_score"),
        (col("mink_score") < lit(threshold)).as("flagged"))
  }

  /**
   * Bigram upgrade of [[lmScore]] (CCNet's KenLM is higher-order; the
   * bigram model is the first step up from the unigram): the first
   * token scores under the unigram model, every following token under
   * p(tᵢ | tᵢ₋₁) = (c(tᵢ₋₁ tᵢ) + α) / (c(tᵢ₋₁) + α·(V+1)), both with
   * add-α smoothing against the pruned vocabulary.
   *
   * Scale shape mirrors [[lmScore]]: BOTH model tables (unigram vocab
   * + surviving bigrams, each pruned by `minCount`) are model-sized
   * and broadcast; the transition stream comes from the codegen'd
   * [[graft.functions.TokenGrams]] kernel map-side, takes two
   * broadcast joins (bigram hit count + prefix unigram count) and one
   * per-doc partial/final aggregate — still exactly one corpus-sized
   * shuffle of (doc, partial-sum) rows.
   */
  def lmScoreBigram(docs: org.apache.spark.sql.DataFrame,
                    train: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, alpha: Double = 0.5,
                    minCount: Long = 1L,
                    maxVocab: Int = 10000000): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val grams2 = graft.functions.ShingleExprs.token_grams(
      col(textCol), 2, overlapping = true)
    // two aggregation passes over the train slice (unigrams, bigrams) —
    // an offline model build, not the scoring hot path
    val uniModel = trainModel(
      train.select(explode(tokens(col(textCol))).as("g")),
      minCount, maxVocab, "lmScoreBigram")
    val bigModel = trainModel(train.select(explode(grams2).as("g")),
      minCount, maxVocab, "lmScoreBigram", allowEmpty = true)
    val n = uniModel.map(_._2).sum
    val v = uniModel.length.toLong
    val denomUni = n + alpha * (v + 1)
    val ovv = alpha * (v + 1) // smoothing mass added to every prefix count
    val uni = uniModel.toSeq.toDF("ptok", "uc")
    val big = bigModel.toSeq.toDF("term", "bc")
    // ONE corpus scan scores both term kinds: position 0 is the first
    // token (unigram formula), positions ≥ 1 are the TokenGrams
    // transitions (bigram formula). The first token comes from a
    // single regexp_extract — not a full token-array materialization —
    // with the no-match "" mapped to null and dropped (a zero-token
    // doc scores nothing).
    docs
      .select(col(idCol), posexplode(concat(
          array(nullif(regexp_extract(col(textCol), "\\S+", 0), lit(""))),
          grams2))
        .as(Seq("pos", "term")))
      .filter(col("term").isNotNull)
      // the prefix whose unigram count conditions the term: the first
      // token itself at pos 0 (tokens never contain spaces), else the
      // gram's left token
      .withColumn("ptok", substring_index(col("term"), " ", 1))
      .join(broadcast(big), Seq("term"), "left")
      .join(broadcast(uni), Seq("ptok"), "left")
      .select(col(idCol),
        when(col("pos") === 0,
          -log((coalesce(col("uc"), lit(0L)) + lit(alpha)) / lit(denomUni)))
        .otherwise(
          -log((coalesce(col("bc"), lit(0L)) + lit(alpha)) /
            (coalesce(col("uc"), lit(0L)) + lit(ovv)))).as("nll"))
      .groupBy(col(idCol))
      .agg(round(avg(col("nll")), 6).as("avg_nll"),
        count(lit(1)).as("n_tokens"))
  }

  /**
   * CCNet's filtering step on top of [[lmScore]]: bucket every document
   * into per-language perplexity bands (1 = head/most fluent …
   * `nBuckets` = tail), from which the classic pipeline keeps the
   * head+middle. Buckets come from per-language type-7 quantile cuts —
   * computed by [[Quantiles.exactQuantiles]]'s distributed selection,
   * NOT an `ntile` window, which would funnel each language (half the
   * corpus is one language in practice) through a single task.
   *
   * The language rides the scoring aggregate as a carried group key
   * (no post-scoring corpus re-join), and the scored (id, lang,
   * avg_nll) projection is localCheckpoint'ed once: the cut
   * computation makes three metadata-sized passes over it and the
   * final bucket join a fourth — without the barrier each pass would
   * re-run the corpus-wide scoring plan. Buckets then attach via a
   * null-safe broadcast join of |langs| cut rows (a NULL language is
   * a band group like any other — a plain equi-join would silently
   * drop those docs) + a per-row compare.
   */
  def perplexityBuckets(docs: org.apache.spark.sql.DataFrame,
                        train: org.apache.spark.sql.DataFrame, idCol: String,
                        textCol: String, langCol: String,
                        nBuckets: Int = 3, alpha: Double = 0.5,
                        minCount: Long = 1L): org.apache.spark.sql.DataFrame = {
    require(nBuckets >= 2, "nBuckets must be >= 2")
    val scored = lmScore(docs, train, idCol, textCol, alpha, minCount,
        carry = Seq(langCol))
      .select(col(idCol), col(langCol), col("avg_nll"))
      .localCheckpoint()
    val qs = (1 until nBuckets).map(i => i / nBuckets.toDouble -> s"__q$i")
    val cuts = Quantiles.exactQuantiles(scored, langCol, "avg_nll", qs)
    scored.join(broadcast(cuts), scored(langCol) <=> cuts(langCol))
      .drop(cuts(langCol))
      .withColumn("bucket", qs.indices.foldLeft(lit(1)) { (acc, i) =>
        acc + when(col("avg_nll") > col(s"__q${i + 1}"), 1).otherwise(0) })
      .select(col(idCol), col(langCol), col("avg_nll"), col("bucket"))
  }

  /**
   * Feature-hashing ("hashing trick") text embedding: token t adds
   * sign(t) at index h(t) mod `dim` — the Vowpal Wabbit /
   * HashingVectorizer construction. No trained vocabulary and fully
   * deterministic (md5-derived bucket + sign, same convention as
   * [[graft.operators.Sampling.hash40]]), so any engine reproduces the
   * vectors bit-for-bit: every entry is a small integer-valued sum of
   * ±1. Bridges `documents` into the embedding operator family
   * (bruteForceTopK / semanticDedup / IVF / PQ) when no model
   * embeddings exist; docs with zero tokens produce no row.
   *
   * Scale shape: ONE fused kernel pass per row
   * ([[graft.functions.HashEmbedVec]]) — zero shuffles; the explode →
   * (doc, bucket) → per-doc-assembly relational form this replaced
   * shuffled the corpus token stream twice. One embedding row is
   * emitted PER INPUT ROW: `idCol` is expected unique (one document
   * per row); rows sharing an id get per-row vectors, where the old
   * groupBy form would have merged their token streams — dedup ids
   * upstream if that contract matters.
   */
  def hashEmbed(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, dim: Int = 64): org.apache.spark.sql.DataFrame = {
    require(dim > 0, "dim must be positive")
    // ONE fused kernel pass per document (graft.functions.HashEmbedVec)
    // — the relational form (explode → groupBy(id,bucket) → groupBy(id))
    // shuffled the corpus token stream twice; the kernel shuffles
    // nothing and is bit-identical ON UNIQUE-ID INPUTS (±1 sums are
    // order-exact in doubles, md5 bucket/sign convention replicated
    // byte-for-byte — the q9Z oracle pins it; see the scaladoc for
    // the duplicate-id contract change). Zero-token docs drop out
    // ("no distribution"), the same contract the explode form had.
    docs.select(col(idCol),
        graft.functions.TextExprs.hash_embed_vec(col(textCol), dim)
          .as("embedding"))
      .filter(col("embedding").isNotNull)
  }

  /**
   * DSIR importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every document
   * by how target-like its hashed unigram distribution is —
   * `weight(d) = Σ_tok [ ln p_t(b(tok)) − ln p_r(b(tok)) ]` where
   * `b(tok)` is the md5 feature bucket ([[hashEmbed]]'s hash, so DSIR
   * features and hashed embeddings can never desynchronize),
   * `p_c(b) = (count_c(b)+1) / (N_c + buckets)` with add-1 smoothing,
   * the target model `t` is the `isTarget` slice and the raw model `r`
   * is the whole input. Resampling keeps the top weights (or draws via
   * [[Sampling.weightedPrioritySample]] with `exp(weight)` weights).
   *
   * Scale shape: both corpus passes are fused kernels. The model is
   * one [[graft.functions.BucketCounts]] pass (per-document count
   * vectors, no token explode) reduced by a
   * [[graft.functions.LongVectorSum]] partial/final aggregate —
   * `buckets` longs per task, never the token stream; above 1024
   * buckets the dense per-row vector would cost O(buckets) per
   * document regardless of its length, so the model falls back to the
   * sparse explode → per-bucket hash-agg (O(total tokens), ≤ buckets
   * rows after map-side combine). Scoring is one
   * [[graft.functions.DsirScore]] pass with the ratio table riding as
   * a reference object — no explode, no join, no per-doc shuffle, and
   * O(tokens) per row at any bucket count. Every division has exact
   * integer-derived operands (one correctly-rounded IEEE op — any
   * engine lands on the same double); `ln` last-ulp and
   * summation-order drift are absorbed by the 1e-6 rounding, the
   * [[lmScore]]/[[bm25Rank]] convention. Documents with zero tokens
   * have no distribution and drop out. One output row is emitted PER
   * INPUT ROW ([[hashEmbed]]'s contract): `idCol` is expected unique —
   * rows sharing an id get per-row weights, where the old grouped
   * form merged their token streams.
   */
  def dsirWeights(docs: org.apache.spark.sql.DataFrame, idCol: String,
                  textCol: String, isTarget: Column,
                  buckets: Int = 64): org.apache.spark.sql.DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // model: per-bucket (raw, target) token counts — two plan shapes,
    // identical integers. Dense kernel path for the hashing-trick
    // regime (≤1024 buckets): one BucketCounts pass reduced by the
    // LongVectorSum partial/final aggregate, `buckets` longs per task,
    // never the token stream; null-text / zero-token docs contribute
    // zero vectors exactly as dropped explode rows did. Above 1024 the
    // dense vector costs O(buckets) per document regardless of length
    // (a boxed long[10k] per 50-token row), so the SPARSE explode →
    // per-bucket hash-agg takes over: O(total tokens), ≤ buckets rows
    // after map-side combine.
    val (cRaw, cT): (IndexedSeq[Long], IndexedSeq[Long]) =
      if (buckets <= 1024) {
        val zero = array_repeat(lit(0L), buckets)
        val lvs = org.apache.spark.sql.functions.udaf(
          new graft.functions.LongVectorSum(buckets),
          org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]())
        val row = docs.select(
            coalesce(graft.functions.TextExprs.bucket_counts(col(textCol),
              buckets), zero).as("c"),
            isTarget.cast("boolean").as("__t"))
          .agg(lvs(col("c")).as("raw"),
            lvs(when(col("__t"), col("c")).otherwise(zero)).as("t"))
          .head()
        (row.getSeq[Long](0).toIndexedSeq, row.getSeq[Long](1).toIndexedSeq)
      } else {
        val m = docs.select(isTarget.cast("boolean").as("__t"),
            explode(tokens(col(textCol))).as("tok"))
          .select(col("__t"),
            (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
              % buckets).cast("int").as("bucket"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("c_raw"),
            sum(when(col("__t"), 1L).otherwise(0L)).as("c_t"))
          .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2)))
          .toMap
        (IndexedSeq.tabulate(buckets)(b => m.get(b).map(_._1).getOrElse(0L)),
         IndexedSeq.tabulate(buckets)(b => m.get(b).map(_._2).getOrElse(0L)))
      }
    val nRaw = cRaw.sum
    val nT = cT.sum
    // same IEEE ops as the SQL oracle: exact-integer-derived divisions,
    // Math.log (the JVM's ln for Column log() too). Ratios exist for
    // every bucket; empty buckets' entries are never referenced (no
    // token hashes there).
    val ratios = (0 until buckets).map { b =>
      math.log((cT(b) + 1).toDouble / (nT + buckets)) -
        math.log((cRaw(b) + 1).toDouble / (nRaw + buckets))
    }
    // score: the second fused pass — per-doc Σ lr(bucket(tok)) and the
    // token count in one kernel (graft.functions.DsirScore, ratio
    // table rides as a reference object): no explode, no join, no
    // per-doc shuffle at all. Summation order changes vs the old
    // shuffled sum(lr); the 1e-6 rounding that already absorbed ln
    // last-ulp drift absorbs reorder drift of the same magnitude.
    // Zero-token docs drop out ("no distribution"), as before.
    docs.select(col(idCol),
        graft.functions.TextExprs.dsir_score(col(textCol), ratios).as("__d"))
      .filter(col("__d").isNotNull)
      .select(col(idCol),
        graft.functions.GateRound(col("__d.score"), 6).as("dsir_weight"),
        col("__d.n_tokens").as("n_tokens"))
  }

  /**
   * BM25 ranked retrieval (Robertson–Spärck Jones / Okapi BM25): score
   * every document against a fixed bag of query terms and return the
   * `topK`. Scores are rounded to 1e-6 BEFORE ordering so cross-engine
   * last-ulp `ln` differences can't flip ranks (same convention as
   * [[tfidfTopTerms]]).
   *
   * Scale shape: the corpus token stream is prefiltered by a BROADCAST
   * join against the |q|-row term list before any aggregation — only
   * matching (doc, term) rows ever shuffle; document frequencies are
   * |q| rows; the per-doc length join is the one corpus-sized join and
   * carries two columns. Final ranking is a global top-k
   * (`TakeOrderedAndProject`), not a sort.
   */
  def bm25Rank(docs: org.apache.spark.sql.DataFrame, idCol: String,
               textCol: String, queryTerms: Seq[String], k1: Double = 1.2,
               b: Double = 0.75, topK: Int = 10): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty, "query terms must be non-empty")
    val spark = docs.sparkSession
    import spark.implicits._
    // SET semantics: a duplicated query term would double-count into
    // tf through the join, feeding the saturation denominator a value
    // that matches no BM25 variant
    val qTerms = queryTerms.distinct
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(tokens(col(textCol))).as("term"))
    val lens = docs.select(col(idCol).as("doc_id"),
      tokenCount(col(textCol)).cast("double").as("len"))
    val stats = lens.agg(count(lit(1)).cast("double").as("nd"),
      avg(col("len")).as("avglen"))
    val qt = qTerms.toDF("term")
    val tf = terms.join(broadcast(qt), "term")
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("dfreq"))
    tf.join(broadcast(dfreq), "term")
      .crossJoin(broadcast(stats))
      .join(lens, "doc_id")
      .withColumn("contrib",
        log(lit(1.0) + (col("nd") - col("dfreq") + lit(0.5)) /
            (col("dfreq") + lit(0.5))) *
          (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * col("len") / col("avglen"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")), 6).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(topK)
  }

  /**
   * Corpus-drift report: pairwise KL divergence KL(P_a ‖ P_b) between
   * the add-one-smoothed unigram token distributions of every source
   * pair — the mixture-monitoring signal ("has source X's language
   * shifted away from source Y / from last week's snapshot").
   * Smoothing is over the union vocabulary V of ALL sources:
   * p_s(t) = (c_s(t)+1) / (N_s+|V|), so every KL term is finite and
   * Σ_t p_s(t) = 1 exactly.
   *
   * Scale shape: the naive formulation full-outer-joins the two count
   * vectors PER PAIR — S² joins over token tables. Algebraically,
   * every cross-support term telescopes through per-source totals:
   * with T1=Σp·ln p, T2=Σp, T3=Σln p over each source's own support
   * and J*=the same sums restricted to the pair's SHARED tokens,
   *
   *   KL(a‖b) = J1 + (T1a−J2) − ln(p_b0)(T2a−J3)
   *           + p_a0[(|B|−|A∩B|)·ln(p_a0) − (T3b−J4)]
   *           + (|V|−|A|−|B|+|A∩B|)·p_a0·(ln p_a0 − ln p_b0)
   *
   * so ONE equi-join of the token-count table with itself (shuffled by
   * token, never by pair) plus metadata-sized per-source aggregates
   * covers all S² pairs. |V| is a single driver scalar (the same
   * census-collect envelope as capBuckets).
   *
   * @return (src_a, src_b, kl_div) for every ordered pair, kl rounded
   *         to 4 decimals (the cross-engine float-sum envelope)
   */
  def klDriftMatrix(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    // checkpoint the token-count table: FIVE consumers (|V| census, the
    // per-source totals, per-source sums, and both sides of the pair
    // join) would otherwise each re-run the corpus tokenize + count
    // shuffle — the q89 recompute lesson (blocks freed by the
    // ContextCleaner once the frame is unreachable)
    val counts = docs
      .select(col(srcCol).as("src"), explode(tokens(col(textCol))).as("t"))
      .groupBy("src", "t").agg(count(lit(1)).cast("double").as("c"))
      .localCheckpoint(true)
    val v = counts.select("t").distinct().count().toDouble
    val tot = counts.groupBy("src")
      .agg(sum("c").as("n"), count(lit(1)).cast("double").as("supp"))
    val p = counts.join(broadcast(tot.select("src", "n")), "src")
      .select(col("src"), col("t"),
        ((col("c") + 1.0) / (col("n") + lit(v))).as("p"))
      .withColumn("lp", log(col("p")))
    // every source present in the INPUT gets a matrix row — a source
    // whose documents are all token-less still has a well-defined
    // smoothed distribution (pure add-one over V: p = 1/(0+|V|) for
    // every token), and silently dropping it would hide a degenerate
    // ingest partner from the drift report (caught by the randomized
    // PropertySpecs parity). All-empty-vocabulary input (V = 0) has no
    // distribution at all → empty result with the output schema.
    if (v == 0)
      return docs.sparkSession.createDataFrame(
        docs.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("src_a",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("src_b",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("kl_div",
            org.apache.spark.sql.types.DoubleType))))
    val srcs = docs.select(col(srcCol).cast("string").as("src")).distinct()
    val per = srcs
      .join(p.groupBy("src")
        .agg(sum(col("p") * col("lp")).as("t1"), sum("p").as("t2"),
          sum("lp").as("t3"), count(lit(1)).cast("double").as("supp")),
        Seq("src"), "left")
      .join(tot.select("src", "n"), Seq("src"), "left")
      .na.fill(0.0, Seq("t1", "t2", "t3", "supp", "n"))
      .withColumn("p0", lit(1.0) / (col("n") + lit(v)))
      .withColumn("lp0", log(col("p0")))
    val pairj = p.as("a").join(p.as("b"),
        col("a.t") === col("b.t") && col("a.src") =!= col("b.src"))
      .groupBy(col("a.src").as("sa"), col("b.src").as("sb"))
      .agg(sum(col("a.p") * (col("a.lp") - col("b.lp"))).as("j1"),
        sum(col("a.p") * col("a.lp")).as("j2"),
        sum(col("a.p")).as("j3"),
        sum(col("b.lp")).as("j4"),
        count(lit(1)).cast("double").as("ji"))
    val pa = per.select(col("src").as("sa"), col("t1").as("t1a"),
      col("t2").as("t2a"), col("supp").as("suppa"),
      col("p0").as("pa0"), col("lp0").as("lpa0"))
    val pb = per.select(col("src").as("sb"), col("t3").as("t3b"),
      col("supp").as("suppb"), col("lp0").as("lpb0"))
    pa.crossJoin(pb).filter(col("sa") =!= col("sb"))
      .join(pairj, Seq("sa", "sb"), "left")
      .na.fill(0.0, Seq("j1", "j2", "j3", "j4", "ji"))
      .select(col("sa").as("src_a"), col("sb").as("src_b"),
        graft.functions.GateRound(col("j1")
          + (col("t1a") - col("j2"))
          - col("lpb0") * (col("t2a") - col("j3"))
          + col("pa0") * ((col("suppb") - col("ji")) * col("lpa0")
            - (col("t3b") - col("j4")))
          + (lit(v) - col("suppa") - col("suppb") + col("ji"))
            * col("pa0") * (col("lpa0") - col("lpb0")), 4)
          .as("kl_div"))
      .orderBy("src_a", "src_b")
  }

  /**
   * Multinomial Naive Bayes text classifier — the classic "quality
   * filter trained on seed labels" pipeline stage (the role a
   * fastText/LR classifier plays in GPT-3/CCNet-style curation), in
   * its DETERMINISTIC closed form: add-one smoothing over the seed's
   * union vocabulary V gives exact per-token log-odds, so training is
   * two hash aggregates (no float iterations) and the whole stage
   * carries a full SQL oracle — unlike an SGD classifier, which would
   * be rows-only.
   *
   *   logit(d) = Σ_t c_d(t)·[ln p(t|+) − ln p(t|−)] + ln(D+) − ln(D−)
   *   p(t|c)   = (n_c(t)+1) / (N_c+|V|)
   *
   * Out-of-vocabulary tokens contribute the constant smoothed weight
   * ln(1/(N_+ +|V|)) − ln(1/(N_− +|V|)) — handled by a `coalesce`
   * after the model join, never by dropping them (dropping biases
   * long unseen-heavy documents toward the prior).
   *
   * Scale shape: training reduces the seed to a (token → weight)
   * model in one shuffle; scoring joins doc token counts with the
   * model BY TOKEN (broadcast when small, shuffled equi-join at
   * vocab scale) and sums per doc — partial aggregation end to end,
   * corpus text shuffled only as (doc, token, count) rows.
   *
   * @param seed  labeled training rows (idCol, textCol, labelCol);
   *              labelCol must be boolean-castable with both classes
   *              present
   * @param corpus rows to score (idCol, textCol) — zero-token docs
   *               score at the prior
   * @return (idCol, logit rounded to 4, pred = logit > 0)
   */
  def nbClassifier(seed: DataFrame, corpus: DataFrame, idCol: String,
                   textCol: String, labelCol: String): DataFrame = {
    val core = nbCore(seed, textCol, labelCol)
    val docToks = corpus
      .select(col(idCol), explode(tokens(col(textCol))).as("t"))
      .groupBy(idCol, "t").agg(count(lit(1)).cast("double").as("c"))
    val scored = docToks.join(core.weights, Seq("t"), "left")
      .groupBy(idCol)
      .agg(sum(col("c") * coalesce(col("w"), lit(core.oovW))).as("s"))
    corpus.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        graft.functions.GateRound(coalesce(col("s"), lit(0.0)) +
          lit(core.priorDelta), 4).as("logit"))
      .withColumn("pred", col("logit") > 0.0)
      .orderBy(idCol)
  }

  /** The ONE training pipeline behind [[nbClassifier]] and [[nbTrain]]:
    * (token → log-odds weight) frame plus the two scalar constants.
    * Float-op FORMS here must stay identical to the qAO SQL oracle
    * (a·b/c reassociation moves the 4th decimal on knife-edge sums) —
    * which is exactly why this exists once, not twice. */
  private case class NbCore(weights: DataFrame, oovW: Double,
                            priorDelta: Double)

  private def nbCore(seed: DataFrame, textCol: String,
                     labelCol: String): NbCore = {
    val st = seed.select(col(labelCol).cast("boolean").as("y"),
      explode(tokens(col(textCol))).as("t"))
    val counts = st.groupBy("y", "t")
      .agg(count(lit(1)).cast("double").as("c")).localCheckpoint(true)
    val v = counts.select("t").distinct().count().toDouble
    val tot = counts.groupBy("y").agg(sum("c").as("n")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    val docsPerClass = seed
      .groupBy(col(labelCol).cast("boolean").as("y"))
      .agg(count(lit(1)).cast("double").as("nd")).collect()
      .map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    require(docsPerClass.keySet == Set(true, false),
      s"nb training: seed must contain both classes, got ${docsPerClass.keySet}")
    val nPos = tot.getOrElse(true, 0.0)
    val nNeg = tot.getOrElse(false, 0.0)
    val weights = counts.groupBy("t")
      .agg(sum(when(col("y"), col("c")).otherwise(0.0)).as("cp"),
        sum(when(!col("y"), col("c")).otherwise(0.0)).as("cn"))
      .select(col("t"),
        (log((col("cp") + 1.0) / lit(nPos + v))
          - log((col("cn") + 1.0) / lit(nNeg + v))).as("w"))
    NbCore(weights,
      math.log(1.0 / (nPos + v)) - math.log(1.0 / (nNeg + v)),
      math.log(docsPerClass(true)) - math.log(docsPerClass(false)))
  }

  /** A trained NB model in broadcastable form: per-token log-odds,
    * the constant out-of-vocabulary weight, and the log-prior delta.
    * This is the DEPLOYED face of [[nbClassifier]] — the vocabulary
    * must fit on an executor (standard for a shipped classifier);
    * corpora whose model can't, score through nbClassifier's token
    * join instead. */
  case class NbModel(weights: Map[String, Double], oovW: Double,
                     priorDelta: Double)

  /** Train [[nbClassifier]]'s closed form and collect it as an
    * [[NbModel]] (one driver collect of the vocab-sized weight table). */
  def nbTrain(seed: DataFrame, textCol: String, labelCol: String): NbModel = {
    val core = nbCore(seed, textCol, labelCol)
    NbModel(core.weights.collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap,
      core.oovW, core.priorDelta)
  }

  /**
   * Score documents with a broadcast [[NbModel]] — STATELESS per row,
   * so the same function works on a batch frame and on a streaming
   * frame unchanged (the "filter the ingest stream with the offline-
   * trained quality model" deployment shape; StreamingSpec pins
   * streamed ≡ batch). mapPartitions, not a per-row UDF: the model
   * map is resolved once per task from the broadcast.
   *
   * Float parity with [[nbClassifier]]: per-token weights are summed
   * in ONE pass over the token sequence (c·w accumulation grouped per
   * distinct token first, matching the count-then-sum order), then
   * rounded identically.
   */
  def nbScore(docs: DataFrame, idCol: String, textCol: String,
              model: NbModel): DataFrame = {
    val spark = docs.sparkSession
    val bc = spark.sparkContext.broadcast(model)
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(textCol))
      .map { r =>
        val m = bc.value
        val text = if (r.isNullAt(1)) "" else r.getString(1)
        val toks = "\\S+".r.findAllIn(text).toSeq
        // per-distinct-token accumulation, like the batch join's
        // (doc, token, count) shape; HALF_UP matches Spark's round()
        val s = toks.groupBy(identity).foldLeft(0.0) { case (acc, (t, occ)) =>
          acc + occ.size.toDouble * m.weights.getOrElse(t, m.oovW)
        }
        val logit = BigDecimal(s + m.priorDelta)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        (r.getLong(0), logit, logit > 0.0)
      }.toDF(idCol, "logit", "pred")
  }

  /**
   * Blocklist PHRASE filter — the multi-pattern companion of
   * [[domainFilter]] for crawl hygiene: one
   * [[graft.functions.AhoCorasick]] automaton pass per document
   * reports every blocklist phrase occurring as a substring
   * (O(|text| + matches) per row, independent of blocklist size),
   * where k `contains` predicates would re-scan the text k times and
   * a regex alternation backtracks. Case-sensitive raw matching —
   * pre-normalize with `lower`/[[cleanText]] when the blocklist is.
   * Emits (doc_id, hits, n_hits, keep): `hits` lists the distinct
   * matched phrases in blocklist order, `keep` = no phrase matched;
   * null text matches nothing and keeps. Per-row kernel, zero
   * shuffle.
   */
  def phraseFilter(docs: DataFrame, idCol: String, textCol: String,
                   phrases: Seq[String]): DataFrame = {
    val hits = coalesce(graft.functions.AhoCorasick
        .multi_phrase_hits(col(textCol), phrases),
      array().cast("array<string>"))
    docs.select(col(idCol).as("doc_id"), hits.as("hits"))
      .select(col("doc_id"), col("hits"),
        size(col("hits")).as("n_hits"),
        (size(col("hits")) === 0).as("keep"))
  }

  /**
   * Line-level quality stats — the C4/FineWeb family of LINE
   * heuristics the document-level battery ([[gopherRulesTable]],
   * [[TextAnalysis.cleanText]]) cannot see: C4 drops lines without
   * terminal punctuation and FineWeb scores the fraction of such
   * lines plus duplicated-line mass, because crawl boilerplate
   * (menus, cookie banners, footers) arrives as short unpunctuated
   * repeated lines that sentence-level stats average away. Per
   * document over the non-empty trimmed lines (split on `sepRegex`):
   * line count, fraction ending in terminal punctuation (`. ! ? "`),
   * duplicated-line fraction (1 − distinct/total), mean line length
   * in chars, and the keep decision
   * `frac_term ≥ minTermFrac && frac_dup ≤ maxDupFrac`. Documents
   * with no non-empty line emit null fractions and keep = false
   * (guarded — a 0-line doc must not ride Spark's NaN-is-largest
   * comparison into `keep`). Fractions and the mean are exact-integer
   * IEEE divisions rounded to 6, so a SQL oracle replays them
   * bit-for-bit. Trimming is SQL `trim` — SPACE-ONLY on both engines,
   * so a tab-padded line counts as non-empty; normalize tabs upstream
   * ([[cleanText]]) when that matters.
   *
   * Shape: one per-row HOF chain (split → trim/filter → counts),
   * zero shuffle, codegen-friendly — the same per-row economics as
   * the rest of the quality battery.
   */
  def lineStats(docs: DataFrame, idCol: String, textCol: String,
                sepRegex: String = "\n", minTermFrac: Double = 0.9,
                maxDupFrac: Double = 0.3): DataFrame = {
    val base = docs.select(col(idCol).as("doc_id"),
      filter(transform(split(coalesce(col(textCol), lit("")), sepRegex, -1),
        x => trim(x)), x => length(x) > 0).as("__lines"))
    val n = size(col("__lines"))
    val fracTerm = round(size(filter(col("__lines"),
      x => x.rlike("[.!?\"]$"))).cast("double") / n.cast("double"), 6)
    val fracDup = round((n - size(array_distinct(col("__lines"))))
      .cast("double") / n.cast("double"), 6)
    val meanLen = round(aggregate(col("__lines"), lit(0L),
      (acc, x) => acc + length(x)).cast("double") / n.cast("double"), 6)
    base.select(col("doc_id"), n.as("n_lines"),
      when(n > 0, fracTerm).as("frac_term"),
      when(n > 0, fracDup).as("frac_dup"),
      when(n > 0, meanLen).as("mean_line_chars"),
      when(n > 0, fracTerm >= lit(minTermFrac) && fracDup <= lit(maxDupFrac))
        .otherwise(lit(false)).as("keep"))
  }

  /**
   * GUARANTEED φ-heavy hitters over the corpus token n-gram stream —
   * the bounded-memory "what dominates this corpus" probe (stopword
   * mass at n = 1, templated boilerplate at n ≥ 2, hot URLs/domains
   * on a pre-extracted column). Exact output: every gram occurring
   * MORE than `phi` × (total gram count) times, with its exact count.
   *
   * Two passes, neither shuffling the gram space:
   *  1. candidates — one [[graft.functions.MisraGries]] summary
   *     (partial/final mergeable aggregate, ≤ k entries per task
   *     cross the wire) plus the exact stream length in the same
   *     aggregate. `(k+1) · phi ≥ 1` makes the summary a PROVEN
   *     superset of the φ-heavy set, so the sketch never costs
   *     recall — it only bounds who needs re-counting;
   *  2. exact verify — re-scan with a broadcast ≤ k-entry candidate
   *     join (map-side filter drops the cold tail before any
   *     aggregation), count only survivors, keep `cnt > phi·N`.
   *
   * The exact `groupBy(gram).count()` alternative shuffles a hash
   * table of corpus-cardinality distinct grams; here shuffle volume
   * is O(k × tasks) + O(k) regardless of gram cardinality. The gram
   * explode runs twice — at 100 TB a re-scan is cheaper than
   * materializing a grams-stream bigger than the corpus.
   */
  def heavyGrams(docs: DataFrame, idCol: String, textCol: String,
                 n: Int, phi: Double, k: Int): DataFrame = {
    require(phi > 0.0 && phi < 1.0, s"phi must be in (0, 1), got $phi")
    require((k + 1).toDouble * phi >= 1.0,
      s"k = $k loses the recall guarantee at phi = $phi: need k+1 >= 1/phi")
    require(k <= (1 << 20), s"candidate cap k = $k exceeds the driver-" +
      "metadata bound (the summary is collected)")
    val spark = docs.sparkSession
    import spark.implicits._
    def grams = docs.select(explode(graft.functions.ShingleExprs
        .token_grams(col(textCol), n, overlapping = true)).as("gram"))
      .filter(col("gram").isNotNull)
    val mg = udaf(new graft.functions.MisraGries(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[String]())
    val row = grams.agg(mg(col("gram")).as("cand"),
      count(lit(1)).as("total")).head()
    val total = row.getLong(1)
    val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    if (cands.isEmpty || total == 0L)
      return grams.limit(0)
        .select(col("gram"), lit(0L).as("cnt"))
    grams.join(broadcast(cands.toDF("gram")), Seq("gram"))
      .groupBy(col("gram")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(phi) * lit(total.toDouble))
      .orderBy(col("cnt").desc, col("gram"))
  }

  /**
   * χ² token–label feature selection (Manning, Raghavan & Schütze
   * 2008 §13.5.2) — the top-k terms most ASSOCIATED with each label:
   * the audit that tells you what a quality/domain classifier would
   * actually key on before you train it (and the shortcut-detector
   * afterwards: a label whose top term is a boilerplate artifact is
   * a leaking label). Presence-based (each document votes once per
   * distinct term, the standard formulation): the 2×2 cells
   * N11/N01/N10/N00 derive from four exact-long counts (N, docs per
   * label, docs per term, docs per (term, label)) in any partition
   * order; χ² = N·(N11·N00 − N01·N10)² / ((N11+N01)(N11+N10)
   * (N10+N00)(N01+N00)) is ONE shared float dag over those longs —
   * the determinant is an exact long below |N| < 3e9 docs (documented
   * bound), each margin product a double factor in fixed
   * left-associated order mirrored verbatim in the oracle. Ranking is
   * engine-independent: χ² quantizes to the 1e-9 grid (the qCC axis)
   * and ties break on term ASC — a total order. A term present in
   * EVERY document (N00 + N01 = 0) or a corpus with one label
   * (N10 + N00 = 0) yields a degenerate margin → χ² = 0,
   * defined = false, still rankable (last).
   *
   * Scale shape: one distinct-token explode → two hash aggregates
   * (per-term, per-(term, label)) sharing the token shuffle; labels
   * and per-label counts broadcast (|labels| is small — the premise
   * of per-label top-k); the candidate frame is |vocab|·|labels| rows
   * and the ranking window sorts per label. `minDf` prunes the
   * long-tail vocabulary BEFORE the window — at web scale the df ≥
   * minDf filter is what keeps the sort bounded. NOTE this operator
   * is EAGER at construction (the [[klDriftMatrix]] census
   * convention): the labeled corpus localCheckpoints and N is
   * collected as a driver scalar — call it when you mean to run it.
   *
   * @return top-k rows per label: (labelCol, term, n11, n01, n10,
   *         n00, chi2 rounded 6, rank, defined)
   */
  def chiSquaredTerms(docs: DataFrame, labelCol: String, textCol: String,
                      topK: Int, minDf: Long = 1L): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    val base = docs.filter(col(labelCol).isNotNull)
      .select(col(labelCol).cast("string").as("__l"), col(textCol))
      .localCheckpoint(true) // three consumers: N + labels, terms, cells
    val nTotal = base.count()
    val labels = base.groupBy(col("__l"))
      .agg(count(lit(1)).as("__nl"))
    val docTerms = base
      .select(col("__l"),
        explode(array_distinct(tokens(col(textCol)))).as("__t"))
    val perTerm = docTerms.groupBy(col("__t"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
    val cells = docTerms.groupBy(col("__t"), col("__l"))
      .agg(count(lit(1)).as("__ntl"))
    val cand = perTerm.crossJoin(broadcast(labels))
      .join(cells, Seq("__t", "__l"), "left")
      .select(col("__t"), col("__l"), col("__df"), col("__nl"),
        coalesce(col("__ntl"), lit(0L)).as("__ntl"))
    val n11 = col("__ntl")
    val n01 = col("__df") - col("__ntl")
    val n10 = col("__nl") - col("__ntl")
    val n00 = lit(nTotal) - col("__df") - col("__nl") + col("__ntl")
    val det = n11 * n00 - n01 * n10
    val defined = (n11 + n01) > 0 && (n11 + n10) > 0 &&
      (n10 + n00) > 0 && (n01 + n00) > 0
    // ONE shared dag, left-associated in both engines
    val chi2 = (lit(nTotal.toDouble) * det.cast("double") *
      det.cast("double")) /
      ((n11 + n01).cast("double") * (n11 + n10).cast("double") *
        (n10 + n00).cast("double") * (n01 + n00).cast("double"))
    val scored = cand.select(col("__l"), col("__t"),
      n11.as("n11"), n01.as("n01"), n10.as("n10"), n00.as("n00"),
      when(defined, chi2).otherwise(lit(0.0)).as("__chi2"),
      defined.as("defined"))
    // SPLIT rank keys (the collocations convention): chi2 ≤ N, so
    // the single-key floor(chi2·1e9) form wraps signed-64 past
    // chi2 ≈ 9.2e9 — i.e. a ~9e9-document corpus could rank wrongly
    // in silence; the (⌊chi2⌋, 1e-9-grid fraction) pair is monotone
    // at the same resolution and overflow-proof to 2⁶³ (r19
    // grid-sum audit)
    val Seq(chi2i, chi2f) = splitRankKeys(col("__chi2"))
    import org.apache.spark.sql.expressions.Window
    scored
      .withColumn("rank", row_number().over(Window.partitionBy(col("__l"))
        .orderBy(chi2i.desc, chi2f.desc, col("__t"))))
      .filter(col("rank") <= topK)
      .select(col("__l").as(labelCol), col("__t").as("term"),
        col("n11"), col("n01"), col("n10"), col("n00"),
        round(col("__chi2"), 6).as("chi2"),
        col("rank").cast("long").as("rank"), col("defined"))
  }

  /**
   * Log-likelihood-ratio collocation extraction (Dunning 1993, the
   * G² statistic) — the statistically-sound "what phrases does this
   * corpus actually use" extractor (raw bigram counts surface
   * stopword pairs; pointwise MI overweights hapaxes; G² is the
   * field's standard fix for both): for every bigram (w1, w2) the
   * 2×2 contingency over all N adjacent-token events — k11 = the
   * bigram, k12 = w1 followed by something else, k21 = something
   * else followed by w2, k22 = the rest — scored by G² =
   * 2·Σ k·ln(k·N / (rowsum·colsum)), 0·ln 0 = 0. Phrase tables,
   * tokenizer-merge candidates and boilerplate phrase detectors all
   * start here.
   *
   * Exact contract: all counts are exact longs in any partition
   * order; G² is ONE shared dag over those longs (four guarded
   * k·ln(kN/(rs·cs)) terms in a fixed left-associated sum, ×2),
   * [[graft.functions.GateRound]]ed — analytically ≥ 0 but the
   * float sum of signed terms can land at −ε/−0.0. The top-k cut is
   * a TOTAL order on a SPLIT key: (⌊G²⌋ as long DESC, fractional
   * part quantized to the 1e-9 grid DESC, w1, w2 ASC) — the split
   * keeps the rank overflow-proof to G² < 2⁶³ (G² ≤ 2N·ln N → ~10¹⁷
   * bigram events), where the single-key floor(G²·10⁹) form
   * overflows signed-64 past G² ≈ 9.2·10⁹ (~2·10⁸ events — reachable
   * at corpus scale); both keys are the same floor/quantize ops on
   * the identical shared-dag double, so the order is
   * engine-independent, and lexicographic (int, frac) order IS
   * 1e-9-grid order. Spark plans the limit as TakeOrderedAndProject
   * (distributed per-partition top-k, never a global sort).
   *
   * Scale shape: one token-pair explode → one (w1, w2) hash
   * aggregate — served from the durable bigram artifact when
   * `cacheKey` names a lake (the [[bigramTypeTableCached]] protocol:
   * build once per lake generation, every later pass reads parquet;
   * in-memory corpora localCheckpoint instead — TWO consumers, the
   * klDriftMatrix lesson); marginals are in-partition WINDOW sums
   * over the bigram-type table (each window partition is one token's
   * successor/predecessor vocabulary, never the corpus — the join
   * formulation's two vocabulary-sized broadcast hash builds cost
   * 12.6 s seq at sf0.1 vs ~3 s windowed); N is a broadcast
   * single-row cross; `minCount` prunes the hapax tail before
   * scoring — at web scale the prune is what keeps the candidate
   * frame bounded.
   *
   * @return top-k rows: (w1, w2, c12, c1, c2, n_bigrams,
   *         g2 rounded 6)
   */
  /** The (w1, w2, count) bigram TYPE table — the shared statistic the
    * whole n-gram family ([[collocations]], [[kneserNeyBigrams]],
    * [[kneserNeyCrossEntropy]]) reduces the corpus to: one token-pair
    * explode → one hash aggregate, text never shuffles. */
  private def bigramTypeTable(docs: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val prs = when(col(textCol).isNotNull && size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"))))
      .otherwise(array().cast("array<struct<w1:string,w2:string>>"))
    docs.select(explode(prs).as("__pr"))
      .select(col("__pr.w1").as("__w1"), col("__pr.w2").as("__w2"))
      .groupBy(col("__w1"), col("__w2"))
      .agg(count(lit(1)).as("__c12"))
  }

  /** [[bigramTypeTable]] behind the durable warm-artifact protocol
    * (the [[Bpe.learnMergesCached]]/IvfIndex precedent): a bigram
    * census is ingest-time corpus work — a deployment computes it
    * ONCE per lake generation and every later process (including the
    * two sibling consumers in one suite run) reads the stored
    * parquet instead of re-exploding the corpus. The artifact name
    * folds the text column AND the input plan's semanticHash, so two
    * different SLICES of one lake (the qDP train/held-out splits)
    * can never serve each other's generations; the ArtifactStore
    * fingerprint handles lake regeneration. In-memory frames (unit
    * tests, ad-hoc corpora) skip the store and localCheckpoint for
    * their multi-consumer reads — the established uncached shape. */
  private[graft] def bigramTypeTableCached(docs: DataFrame,
      textCol: String, cacheKey: Option[String]): DataFrame =
    cacheKey match {
      case Some(lake) if docs.inputFiles.nonEmpty =>
        ArtifactStore.readOrBuild(docs.sparkSession, lake,
          "bigrams-" + ArtifactStore.md5(textCol + "|" +
            docs.queryExecution.analyzed.semanticHash()).take(12),
          Seq(docs))(bigramTypeTable(docs, textCol))
      case _ => bigramTypeTable(docs, textCol)
        .localCheckpoint(true) // two consumers of the bigram table
    }

  def collocations(docs: DataFrame, textCol: String, topK: Int,
                   minCount: Long = 2L,
                   cacheKey: Option[String] = None): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val counts = bigramTypeTableCached(docs, textCol, cacheKey)
    // marginals as WINDOW sums over the checkpointed type table, not
    // re-aggregate-and-join: a vocabulary-sized marginal would build
    // a vocabulary-sized broadcast hash relation per side (measured
    // 12.6 s seq at sf0.1 in the join formulation vs ~3 s windowed —
    // two in-partition sorts replace two 1M-entry broadcast builds)
    import org.apache.spark.sql.expressions.Window
    val withM = counts
      .withColumn("__c1", sum(col("__c12")).over(
        Window.partitionBy(col("__w1"))))
      .withColumn("__c2", sum(col("__c12")).over(
        Window.partitionBy(col("__w2"))))
    val nRow = counts.agg(coalesce(sum(col("__c12")), lit(0L)).as("__nn"))
    val scored = withM.filter(col("__c12") >= minCount)
      .crossJoin(broadcast(nRow))
    val k11 = col("__c12")
    val k12 = col("__c1") - col("__c12")
    val k21 = col("__c2") - col("__c12")
    val k22 = col("__nn") - col("__c1") - col("__c2") + col("__c12")
    val nnd = col("__nn").cast("double")
    def term(k: org.apache.spark.sql.Column, rs: org.apache.spark.sql.Column,
             cs: org.apache.spark.sql.Column) =
      when(k > 0, k.cast("double") *
        log(k.cast("double") * nnd / (rs.cast("double") * cs.cast("double"))))
        .otherwise(lit(0.0))
    val r1 = col("__c1")
    val r2 = col("__nn") - col("__c1")
    val s1 = col("__c2")
    val s2 = col("__nn") - col("__c2")
    val g2 = lit(2.0) * (term(k11, r1, s1) + term(k12, r1, s2) +
      term(k21, r2, s1) + term(k22, r2, s2))
    val Seq(g2i, g2f) = splitRankKeys(g2)
    scored.select(col("__w1").as("w1"), col("__w2").as("w2"),
        col("__c12").as("c12"), col("__c1").as("c1"),
        col("__c2").as("c2"), col("__nn").as("n_bigrams"),
        graft.functions.GateRound(g2, 6).as("g2"),
        g2i.as("__g2i"), g2f.as("__g2f"))
      .orderBy(col("__g2i").desc, col("__g2f").desc, col("w1"), col("w2"))
      .limit(topK)
      .drop("__g2i", "__g2f")
  }

  /**
   * Held-out cross-entropy under an interpolated Kneser–Ney bigram
   * model (Chen & Goodman 1999 §5 — the evaluation loop
   * [[kneserNeyBigrams]] trains for): train the model on one corpus
   * split, score another's bigrams, report coverage and the
   * per-event cross-entropy/perplexity over COVERED events — the
   * honest quality number for an n-gram scorer ("how surprised is
   * the model by fresh text"), and the train/held-out gap is the
   * overfitting audit.
   *
   * Coverage contract: a held-out bigram event is COVERED iff its
   * context w1 was seen in training AND its w2 has continuation mass
   * (N₁₊(·w2) > 0) — exactly the events where interpolated KN
   * assigns p > 0 (an unseen-w2 event has zero mass under the model;
   * emitting −∞ would be a lie, so the uncovered count is reported
   * beside the entropy instead, never folded in).
   *
   * Exact contract: all counts exact longs; P_KN is the SAME shared
   * dag as [[kneserNeyBigrams]] (max(c₁₂−D,0)/c₁ + D·N₁₊(w1·)/c₁ ·
   * N₁₊(·w2)/N₁₊(··), with c₁₂ = 0 for unseen pairs); each covered
   * bigram TYPE's ln p quantizes to the 1e-9 grid (signed, the qCW
   * convention) and multiplies its exact held-out count — hc·|ln p|
   * per type must stay under 9.2·10⁹·10⁹ (signed-64; pre-shard a
   * corpus past it); the CROSS-TYPE sum of those products rides
   * DECIMAL(38,0) (exact commutative addition, 10³⁸ headroom — the
   * r17 long sum wrapped near 10⁹ covered events at |ln p| ≈ 10;
   * judge finding, r18), so the per-type bound is the ONLY bound;
   * ce = −Σ/10⁹/n_covered and ppl =
   * exp(ce) ride the ln/exp parity precedent under round-6.
   *
   * Scale shape: two token-pair explodes (train + held-out) → two
   * bigram-type hash aggregates — each served from its own durable
   * bigram artifact when `cacheKey` names a lake (the artifact name
   * folds the split's plan hash, so the two slices never collide;
   * in-memory corpora localCheckpoint against the train table's
   * THREE consumers — the qCT/qCU lesson); the held-out types join
   * the pair/context/continuation tables each on their OWN keys
   * (type-sized shuffles, never corpus-sized), the type total is a
   * broadcast single-row cross.
   *
   * @return ONE row: (n_train_types, n_eval, n_covered, coverage,
   *         cross_entropy, perplexity — rounded 6, defined =
   *         n_covered > 0)
   */
  def kneserNeyCrossEntropy(train: DataFrame, heldout: DataFrame,
                            textCol: String, discount: Double = 0.75,
                            cacheKey: Option[String] = None): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    // the cached path reads parquet per consumer; the in-memory path
    // localCheckpoints against the three-consumer replay (pair join +
    // both marginal re-aggregates) — the qCT/qCU lesson
    val pairs = bigramTypeTableCached(train, textCol, cacheKey)
      .withColumnRenamed("__c12", "__c")
    val ctx = pairs.groupBy(col("__w1"))
      .agg(sum(col("__c")).as("__c1"), count(lit(1)).as("__n1f"))
    val cont = pairs.groupBy(col("__w2"))
      .agg(count(lit(1)).as("__n1b"))
    val types = pairs.agg(count(lit(1)).as("__nt"))
    val ho = bigramTypeTableCached(heldout, textCol, cacheKey)
      .withColumnRenamed("__c12", "__hc")
    val joined = ho
      .join(pairs.withColumnRenamed("__c", "__c12"), Seq("__w1", "__w2"),
        "left")
      .join(ctx, Seq("__w1"), "left")
      .join(cont, Seq("__w2"), "left")
      .crossJoin(broadcast(types))
    val covered = col("__c1").isNotNull && col("__n1b").isNotNull
    val d = lit(discount)
    val pkn = greatest(coalesce(col("__c12"), lit(0L)).cast("double") - d,
      lit(0.0)) / col("__c1").cast("double") +
      (d * col("__n1f").cast("double") / col("__c1").cast("double")) *
      (col("__n1b").cast("double") / col("__nt").cast("double"))
    val qln = floor(log(pkn) * lit(1e9) + lit(0.5)).cast("long")
    val stats = joined.select(col("__hc"),
        when(covered, col("__hc")).otherwise(0L).as("__hcov"),
        when(covered, col("__hc") * qln).otherwise(0L).as("__num"),
        col("__nt"))
      .agg(max(col("__nt")).as("n_train_types"),
        coalesce(sum(col("__hc")), lit(0L)).as("n_eval"),
        coalesce(sum(col("__hcov")), lit(0L)).as("n_covered"),
        // decimal(38,0): per-type hc*qln products are signed-64 by
        // the documented bound, but web-scale corpora overflow the
        // cross-type LONG sum — decimal keeps it exact at any size
        coalesce(sum(col("__num").cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("__nums"))
    val defined = col("n_covered") > 0
    val ce = -(col("__nums").cast("double") / lit(1e9)) /
      col("n_covered").cast("double")
    stats.select(coalesce(col("n_train_types"), lit(0L))
        .as("n_train_types"),
      col("n_eval"), col("n_covered"),
      when(col("n_eval") > 0, round(col("n_covered").cast("double") /
        col("n_eval").cast("double"), 6)).otherwise(lit(0.0))
        .as("coverage"),
      when(defined, graft.functions.GateRound(ce, 6)).otherwise(lit(0.0))
        .as("cross_entropy"),
      when(defined, round(exp(ce), 6)).otherwise(lit(0.0))
        .as("perplexity"),
      defined.as("defined"))
  }

  /**
   * Term burstiness — variance-to-mean ratio of per-document term
   * counts (Church & Gale 1995) — the "content word or function
   * word" axis beside raw frequency: under a Poisson (non-bursty)
   * process VMR ≈ 1; topical content words CLUMP (a document about
   * kernels mentions "kernel" twenty times, most mention it never) →
   * VMR ≫ 1, while function words sit near 1 at any frequency.
   * Boilerplate/template detection and stopword induction both read
   * this axis.
   *
   * Exact contract: per-(doc, term) counts, df, Σc and Σc² are exact
   * longs (absent docs contribute exact zeros to every moment, so
   * only present pairs are ever materialized); the mean-square term
   * (Σc)²/n splits by integer div/mod (the [[Classification
   * .oneWayAnova]] trick — exact at any magnitude the square
   * permits, |Σc| ≤ 3.037·10⁹ ENFORCED plan-side); mean, variance
   * and VMR are one fixed dag. The top-k cut is a TOTAL (total DESC,
   * term ASC) order planned as TakeOrderedAndProject. n_docs ≤ 1 or
   * zero-total terms → defined = false (can't happen past minDf ≥ 1
   * — defensive).
   *
   * Scale shape: one token explode → one (doc, term) hash aggregate
   * → one term aggregate → distributed top-k; the doc count is a
   * one-row broadcast cross. The corpus never sorts.
   *
   * @return top-k rows: (term, df, total, mean, vmr — rounded 6,
   *         defined), ordered (total DESC, term)
   */
  def termBurstiness(docs: DataFrame, idCol: String, textCol: String,
                     topK: Int = 50, minDf: Long = 2L): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(minDf >= 1L, s"minDf must be >= 1, got $minDf")
    val base = docs.filter(col(idCol).isNotNull)
    val nDocs = base.agg(count(lit(1)).as("__n"))
    val perDoc = base
      .select(col(idCol).as("__id"),
        explode(tokens(coalesce(col(textCol), lit("")))).as("__t"))
      .groupBy(col("__id"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val terms = perDoc.groupBy(col("__t"))
      .agg(count(lit(1)).as("df"), sum(col("__c")).as("total"),
        sum(col("__c") * col("__c")).as("__c2"))
      .filter(col("df") >= minDf)
      .crossJoin(broadcast(nDocs))
    val totOk = when(col("total") <= 3037000499L, col("total"))
      .otherwise(raise_error(concat(
        lit("termBurstiness: term "), col("__t"),
        lit(" has total "), col("total").cast("string"),
        lit(" > 3037000499 — its square overflows signed-64; " +
          "shard the corpus"))))
    val sq = totOk * totOk
    val ti = call_function("div", sq, col("__n"))
    val tf = floor((sq % col("__n")).cast("double") /
      col("__n").cast("double") * lit(1e9) + lit(0.5)).cast("long")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val meanSq = d(ti) + d(tf) / lit(1e9)
    val mean = d(col("total")) / d(col("__n"))
    val vmr = ((d(col("__c2")) - meanSq) / d(col("__n") - 1L)) / mean
    val defined = col("__n") > 1 && col("total") > 0
    terms.select(col("__t").as("term"), col("df"), col("total"),
        round(mean, 6).as("mean"),
        when(defined, graft.functions.GateRound(vmr, 6))
          .otherwise(lit(0.0)).as("vmr"),
        defined.as("defined"))
      .orderBy(col("total").desc, col("term"))
      .limit(topK)
  }

  /**
   * Overflow-proof 1e-9-grid rank keys for a non-negative-ish score:
   * (⌊x⌋ as long, ⌊(x − ⌊x⌋)·10⁹ + ½⌋ as long). Lexicographic order
   * on the pair is monotone in x at 1e-9 resolution — including for
   * the −ε a gated float dag can produce (⌊−ε⌋ = −1 sorts below
   * every non-negative key) — while the integer part tolerates
   * scores up to 2⁶³ where the single-key floor(x·10⁹) form
   * overflows past ~9.2·10⁹. Both keys are plain floor ops on the
   * SAME double, so any engine mirroring the dag ranks identically.
   */
  private[graft] def splitRankKeys(x: org.apache.spark.sql.Column)
      : Seq[org.apache.spark.sql.Column] = {
    val i = floor(x).cast("long")
    Seq(i, floor((x - floor(x)) * lit(1e9) + lit(0.5)).cast("long"))
  }

  /**
   * Lexical diversity profile per group (Herdan 1960; the
   * type-token family) — the vocabulary-richness audit beside the
   * quality battery: template-generated or looping text shows a
   * collapsed type/token ratio and a starved hapax share long before
   * a human notices. Herdan's C = ln(types)/ln(tokens) is the
   * length-corrected variant (raw TTR decays with corpus size; C is
   * comparable across differently-sized sources).
   *
   * Exact contract: token, type and hapax counts are exact longs
   * (types and hapaxes via one (group, token) aggregate); TTR and
   * hapax share are ONE division each; Herdan's C is one shared
   * ln/ln dag over exact longs. tokens ≤ 1 leaves C undefined
   * (ln 1 = 0 in the denominator) → defined = false, counts still
   * reported. All outputs non-negative: plain round.
   *
   * Scale shape: one token explode → one (group, token) hash
   * aggregate → one group aggregate; the token totals ride the same
   * aggregates (no second corpus pass).
   *
   * @return (byCol, n_tokens, n_types, n_hapax, ttr, herdan_c,
   *         hapax_share — each rounded 6, defined)
   */
  def lexicalDiversity(docs: DataFrame, byCol: String,
                       textCol: String): DataFrame = {
    val perTok = docs.filter(col(byCol).isNotNull)
      .select(col(byCol).as("__g"),
        explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val stats = perTok.groupBy(col("__g"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("n_hapax"))
    val defined = col("n_tokens") > 1
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    stats.select(col("__g").as(byCol), col("n_tokens"), col("n_types"),
      col("n_hapax"),
      round(d(col("n_types")) / d(col("n_tokens")), 6).as("ttr"),
      when(defined, round(log(d(col("n_types"))) /
        log(d(col("n_tokens"))), 6)).otherwise(lit(0.0)).as("herdan_c"),
      round(d(col("n_hapax")) / d(col("n_types")), 6).as("hapax_share"),
      defined.as("defined"))
  }

  /**
   * Vocabulary churn between two corpus snapshots — the
   * type-level drift check beside [[jsDivergence]]'s mass-level one
   * (mass can stay put while the long tail turns over completely —
   * exactly the regime a tokenizer retrain decision cares about):
   * type counts per side, shared types, type-set Jaccard, and the
   * new-type rate (what fraction of the NEW snapshot's vocabulary
   * the old one never saw).
   *
   * Exact contract: all five counts are exact longs from ONE (token)
   * aggregate with two conditional sums (the split never shuffles
   * separately); Jaccard and new-type rate are ONE division each. An
   * empty side → defined = false, counts visible.
   *
   * Scale shape: one token explode → one (token) hash aggregate →
   * one global aggregate.
   *
   * @return ONE row: (n_types_a, n_types_b, n_shared, jaccard,
   *         new_type_rate — each rounded 6, defined)
   */
  def vocabChurn(docs: DataFrame, inBCol: String,
                 textCol: String): DataFrame = {
    require(docs.schema(inBCol).dataType ==
        org.apache.spark.sql.types.BooleanType,
      s"vocabChurn: $inBCol must be boolean (got " +
        s"${docs.schema(inBCol).dataType.simpleString})")
    val perTok = docs.filter(col(inBCol).isNotNull)
      .select(col(inBCol).as("__in"),
        explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__t"))
      .agg(sum(when(!col("__in"), 1L).otherwise(0L)).as("__ca"),
        sum(when(col("__in"), 1L).otherwise(0L)).as("__cb"))
    val agg = perTok.agg(
      coalesce(sum(when(col("__ca") > 0, 1L).otherwise(0L)), lit(0L))
        .as("n_types_a"),
      coalesce(sum(when(col("__cb") > 0, 1L).otherwise(0L)), lit(0L))
        .as("n_types_b"),
      coalesce(sum(when(col("__ca") > 0 && col("__cb") > 0, 1L)
        .otherwise(0L)), lit(0L)).as("n_shared"))
    val defined = col("n_types_a") > 0 && col("n_types_b") > 0
    val union = col("n_types_a") + col("n_types_b") - col("n_shared")
    agg.select(col("n_types_a"), col("n_types_b"), col("n_shared"),
      when(defined, round(col("n_shared").cast("double") /
        union.cast("double"), 6)).otherwise(lit(0.0)).as("jaccard"),
      when(defined, round((col("n_types_b") - col("n_shared"))
        .cast("double") / col("n_types_b").cast("double"), 6))
        .otherwise(lit(0.0)).as("new_type_rate"),
      defined.as("defined"))
  }

  /**
   * Duplicate n-gram rate (the memorization-risk scalar; Lee et al.
   * 2022 "Deduplicating Training Data Makes Language Models Better"
   * measure the same mass) — what fraction of the corpus's n-gram
   * OCCURRENCES belong to n-grams seen more than once: the headline
   * number a dedup pass is judged by, and the memorization exposure
   * a model trained on this corpus inherits. Reported with the type
   * counts so "few heavy duplicates" and "many light ones" read
   * differently.
   *
   * Exact contract: occurrence and type counts are exact longs; the
   * rate is ONE division. Empty corpus → defined = false, the one
   * row stays visible.
   *
   * Scale shape: one gram explode → one (gram) hash aggregate → one
   * global aggregate. Text never shuffles, only grams (the qC6
   * economics).
   *
   * @return ONE row: (n_occurrences, n_types, n_dup_types,
   *         n_dup_occurrences, dup_rate rounded 6, defined)
   */
  def dupGramRate(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val grams = docs
      .select(explode(graft.functions.ShingleExprs
        .token_grams(coalesce(col(textCol), lit("")), n,
          overlapping = true)).as("__g"))
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("__c"))
    val agg = grams.agg(
      coalesce(sum(col("__c")), lit(0L)).as("n_occurrences"),
      count(lit(1)).as("n_types"),
      coalesce(sum(when(col("__c") > 1L, 1L).otherwise(0L)), lit(0L))
        .as("n_dup_types"),
      coalesce(sum(when(col("__c") > 1L, col("__c")).otherwise(0L)),
        lit(0L)).as("n_dup_occurrences"))
    val defined = col("n_occurrences") > 0
    agg.select(col("n_occurrences"), col("n_types"), col("n_dup_types"),
      col("n_dup_occurrences"),
      when(defined, round(col("n_dup_occurrences").cast("double") /
        col("n_occurrences").cast("double"), 6)).otherwise(lit(0.0))
        .as("dup_rate"),
      defined.as("defined"))
  }

  /**
   * Interpolated Kneser–Ney bigram model table (Kneser & Ney 1995;
   * Chen & Goodman 1999 eq. 4.25, fixed discount) — the smoothing
   * that actually works for language data, and the reason "San
   * Francisco" doesn't make "Francisco" a likely sentence starter:
   * the backoff weight of a word is its CONTINUATION count (how many
   * distinct contexts it follows), not its raw frequency. This is
   * the model table an n-gram quality scorer / infill-data generator
   * trains: P_KN(w2|w1) = max(c₁₂ − D, 0)/c₁ + λ(w1)·P_cont(w2),
   * λ(w1) = D·N₁₊(w1·)/c₁, P_cont(w2) = N₁₊(·w2)/N₁₊(··).
   *
   * Exact contract: every count in the formula — c₁₂, the context
   * total c₁, the forward type count N₁₊(w1·), the continuation
   * count N₁₊(·w2) and the bigram-type total N₁₊(··) — is an exact
   * long in any partition order; D = 0.75 is a LITERAL (exact in
   * binary: 3/4), and P_KN is ONE shared dag over those longs
   * mirrored verbatim in the oracle. The top-k cut needs no
   * quantization at all: (c₁₂ DESC, w1, w2) is a total order on
   * exact integers. P ∈ (0, 1]: plain round.
   *
   * Scale shape: one token-pair explode → one (w1, w2) hash
   * aggregate — served from the durable bigram artifact when
   * `cacheKey` names a lake ([[bigramTypeTableCached]]; in-memory
   * corpora localCheckpoint against the two-consumer replay); all
   * three marginals (c₁, N₁₊(w1·), N₁₊(·w2)) are in-partition
   * WINDOW sums/counts over the bigram-type table (window
   * partitions bounded by per-token successor/predecessor
   * vocabularies — the collocations lesson, same file: the join
   * formulation's vocabulary-sized broadcast builds cost 5.2 s seq
   * at sf0.1); the type total is a broadcast single-row cross. The
   * model table is bigram-type-sized, never corpus-sized.
   *
   * @return top-k rows: (w1, w2, c12, c1, n1f, n1b, n_types,
   *         p_kn rounded 6)
   */
  def kneserNeyBigrams(docs: DataFrame, textCol: String, topK: Int,
                       discount: Double = 0.75,
                       cacheKey: Option[String] = None): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    val counts = bigramTypeTableCached(docs, textCol, cacheKey)
    // marginals as WINDOW sums (the collocations lesson, same file):
    // vocabulary-sized re-aggregate-and-broadcast-join marginals cost
    // 5.2 s seq at sf0.1; two in-partition sorts over the checkpoint
    // replace both broadcast builds
    import org.apache.spark.sql.expressions.Window
    val withM = counts
      .withColumn("__c1", sum(col("__c12")).over(
        Window.partitionBy(col("__w1"))))
      .withColumn("__n1f", count(lit(1)).over(
        Window.partitionBy(col("__w1"))))
      .withColumn("__n1b", count(lit(1)).over(
        Window.partitionBy(col("__w2"))))
    val types = counts.agg(count(lit(1)).as("__nt"))
    val d = lit(discount)
    val scored = withM.crossJoin(broadcast(types))
    val pkn = greatest(col("__c12").cast("double") - d, lit(0.0)) /
      col("__c1").cast("double") +
      (d * col("__n1f").cast("double") / col("__c1").cast("double")) *
      (col("__n1b").cast("double") / col("__nt").cast("double"))
    scored.select(col("__w1").as("w1"), col("__w2").as("w2"),
        col("__c12").as("c12"), col("__c1").as("c1"),
        col("__n1f").as("n1f"), col("__n1b").as("n1b"),
        col("__nt").as("n_types"), round(pkn, 6).as("p_kn"))
      .orderBy(col("c12").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** The (w1, w2, w3, count) trigram TYPE table — the
    * [[bigramTypeTable]] shape one order up: one token-triple explode
    * → one hash aggregate, text never shuffles. */
  private def trigramTypeTable(docs: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val trs = when(col(textCol).isNotNull && size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => struct(element_at(toks, i).as("w1"),
          element_at(toks, i + 1).as("w2"),
          element_at(toks, i + 2).as("w3"))))
      .otherwise(array().cast(
        "array<struct<w1:string,w2:string,w3:string>>"))
    docs.select(explode(trs).as("__tr"))
      .select(col("__tr.w1").as("__w1"), col("__tr.w2").as("__w2"),
        col("__tr.w3").as("__w3"))
      .groupBy(col("__w1"), col("__w2"), col("__w3"))
      .agg(count(lit(1)).as("__c123"))
  }

  /** [[trigramTypeTable]] behind the same durable warm-artifact
    * protocol as [[bigramTypeTableCached]] (per-lake, per-slice
    * generation; in-memory frames localCheckpoint for their
    * multi-consumer reads). */
  private[graft] def trigramTypeTableCached(docs: DataFrame,
      textCol: String, cacheKey: Option[String]): DataFrame =
    cacheKey match {
      case Some(lake) if docs.inputFiles.nonEmpty =>
        ArtifactStore.readOrBuild(docs.sparkSession, lake,
          "trigrams-" + ArtifactStore.md5(textCol + "|" +
            docs.queryExecution.analyzed.semanticHash()).take(12),
          Seq(docs))(trigramTypeTable(docs, textCol))
      case _ => trigramTypeTable(docs, textCol)
        .localCheckpoint(true)
    }

  /** The distinct-(w2, w3) mid-order frame with every lower-order KN
    * marginal attached as an in-partition WINDOW (the collocations
    * lesson — no vocabulary-sized broadcast builds): nc23 =
    * N₁₊(·w2w3), ncmid2 = N₁₊(·w2·), n1fmid2 = N₁₊(w2·) (distinct
    * successors of w2 among trigram types), n1b3 = N₁₊(·w3) over the
    * projected (w2, w3) pairs. localCheckpointed: the join and the
    * type total both consume it. */
  private def knMidOrderFrame(tri: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    tri.groupBy(col("__w2"), col("__w3"))
      .agg(count(lit(1)).as("__nc23"))
      .withColumn("__ncmid2", sum(col("__nc23")).over(
        Window.partitionBy(col("__w2"))))
      .withColumn("__n1fmid2", count(lit(1)).over(
        Window.partitionBy(col("__w2"))))
      .withColumn("__n1b3", count(lit(1)).over(
        Window.partitionBy(col("__w3"))))
      .localCheckpoint(true)
  }

  /** The shared trigram-KN probability dag — ONE definition feeding
    * [[kneserNeyTrigrams]] and [[kneserNeyTrigramCrossEntropy]], and
    * mirrored verbatim in the qE9/qEA oracles (a drift would only
    * surface as an opaque hash mismatch). c123 is coalesced so the
    * same dag scores unseen held-out trigrams (c123 = 0, nc23 = 0). */
  private def pknTrigram(d: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val pcont = col("__n1b3").cast("double") / col("__ntm").cast("double")
    val pmid = greatest(coalesce(col("__nc23"), lit(0L)).cast("double") - d,
      lit(0.0)) / col("__ncmid2").cast("double") +
      (d * col("__n1fmid2").cast("double") /
        col("__ncmid2").cast("double")) * pcont
    greatest(coalesce(col("__c123"), lit(0L)).cast("double") - d,
      lit(0.0)) / col("__c12").cast("double") +
      (d * col("__n1f12").cast("double") /
        col("__c12").cast("double")) * pmid
  }

  /**
   * Interpolated Kneser–Ney TRIGRAM model table with continuation
   * backoff (Chen & Goodman 1999 §4.1.6 — [[kneserNeyBigrams]] one
   * order up, the order real LM-data tooling actually scores with):
   * P_KN(w3|w1w2) = max(c₁₂₃ − D, 0)/c₁₂ + λ(w1w2)·P_KN(w3|w2),
   * λ(w1w2) = D·N₁₊(w1w2·)/c₁₂, and the BACKOFF distribution uses
   * CONTINUATION counts, not raw counts: P_KN(w3|w2) =
   * max(N₁₊(·w2w3) − D, 0)/N₁₊(·w2·) + D·N₁₊(w2·)/N₁₊(·w2·) ·
   * N₁₊(·w3)/N₁₊(··).
   *
   * Convention: every lower-order statistic derives from the ONE
   * trigram type census (N₁₊(w2·) = distinct successors among
   * trigram types, N₁₊(·w3)/N₁₊(··) over the projected (w2, w3)
   * pairs) — the standard highest-order-counts-only formulation, so
   * document-initial bigrams contribute no lower-order mass;
   * documented, deterministic, and what makes per-context masses sum
   * to EXACTLY 1 over the continuation vocabulary (Round19OpsSpec
   * pins it against a sequential replica).
   *
   * Exact contract: every count is an exact long in any partition
   * order; D = 0.75 is a literal (exact in binary); P_KN is the ONE
   * shared [[pknTrigram]] dag mirrored verbatim in the oracle; the
   * top-k cut is the total order (c₁₂₃ DESC, w1, w2, w3) on exact
   * integers — no quantization anywhere. P ∈ (0, 1]: plain round.
   *
   * Scale shape: one token-triple explode → one hash aggregate
   * (served from the durable trigram artifact when `cacheKey` names
   * a lake), one type-sized (w2, w3) re-aggregate; ALL marginals are
   * in-partition window sums/counts over those two frames (the
   * collocations lesson — the join formulation builds
   * vocabulary-sized broadcast hashes); the mid-type total is a
   * broadcast single-row cross; the model table is
   * trigram-type-sized, never corpus-sized.
   *
   * @return top-k rows: (w1, w2, w3, c123, c12, n1f12, nc23, ncmid2,
   *         n1fmid2, n1b3, n_mid_types, p_kn rounded 6)
   */
  def kneserNeyTrigrams(docs: DataFrame, textCol: String, topK: Int,
                        discount: Double = 0.75,
                        cacheKey: Option[String] = None): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    import org.apache.spark.sql.expressions.Window
    val tri = trigramTypeTableCached(docs, textCol, cacheKey)
    val mid = knMidOrderFrame(tri)
    val types = mid.select(col("__w2"), col("__w3"))
      .agg(count(lit(1)).as("__ntm"))
    val withM = tri
      .withColumn("__c12", sum(col("__c123")).over(
        Window.partitionBy(col("__w1"), col("__w2"))))
      .withColumn("__n1f12", count(lit(1)).over(
        Window.partitionBy(col("__w1"), col("__w2"))))
    val scored = withM.join(mid, Seq("__w2", "__w3"))
      .crossJoin(broadcast(types))
    scored.select(col("__w1").as("w1"), col("__w2").as("w2"),
        col("__w3").as("w3"), col("__c123").as("c123"),
        col("__c12").as("c12"), col("__n1f12").as("n1f12"),
        col("__nc23").as("nc23"), col("__ncmid2").as("ncmid2"),
        col("__n1fmid2").as("n1fmid2"), col("__n1b3").as("n1b3"),
        col("__ntm").as("n_mid_types"),
        round(pknTrigram(lit(discount)), 6).as("p_kn"))
      .orderBy(col("c123").desc, col("w1"), col("w2"), col("w3"))
      .limit(topK)
  }

  /**
   * Held-out cross-entropy under the interpolated KN TRIGRAM model —
   * [[kneserNeyCrossEntropy]] one order up, same coverage honesty: a
   * held-out trigram event is COVERED iff its context (w1, w2) was
   * seen in training AND w3 has continuation mass (N₁₊(·w3) > 0) —
   * exactly the events where the model assigns p > 0 (a seen context
   * guarantees the mid-order marginals exist, because the trigram
   * that created the context also created a (w2, ·) mid type;
   * uncovered counts are reported beside the entropy, never folded
   * in as −∞).
   *
   * Exact contract: the [[kneserNeyCrossEntropy]] grid rules
   * verbatim — per-type ln p quantizes to the signed 1e-9 grid, the
   * per-type product hc·qln is signed-64 by the documented bound,
   * the CROSS-TYPE sum rides DECIMAL(38,0) (the r17 wrap lesson);
   * ce/ppl/coverage are the same final dag.
   *
   * @return ONE row: (n_train_types, n_eval, n_covered, coverage,
   *         cross_entropy, perplexity — rounded 6, defined)
   */
  def kneserNeyTrigramCrossEntropy(train: DataFrame, heldout: DataFrame,
                                   textCol: String,
                                   discount: Double = 0.75,
                                   cacheKey: Option[String] = None): DataFrame = {
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    import org.apache.spark.sql.expressions.Window
    val tri = trigramTypeTableCached(train, textCol, cacheKey)
    val mid = knMidOrderFrame(tri)
    val types = mid.select(col("__w2"), col("__w3"))
      .agg(count(lit(1)).as("__ntm"))
    val ctx = tri.groupBy(col("__w1"), col("__w2"))
      .agg(sum(col("__c123")).as("__c12"), count(lit(1)).as("__n1f12"))
    val triTypes = tri.agg(count(lit(1)).as("__nt"))
    val cont = mid.groupBy(col("__w3"))
      .agg(max(col("__n1b3")).as("__n1b3g"))
    val ho = trigramTypeTableCached(heldout, textCol, cacheKey)
      .withColumnRenamed("__c123", "__hc")
    // each marginal key has exactly ONE consumer (the r19 ADVICE
    // item): the (w2, w3) join carries only nc23, and the w2-level
    // marginals come solely from the one per-w2 frame — for a SEEN
    // pair both sources carry the identical window value, so the old
    // coalesce fallback was a second, redundant type-sized shuffle
    val w2m = mid.select(col("__w2"), col("__ncmid2"), col("__n1fmid2"))
      .groupBy(col("__w2")).agg(max(col("__ncmid2")).as("__ncmid2"),
        max(col("__n1fmid2")).as("__n1fmid2"))
    val joined = ho
      .join(tri, Seq("__w1", "__w2", "__w3"), "left")
      .join(ctx, Seq("__w1", "__w2"), "left")
      .join(mid.select(col("__w2"), col("__w3"), col("__nc23")),
        Seq("__w2", "__w3"), "left")
      .join(w2m, Seq("__w2"), "left")
      .join(cont.withColumnRenamed("__w3", "__w3j")
        .withColumnRenamed("__n1b3g", "__n1b3j"),
        col("__w3") === col("__w3j"), "left")
      .crossJoin(broadcast(types))
      .crossJoin(broadcast(triTypes))
      .withColumn("__n1b3", col("__n1b3j"))
    val covered = col("__c12").isNotNull && col("__n1b3").isNotNull
    val qln = floor(log(pknTrigram(lit(discount))) * lit(1e9) + lit(0.5))
      .cast("long")
    val stats = joined.select(col("__hc"),
        when(covered, col("__hc")).otherwise(0L).as("__hcov"),
        when(covered, col("__hc") * qln).otherwise(0L).as("__num"),
        col("__nt"))
      .agg(max(col("__nt")).as("n_train_types"),
        coalesce(sum(col("__hc")), lit(0L)).as("n_eval"),
        coalesce(sum(col("__hcov")), lit(0L)).as("n_covered"),
        coalesce(sum(col("__num").cast("decimal(38,0)")),
          lit(0L).cast("decimal(38,0)")).as("__nums"))
    val defined = col("n_covered") > 0
    val ce = -(col("__nums").cast("double") / lit(1e9)) /
      col("n_covered").cast("double")
    stats.select(coalesce(col("n_train_types"), lit(0L))
        .as("n_train_types"),
      col("n_eval"), col("n_covered"),
      when(col("n_eval") > 0, round(col("n_covered").cast("double") /
        col("n_eval").cast("double"), 6)).otherwise(lit(0.0))
        .as("coverage"),
      when(defined, graft.functions.GateRound(ce, 6)).otherwise(lit(0.0))
        .as("cross_entropy"),
      when(defined, round(exp(ce), 6)).otherwise(lit(0.0))
        .as("perplexity"),
      defined.as("defined"))
  }

  /**
   * Jensen–Shannon divergence between two corpus halves' unigram
   * token distributions (Lin 1991) — the SYMMETRIC, always-finite
   * companion to [[klDriftMatrix]] for the before/after mixture
   * check (did the new crawl shift the token distribution, and by
   * how many bits): JS needs no smoothing because every observed
   * token has mass in the mixture M = (P+Q)/2, and √JS is a metric,
   * so thresholds transfer across corpus pairs.
   *
   * Exact contract (the qCC cross-entity quantization axis): the
   * per-token counts (a, b) and totals (T_A, T_B) are exact longs;
   * each token's term 0.5·p·ln(2p/(p+q)) + 0.5·q·ln(2q/(p+q))
   * (p = a/T_A, q = b/T_B; a zero-count side contributes 0 by the
   * 0·ln 0 = 0 convention) is ONE shared IEEE dag quantized to a
   * 1e-9-grid long, so the cross-vocabulary SUM is an exact integer
   * in any partition order; the bits conversion divides by a shared
   * ln 2 LITERAL (not each engine's ln(2) — same bits by
   * construction). GateRounded: an identical-corpora JS is exactly 0
   * (every term is ln 1 = 0 pre-quantization), but near-identical
   * corpora can sum quantization residue to −ε.
   *
   * Scale shape: one token explode → one (token) hash aggregate with
   * two conditional sums (the split never shuffles separately) → one
   * global aggregate. Totals ride the same aggregate re-aggregated —
   * two metadata-sized rows, no second corpus pass.
   *
   * @param inBCol boolean — false = corpus A, true = corpus B
   * @return ONE row: (n_vocab, total_a, total_b, js_bits rounded 6,
   *         defined — false when either half is token-less)
   */
  def jsDivergence(docs: DataFrame, inBCol: String,
                   textCol: String): DataFrame = {
    require(docs.schema(inBCol).dataType ==
        org.apache.spark.sql.types.BooleanType,
      s"jsDivergence: $inBCol must be boolean (got " +
        s"${docs.schema(inBCol).dataType.simpleString})")
    val counts = docs.filter(col(inBCol).isNotNull)
      .select(col(inBCol).as("__b"),
        explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__t"))
      .agg(sum(when(!col("__b"), 1L).otherwise(0L)).as("__a"),
        sum(when(col("__b"), 1L).otherwise(0L)).as("__bc"))
    val withTot = counts.crossJoin(broadcast(
      counts.select(sum(col("__a")).as("__ta"),
        sum(col("__bc")).as("__tb"))))
    // the when() is pure selection (ANSI double-division throws on a
    // zero total): a token-less half is the defined=false regime and
    // its terms are discarded — on the defined path the dag is the
    // bare a/T_A division, bit-identical to the oracle's
    val pd = when(col("__ta") > 0,
      col("__a").cast("double") / col("__ta").cast("double"))
      .otherwise(lit(0.0))
    val qd = when(col("__tb") > 0,
      col("__bc").cast("double") / col("__tb").cast("double"))
      .otherwise(lit(0.0))
    val term =
      when(col("__a") > 0,
        lit(0.5) * pd * log(lit(2.0) * pd / (pd + qd)))
        .otherwise(lit(0.0)) +
      when(col("__bc") > 0,
        lit(0.5) * qd * log(lit(2.0) * qd / (pd + qd)))
        .otherwise(lit(0.0))
    val tq = floor(term * lit(1e9) + lit(0.5)).cast("long")
    val agg = withTot.select(col("__ta"), col("__tb"), tq.as("__tq"))
      .groupBy(/* global */)
      .agg(count(lit(1)).as("n_vocab"),
        coalesce(max(col("__ta")), lit(0L)).as("total_a"),
        coalesce(max(col("__tb")), lit(0L)).as("total_b"),
        coalesce(sum(col("__tq")), lit(0L)).as("__s"))
    val defined = col("total_a") > 0 && col("total_b") > 0
    agg.select(col("n_vocab"), col("total_a"), col("total_b"),
      when(defined, graft.functions.GateRound(
        col("__s").cast("double") / lit(1e9) / lit(0.6931471805599453),
        6)).otherwise(lit(0.0)).as("js_bits"),
      defined.as("defined"))
  }

  /**
   * ROUGE-N overlap between paired texts (Lin 2004, "ROUGE: A
   * Package for Automatic Evaluation of Summaries") — the
   * reference-based generation score a distillation / summarization
   * pipeline grades candidates with: per (candidate, reference)
   * pair, clipped n-gram matches = Σ_g min(count_cand(g),
   * count_ref(g)). All counts are exact longs; precision = m/|cand
   * grams| and recall = m/|ref grams| are ONE division each, and F1
   * uses the harmonic identity F1 = 2m/(|cand|+|ref|) — one division
   * of exact integers, NOT a float p·r composition (the same value,
   * none of the intermediate rounding). A gram-less side ⇒
   * defined = false with zero scores, pairs stay visible.
   *
   * Scale shape: both sides' grams explode into ONE union frame
   * (side-tagged — the two gram multisets meet in a single
   * (pair, gram) hash aggregate, never a join), then one per-pair
   * aggregate; texts shuffle never, only grams (the qC6 economics);
   * the pairs frame re-joins at |pairs| rows for visibility.
   *
   * @return (idCol, n_cand_grams, n_ref_grams, n_matches,
   *         rouge_p, rouge_r, rouge_f1 — each rounded 6, defined)
   */
  def rougeN(pairs: DataFrame, idCol: String, candCol: String,
             refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val base = pairs.filter(col(idCol).isNotNull)
    // ONE scan of the pairs frame (which is often itself a join):
    // both sides' grams tag-and-concat into a single exploded array
    // rather than two per-side scans unioned
    def tagged(c: String, isCand: Boolean) =
      transform(graft.functions.ShingleExprs
          .token_grams(coalesce(col(c), lit("")), n, overlapping = true),
        g => struct(g.as("g"), lit(isCand).as("c")))
    val stats = base
      .select(col(idCol).as("__id"),
        explode(concat(tagged(candCol, isCand = true),
          tagged(refCol, isCand = false))).as("__e"))
      .select(col("__id"), col("__e.g").as("__g"), col("__e.c").as("__c"))
      .groupBy(col("__id"), col("__g"))
      .agg(sum(when(col("__c"), 1L).otherwise(0L)).as("__cc"),
        sum(when(!col("__c"), 1L).otherwise(0L)).as("__rc"))
      .groupBy(col("__id"))
      .agg(sum(least(col("__cc"), col("__rc"))).as("__m"),
        sum(col("__cc")).as("__tc"), sum(col("__rc")).as("__tr"))
    val out = base.select(col(idCol).as("__id")).distinct()
      .join(stats, Seq("__id"), "left")
    def z(c: String) = coalesce(col(c), lit(0L))
    val defined = z("__tc") > 0 && z("__tr") > 0
    out.select(col("__id").as(idCol),
      z("__tc").as("n_cand_grams"), z("__tr").as("n_ref_grams"),
      z("__m").as("n_matches"),
      when(defined, round(z("__m").cast("double") /
        z("__tc").cast("double"), 6)).otherwise(lit(0.0)).as("rouge_p"),
      when(defined, round(z("__m").cast("double") /
        z("__tr").cast("double"), 6)).otherwise(lit(0.0)).as("rouge_r"),
      when(defined, round(lit(2.0) * z("__m").cast("double") /
        (z("__tc") + z("__tr")).cast("double"), 6)).otherwise(lit(0.0))
        .as("rouge_f1"),
      defined.as("defined"))
  }

  /**
   * Chao1 species-richness estimate + Good–Turing coverage (Chao
   * 1984; Good 1953) — "how much vocabulary HAVEN'T we crawled yet":
   * [[lexicalDiversity]] profiles the types a corpus HAS; Chao1
   * estimates the types it's still missing from the frequency-of-
   * frequencies head (singletons f₁ and doubletons f₂ carry the
   * signal — a crawl still finding many hapaxes is far from
   * exhausting its domain), and the Good–Turing unseen mass f₁/N is
   * the probability the NEXT token is a brand-new type — the
   * principled "is more crawling worth it" number.
   *
   * Exact contract: N, S, f₁, f₂ come from ONE (group, token)
   * aggregate + one group aggregate — exact longs in any partition
   * order; the bias-corrected Chao1 = S + f₁(f₁−1)/(2(f₂+1))
   * (defined even at f₂ = 0, unlike the classic f₁²/2f₂ form) is
   * ONE division of exact longs (f₁ < 3·10⁹ keeps the square in
   * signed-64 — a 3-billion-hapax group; document-scale), and the
   * unseen mass and coverage are one division each. A group whose
   * every text is null/empty VANISHES (nothing survives the explode)
   * — the defined guard is defensive only.
   *
   * Scale shape: one token explode → one (group, token) hash
   * aggregate → one group aggregate (the lexicalDiversity economics:
   * text never shuffles, only tokens).
   *
   * @return (byCol, n_tokens, n_types, f1, f2, chao1, unseen_mass,
   *         coverage — rounded 6, defined)
   */
  def chao1Richness(docs: DataFrame, byCol: String,
                    textCol: String): DataFrame = {
    val perTok = docs.filter(col(byCol).isNotNull)
      .select(col(byCol).as("__g"),
        explode(tokens(col(textCol))).as("__t"))
      .groupBy(col("__g"), col("__t"))
      .agg(count(lit(1)).as("__c"))
    val stats = perTok.groupBy(col("__g"))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("__c") === 1L, 1L).otherwise(0L)).as("f1"),
        sum(when(col("__c") === 2L, 1L).otherwise(0L)).as("f2"))
    val defined = col("n_tokens") > 0
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val chao1 = d(col("n_types")) +
      d(col("f1") * (col("f1") - 1L)) /
      d(lit(2L) * (col("f2") + 1L))
    val unseen = d(col("f1")) / d(col("n_tokens"))
    stats.select(col("__g").as(byCol), col("n_tokens"), col("n_types"),
      col("f1"), col("f2"),
      when(defined, round(chao1, 6)).otherwise(lit(0.0)).as("chao1"),
      when(defined, round(unseen, 6)).otherwise(lit(0.0))
        .as("unseen_mass"),
      when(defined, round(lit(1.0) - unseen, 6)).otherwise(lit(0.0))
        .as("coverage"),
      defined.as("defined"))
  }

  /**
   * Zipf rank–frequency slope (Zipf 1949; the log–log OLS fit over
   * the frequency head) — the one-number distribution-shape audit a
   * corpus mix needs beside [[lexicalDiversity]]: natural language
   * sits near slope −1; template/boilerplate-heavy corpora flatten
   * the head (slope → 0 over the top ranks) and spam/generated text
   * steepens it. Fit: OLS of ln(freq) on ln(rank) over the top-R
   * types.
   *
   * Exact contract: frequencies are exact longs; the top-R cut is a
   * TOTAL order (freq DESC, token ASC) planned as
   * TakeOrderedAndProject — the corpus never globally sorts, only
   * the R-row head does (rank assignment runs a window over that
   * R-row frame in one task — R is a constant knob, not data-sized);
   * per-rank x = ln(rank), y = ln(freq) and the products x·y, x²
   * each quantize to the 1e-9 grid (|x·y| ≲ 300 at any corpus
   * size — fits trivially) so all four regression sums are exact
   * longs in any order, and slope/intercept are one fixed dag over
   * them (slope signed → gateRounded; the ln calls ride the
   * established libm-parity precedent). Fewer than 2 ranks or a
   * degenerate denominator → defined = false.
   *
   * Scale shape: one token explode → one token hash aggregate → one
   * distributed top-R (per-partition heaps) → constant-sized window
   * + aggregate.
   *
   * @return ONE row: (n_types, r_used, slope, intercept — rounded 6,
   *         defined)
   */
  def zipfSlope(docs: DataFrame, textCol: String,
                topR: Int = 300): DataFrame = {
    require(topR >= 2 && topR <= 100000,
      s"topR must be in [2, 100000], got $topR")
    val freqs = docs
      .select(explode(tokens(coalesce(col(textCol), lit(""))))
        .as("__t"))
      .groupBy(col("__t"))
      .agg(count(lit(1)).as("__c"))
    val types = freqs.agg(count(lit(1)).as("__nt"))
    val head = freqs.orderBy(col("__c").desc, col("__t")).limit(topR)
    import org.apache.spark.sql.expressions.Window
    val rnk = row_number()
      .over(Window.orderBy(col("__c").desc, col("__t"))).cast("long")
    val x = log(rnk.cast("double"))
    val y = log(col("__c").cast("double"))
    def q(c: org.apache.spark.sql.Column) =
      floor(c * lit(1e9) + lit(0.5)).cast("long")
    val sums = head
      .select(q(x).as("__qx"), q(y).as("__qy"), q(x * y).as("__qxy"),
        q(x * x).as("__qxx"))
      .agg(count(lit(1)).as("r_used"), sum(col("__qx")).as("__sx"),
        sum(col("__qy")).as("__sy"), sum(col("__qxy")).as("__sxy"),
        sum(col("__qxx")).as("__sxx"))
      .crossJoin(types)
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val rr = d(col("r_used"))
    val sx = d(col("__sx")) / lit(1e9)
    val sy = d(col("__sy")) / lit(1e9)
    val sxy = d(col("__sxy")) / lit(1e9)
    val sxx = d(col("__sxx")) / lit(1e9)
    val den = rr * sxx - sx * sx
    val slope = (rr * sxy - sx * sy) / den
    val defined = col("r_used") > 1 && den > 0.0
    sums.select(col("__nt").as("n_types"), col("r_used"),
      when(defined, graft.functions.GateRound(slope, 6))
        .otherwise(lit(0.0)).as("slope"),
      when(defined, graft.functions.GateRound(
        (sy - slope * sx) / rr, 6)).otherwise(lit(0.0)).as("intercept"),
      defined.as("defined"))
  }
}
