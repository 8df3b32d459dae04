package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Per-row text kernels for the training-data pipeline that have no
 * efficient relational formulation:
 *
 *  - [[SortedLongsOverlap]] — "does this document share any shingle
 *    with the (driver-collected, sorted) eval-set gram table?" as a
 *    single codegen'd binary-search loop. This is the map-side half of
 *    test-set decontamination: the corpus side is NEVER exploded or
 *    shuffled — the flag is computed inside the scan stage.
 *    (`arrays_overlap` would rebuild a hash set from the constant side
 *    on every row; this keeps the needle array as one shared
 *    reference object and binary-searches it.)
 *
 *  - [[RepetitionStats]] — Gopher-style repetitiousness counters
 *    (token count, distinct-token count, max bigram multiplicity,
 *    duplicated-bigram / total bigram character sums) in one pass
 *    over the document. Expressing this relationally costs an
 *    explode of every token and bigram (a corpus-sized stream) plus
 *    two shuffles; as a kernel it is embarrassingly parallel.
 *
 * Tokenization is [[ShingleExprs.toks]] itself (one shared definition —
 * `\S+` runs, `regexp_extract_all` parity), so decontamination grams
 * and repetition counters can never desynchronize from dedup grams.
 */
object TextExprs {

  private def toks(text: UTF8String): Array[String] = ShingleExprs.toks(text)

  /** True iff any element of the sorted `haystack` array occurs in the
    * sorted `needles` array (binary search per element). */
  def overlaps(haystack: ArrayData, needles: Array[Long]): Boolean = {
    val n = haystack.numElements()
    var i = 0
    while (i < n) {
      if (java.util.Arrays.binarySearch(needles, haystack.getLong(i)) >= 0)
        return true
      i += 1
    }
    false
  }

  /** (n_tokens, n_distinct_tokens, max_bigram_count, dup_bigram_chars,
    * total_bigram_chars) over the whitespace tokens — exact string
    * equality (no hashing), so the result is oracle-comparable
    * gram-for-gram. The char sums weight each bigram occurrence by its
    * character length (Gopher-style "fraction of characters in
    * duplicated n-grams": dup/total, computed by the caller). */
  def repetition(text: UTF8String): InternalRow = {
    val ts = toks(text)
    val n = ts.length
    val seen = new java.util.HashSet[String](n * 2)
    var i = 0
    while (i < n) { seen.add(ts(i)); i += 1 }
    var maxBigram = 0
    var dupChars = 0L
    var totalChars = 0L
    if (n >= 2) {
      val counts = new java.util.HashMap[String, Integer](n * 2)
      i = 0
      while (i < n - 1) {
        val bg = ts(i) + " " + ts(i + 1)
        val c = counts.merge(bg, 1, (x, y) => x + y)
        if (c > maxBigram) maxBigram = c
        i += 1
      }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val w = e.getKey.codePointCount(0, e.getKey.length).toLong * e.getValue
        totalChars += w
        if (e.getValue >= 2) dupChars += w
      }
    }
    InternalRow(n, seen.size(), maxBigram, dupChars, totalChars)
  }

  /** Per-n repetition aggregates for n = 2..10, one array entry per n:
    * (n, top_chars, dup_chars, total_chars) where each OVERLAPPING
    * n-gram occurrence is weighted by its codepoint length,
    * `top_chars = max_g count(g)·chars(g)` (the mass of the dominant
    * gram — deterministic without a tie-break), `dup_chars` sums the
    * mass of grams occurring ≥ 2 times, `total_chars` all of it. The
    * callers derive Gopher's repetition rules: fraction of characters
    * in the MOST COMMON n-gram (n = 2..4) and in DUPLICATED n-grams
    * (n = 5..10). ns with fewer than n tokens emit (n, 0, 0, 0).
    * One tokenization + 9 counting passes per document, all inside the
    * scan stage — the gram streams never materialize into the plan. */
  def repetitionNgrams(text: UTF8String): ArrayData = {
    val ts = toks(text)
    val out = new Array[Any](9)
    var n = 2
    while (n <= 10) {
      var top = 0L
      var dup = 0L
      var total = 0L
      if (ts.length >= n) {
        val counts = new java.util.HashMap[String, Integer](ts.length * 2)
        val sb = new java.lang.StringBuilder
        var i = 0
        while (i <= ts.length - n) {
          sb.setLength(0)
          var j = i
          while (j < i + n) {
            if (j > i) sb.append(' ')
            sb.append(ts(j))
            j += 1
          }
          counts.merge(sb.toString, 1, (a, b) => a + b)
          i += 1
        }
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val w = e.getKey.codePointCount(0, e.getKey.length).toLong * e.getValue
          total += w
          if (w > top) top = w
          if (e.getValue >= 2) dup += w
        }
      }
      out(n - 2) = InternalRow(n, top, dup, total)
      n += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  // one Deflater + scratch buffer per executor thread: Deflater is
  // native-backed and expensive to construct; reset() between rows is
  // cheap. Level 6 = zlib default, the level the signal is usually
  // quoted at.
  private val deflaterTL = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue() = new java.util.zip.Deflater(6, true)
  }
  private val deflateBufTL = new ThreadLocal[Array[Byte]] {
    override def initialValue() = new Array[Byte](16 * 1024)
  }

  /** (n_bytes, z_bytes): UTF-8 byte length and its raw-deflate
    * (level 6) compressed size. z/n is the classic entropy proxy for
    * corpus curation — boilerplate and template spam compress far
    * below natural prose, random junk compresses above it — and costs
    * one pass over the bytes with zero allocation beyond the UTF-8
    * copy (thread-local Deflater + scratch buffer). */
  def deflateStats(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val d = deflaterTL.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = deflateBufTL.get()
    var total = 0L
    while (!d.finished()) total += d.deflate(buf)
    InternalRow(bytes.length, total.toInt)
  }

  /** Unicode NFC composition (é as one codepoint, not e+combining
    * acute) — per-row, allocation only when the string is not already
    * normalized (the common case for clean corpora is a no-op). */
  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def nfc_normalize(text: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(text)))

  def sorted_overlap(hashes: Column, needles: Array[Long]): Column =
    ColumnBridge.column(
      SortedLongsOverlap(ColumnBridge.expression(hashes), needles))

  def repetition_stats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))

  def deflate_stats(text: Column): Column =
    ColumnBridge.column(DeflateStats(ColumnBridge.expression(text)))

  def repetition_ngrams(text: Column): Column =
    ColumnBridge.column(RepetitionNgrams(ColumnBridge.expression(text)))

  def text_profile(text: Column): Column =
    ColumnBridge.column(TextProfile(ColumnBridge.expression(text)))

  def lexical_stats(text: Column, wordSets: Seq[Seq[String]]): Column =
    ColumnBridge.column(LexicalStats(ColumnBridge.expression(text), wordSets))

  def hash_embed_vec(text: Column, dim: Int): Column =
    ColumnBridge.column(HashEmbedVec(ColumnBridge.expression(text), dim))

  def bucket_counts(text: Column, buckets: Int): Column =
    ColumnBridge.column(BucketCounts(ColumnBridge.expression(text), buckets))

  def dsir_score(text: Column, lr: Seq[Double]): Column =
    ColumnBridge.column(DsirScore(ColumnBridge.expression(text), lr))

  private val DOT = java.util.regex.Pattern.compile("\\.")

  /** Every label-aligned dot-suffix of a host in one right-to-left
    * pass — `transform(sequence(1, size(labels)), i →
    * array_join(slice(labels, i, size(labels)), "."))` parity over
    * `split(host, "\\.")`, including the empty labels java's split
    * with limit −1 (the SQL split contract) keeps for consecutive or
    * trailing dots. The relational spelling re-splits/re-slices per
    * suffix position (O(labels²) interpreted lambda evaluations). */
  def hostSuffixes(host: UTF8String): ArrayData = {
    val labels = DOT.split(host.toString, -1)
    val m = labels.length
    val out = new Array[Any](m)
    var s: String = null
    var i = m - 1
    while (i >= 0) {
      s = if (i == m - 1) labels(i) else labels(i) + "." + s
      out(i) = UTF8String.fromString(s)
      i -= 1
    }
    new GenericArrayData(out)
  }

  def host_suffixes(host: Column): Column =
    ColumnBridge.column(HostSuffixes(ColumnBridge.expression(host)))

  /** First-4-digest-bytes unsigned big-endian value mod `n` — the ONE
    * definition of the bucket fold, shared by every md5-bucket kernel
    * (a convention tweak applied anywhere else would silently
    * desynchronize hashed embeddings from DSIR features); parity with
    * the relational `conv(substring(md5(tok),1,8),16,10) % n` form. */
  private def bucketOfDigest(d: Array[Byte], n: Int): Int =
    ((((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % n).toInt

  /** md5 feature bucket of one token — shared by [[bucketCounts]] and
    * [[dsirScore]]; [[hashEmbedVec]] digests once itself because it
    * also reads the sign nibble, then folds via [[bucketOfDigest]]. */
  private def md5Bucket(md: java.security.MessageDigest, tok: String,
                        n: Int): Int =
    bucketOfDigest(
      md.digest(tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)), n)

  /** Per-document token counts by md5 feature bucket, in one pass —
    * long[buckets], zeros for zero-token text (contributes nothing to
    * a downstream [[LongVectorSum]] model). */
  def bucketCounts(text: UTF8String, buckets: Int): ArrayData = {
    val ts = toks(text)
    val acc = new Array[Long](buckets)
    val md = md5Local.get()
    var i = 0
    while (i < ts.length) {
      acc(md5Bucket(md, ts(i), buckets)) += 1
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** Per-document DSIR partial: struct(score = Σ_tok lr(bucket(tok)),
    * n_tokens), null when the text has no tokens (the "no
    * distribution" drop-out contract). One pass, no explode/shuffle —
    * the per-bucket log-ratios ride inside the expression. */
  def dsirScore(text: UTF8String, lr: Array[Double]): InternalRow = {
    val ts = toks(text)
    if (ts.isEmpty) return null
    val md = md5Local.get()
    var s = 0.0
    var i = 0
    while (i < ts.length) {
      s += lr(md5Bucket(md, ts(i), lr.length))
      i += 1
    }
    InternalRow(s, ts.length.toLong)
  }

  /** Fused feature-hashing pass backing [[HashEmbedVec]]: the whole
    * signed-bucket accumulation per document in one token walk. The
    * relational form (explode → groupBy(id, bucket) → groupBy(id))
    * shuffles the corpus token stream twice; here nothing shuffles at
    * all. Bucket/sign replicate the Spark-SQL/DuckDB md5 convention
    * EXACTLY — first 8 hex chars (digest bytes 0–3, unsigned
    * big-endian) mod dim, sign from the parity of hex char 9 (the
    * high nibble of byte 4) — and ±1 sums are exact in doubles under
    * ANY order, so the kernel is bit-identical to the relational
    * plan and the q9Z oracle. Returns null when the text has no
    * tokens ("no distribution", the relational form's dropped-row
    * contract). */
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  def hashEmbedVec(text: UTF8String, dim: Int): ArrayData = {
    val ts = toks(text)
    if (ts.isEmpty) return null
    val acc = new Array[Double](dim)
    // per-thread digest: a per-row getInstance would pay a provider
    // lookup + allocation per document; digest() resets the engine
    // after each call, so no explicit reset between tokens
    val md = md5Local.get()
    var i = 0
    while (i < ts.length) {
      val d = md.digest(ts(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val bucket = bucketOfDigest(d, dim)
      val nib = (d(4) >> 4) & 0xf
      acc(bucket) += (if (nib % 2 == 0) 1.0 else -1.0)
      i += 1
    }
    new GenericArrayData(acc)
  }

  /** Fused lexical-statistics pass backing [[LexicalStats]]: every
    * counter the quality-score / text-stats / Gopher-rules / lang-ID
    * operators need, in ONE codepoint walk — replacing up to seven
    * full-text regex scans per projection. Counter semantics replicate
    * the regex spellings the DuckDB oracles keep, exactly:
    *
    *  - `n_chars` = codepoint count (`length`);
    *  - `n_tokens` = `\S+` run count (Java `\s` class, ASCII — the
    *    [[TextProfile]] word counter);
    *  - `n_nonspace` = non-whitespace codepoints
    *    (`length(regexp_replace(text, "\s+", ""))`);
    *  - `n_hash` = '#' occurrences;
    *  - `n_ellipsis` = non-overlapping `\.\.\.` matches — per maximal
    *    run of d dots the regex consumes ⌊d/3⌋ matches;
    *  - `n_alpha_words` = tokens containing ≥ 1 Unicode letter
    *    (`(?<!\S)[^\p{L}\s]*\p{L}\S*` counts exactly one match per
    *    such token);
    *  - `set_hits[k]` = tokens whose WHOLE text equals a member of
    *    `wordSets(k)` — the `(?<!\S)(?:w1|w2|…)(?!\S)` whole-token
    *    alternation count (stopword hits, language-marker hits).
    *
    * Token strings materialize only while a run is still short enough
    * to possibly be a member (≤ the longest word in any set) — long
    * tokens never allocate. */
  def lexicalStats(text: UTF8String,
                   sets: Array[java.util.HashSet[String]],
                   maxWordLen: Int): InternalRow = {
    val s = text.toString
    val n = s.length
    var chars = 0L; var toks = 0L; var nonws = 0L
    var hash = 0L; var ellip = 0L; var alphaw = 0L
    val hits = new Array[Long](sets.length)
    var dotRun = 0L
    var inWord = false; var wordHasLetter = false; var runLen = 0
    val sb = new java.lang.StringBuilder
    def endWord(): Unit = {
      if (wordHasLetter) alphaw += 1
      if (runLen <= maxWordLen && sets.length > 0) {
        val w = sb.toString
        var k = 0
        while (k < sets.length) {
          if (sets(k).contains(w)) hits(k) += 1
          k += 1
        }
      }
      inWord = false
    }
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      chars += 1
      if (cp == '.') dotRun += 1
      else { ellip += dotRun / 3; dotRun = 0 }
      if (cp == '#') hash += 1
      val ws = cp == 0x20 || cp == 0x09 || cp == 0x0A || cp == 0x0B ||
        cp == 0x0C || cp == 0x0D
      if (!ws) {
        nonws += 1
        if (!inWord) {
          inWord = true; wordHasLetter = false; runLen = 0; sb.setLength(0)
          toks += 1
        }
        if (!wordHasLetter && Character.isLetter(cp)) wordHasLetter = true
        runLen += 1
        if (runLen <= maxWordLen) sb.appendCodePoint(cp)
      } else if (inWord) endWord()
      i += cc
    }
    if (inWord) endWord()
    ellip += dotRun / 3
    InternalRow(chars, toks, nonws, hash, ellip, alphaw,
      new org.apache.spark.sql.catalyst.util.GenericArrayData(hits))
  }

  /** Fused character-profile pass backing [[TextProfile]]: every count
    * the script-mix / mojibake / readability profilers need, in ONE
    * codepoint walk (plus one lowercase pass for syllables) instead of
    * the 11 full-text `regexp_count` scans the column-expression
    * formulation costs. Each counter replicates its regex's match
    * semantics EXACTLY (the DuckDB oracles keep the regex spelling):
    *
    *  - script counts = per-codepoint `Character.UnicodeScript`
    *    membership — the same tables Java regex `\p{IsX}` (and RE2
    *    `\p{X}`) resolve to, one binary search per char instead of
    *    five anchored regex scans;
    *  - `n_replacement` / `n_c1_controls` = single-char class counts;
    *  - `n_mojibake_digraphs` = non-overlapping `Ã[\x80-\xBF]` matches.
    *    Statless pairwise testing IS non-overlapping here: a match's
    *    consumed second char is in [0x80,BF] and can never start the
    *    next match (which needs 0xC3);
    *  - `n_words` = `\S+` run count with Java's `\s` class
    *    ([ \t\n\x0B\f\r] — NOT Unicode spaces), matching
    *    `tokenCount`'s regex byte-for-byte;
    *  - `n_sentences` = `[.!?]+` run count;
    *  - `n_syllables` = `[aeiouy]+` run count over
    *    `UTF8String.toLowerCase` — the exact kernel Spark's `lower()`
    *    applies, so 1:M case mappings (İ → i + combining dot) land
    *    identically to the `regexp_count(lower(text), ...)` spelling. */
  def textProfile(text: UTF8String): InternalRow = {
    val s = text.toString
    val n = s.length
    var latin = 0L; var cyr = 0L; var han = 0L; var arab = 0L; var greek = 0L
    var repl = 0L; var c1 = 0L; var digraph = 0L
    var words = 0L; var sents = 0L
    var inWord = false; var inSent = false
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      val cc = Character.charCount(cp)
      if (cp >= 0x41) { // scripts assigned below U+0041 are all COMMON
        val sc = Character.UnicodeScript.of(cp)
        if (sc eq Character.UnicodeScript.LATIN) latin += 1
        else if (sc eq Character.UnicodeScript.CYRILLIC) cyr += 1
        else if (sc eq Character.UnicodeScript.HAN) han += 1
        else if (sc eq Character.UnicodeScript.ARABIC) arab += 1
        else if (sc eq Character.UnicodeScript.GREEK) greek += 1
      }
      if (cp == 0xFFFD) repl += 1
      else if (cp >= 0x80 && cp <= 0x9F) c1 += 1
      else if (cp == 0xC3 && i + cc < n) {
        val nx = s.codePointAt(i + cc)
        if (nx >= 0x80 && nx <= 0xBF) digraph += 1
      }
      val ws = cp == 0x20 || cp == 0x09 || cp == 0x0A || cp == 0x0B ||
        cp == 0x0C || cp == 0x0D
      if (!ws) { if (!inWord) { words += 1; inWord = true } }
      else inWord = false
      val sentCh = cp == '.' || cp == '!' || cp == '?'
      if (sentCh) { if (!inSent) { sents += 1; inSent = true } }
      else inSent = false
      i += cc
    }
    var sylls = 0L
    var inVowel = false
    val ls = text.toLowerCase.toString
    var j = 0
    val m = ls.length
    while (j < m) {
      val c = ls.charAt(j)
      val v = c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u' || c == 'y'
      if (v) { if (!inVowel) { sylls += 1; inVowel = true } }
      else inVowel = false
      j += 1
    }
    InternalRow(latin, cyr, han, arab, greek, repl, c1, digraph,
      words, sents, sylls)
  }
}

/** Unicode NFC normalization (the canonicalization step of text
  * cleaning; DuckDB-`nfc_normalize` parity). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    TextExprs.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.nfc($c)")

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
  override def prettyName: String = "nfc_normalize"
}

/** Membership test of a sorted long array against a sorted constant
  * needle set — the zero-shuffle decontamination flag. */
case class SortedLongsOverlap(child: Expression, needles: Array[Long])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = BooleanType

  override def nullSafeEval(v: Any): Any =
    TextExprs.overlaps(v.asInstanceOf[ArrayData], needles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("needles", needles, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.overlaps($c, $ref)")
  }

  override protected def withNewChildInternal(c: Expression): SortedLongsOverlap =
    copy(child = c)
  override def prettyName: String = "sorted_overlap"
}

/** struct(n_tokens, n_distinct, max_bigram, dup_bigram_chars,
  * total_bigram_chars) in one pass over the text. */
case class RepetitionStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("max_bigram", IntegerType, nullable = false),
    StructField("dup_bigram_chars", LongType, nullable = false),
    StructField("total_bigram_chars", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any =
    TextExprs.repetition(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.repetition($c)")

  override protected def withNewChildInternal(c: Expression): RepetitionStats =
    copy(child = c)
  override def prettyName: String = "repetition_stats"
}

/** array<struct(n, top_chars, dup_chars, total_chars)> for n = 2..10 —
  * the full Gopher repetition battery in one pass (bigram-only summary
  * is [[RepetitionStats]]). */
case class RepetitionNgrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("n", IntegerType, nullable = false),
    StructField("top_chars", LongType, nullable = false),
    StructField("dup_chars", LongType, nullable = false),
    StructField("total_chars", LongType, nullable = false))),
    containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TextExprs.repetitionNgrams(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.repetitionNgrams($c)")

  override protected def withNewChildInternal(c: Expression): RepetitionNgrams =
    copy(child = c)
  override def prettyName: String = "repetition_ngrams"
}

/** struct(n_bytes, z_bytes): UTF-8 length and raw-deflate(level 6)
  * compressed size — the compression-ratio entropy proxy. No SQL
  * oracle exists (DuckDB exposes no deflate scalar), so its query is
  * rows-only; the spec pins exact determinism and the
  * repetitive < prose < random ratio ordering. */
case class DeflateStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("z_bytes", IntegerType, nullable = false)))

  override def nullSafeEval(v: Any): Any =
    TextExprs.deflateStats(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.deflateStats($c)")

  override protected def withNewChildInternal(c: Expression): DeflateStats =
    copy(child = c)
  override def prettyName: String = "deflate_stats"
}

/** struct of the 11 counters behind the script-mix / mojibake /
  * readability profilers, in one fused codepoint pass (see
  * [[TextExprs.textProfile]]) — replaces up to 11 separate full-text
  * `regexp_count` scans. Callers project the fields they need; with
  * whole-stage codegen's common-subexpression elimination the kernel
  * runs ONCE per row however many fields are read. */
/** struct of the fused lexical counters (see
  * [[TextExprs.lexicalStats]]) + per-word-set whole-token hit counts —
  * one codepoint pass serving quality scoring, text stats, the Gopher
  * rule battery, and language ID. `wordSets` participates in equality,
  * so whole-stage codegen CSE shares one evaluation exactly between
  * projections of the SAME sets. */
case class LexicalStats(child: Expression, wordSets: Seq[Seq[String]])
    extends UnaryExpression with ExpectsInputTypes {

  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    wordSets.map { ws =>
      val h = new java.util.HashSet[String](ws.size * 2)
      ws.foreach(h.add)
      h
    }.toArray
  @transient private lazy val maxWordLen: Int =
    wordSets.flatten.map(_.length).maxOption.getOrElse(0)

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", LongType, nullable = false),
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_nonspace", LongType, nullable = false),
    StructField("n_hash", LongType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_alpha_words", LongType, nullable = false),
    StructField("set_hits", ArrayType(LongType, containsNull = false),
      nullable = false)))

  override def nullSafeEval(v: Any): Any =
    TextExprs.lexicalStats(v.asInstanceOf[UTF8String], sets, maxWordLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sets", sets, "java.util.HashSet[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprs.lexicalStats($c, $ref, $maxWordLen)")
  }

  override protected def withNewChildInternal(c: Expression): LexicalStats =
    copy(child = c)
  override def prettyName: String = "lexical_stats"
}

case class TextProfile(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_latin", LongType, nullable = false),
    StructField("n_cyrillic", LongType, nullable = false),
    StructField("n_han", LongType, nullable = false),
    StructField("n_arabic", LongType, nullable = false),
    StructField("n_greek", LongType, nullable = false),
    StructField("n_replacement", LongType, nullable = false),
    StructField("n_c1_controls", LongType, nullable = false),
    StructField("n_mojibake_digraphs", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_sentences", LongType, nullable = false),
    StructField("n_syllables", LongType, nullable = false)))

  override def nullSafeEval(v: Any): Any =
    TextExprs.textProfile(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.textProfile($c)")

  override protected def withNewChildInternal(c: Expression): TextProfile =
    copy(child = c)
  override def prettyName: String = "text_profile"
}

/** Signed feature-hashed embedding of the token stream in ONE pass —
  * array<double> of length `dim`, null when the text has no tokens
  * (see [[TextExprs.hashEmbedVec]] for the md5 convention parity). */
case class HashEmbedVec(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(dim > 0, "dim must be positive")

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  // null OUT for zero-token text even when the INPUT is non-nullable —
  // without this override the optimizer trusts child.nullable, deletes
  // downstream isNotNull filters, and a null embedding escapes
  // (confirmed EXPRESSION_DECODING_FAILED on a lit() input); it also
  // keeps nullSafeCodeGen's isNull a real variable, not the literal
  // `false` the generated assignment below could not compile against
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    TextExprs.hashEmbedVec(v.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextExprs.hashEmbedVec($c, $dim);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): HashEmbedVec =
    copy(child = c)
  override def prettyName: String = "hash_embed_vec"
}

/** Per-document md5-bucket token counts in one pass — long[buckets],
  * zeros for zero-token text (see [[TextExprs.bucketCounts]]). */
case class BucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(buckets > 0, "buckets must be positive")

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TextExprs.bucketCounts(v.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.bucketCounts($c, $buckets)")

  override protected def withNewChildInternal(c: Expression): BucketCounts =
    copy(child = c)
  override def prettyName: String = "bucket_counts"
}

/** struct(score, n_tokens): Σ of the per-bucket log-ratios over the
  * document's tokens in one pass; null when the text has no tokens
  * (see [[TextExprs.dsirScore]]). The ≤buckets-sized ratio table rides
  * inside the expression as one reference object. */
case class DsirScore(child: Expression, lr: Seq[Double])
    extends UnaryExpression with ExpectsInputTypes {
  require(lr.nonEmpty, "log-ratio table must be non-empty")

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("n_tokens", LongType, nullable = false)))
  // null OUT for zero-token text even from a non-nullable input — the
  // HashEmbedVec lesson: without this the optimizer deletes downstream
  // isNotNull guards and the null escapes
  override def nullable: Boolean = true

  @transient private lazy val lrArr: Array[Double] = lr.toArray

  override def nullSafeEval(v: Any): Any =
    TextExprs.dsirScore(v.asInstanceOf[UTF8String], lrArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("lr", lrArr, "double[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextExprs.dsirScore($c, $ref);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): DsirScore =
    copy(child = c)
  override def prettyName: String = "dsir_score"
}

/** Label-aligned dot-suffix array of a host (blocklist equi-join key
  * fan-out); null in, null out. */
case class HostSuffixes(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    TextExprs.hostSuffixes(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextExprs.hostSuffixes($c)")

  override protected def withNewChildInternal(c: Expression): HostSuffixes =
    copy(child = c)
  override def prettyName: String = "host_suffixes"
}
