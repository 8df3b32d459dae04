package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Single-pass per-document shingling/signature kernels as native
 * Catalyst Expressions. These replace the explode → distinct → window
 * → hash-aggregate pipelines inside the dedup operators: the per-doc
 * work (tokenize, w-shingle, hash, dedupe, k minhash permutations /
 * simhash votes) is a tight per-row loop, so expressing it relationally
 * costs THE defining shuffle of a 100 TB dedup sweep — the exploded
 * shingle stream is as large as the corpus itself and was shuffled
 * twice (distinct + groupBy doc). As Expressions the signature build is
 * map-side only: zero shuffles until the (tiny) band/prefix join.
 *
 * Hash parity is load-bearing: tokens are the maximal `\S+` runs —
 * exactly `regexp_extract_all(text, '\S+')`, the tokenization every
 * DuckDB oracle and `TextAnalysis.tokens` use (never an empty token,
 * whatever whitespace bounds the text) — and shingles are hashed with
 * the same XXH64(seed=42) that the `xxhash64` SQL function uses, so
 * these kernels produce bit-identical signatures/candidates to the
 * relational pipelines they replace (pinned by DedupSpec /
 * ScaleOperatorsSpec parity tests).
 */
object ShingleExprs {

  private val TOKEN = java.util.regex.Pattern.compile("\\S+")

  /** `regexp_extract_all(text, '\S+')`-parity tokenization. */
  private[functions] def toks(text: UTF8String): Array[String] = {
    val m = TOKEN.matcher(text.toString)
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    out.toArray
  }

  /** Sorted DISTINCT xxhash64(seed 42) values of the w-shingles,
    * optionally masked to 32 bits. `wordShingles` parity: < w tokens
    * degenerate to ONE shingle = all tokens joined. */
  def computeHashes(text: UTF8String, w: Int, mask: Boolean): Array[Long] = {
    val ts = toks(text)
    val n = if (ts.length >= w) ts.length - w + 1 else 1
    val hs = new Array[Long](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      val end = if (ts.length >= w) i + w else ts.length
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(ts(j))
        j += 1
      }
      val h = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      hs(i) = if (mask) h & 0xFFFFFFFFL else h
      i += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedupe of the sorted run
    var out = 0
    i = 0
    while (i < hs.length) {
      if (out == 0 || hs(i) != hs(out - 1)) { hs(out) = hs(i); out += 1 }
      i += 1
    }
    if (out == hs.length) hs else java.util.Arrays.copyOf(hs, out)
  }

  /** Full-width w-shingle hashes only (minhashCandidates parity:
    * documents with < w tokens produce NO shingles and drop out). */
  private def fullWidthHashes(text: UTF8String, w: Int): Array[Long] = {
    val ts = toks(text)
    if (ts.length < w) return Array.emptyLongArray
    computeHashes(text, w, mask = true)
  }

  /** struct(sig: array<long>, hs: array<long>) — the k minhash minima
    * under h_i(x) = (a_i·x + b_i) mod P plus the sorted distinct
    * 32-bit-masked shingle-hash set, in ONE pass over the document. */
  def computeSig(text: UTF8String, w: Int, k: Int,
                 a: Array[Long], b: Array[Long], p: Long): InternalRow = {
    val hs = fullWidthHashes(text, w)
    if (hs.isEmpty)
      return InternalRow(new GenericArrayData(Array.emptyLongArray),
        new GenericArrayData(Array.emptyLongArray))
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < hs.length) {
      val h = hs(i)
      var j = 0
      while (j < k) {
        // a_j is 30-bit, h 32-bit ⇒ a·h + b < 2^63: no overflow
        val v = (a(j) * h + b(j)) % p
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    InternalRow(new GenericArrayData(sig), new GenericArrayData(hs))
  }

  /** 64-bit SimHash of a token array: per-bit ±1 votes of each token's
    * xxhash64(seed 42); sign of the vote becomes the bit. Null for an
    * empty array (explode-parity: token-less docs drop out). */
  def computeSim(tokens: ArrayData): Any = {
    val n = tokens.numElements()
    if (n == 0) return null
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XXH64.hashUTF8String(tokens.getUTF8String(i), 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (((h >>> b) & 1L).toInt << 1) - 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** w-token gram STRING array in one pass — `overlapping = true`
    * yields the stride-1 window stream ([[graft.operators.Dedup.spanDedup]]:
    * `len − w + 1` grams, none when `len < w`); `false` the
    * non-overlapping chunking ([[graft.operators.Dedup.chunkDedup]]:
    * `ceil(len / w)` chunks, short tail kept). Tokenization is the
    * shared `\S+` contract. Replaces the relational
    * `transform(sequence, slice)` builders, whose lambda re-evaluated
    * the tokenizer per gram position. */
  def computeGrams(text: UTF8String, w: Int, overlapping: Boolean): ArrayData = {
    val ts = toks(text)
    val n =
      if (overlapping) { if (ts.length >= w) ts.length - w + 1 else 0 }
      else (ts.length + w - 1) / w
    val out = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var g = 0
    while (g < n) {
      val start = if (overlapping) g else g * w
      val end = math.min(start + w, ts.length)
      sb.setLength(0)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(ts(j))
        j += 1
      }
      out(g) = UTF8String.fromString(sb.toString)
      g += 1
    }
    new GenericArrayData(out)
  }

  def shingle_minhash(text: Column, w: Int, k: Int,
                      a: Array[Long], b: Array[Long], p: Long): Column =
    ColumnBridge.column(ShingleMinHashSig(ColumnBridge.expression(text), w, k, a, b, p))

  def shingle_hashes(text: Column, w: Int, mask: Boolean = false): Column =
    ColumnBridge.column(ShingleHashSet(ColumnBridge.expression(text), w, mask))

  def simhash64(tokens: Column): Column =
    ColumnBridge.column(SimHash64(ColumnBridge.expression(tokens)))

  def token_grams(text: Column, w: Int, overlapping: Boolean): Column =
    ColumnBridge.column(TokenGrams(ColumnBridge.expression(text), w, overlapping))

  /** Distinct character n-grams in first-occurrence order —
    * `array_distinct(transform(sequence(1, len−n+1), i → substr(i, n)))`
    * parity, including `Dedup.charShingles`' degenerate branches:
    * `< n` chars ⇒ `[whole string]`, null input ⇒ `[null]` (the
    * `otherwise(array(c))` arm fires for null because the `when`
    * predicate is null). The relational spelling re-evaluates the
    * interpreted lambda per gram position, materializes every
    * (overlapping, duplicated) gram, and then re-hashes the whole
    * array inside array_distinct; this is one pass with one hash
    * probe per position. */
  def distinctCharGrams(text: UTF8String, n: Int): ArrayData = {
    if (text == null) return new GenericArrayData(Array[Any](null))
    val len = text.numChars()
    if (len < n) return new GenericArrayData(Array[Any](text))
    val seen = new java.util.LinkedHashSet[UTF8String]
    val last = len - n + 1
    var i = 1
    while (i <= last) {
      seen.add(text.substringSQL(i, n))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  def distinct_char_grams(text: Column, n: Int): Column =
    ColumnBridge.column(DistinctCharGrams(ColumnBridge.expression(text), n))

  /** Agreeing-position count of two signature arrays —
    * `size(filter(zip_with(a, b, _ === _), z => z))` parity: zip_with
    * pads the shorter side with nulls and `null === x` is null, which
    * `filter` drops, so only positions below min(len) where both
    * elements are non-null and equal count. One merge loop instead of
    * three interpreted HOFs and two intermediate arrays per candidate
    * pair. */
  def sigAgreeCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        c += 1
      i += 1
    }
    c
  }

  def sig_agree_count(a: Column, b: Column): Column =
    ColumnBridge.column(SigAgreeCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Space-join of `arr`'s elements whose index is NOT in `drop` —
    * one bitset pass, O(n + d); the `filter(arr, array_contains(...))`
    * formulation is O(n·d) per row, quadratic for a heavily
    * duplicated 10k-token document. */
  def joinDrop(arr: ArrayData, drop: ArrayData): UTF8String = {
    val n = arr.numElements()
    val dropped = new java.util.BitSet(n)
    if (drop != null) {
      var i = 0
      while (i < drop.numElements()) {
        val p = drop.getInt(i)
        if (p >= 0 && p < n) dropped.set(p)
        i += 1
      }
    }
    val sb = new java.lang.StringBuilder
    var i = 0
    var first = true
    while (i < n) {
      if (!dropped.get(i) && !arr.isNullAt(i)) {
        if (!first) sb.append(' ')
        sb.append(arr.getUTF8String(i).toString)
        first = false
      }
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def join_except_positions(arr: Column, drop: Column): Column =
    ColumnBridge.column(JoinExceptPositions(
      ColumnBridge.expression(arr), ColumnBridge.expression(drop)))

  /** |a ∩ b| of two SORTED distinct long arrays — one merge pass, no
    * allocation. The `array_intersect`/`array_union` formulation
    * builds two hash sets and materializes both result arrays per
    * candidate pair; in the exact-verify stage of the similarity
    * joins that's the per-pair hot loop. */
  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    val m = b.numElements()
    var i = 0
    var j = 0
    var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  def sorted_intersect_count(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** MinHash signature + distinct shingle-hash set in one codegen'd pass. */
case class ShingleMinHashSig(child: Expression, w: Int, k: Int,
                             a: Array[Long], b: Array[Long], p: Long)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = StructType(Seq(
    StructField("sig", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("hs", ArrayType(LongType, containsNull = false), nullable = false)))

  override def nullSafeEval(v: Any): Any =
    ShingleExprs.computeSig(v.asInstanceOf[UTF8String], w, k, a, b, p)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", a, "long[]")
    val bRef = ctx.addReferenceObj("mhB", b, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleExprs.computeSig($c, $w, $k, $aRef, $bRef, ${p}L)")
  }

  override protected def withNewChildInternal(c: Expression): ShingleMinHashSig =
    copy(child = c)
  override def prettyName: String = "shingle_minhash"
}

/** Sorted distinct w-shingle xxhash64 values (prefix-filter input). */
case class ShingleHashSet(child: Expression, w: Int, mask: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(ShingleExprs.computeHashes(v.asInstanceOf[UTF8String], w, mask))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.ShingleExprs.computeHashes($c, $w, $mask))")

  override protected def withNewChildInternal(c: Expression): ShingleHashSet =
    copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** Space-join of a string array minus a dropped-index set; the drop
  * side is null-tolerant (null ⇒ drop nothing) so a left join's
  * missing rows need no coalesce. */
case class JoinExceptPositions(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = left.nullable

  override def eval(input: InternalRow): Any = {
    val arr = left.eval(input)
    if (arr == null) null
    else ShingleExprs.joinDrop(arr.asInstanceOf[ArrayData],
      right.eval(input).asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    ev.copy(code =
      code"""
        ${l.code}
        ${r.code}
        boolean ${ev.isNull} = ${l.isNull};
        UTF8String ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.ShingleExprs.joinDrop(${l.value},
            ${r.isNull} ? null : ${r.value});
        }
      """)
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): JoinExceptPositions = copy(left = l, right = r)
  override def prettyName: String = "join_except_positions"
}

/** Merge-count of two sorted distinct long arrays (null-intolerant). */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleExprs.sortedIntersectCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleExprs.sortedIntersectCount($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SortedIntersectCount = copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** One-pass w-token gram array (overlapping windows or chunks). */
case class TokenGrams(child: Expression, w: Int, overlapping: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  require(w >= 1, s"token_grams width must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    ShingleExprs.computeGrams(v.asInstanceOf[UTF8String], w, overlapping)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleExprs.computeGrams($c, $w, $overlapping)")

  override protected def withNewChildInternal(c: Expression): TokenGrams =
    copy(child = c)
  override def prettyName: String = "token_grams"
}

/** Distinct char n-grams with charShingles' degenerate branches; never
  * null (a null input yields `[null]`, matching `array(c)`). */
case class DistinctCharGrams(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, s"distinct_char_grams width must be >= 1, got $n")

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    ShingleExprs.distinctCharGrams(
      child.eval(input).asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = false;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
          graft.functions.ShingleExprs.distinctCharGrams(
            ${c.isNull} ? null : ${c.value}, $n);
      """)
  }

  override protected def withNewChildInternal(c: Expression): DistinctCharGrams =
    copy(child = c)
  override def prettyName: String = "distinct_char_grams"
}

/** Agreeing-position count of two signature arrays (null-intolerant —
  * a null side yields null, exactly like the zip_with chain). Long
  * arrays only: the merge loop reads getLong, so binding anything
  * else must fail at analysis, not return garbage at runtime. */
case class SigAgreeCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleExprs.sigAgreeCount(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleExprs.sigAgreeCount($a, $b)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): SigAgreeCount = copy(left = l, right = r)
  override def prettyName: String = "sig_agree_count"
}

/** 64-bit SimHash over a token array; null for empty input. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[ColumnBridge.SqlAbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    ShingleExprs.computeSim(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("simResult")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          Object $boxed = graft.functions.ShingleExprs.computeSim(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = ((java.lang.Long) $boxed).longValue();
          }
        }
      """)
  }

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
  override def prettyName: String = "simhash64"
}
