package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic global shuffle + sequential shard packing — the last
 * step of a training-data pipeline: documents are laid out in a
 * reproducible pseudo-random order (md5 of the id — engine- and
 * partitioning-independent, the same trick as
 * [[Sampling.stratifiedSample]]) and split into contiguous shards of
 * ~`budget` total weight (tokens/chars), so each training shard is a
 * same-sized, unbiased sample of the corpus.
 *
 * Shard assignment needs the GLOBAL running weight sum in md5 order. A
 * window cumsum with no partition key would funnel the whole corpus
 * through ONE task — the classic global-order scale killer. Instead we
 * compute a distributed two-phase prefix sum:
 *
 *   1. range-partition + sort by the md5 key (the one necessary
 *      shuffle — same cost class as any global sort),
 *   2. per-partition weight totals → driver (one long per partition),
 *      cumulated into per-partition starting offsets,
 *   3. a second map-side pass adds the offset to the within-partition
 *      running sum.
 *
 * The partitioned/sorted intermediate is persisted between the two
 * passes — range boundaries are sampled, so recomputing it could
 * legally repartition differently and corrupt the offsets.
 */
object Packing {

  /** @return (idCol, weightCol, cum_before, shard_id) — `shard_id` =
    *         floor(weight-sum of all PRECEDING docs in md5 order /
    *         budget): a doc straddling a boundary belongs to the shard
    *         it starts in. */
  def packShards(df: DataFrame, idCol: String, weightCol: String,
                 budget: Long, partitions: Int = 32): DataFrame = {
    require(budget > 0, "budget must be positive")
    val b = budget
    prefixByKey(df,
        Seq(graft.functions.HashExprs.md5_bytes(col(idCol).cast("string"))),
        idCol, weightCol, partitions)
      .withColumn("shard_id", expr(s"cum_before div $b"))
  }

  /** The distributed two-phase prefix sum shared by [[packShards]],
    * [[packSequences]], [[packSequencesBy]] and
    * [[ContextLayout.contextOrder]]: range-partition + sort by
    * `keys` (the ONE necessary shuffle), per-partition totals →
    * driver offsets, then a map-side pass adds the offset to the
    * within-partition running sum. `keys` must be orderable
    * expressions whose lexicographic (field-by-field) order IS the
    * intended layout order; the md5 callers pass the 16 raw digest
    * bytes (order-identical to the hex string — Sampling.rankKeyBytes
    * doc) and the ordinal callers pass plain longs, so the range
    * shuffle carries narrow keys and never a zero-padded string
    * (§2.3). The keys exist only to order the stream: they are
    * projected away after the within-partition sort, so the persisted
    * frame and both typed passes carry (id, w) alone.
    * @return (idCol, weightCol, cum_before). */
  private[graft] def prefixByKey(df: DataFrame, keys: Seq[Column],
                                     idCol: String, weightCol: String,
                                     partitions: Int): DataFrame = {
    // ids ride through the typed two-pass pipeline as longs — refuse
    // non-integral id columns loudly instead of silently nulling them
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"prefix packing needs an integral id column; $idCol is $idType")
    val spark = df.sparkSession
    import spark.implicits._

    val keyNames = keys.indices.map(i => col(s"__k$i"))
    val keyed = df
      .select(keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") } ++
        Seq(col(idCol).cast("long").as("__id"),
          col(weightCol).cast("long").as("__w")): _*)
      .repartitionByRange(partitions, keyNames: _*)
      .sortWithinPartitions(keyNames: _*)
      .select(col("__id"), col("__w"))
      .persist()
    val ds = keyed.as[(Long, Long)]

    val partSums = ds.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator((TaskContext.getPartitionId(), s))
    }.collect().toMap
    // offsets(p) = total weight of partitions before p
    val offsets: Array[Long] = (0 until partitions)
      .map(p => partSums.getOrElse(p, 0L)).scanLeft(0L)(_ + _).toArray
    val bOffsets = spark.sparkContext.broadcast(offsets)

    val out = ds.mapPartitions { it =>
      var run = bOffsets.value(TaskContext.getPartitionId())
      it.map { case (id, w) =>
        val before = run
        run += w
        (id, w, before)
      }
    }.toDF(idCol, weightCol, "cum_before")
      // materialize NOW (eager localCheckpoint): the result is small
      // (3 scalar columns) and once it exists the big range-partitioned
      // intermediate can be released instead of leaking in the cache
      // for the session lifetime
      .localCheckpoint(true)
    keyed.unpersist(false)
    out
  }

  /** [[prefixByKey]] for TWO weight columns in ONE pass over ONE
    * range shuffle — the in-context layout fusion (§2): the layout
    * ordinal (unit weights) and the token prefix sum share the same
    * key order, so running them as separate prefix phases paid a
    * second full range shuffle + persist + driver round-trip +
    * materialization for algebra one pass already had in hand.
    * Semantics are exactly two [[prefixByKey]] calls over the same
    * `keys` (pinned in Round20OptSpec).
    * @return (idCol, w1Col, w2Col, cum_before_1, cum_before_2). */
  private[graft] def prefixByKey2(df: DataFrame, keys: Seq[Column],
                                  idCol: String, w1Col: String, w2Col: String,
                                  partitions: Int): DataFrame = {
    val idType = df.schema(idCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(idType.typeName),
      s"prefix packing needs an integral id column; $idCol is $idType")
    val spark = df.sparkSession
    import spark.implicits._

    val keyNames = keys.indices.map(i => col(s"__k$i"))
    val keyed = df
      .select(keys.zipWithIndex.map { case (k, i) => k.as(s"__k$i") } ++
        Seq(col(idCol).cast("long").as("__id"),
          col(w1Col).cast("long").as("__w1"),
          col(w2Col).cast("long").as("__w2")): _*)
      .repartitionByRange(partitions, keyNames: _*)
      .sortWithinPartitions(keyNames: _*)
      .select(col("__id"), col("__w1"), col("__w2"))
      .persist()
    val ds = keyed.as[(Long, Long, Long)]

    val partSums = ds.mapPartitions { it =>
      var s1 = 0L
      var s2 = 0L
      it.foreach { r => s1 += r._2; s2 += r._3 }
      Iterator((TaskContext.getPartitionId(), s1, s2))
    }.collect().map(t => t._1 -> ((t._2, t._3))).toMap
    def offsets(pick: ((Long, Long)) => Long): Array[Long] = (0 until partitions)
      .map(p => partSums.get(p).map(pick).getOrElse(0L))
      .scanLeft(0L)(_ + _).toArray
    val b1 = spark.sparkContext.broadcast(offsets(_._1))
    val b2 = spark.sparkContext.broadcast(offsets(_._2))

    val out = ds.mapPartitions { it =>
      val p = TaskContext.getPartitionId()
      var r1 = b1.value(p)
      var r2 = b2.value(p)
      it.map { case (id, w1, w2) =>
        val o1 = r1
        val o2 = r2
        r1 += w1
        r2 += w2
        (id, w1, w2, o1, o2)
      }
    }.toDF(idCol, w1Col, w2Col, "cum_before_1", "cum_before_2")
      .localCheckpoint(true)
    keyed.unpersist(false)
    out
  }

  /**
   * Fixed-length training-SEQUENCE packing: documents in the same
   * deterministic md5 order occupy the token interval
   * `[cum_before, cum_before + w)` of one global stream, which is cut
   * into sequences of exactly `seqLen` tokens; a document straddling a
   * boundary is SPLIT (the pretraining convention — sequences are
   * dense, no padding), so each (doc, sequence) overlap is emitted as
   * one row with the doc-relative token span `[tok_start, tok_end)`.
   * Zero-weight docs occupy no tokens and are dropped.
   *
   * Scale shape: [[packShards]]'s two-phase distributed prefix sum
   * (never a single-task global window) + a per-row `sequence` explode
   * bounded by ceil(w / seqLen) rows per doc. Integer `div` keeps the
   * boundary math in exact longs — no double rounding at 100 TB token
   * counts.
   */
  def packSequences(df: DataFrame, idCol: String, weightCol: String,
                    seqLen: Long, partitions: Int = 32): DataFrame =
    cutSequences(
      prefixByKey(df,
        Seq(graft.functions.HashExprs.md5_bytes(col(idCol).cast("string"))),
        idCol, weightCol, partitions),
      idCol, weightCol, seqLen)

  /**
   * [[packSequences]] with a CALLER-SUPPLIED layout order instead of
   * the md5 shuffle — the packing half of
   * [[ContextLayout.inContextLayout]]: an in-context pretraining
   * layout (Shi et al. 2023) wants RELATED documents adjacent in the
   * token stream, so the order is the similarity walk's ordinal, not
   * a pseudo-random key. `orderCol` must be a non-negative long,
   * unique per row (ties would make the layout partitioning-
   * dependent); it rides as a plain long key through the same
   * two-phase distributed prefix sum — never a single-task window.
   */
  def packSequencesBy(df: DataFrame, idCol: String, weightCol: String,
                      orderCol: String, seqLen: Long,
                      partitions: Int = 32): DataFrame = {
    // a fractional order column would silently TRUNCATE through the
    // long cast and alias distinct positions onto one key
    val ordType = df.schema(orderCol).dataType
    require(Seq("byte", "short", "integer", "long").contains(ordType.typeName),
      s"packSequencesBy needs an integral order column; $orderCol is $ordType")
    // the long itself is the key now (numeric order ≡ the old
    // zero-padded string order for the guarded non-negative domain) —
    // 8 key bytes through the range shuffle instead of 19 chars
    val key = when(col(orderCol) >= 0, col(orderCol).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"packSequencesBy: negative $orderCol breaks the " +
          "ordinal key order: "), col(orderCol).cast("string"))))
    cutSequences(prefixByKey(df, Seq(key), idCol, weightCol, partitions),
      idCol, weightCol, seqLen)
  }

  /**
   * Packing-efficiency audit over [[packSequences]] /
   * [[packSequencesBy]] output — the layout's acceptance report: how
   * many documents were SPLIT across a sequence boundary (attention
   * never spans the cut, so a split doc trains on truncated context),
   * how densely sequences filled, and the doc-per-sequence mixing
   * rate the in-context layout is trying to raise. One row of exact
   * integer counts; the two fractions are single divisions of exact
   * integers (the float-contract rule). Assumes the dense-stream
   * contract of the producers (contiguous seq ids from 0), under
   * which `tail_fill` = tokens in the final, possibly-partial
   * sequence. Empty input yields the row with zero counts and null
   * fractions.
   *
   * Scale shape: two partial/final aggregates over the span rows
   * (by doc, by sequence) reduced to one-row summaries each, then a
   * 1×1 cross join — nothing corpus-sized survives the first stage.
   *
   * @return (n_seqs, n_docs, n_tokens, full_seqs, split_docs,
   *         split_doc_frac, mean_docs_per_seq, tail_fill)
   */
  def packingReport(packed: DataFrame, idCol: String,
                    seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spans = packed.select(col(idCol).as("__id"), col("seq_id"),
      (col("tok_end") - col("tok_start")).as("__len"))
    val perDoc = spans.groupBy("__id").agg(count(lit(1)).as("__n"))
    val perSeq = spans.groupBy("seq_id")
      .agg(sum("__len").as("__fill"), count(lit(1)).as("__docs"))
    val d = perDoc.agg(
      count(lit(1)).cast("long").as("n_docs"),
      coalesce(sum(when(col("__n") > 1, 1L).otherwise(0L)), lit(0L))
        .cast("long").as("split_docs"))
    val s = perSeq.agg(
      count(lit(1)).cast("long").as("n_seqs"),
      coalesce(sum(col("__fill")), lit(0L)).cast("long").as("n_tokens"),
      coalesce(sum(when(col("__fill") === seqLen, 1L).otherwise(0L)),
        lit(0L)).cast("long").as("full_seqs"),
      coalesce(sum(col("__docs")), lit(0L)).cast("long").as("n_spans"))
    d.crossJoin(s).select(
      col("n_seqs"), col("n_docs"), col("n_tokens"), col("full_seqs"),
      col("split_docs"),
      when(col("n_docs") > 0, round(col("split_docs").cast("double") /
        col("n_docs").cast("double"), 6)).as("split_doc_frac"),
      when(col("n_seqs") > 0, round(col("n_spans").cast("double") /
        col("n_seqs").cast("double"), 6)).as("mean_docs_per_seq"),
      when(col("n_seqs") > 0,
        col("n_tokens") - (col("n_seqs") - 1) * lit(seqLen))
        .as("tail_fill"))
  }

  /** The sequence-cut explode shared by [[packSequences]] and
    * [[packSequencesBy]]: cut the global token stream at multiples of
    * `seqLen`, emit one row per (doc, sequence) overlap. Integer
    * `div` keeps boundary math in exact longs. */
  private[graft] def cutSequences(base: DataFrame, idCol: String,
                                  weightCol: String, seqLen: Long): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val L = lit(seqLen)
    val first = expr(s"cum_before div $seqLen")
    val last = expr(s"(cum_before + `$weightCol` - 1) div $seqLen")
    base.filter(col(weightCol) > 0)
      .select(col(idCol), col(weightCol), col("cum_before"),
        explode(sequence(first, last)).as("seq_id"))
      .select(col(idCol), col("seq_id"),
        greatest(lit(0L), col("seq_id") * L - col("cum_before")).as("tok_start"),
        least(col(weightCol).cast("long"),
          (col("seq_id") + lit(1L)) * L - col("cum_before")).as("tok_end"))
  }

  /**
   * Overlapping retrieval chunks — the RAG-ingest layout, PER
   * document (unlike [[packSequences]], which packs a global training
   * stream ACROSS document boundaries): each document's token stream
   * is cut into windows of `width` tokens starting every `stride`
   * tokens, so consecutive chunks overlap by `width − stride` and no
   * passage is split without also appearing whole in a neighbor.
   * Emitted columns: (doc_id, chunk_idx, tok_start, tok_end,
   * chunk_text), spans 1-based inclusive in the document's token
   * coordinates — the metadata an index needs to map a retrieved
   * chunk back to its source span.
   *
   * Contract, integer-exact (the qBA oracle replays it verbatim):
   * starts are 1, 1+stride, 2·stride+1, …; a start is kept while it
   * is 1 or extends coverage (start ≤ n − width + stride — a tail
   * window fully contained in its predecessor is redundant retrieval
   * mass and is dropped); the final chunk clips to the document end.
   * Zero-token documents emit no chunks.
   *
   * Scale shape: pure per-row explode — tokenize once, one Generate,
   * no shuffle at all; ~n/stride output rows per document. The
   * bounded per-doc fan-out (≤ n/stride + 1) keeps task memory flat;
   * chunk text is materialized by slicing the one token array, never
   * by re-tokenizing per chunk.
   */
  def chunkWindows(docs: DataFrame, idCol: String, textCol: String,
                   width: Int, stride: Int): DataFrame = {
    require(width > 0, s"chunk width must be positive, got $width")
    require(stride > 0 && stride <= width,
      s"stride must be in [1, width], got $stride (width $width)")
    val toks = coalesce(TextAnalysis.tokens(col(textCol)),
      array().cast("array<string>"))
    docs.select(col(idCol).as("doc_id"), toks.as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n"), col("t"))
      .filter(col("n") >= 1)
      .select(col("doc_id"), col("n"), col("t"),
        posexplode(sequence(lit(1L), col("n"), lit(stride.toLong)))
          .as(Seq("ci", "start")))
      .filter(col("start") === 1 ||
        col("start") <= col("n") - lit(width.toLong) + lit(stride.toLong))
      .select(col("doc_id"), col("ci").cast("long").as("chunk_idx"),
        col("start").as("tok_start"),
        least(col("start") + lit((width - 1).toLong), col("n")).as("tok_end"),
        concat_ws(" ", slice(col("t"), col("start"), lit(width)))
          .as("chunk_text"))
  }
}
