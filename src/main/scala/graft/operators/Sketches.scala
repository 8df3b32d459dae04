package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Engine-replayable distinct-count sketches. Spark's own
 * `approx_count_distinct` (q09) is correct but its HLL++ register
 * layout is engine-internal — a byte-hash oracle cannot replay it,
 * so q09 is a rows-only gate pin. [[hllExact]] is the FULL-oracle
 * twin (the q72→qE0 move crossed onto sketches): a classic
 * HyperLogLog (Flajolet et al. 2007) whose every decision is
 * deterministic and SQL-expressible — md5-driven register draws
 * (the [[Sampling.rankKey]] convention: any engine replays the
 * sketch from (value, salt) alone), integer register maxima, an
 * EXACT-long harmonic numerator, and one IEEE division at the end —
 * so DuckDB rebuilds the identical sketch from the same parquet.
 *
 * Draw contract, per non-null value v (duplicates hash identically —
 * that is the point of a distinct sketch):
 *   hex = md5(cast(v as string) || ' ' || salt)
 *   j   = first p/4 hex chars as an integer — the register index
 *         (p ∈ {4, 8, 12, 16} keeps the index hex-char-aligned: a
 *         non-power-of-16 slice would need bit surgery both engines
 *         must mirror; 2^p registers, se ≈ 1.04/√(2^p))
 *   w   = next 10 hex chars — the 40-bit rank draw
 *   ρ   = position of w's highest set bit from the TOP of the 40-bit
 *         window, 1-based: 41 − bitlength(w); w = 0 ⇒ ρ = 41.
 *         Computed STRING-WISE (strip leading '0' hex chars, then a
 *         4-way CASE on the first surviving char) because bitlength
 *         itself has no engine-portable exact form — this one is
 *         pure string algebra, identical everywhere.
 *
 * Estimate contract: register maxima M_j are exact ints; the
 * harmonic sum Σ 2^(−M_j) is scaled by 2⁴¹ into the EXACT long
 * S41 = Σ_hit 2^(41−M_j) + V·2⁴¹ (V = empty registers; max m·2⁴¹ =
 * 2⁵⁷ at p = 16 — long-safe); E_raw = α_m·m²·2⁴¹ / S41 is ONE
 * correctly-rounded IEEE division of a driver literal by an exact
 * long. Small-range correction (E_raw ≤ 2.5m AND V > 0) uses linear
 * counting m·ln(m/V) with the ln QUANTIZED to the 1e-9 grid (the
 * qDP/qEA libm convention) so the branch value is grid-stable; no
 * large-range correction — that corrects 32-bit hash collisions and
 * the 40-bit rank window makes it irrelevant below ~10¹⁰ distinct.
 *
 * Scale shape: one scan → codegen'd string kernel (md5 + slicing) →
 * partial/final hash aggregate to ≤ m rows per group per partition
 * (the shuffle carries REGISTERS, never values) → a second m-bounded
 * aggregate to one row per group. Registers max-merge, so the sketch
 * is embarrassingly mergeable — the property the streaming twin
 * ([[graft.streaming.StreamingHll]]) inherits: max is idempotent and
 * commutative, so even at-least-once redelivery cannot skew it.
 */
object Sketches {

  /** α_m · m² · 2⁴¹ as ONE driver double literal (standard HLL bias
    * constants; the m ≥ 128 closed form above 64). Embedded verbatim
    * in both plans — shortest-roundtrip decimal parses back to the
    * identical double in any engine. */
  private[graft] def alphaM2(m: Int): Double = {
    val alpha =
      if (m == 16) 0.673
      else if (m == 32) 0.697
      else if (m == 64) 0.709
      else 0.7213 / (1.0 + 1.079 / m)
    alpha * m.toDouble * m.toDouble * 2199023255552.0 // 2^41
  }

  /** (__g, __v) → (__g, __j, __rho) — the shared draw kernel (batch
    * and streaming twin run the SAME columns). ONE fused codegen'd
    * digest per row ([[graft.functions.HashExprs.hllJRhoPacked]] —
    * bit-equality with the hex-string chain pinned in HashExprsSpec;
    * the oracles keep replaying the hex spelling), STAGED through an
    * explicit packed projection so the digest evaluates ONCE for both
    * consumers: CollapseProject deliberately refuses to re-inline a
    * non-cheap alias referenced more than once, so the staging
    * survives optimization (the r19 staging lesson — inlined, the
    * draw re-evaluated per consumer and priced the register pass
    * ~4×). */
  private[graft] def drawFrame(gv: DataFrame, p: Int,
                               salt: String): DataFrame =
    gv.select(col("__g"),
        graft.functions.HashExprs.hll_jrho_packed(
          Sampling.rankInput(Seq(col("__v")), salt), p).as("__pk"))
      .select(col("__g"),
        shiftright(col("__pk"), 6).as("__j"),
        col("__pk").bitwiseAND(lit(63L)).cast("int").as("__rho"))

  /** The defining sub-dag over (n_hit, __sp): (v_empty, s41,
    * est_raw, small-range?) — ONE definition so the threshold and
    * the S41 formula cannot desynchronize between consumers. */
  private def estParts(m: Int): (Column, Column, Column, Column) = {
    val vEmpty = lit(m.toLong) - col("n_hit")
    val s41 = col("__sp") + vEmpty * lit(2199023255552L)
    val estRaw = lit(alphaM2(m)) / s41.cast("double")
    val small = estRaw <= lit(2.5 * m) && vEmpty > 0
    (vEmpty, s41, estRaw, small)
  }

  /** The final estimate over (n_hit, __sp) — raw-vs-linear-counting
    * branch, GateRounded 6. The single dag every consumer replays. */
  private[graft] def estimateCol(m: Int): Column = {
    val (vEmpty, _, estRaw, small) = estParts(m)
    val qln = floor(log(lit(m.toDouble) / vEmpty.cast("double")) *
      lit(1e9) + lit(0.5)).cast("long")
    val lc = (lit(m.toLong) * qln).cast("double") / lit(1e9)
    graft.functions.GateRound(when(small, lc).otherwise(estRaw), 6)
  }

  /** The estimate columns over (n_hit, __sp) — shared by the batch
    * aggregate and the streaming twin's post-state select so both
    * run the IDENTICAL float dag (one division each, GateRounded). */
  private[graft] def estimateCols(m: Int): Seq[Column] = {
    val (vEmpty, s41, estRaw, small) = estParts(m)
    Seq(lit(m.toLong).as("m_registers"), col("n_hit"),
      vEmpty.as("v_empty"), s41.as("s41"),
      graft.functions.GateRound(estRaw, 6).as("est_raw"),
      estimateCol(m).as("estimate"),
      small.as("small_range"))
  }

  /** The sparse register table (__g, __j, __mj) — [[hllExact]]'s
    * first aggregate, exposed because registers are the MERGEABLE
    * artifact: max over any union of register sets IS the sketch of
    * the unioned values. */
  private[graft] def registers(df: DataFrame, byCol: String,
                               valueCol: String, p: Int,
                               salt: String): DataFrame =
    drawFrame(df.filter(col(byCol).isNotNull && col(valueCol).isNotNull)
        .select(col(byCol).as("__g"), col(valueCol).as("__v")), p, salt)
      .groupBy(col("__g"), col("__j"))
      .agg(max(col("__rho")).as("__mj"))

  /**
   * Per-group HyperLogLog distinct estimate with a FULL hash-oracle
   * contract (see object doc). Null groups and null values are
   * dropped (COUNT DISTINCT semantics).
   *
   * @param p register index bits — 2^p registers; must be in
   *          {4, 8, 12, 16} (hex-char-aligned slices)
   * @return one row per group: (byCol, m_registers, n_hit, v_empty,
   *         s41 — the exact harmonic numerator, est_raw, estimate —
   *         GateRounded 6, small_range)
   */
  def hllExact(df: DataFrame, byCol: String, valueCol: String,
               p: Int = 12, salt: String = "s0"): DataFrame = {
    require(Set(4, 8, 12, 16).contains(p),
      s"p must be one of 4, 8, 12, 16 (hex-char-aligned registers), got $p")
    val m = 1 << p
    registers(df, byCol, valueCol, p, salt)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, 41 - __mj)")).as("__sp"))
      .select(col("__g").as(byCol) +: estimateCols(m): _*)
  }

  /**
   * Cross-group distinct-overlap matrix from MERGED HLL registers —
   * the dedup-planning question ("how much vocabulary do crawl A and
   * crawl B share?") answered WITHOUT ever joining values: for each
   * unordered group pair (a < b), the union sketch is the register-
   * wise max of the two register sets (merge-of-sketches ≡ sketch-
   * of-the-unioned-values — pinned algebraically in HllSpec), the
   * intersection is inclusion–exclusion est_a + est_b − est_union
   * (can go slightly negative on near-disjoint pairs — reported raw,
   * clamped only inside the Jaccard ratio), and every float step is
   * the one shared [[estimateCol]] dag plus two more deterministic
   * IEEE ops — fully hash-oracle-able.
   *
   * Accuracy note: inclusion–exclusion inherits BOTH sketches'
   * errors, so small intersections need a fine sketch — default
   * p = 16 (65536 registers; the deep linear-counting regime for
   * vocabularies ≪ m, where the estimate is near-exact).
   *
   * Scale shape: ONE corpus scan builds the sparse register table
   * (localCheckpointed — three consumers); everything after is
   * register-table algebra. The union sketch is NEVER materialized
   * per pair: (n_hit, s41) of a pair union derive by exact long
   * inclusion–exclusion from the per-source aggregates plus the
   * intersection correction terms, which one register self-join on
   * __j produces — the table shuffles once keyed by register index
   * instead of each group's registers replaying into S−1 pairs
   * (S = number of groups — a catalog DIMENSION, so S² pairs is
   * bounded; refuse upstream if a high-cardinality key is passed by
   * mistake: > 64 groups throws).
   *
   * @return one row per pair, a < b: (byCol_a, byCol_b, est_a,
   *         est_b, est_union, est_intersect, jaccard_est — all
   *         GateRounded 6)
   */
  def hllOverlap(df: DataFrame, byCol: String, valueCol: String,
                 p: Int = 16, salt: String = "s0",
                 maxGroups: Int = 64): DataFrame = {
    require(Set(4, 8, 12, 16).contains(p),
      s"p must be one of 4, 8, 12, 16 (hex-char-aligned registers), got $p")
    val m = 1 << p
    val reg = registers(df, byCol, valueCol, p, salt)
      .localCheckpoint(true)
    // ONE distinct job serves both the quadratic guard and the pair
    // matrix (the checkpointed frame is group-count-sized)
    val gs = reg.select(col("__g")).distinct().localCheckpoint(true)
    val nGroups = gs.count()
    require(nGroups <= maxGroups,
      s"hllOverlap: $nGroups groups exceed maxGroups=$maxGroups — the " +
        "pair matrix is quadratic; this operator is for catalog " +
        "dimensions (sources, days), not high-cardinality keys")
    // Per-source sketch, keeping the RAW integer aggregates: the pair
    // union's (n_hit, __sp) derive from them by exact inclusion–
    // exclusion below, so the per-pair register expansion (each
    // group's registers replayed into S−1 pairs, then a (pair, j)
    // shuffle of (S−1)·|reg| rows) is gone entirely (guide §2 — the
    // r19 verdict's qED ask). All terms are exact longs, so the
    // derived (n_hit, __sp) — and hence every float downstream — are
    // bit-identical to the expanded spelling (pinned in HllSpec).
    val perSrc = reg.groupBy(col("__g"))
      .agg(count(lit(1)).as("n_hit"),
        sum(expr("shiftleft(1L, 41 - __mj)")).as("__sp"))
      .select(col("__g"), col("n_hit").as("__n"), col("__sp").as("__s"),
        estimateCol(m).as("__est"))
    val pairs = gs.select(col("__g").as("__ga"))
      .crossJoin(gs.select(col("__g").as("__gb")))
      .filter(col("__ga") < col("__gb"))
    // Intersection correction terms via ONE register self-join on __j:
    // for j hit by both groups the union register is max(mj_a, mj_b),
    // while s_a + s_b counted 2^(41−mj_a) + 2^(41−mj_b) — an exact
    // overcount of 2^(41−min(mj_a, mj_b)); n_a + n_b overcounts the
    // shared register by exactly 1. Groups sharing no register simply
    // don't appear (coalesce 0 below). The join shuffles |reg| rows
    // once, keyed by register index, instead of (S−1)·|reg|.
    val inter = reg.as("x").join(reg.as("y"),
        col("x.__j") === col("y.__j") && col("x.__g") < col("y.__g"))
      .select(col("x.__g").as("__ga"), col("y.__g").as("__gb"),
        least(col("x.__mj"), col("y.__mj")).as("__mn"))
      .groupBy(col("__ga"), col("__gb"))
      .agg(count(lit(1)).as("__ci"),
        sum(expr("shiftleft(1L, 41 - __mn)")).as("__si"))
    val uni = pairs
      .join(perSrc.select(col("__g").as("__ga"), col("__n").as("__na"),
        col("__s").as("__sa"), col("__est").as("__esta")), Seq("__ga"))
      .join(perSrc.select(col("__g").as("__gb"), col("__n").as("__nb"),
        col("__s").as("__sb"), col("__est").as("__estb")), Seq("__gb"))
      .join(inter, Seq("__ga", "__gb"), "left")
      .select(col("__ga"), col("__gb"), col("__esta"), col("__estb"),
        (col("__na") + col("__nb") - coalesce(col("__ci"), lit(0L)))
          .as("n_hit"),
        (col("__sa") + col("__sb") - coalesce(col("__si"), lit(0L)))
          .as("__sp"))
      .select(col("__ga"), col("__gb"), col("__esta"), col("__estb"),
        estimateCol(m).as("__estu"))
    val inter2 = col("__esta") + col("__estb") - col("__estu")
    uni
      .select(col("__ga").as(s"${byCol}_a"),
        col("__gb").as(s"${byCol}_b"),
        col("__esta").as("est_a"), col("__estb").as("est_b"),
        col("__estu").as("est_union"),
        graft.functions.GateRound(inter2, 6).as("est_intersect"),
        graft.functions.GateRound(
          greatest(inter2, lit(0.0)) / col("__estu"), 6).as("jaccard_est"))
  }

  /**
   * HDR-histogram quantile sketch (the log-bucketed deterministic
   * percentile tool of latency engineering) — q87's scale-path twin
   * the way [[hllExact]] is q09's: Spark's `approx_percentile` (KLL)
   * is randomized-compaction engine-internal, so q87 is a rows-only
   * pin; THIS sketch is 100% integer, so the whole answer is hash-
   * oracle-able and NO float exists anywhere in the operator.
   *
   * Bucket contract (HDR shape, `subBits` = k mantissa bits, 2^k
   * sub-buckets per octave → relative error ≤ 2⁻ᵏ): a non-negative
   * long v maps to
   *   id = v                                   when v < 2^k (exact)
   *   id = (e−k+1)·2^k + (v >> (e−k)) − 2^k    otherwise,
   * with e = bitlength(v) − 1 = length(bin(v)) − 1 — bin() emits the
   * identical minimal binary string in Spark and DuckDB (probed), so
   * the bucket function replays anywhere. ids are monotone in v; a
   * bucket's representative is its exact-integer LOWER bound
   * (id < 2^k ⇒ id; else (2^k + id mod 2^k) << (id div 2^k − 1)), so
   * the reported quantile q̂ satisfies q̂ ≤ x₍ᵣ₎ < q̂·(1 + 2⁻ᵏ) —
   * the one-sided bound is the documented semantics. Negative values
   * are REFUSED loudly (the HDR domain is durations/sizes/counts;
   * silently bucketing them would corrupt the order).
   *
   * Rank contract: for permille p over n rows, rank = ⌈n·p/1000⌉ via
   * integer arithmetic ((n·p + 999) div 1000), and the answer is the
   * first bucket whose cumulative count reaches it — min(rep) over
   * cum ≥ rank, a pure integer argmin.
   *
   * Scale shape: one scan → codegen'd bucket kernel → partial/final
   * hash aggregate to ≤ (64−k+1)·2^k bucket rows per group per
   * partition (≈ 1.9k at k = 5 — the shuffle carries BUCKETS, never
   * values) → per-group windows over the bucket-bounded frame.
   * Bucket counts ADD, so sketches merge across shards/days by
   * summation — the mergeability KLL promises, without its RNG.
   *
   * @param permilles requested quantiles ×1000 (e.g. 500, 900, 990,
   *                  999), each in [1, 1000]
   * @return one row per (group, permille): (byCol, permille, n, est)
   *         — est the exact-long bucket lower bound
   */
  private[graft] def validateHdr(permilles: Seq[Int], subBits: Int): Unit = {
    require(subBits >= 1 && subBits <= 16,
      s"subBits must be in [1, 16], got $subBits")
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000)
        && permilles.distinct.size == permilles.size,
      s"permilles must be distinct values in [1, 1000], got $permilles")
  }

  /** Adds the HDR bucket id of `__v` as `__id` (negative values
    * refused loudly), preserving the frame's other columns — the
    * shared kernel behind [[hdrQuantiles]] and the streaming twin. */
  private[graft] def withBucketId(df: DataFrame, subBits: Int): DataFrame = {
    val m = 1 << subBits
    val v = col("__v").cast("long")
    val guarded = when(v >= 0, v).otherwise(raise_error(concat(
      lit("hdrQuantiles: negative value breaks the log-bucket domain " +
        "(durations/sizes/counts): "), v.cast("string"))))
    df.withColumn("__vg", guarded)
      .withColumn("__e", (length(bin(col("__vg"))) - lit(1)).cast("int"))
      .withColumn("__id", when(col("__vg") < m, col("__vg"))
        .otherwise((col("__e") - lit(subBits) + lit(1)).cast("long") *
          lit(m.toLong) +
          expr(s"shiftright(__vg, __e - $subBits)") - lit(m.toLong)))
      .drop("__vg", "__e", "__v")
  }

  /** A bucket id's exact-long representative (its lower bound) — the
    * per-row column form; [[bucketRep]] is the same formula in Scala
    * for the streaming twin's state walk. */
  private[graft] def repCol(subBits: Int): Column = {
    val m = 1 << subBits
    when(col("__id") < m, col("__id"))
      .otherwise(expr(
        s"shiftleft(cast($m + (__id % $m) as bigint), " +
          s"cast(__id div $m as int) - 1)"))
  }

  /** [[repCol]] in driver/executor Scala (the streaming twin and the
    * spec replica share it): id < 2^k ⇒ id, else
    * (2^k + id mod 2^k) << (id div 2^k − 1). */
  private[graft] def bucketRep(id: Long, subBits: Int): Long = {
    val m = 1L << subBits
    if (id < m) id else (m + (id % m)) << ((id / m).toInt - 1)
  }

  def hdrQuantiles(df: DataFrame, byCol: String, valueCol: String,
                   permilles: Seq[Int], subBits: Int = 5): DataFrame = {
    validateHdr(permilles, subBits)
    import org.apache.spark.sql.expressions.Window
    val ids = withBucketId(
      df.filter(col(byCol).isNotNull && col(valueCol).isNotNull)
        .select(col(byCol).as("__g"), col(valueCol).as("__v")), subBits)
    val rep = repCol(subBits)
    val counts = ids.groupBy(col("__g"), col("__id"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__cum",
        sum(col("__cnt")).over(Window.partitionBy(col("__g"))
          .orderBy(col("__id"))))
      .withColumn("__n",
        sum(col("__cnt")).over(Window.partitionBy(col("__g"))))
      .withColumn("__rep", rep.cast("long"))
    counts
      .withColumn("__p", explode(typedLit(permilles)))
      .filter(col("__cum") >=
        expr("(__n * __p + 999) div 1000"))
      .groupBy(col("__g"), col("__p"))
      .agg(max(col("__n")).as("n"), min(col("__rep")).as("est"))
      .select(col("__g").as(byCol), col("__p").as("permille"),
        col("n"), col("est"))
  }
}
