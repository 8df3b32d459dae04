package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupStateTimeout

/**
 * Streaming embedding-drift monitor —
 * [[graft.operators.Similarity.centroidDriftMatrix]]'s linear-MMD
 * statistic lifted onto Structured Streaming: each group's state
 * holds its RUNNING (sum-vector, count), so at every point in time
 * the emitted distance is `‖mean_ingested(g) − reference(g)‖` over
 * everything the stream has delivered for that group — the "did
 * source X drift away from its reference distribution" alarm,
 * evaluated at ingest with no corpus ever retained.
 *
 * The reference centroids come from a batch profile (e.g.
 * `centroidDriftMatrix`'s input corpus, or last month's lake) and
 * ride into the state function inside the task closure. Groups
 * absent from the reference emit a null distance (new source — no
 * baseline to drift from) rather than being dropped; the count and
 * running mean still accumulate AND are emitted, so
 * [[promoteReference]] folds them into the next reference from the
 * consumer's latest-per-group snapshot — no second pass over the
 * ingested data.
 *
 * Scale shape: state is dim doubles + one long PER GROUP
 * (sources/labels/shards — the same cardinality contract as the
 * batch matrix); the stateful exchange moves one (group, vector) row
 * per input row, and the per-batch fold is a vector add. Sums are
 * exact under any arrival order for the integer-valued vectors the
 * hashing-trick embeddings produce, and associative-to-ulps
 * otherwise — the same float envelope as the batch VectorMean.
 *
 * At-least-once caveat: a replayed micro-batch re-adds its vectors
 * (sum and count both inflate — the MEAN is far less sensitive than
 * a raw sum, but not replay-proof); run with exactly-once sinks, the
 * [[StreamingHeavyHitters]] convention.
 */
object StreamingDrift {

  /** @return Update-mode stream of (group, n, n_bad, dist, mean):
    *         usable rows ingested so far for the group, rows REJECTED
    *         for the group (empty vectors, or a dimension that
    *         contradicts the group's first-seen dimension — the
    *         schema-drift signal), the Euclidean distance of the
    *         running mean to `reference(group)` rounded to 4, and the
    *         running mean itself (null until a usable row arrives —
    *         the [[promoteReference]] input). `dist` is null when the
    *         group has no reference entry, has no usable rows yet, or
    *         its dimension does not match the reference's — a
    *         dimension mismatch must read as "no comparable signal",
    *         never as a silently truncated distance (a monitor that
    *         reports 0.0 drift on a schema change is worse than
    *         none). */
  def centroidDrift(emb: DataFrame, groupCol: String, vecCol: String,
                    reference: Map[String, Seq[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // the reference is groups × dim doubles — task-closure-sized; a
    // SparkContext broadcast here would leak (no handle to unpersist
    // across query restarts), so it rides the serialized closure
    val ref = reference
    emb.filter(col(groupCol).isNotNull && col(vecCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(String, Seq[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState[(Array[Double], Long, Long),
                          (String, Long, Long, Option[Double], Option[Seq[Double]])](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Seq[Double])],
         state: org.apache.spark.sql.streaming.GroupState[(Array[Double], Long, Long)]) =>
          var (sums, n, bad) =
            state.getOption.getOrElse((Array.empty[Double], 0L, 0L))
          // the group's AUTHORITATIVE dimension: the reference's when
          // it has one (a junk first arrival must not hijack the
          // group), else first-seen
          val refDim = ref.get(g).map(_.size)
          rows.foreach { case (_, v) =>
            if (v.isEmpty || refDim.exists(_ != v.size)) bad += 1
            else {
              if (sums.isEmpty) sums = new Array[Double](v.size)
              if (v.size != sums.length) bad += 1 // dimension drifted
              else {
                var i = 0
                while (i < sums.length) { sums(i) += v(i); i += 1 }
                n += 1
              }
            }
          }
          state.update((sums, n, bad))
          val dist = ref.get(g)
            .filter(rc => n > 0 && rc.size == sums.length)
            .map { rc =>
              var s = 0.0
              var i = 0
              while (i < sums.length) {
                val diff = sums(i) / n - rc(i)
                s += diff * diff
                i += 1
              }
              BigDecimal(math.sqrt(s))
                .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
            }
          val mean =
            if (n > 0) Some(sums.map(_ / n).toSeq) else None
          (g, n, bad, dist, mean)
      }
      .toDF(groupCol, "n", "n_bad", "dist", "mean")
  }

  /** Fold the monitor's accumulated no-baseline groups into the NEXT
    * reference — the promotion the [[centroidDrift]] scaladoc
    * promises: `snapshot` is the consumer's latest-per-group view of
    * the update-mode output (e.g. a foreachBatch upsert sink — update
    * mode re-emits a group on every touch, so the last row per group
    * is current; group cardinality is metadata-sized by the monitor's
    * own state contract), and every group ABSENT from `reference`
    * with at least `minCount` usable rows joins the returned map with
    * its running mean as centroid. Groups already in the reference
    * keep their existing entry untouched: refreshing a live baseline
    * is a re-profiling decision (run the batch profile), not a side
    * effect of promotion — a reference that chases the stream would
    * read zero drift forever. */
  def promoteReference(snapshot: DataFrame,
                       reference: Map[String, Seq[Double]],
                       minCount: Long = 1L): Map[String, Seq[Double]] = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    val cols = snapshot.columns
    require(cols.length >= 5,
      "promoteReference expects the centroidDrift output shape " +
        s"(group, n, n_bad, dist, mean); got ${cols.mkString(", ")}")
    val rows = snapshot.select(col(cols(0)).cast("string"), col("n"),
      col("mean")).collect()
    val dup = rows.groupBy(_.getString(0)).collect {
      case (g, rs) if rs.length > 1 => g
    }
    require(dup.isEmpty,
      s"snapshot holds ${dup.size} duplicated group(s) (${dup.take(3).mkString(", ")}" +
        ") — pass the LATEST emission per group, not the raw update stream")
    reference ++ rows.collect {
      case r if !reference.contains(r.getString(0)) && !r.isNullAt(2) &&
          r.getLong(1) >= minCount =>
        r.getString(0) -> r.getSeq[Double](2).toSeq
    }
  }
}
