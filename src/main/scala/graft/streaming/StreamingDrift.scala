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
 * ride into the state function as one broadcast-sized map. Groups
 * absent from the reference emit a null distance (new source — no
 * baseline to drift from) rather than being dropped; the count and
 * running mean still accumulate, so promoting the group into the
 * next reference is a read of the same emission.
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

  /** @return Update-mode stream of (group, n, dist): rows ingested so
    *         far for the group, and the Euclidean distance of its
    *         running mean to `reference(group)` rounded to 4 (null
    *         when the group has no reference entry). */
  def centroidDrift(emb: DataFrame, groupCol: String, vecCol: String,
                    reference: Map[String, Seq[Double]]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val ref = spark.sparkContext.broadcast(reference)
    emb.filter(col(groupCol).isNotNull && col(vecCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(String, Seq[Double])]
      .groupByKey(_._1)
      .mapGroupsWithState[(Array[Double], Long),
                          (String, Long, Option[Double])](
        GroupStateTimeout.NoTimeout) {
        (g: String, rows: Iterator[(String, Seq[Double])],
         state: org.apache.spark.sql.streaming.GroupState[(Array[Double], Long)]) =>
          var (sums, n) = state.getOption.getOrElse((Array.empty[Double], 0L))
          rows.foreach { case (_, v) =>
            if (sums.isEmpty) sums = new Array[Double](v.size)
            var i = 0
            val d = math.min(sums.length, v.size)
            while (i < d) { sums(i) += v(i); i += 1 }
            n += 1
          }
          state.update((sums, n))
          val dist = ref.value.get(g).filter(_ => n > 0).map { rc =>
            var s = 0.0
            var i = 0
            val d = math.min(sums.length, rc.size)
            while (i < d) {
              val diff = sums(i) / n - rc(i)
              s += diff * diff
              i += 1
            }
            BigDecimal(math.sqrt(s))
              .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
          (g, n, dist)
      }
      .toDF(groupCol, "n", "dist")
  }
}
