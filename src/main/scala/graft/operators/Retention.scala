package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Tiered-retention downsampling — the storage policy every large
 * time-series lake runs (keep raw fidelity for the recent window,
 * compact older data to coarse rollups): rows with `ts >= cutoffNs`
 * pass through RAW; older rows compact to one row per (keys, bucket)
 * carrying the count / avg / min / max that dashboards still need.
 *
 * Scale shape: the reference's lake layout is `date=/hour=`-partitioned
 * parquet (SURVEY §1.1), so the cutoff predicate is a PARTITION-PRUNING
 * split — each branch's scan reads only its own date folders, the hot
 * branch is map-only pass-through (never shuffled), and the cold branch
 * is one partial/final hash aggregate whose output is smaller than its
 * input by the bucket compaction factor. On a flat unpartitioned file
 * the two branches read the file twice; on the partitioned lake the
 * union reads every row exactly once, which is the deployment target.
 *
 * `v_avg` is rounded to 1e-6 on BOTH tiers (the q41/lmScore
 * cross-engine convention); min/max are exact row values and need no
 * rounding. The rollup average is computed as an EXACT DECIMAL sum
 * cast to double, then divided — a plain double `avg` is
 * summation-order-dependent, and at sf0.1 one bucket's float sum
 * landed a half-ulp either side of a round(x, 6) midpoint in Spark vs
 * DuckDB; the decimal sum is order-independent, so both engines round
 * the identical double.
 */
object Retention {

  def tieredDownsample(events: DataFrame, tsCol: String,
                       keyCols: Seq[String], valCol: String,
                       cutoffNs: Long, bucketNs: Long): DataFrame = {
    require(bucketNs > 0, "bucketNs must be positive")
    val keys = keyCols.map(col)
    val ts = col(tsCol)
    val raw = events.filter(ts >= cutoffNs)
      .select(keys ++ Seq(
        ts.as("bucket_ns"), lit(1L).as("n_rows"),
        round(col(valCol).cast("double"), 6).as("v_avg"),
        col(valCol).cast("double").as("v_min"),
        col(valCol).cast("double").as("v_max"),
        lit("raw").as("tier")): _*)
    val rolled = events.filter(ts < cutoffNs)
      .groupBy(keys :+ (ts - pmod(ts, lit(bucketNs))).as("bucket_ns"): _*)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valCol).cast("decimal(27,9)")).as("__vsum"),
        min(col(valCol)).cast("double").as("v_min"),
        max(col(valCol)).cast("double").as("v_max"))
      .select(keys ++ Seq(col("bucket_ns"), col("n_rows"),
        round(col("__vsum").cast("double") / col("n_rows"), 6).as("v_avg"),
        col("v_min"), col("v_max"), lit("rollup").as("tier")): _*)
    raw.unionByName(rolled)
  }
}
