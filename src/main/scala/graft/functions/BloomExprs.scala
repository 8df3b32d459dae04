package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/**
 * Column wrappers over Spark's internal bloom-filter expressions
 * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
 * behind Catalyst's runtime row-group filtering, not exposed through
 * `functions._`). We reuse them instead of shipping our own sketch:
 * they are codegen'd, partial/final-merge aware aggregates over
 * xxhash64 keys, exactly what a 100 TB "seen before?" prefilter needs.
 */
object BloomExprs {

  /** Aggregate a bloom filter (binary sketch) over `hashed` (a LongType
    * column, conventionally `xxhash64(key)`). */
  def bloom_agg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `hashed` against a driver-held sketch. False
    * negatives impossible; false positives at the sized fpp. */
  def might_contain(bloom: Array[Byte], hashed: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType), ColumnBridge.expression(hashed)))

  /** Optimal bit count for `n` items at false-positive rate `fpp`. */
  def optimalNumBits(n: Long, fpp: Double): Long = {
    require(n > 0 && fpp > 0 && fpp < 1, s"need n>0, 0<fpp<1; got n=$n fpp=$fpp")
    math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }
}
