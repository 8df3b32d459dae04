package graft

import graft.encoders.ArrowEncoder
import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.ipc.ArrowStreamReader
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ArrowEncoderSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark
  import spark.implicits._

  test("round-trip: schema contract + values (A3 cases)") {
    val df = Seq(
      (1704067200000000000L, 42L, 1.5, true, "hello"),
      (1704067201000000123L, 7L, -2.25, false, "world"))
      .toDF("time", "count", "value", "active", "message")
      .withColumn("maybe_null", when(col("count") === 7, col("message")))
    val bos = new java.io.ByteArrayOutputStream()
    ArrowEncoder.writeStream(df, bos)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(bos.toByteArray), alloc)
    try {
      val schema = reader.getVectorSchemaRoot.getSchema
      val names = schema.getFields.toArray.map(_.toString)
      // time first, rest alphabetical (flightsql.go:313-324)
      assert(schema.getFields.get(0).getName == "time")
      assert(schema.getFields.toArray.map(_.asInstanceOf[
        org.apache.arrow.vector.types.pojo.Field].getName).drop(1).toSeq ==
        Seq("active", "count", "maybe_null", "message", "value"))
      // time column forced to Timestamp(ns, UTC) (flightsql.go:430-432)
      assert(schema.getFields.get(0).getType.toString.contains("NANOSECOND"))
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      assert(root.getRowCount == 2)
      val tv = root.getVector("time").asInstanceOf[
        org.apache.arrow.vector.TimeStampNanoTZVector]
      assert(tv.get(0) == 1704067200000000000L)
      assert(tv.get(1) == 1704067201000000123L) // full ns fidelity
      val cv = root.getVector("count").asInstanceOf[org.apache.arrow.vector.BigIntVector]
      assert(cv.get(1) == 7L)
      val nv = root.getVector("maybe_null")
      assert(nv.isNull(0) && !nv.isNull(1))
    } finally { reader.close(); alloc.close() }
  }

  test("query result through arrow: events time-first with ns values") {
    // end-to-end from the real lake: the Arrow `time` vector must carry
    // the exact int64-ns values the engine computed, whatever physical
    // timestamp annotation the lake currently ships (sub-µs FIDELITY of
    // the encoder itself is pinned by the in-memory A3 test above —
    // the testdata's own resolution is not under our control).
    val batch = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts").as("time"), col("event_type"), col("value"))
      .orderBy(col("time"), col("event_type"), col("value")).limit(10)
    val expected = batch.collect().map(_.getLong(0)).toSeq
    val bos = new java.io.ByteArrayOutputStream()
    ArrowEncoder.writeStream(batch, bos)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(bos.toByteArray), alloc)
    try {
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      val tv = root.getVector("time").asInstanceOf[
        org.apache.arrow.vector.TimeStampNanoTZVector]
      assert(root.getRowCount == expected.size)
      assert((0 until root.getRowCount).map(tv.get) == expected)
    } finally { reader.close(); alloc.close() }
  }
}
