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
    val df = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("ts").as("time"), col("event_type"), col("value"))
      .orderBy(col("time")).limit(10)
    val bos = new java.io.ByteArrayOutputStream()
    ArrowEncoder.writeStream(df, bos)
    val alloc = new RootAllocator()
    val reader = new ArrowStreamReader(
      new java.io.ByteArrayInputStream(bos.toByteArray), alloc)
    try {
      assert(reader.loadNextBatch())
      val root = reader.getVectorSchemaRoot
      val tv = root.getVector("time").asInstanceOf[
        org.apache.arrow.vector.TimeStampNanoTZVector]
      // sub-µs digits survive (the reference's whole reason for ns)
      assert((0 until root.getRowCount).exists(i => tv.get(i) % 1000 != 0))
    } finally { reader.close(); alloc.close() }
  }
}
