package graft

import graft.operators.Multimodal
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("format sniffing from magic bytes") {
    assert(Multimodal.sniffFormat(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte, 13, 10)) == "png")
    assert(Multimodal.sniffFormat(
      Array(0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte)) == "jpeg")
    assert(Multimodal.sniffFormat("GIF89a".getBytes) == "gif")
    assert(Multimodal.sniffFormat(
      "RIFF....WEBPVP8 ".getBytes) == "webp")
    assert(Multimodal.sniffFormat("RIFF....WAVE".getBytes) == "wav")
    assert(Multimodal.sniffFormat("....ftypisom".getBytes) == "mp4")
    assert(Multimodal.sniffFormat("ID3....".getBytes) == "mp3")
    assert(Multimodal.sniffFormat("plain text".getBytes) == "unknown")
    assert(Multimodal.sniffFormat(Array.emptyByteArray) == "unknown")
  }

  test("extractMeta pipeline: schema, determinism, partition batching") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val meta = Multimodal.documentsAsMedia(spark, docs)
    val rows = meta.collect()
    assert(rows.length == docs.count())
    assert(rows.forall(_.format == "unknown")) // text payloads
    assert(rows.forall(r => r.width >= 64 && r.height >= 64 && r.n_frames >= 1))
    // deterministic across runs
    val again = Multimodal.documentsAsMedia(spark, docs).collect()
    assert(rows.sortBy(_.doc_id).toSeq == again.sortBy(_.doc_id).toSeq)
  }

  private lazy val media = {
    import spark.implicits._
    Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.encode(
          org.apache.spark.sql.functions.col("text"), "UTF-8").as("payload"))
      .as[Multimodal.MediaRow]
  }

  test("frame sampling fans out every Nth frame with bounded slices") {
    val metaFrames = Multimodal.extractMeta(media).collect()
      .map(m => m.doc_id -> m.n_frames).toMap
    val frames = Multimodal.sampleFrames(media, everyN = 4).collect()
    val perDoc = frames.groupBy(_.doc_id)
    assert(perDoc.keySet == metaFrames.keySet)
    perDoc.foreach { case (id, fs) =>
      val expect = (0 until metaFrames(id) by 4).toSeq
      assert(fs.map(_.frame_idx).sorted.toSeq == expect, s"doc $id")
    }
  }

  test("resize shrinks payloads by the scale divisor") {
    val sizes = media.collect().map(r => r.doc_id -> r.payload.length).toMap
    Multimodal.resizeStub(media, scaleDiv = 4).collect().foreach { r =>
      assert(r.payload.length == (sizes(r.doc_id) + 3) / 4)
    }
  }

  test("media features feed the similarity family directly") {
    val feats = Multimodal.featureStub(media, dim = 64)
    // unit-norm vectors
    val norms = feats.select(org.apache.spark.sql.functions.sqrt(
        graft.operators.Similarity.dot(
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("embedding"))))
      .collect().map(_.getDouble(0))
    assert(norms.forall(n => math.abs(n - 1.0) < 1e-5))
    val top = graft.operators.Similarity.bruteForceTopK(
      feats, "doc_id", "embedding", queryId = 0L, k = 5)
    assert(top.count() == 5)
  }
}
