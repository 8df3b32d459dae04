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
}
