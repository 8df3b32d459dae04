package graft

import graft.operators.{Audio, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

class AudioSpec extends AnyFunSuite {
  private lazy val spark = GraftTestSession.spark

  test("square WAV round-trips exactly: format, RMS = amplitude, crossings") {
    val wav = Audio.syntheticSquareWav(16000, 1600, 1234)
    assert(Multimodal.sniffFormat(wav) == "wav")
    val d = Audio.decodeWav(wav).get
    assert(d.sampleRate == 16000 && d.channels == 1 && d.bits == 16)
    assert(d.nSamples == 1600L)
    // every |sample| = A ⇒ RMS is exactly A (perfect-square sqrt)
    assert(d.rms == 1234.0)
    // alternating signs ⇒ a crossing at every sample boundary
    assert(d.zeroCrossings == 1599L)
  }

  test("non-WAV and malformed payloads refuse to decode") {
    assert(Audio.decodeWav("RIFFxxxxWAVEnot really audio".getBytes).isEmpty)
    assert(Audio.decodeWav("plain text".getBytes).isEmpty)
    assert(Audio.decodeWav(Array.emptyByteArray).isEmpty)
    // an image is not audio (and vice versa — the router's job)
    assert(Audio.decodeWav(Multimodal.syntheticPng(8, 8, 100)).isEmpty)
    assert(Multimodal.decodeImage(
      Audio.syntheticSquareWav(8000, 160, 100)).isEmpty)
  }

  test("audioMeta: decoded WAVs carry real stats, others are flagged") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Audio.syntheticSquareWav(8000, 800, 500)),
      Multimodal.MediaRow(2L, "opaque mp3 bytes".getBytes)
    ).toDS()
    val metas = Audio.audioMeta(rows).collect().map(m => m.doc_id -> m).toMap
    assert(metas(1L).decoded && metas(1L).rms == 500.0)
    assert(metas(1L).duration_ms == 100.0) // 800 samples at 8 kHz
    assert(!metas(2L).decoded && metas(2L).rms == 0.0)
  }

  test("frameStats fans out per-frame RMS/crossings") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Audio.syntheticSquareWav(16000, 1600, 777)),
      Multimodal.MediaRow(2L, "not audio".getBytes)).toDS()
    val frames = Audio.frameStats(rows, frameSamples = 400).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2), r.getLong(3)))
    assert(frames.length == 4) // non-audio contributes no rows
    assert(frames.forall(_._1 == 1L))
    assert(frames.map(_._2).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(frames.forall(_._3 == 777.0))
    assert(frames.forall(_._4 == 399L))
  }

  test("activeSegments: gated runs, all-active, all-silent, undecodable") {
    import spark.implicits._
    val rows = Seq(
      // runLen 3: active runs [0,3) [6,9) ... [60,63)
      Multimodal.MediaRow(1L, Audio.syntheticGatedWav(11L, 8000, 4, runLen = 3)),
      // no silence anywhere: one segment spanning all 65 frames
      Multimodal.MediaRow(2L, Audio.syntheticEnvelopeWav(5L, 8000, 4)),
      // all-silent payload: a gated wav thresholded above every amp
      Multimodal.MediaRow(3L, Audio.syntheticGatedWav(7L, 8000, 4, runLen = 2)),
      // not audio at all: emits nothing
      Multimodal.MediaRow(4L, Array[Byte](1, 2, 3, 4))
    ).toDS()
    val got = Audio.activeSegments(rows, minRms = 500.0)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1)
    val exp1 = (0 until 11).map(m => (1L, m, 6 * m, math.min(6 * m + 3, 65)))
    assert(got(1L).toSeq.sortBy(_._2) == exp1, s"gated: ${got(1L).toSeq}")
    assert(got(2L).toSeq == Seq((2L, 0, 0, 65)), s"all-active: ${got(2L).toSeq}")
    // threshold above the max segmentAmp (28998): nothing is active
    val silent = Audio.activeSegments(rows.filter(_.doc_id == 3L),
      minRms = 30000.0)
    assert(silent.count() == 0L)
    assert(!got.contains(4L), "undecodable payload emitted segments")
  }
}
