package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * REAL audio kernel for WAV payloads via the JDK's
 * `javax.sound.sampled.AudioSystem` — like the image kernel's
 * ImageIO, it ships with the JDK, so PCM WAV decode needs zero
 * external jars. Only compressed audio (mp3/aac) remains stubbed in
 * [[Multimodal]].
 *
 * Decode yields format ground truth (sample rate, channels, bit
 * depth, frame count) plus two signal statistics computed from the
 * actual PCM samples — RMS level and zero-crossing count — the
 * standard first-pass features of an audio curation pipeline
 * (silence/clipping detection, voice-activity heuristics).
 *
 * Scale shape: mapPartitions over [[Multimodal.MediaRow]], same
 * batching contract as the image stages; payloads stream through one
 * task each, statistics are one pass over the samples.
 */
object Audio {

  case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
                       bits: Int, n_samples: Long, duration_ms: Double,
                       rms: Double, zero_crossings: Long, decoded: Boolean)

  case class DecodedWav(sampleRate: Int, channels: Int, bits: Int,
                        nSamples: Long, nFrames: Long,
                        rms: Double, zeroCrossings: Long)

  /** Payloads over this sample count are refused (same
    * decompression-bomb reasoning as [[Multimodal]]'s image guard —
    * a WAV header can declare an arbitrary data length). ~100 MB of
    * 16-bit mono. */
  private val MaxSamples = 50L * 1000 * 1000

  /** Real WAV decode: header via AudioSystem, then one pass over the
    * PCM frames for RMS + zero crossings. None for payloads the JDK
    * cannot parse (not a WAV, malformed header, compressed encoding,
    * over the sample guard) — they stay on the deterministic stub
    * path. Supports the canonical 16-bit signed little-endian PCM
    * (mono or interleaved stereo; statistics over all interleaved
    * samples). */
  def decodeWav(payload: Array[Byte]): Option[DecodedWav] = {
    if (payload.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val enc = f.getEncoding
        val nFrames = in.getFrameLength
        val nSamples = nFrames * f.getChannels
        if (enc != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || f.isBigEndian ||
            nFrames <= 0 || nSamples > MaxSamples) None
        else {
          val bytes = in.readAllBytes()
          var sumSq = 0.0
          var crossings = 0L
          var prevSign = 0
          var i = 0
          val n = bytes.length / 2
          while (i < n) {
            val s = ((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xFF)).toShort.toInt
            sumSq += s.toDouble * s
            val sign = java.lang.Integer.signum(s)
            if (sign != 0) {
              if (prevSign != 0 && sign != prevSign) crossings += 1
              prevSign = sign
            }
            i += 1
          }
          Some(DecodedWav(f.getSampleRate.toInt, f.getChannels, 16,
            n.toLong, n.toLong / f.getChannels,
            math.sqrt(sumSq / n), crossings))
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Deterministic 16-bit mono PCM WAV: a square wave alternating
    * `+amplitude`/`-amplitude` every sample — every |sample| equals
    * `amplitude`, so the decoded RMS is EXACTLY `amplitude` (n·A² and
    * A² are exactly representable, IEEE division and sqrt of a
    * perfect square are exact) and zero crossings are exactly
    * `nSamples - 1`: full oracle arithmetic for a real decode. */
  def syntheticSquareWav(sampleRate: Int, nSamples: Int,
                         amplitude: Int): Array[Byte] = {
    require(sampleRate > 0 && nSamples > 0)
    require(amplitude > 0 && amplitude <= Short.MaxValue)
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes); buf.putInt(36 + dataLen); buf.put("WAVE".getBytes)
    buf.put("fmt ".getBytes); buf.putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(1) // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits
    buf.put("data".getBytes); buf.putInt(dataLen)
    var j = 0
    while (j < nSamples) {
      buf.putShort((if (j % 2 == 0) amplitude else -amplitude).toShort)
      j += 1
    }
    buf.array()
  }

  /** Dataset stage: real WAV metadata + signal stats per payload;
    * undecodable payloads come through with `decoded = false` and
    * zeroed fields (the pipeline keeps moving, callers filter). */
  def audioMeta(media: Dataset[Multimodal.MediaRow]): Dataset[AudioMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeWav(r.payload) match {
          case Some(d) =>
            // duration is frames / rate — nSamples counts interleaved
            // samples, which for stereo is 2× the playback length
            AudioMeta(r.doc_id, d.sampleRate, d.channels, d.bits,
              d.nSamples, d.nFrames * 1000.0 / d.sampleRate,
              d.rms, d.zeroCrossings, decoded = true)
          case None =>
            AudioMeta(r.doc_id, 0, 0, 0, 0L, 0.0, 0.0, 0L, decoded = false)
        }
      }
    }
  }

  /** Fixed-width analysis frames over a decoded 16-bit mono WAV: per
    * frame (index, RMS, zero crossings) — the audio twin of
    * [[Multimodal.sampleFrames]]'s row fan-out, flatMap inside
    * mapPartitions so the output stream is Σ n_frames rows. */
  def frameStats(media: Dataset[Multimodal.MediaRow],
                 frameSamples: Int): DataFrame = {
    require(frameSamples > 0)
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        decodeWav(r.payload) match {
          case Some(d) if d.channels == 1 =>
            // re-read the PCM payload frame by frame (decodeWav already
            // validated the header); the 44-byte canonical offset is
            // re-derived through AudioSystem, not assumed
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.payload))
            val bytes = try in.readAllBytes() finally in.close()
            val n = bytes.length / 2
            (0 until n / frameSamples).iterator.map { fi =>
              var sumSq = 0.0
              var crossings = 0L
              var prevSign = 0
              var j = fi * frameSamples
              while (j < (fi + 1) * frameSamples) {
                val s = ((bytes(2 * j + 1) << 8) | (bytes(2 * j) & 0xFF)).toShort.toInt
                sumSq += s.toDouble * s
                val sign = java.lang.Integer.signum(s)
                if (sign != 0) {
                  if (prevSign != 0 && sign != prevSign) crossings += 1
                  prevSign = sign
                }
                j += 1
              }
              (r.doc_id, fi, math.sqrt(sumSq / frameSamples), crossings)
            }
          case _ => Iterator.empty
        }
      }
    }.toDF("doc_id", "frame_idx", "rms", "zero_crossings")
  }
}
