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

  /** Canonical 44-byte-header 16-bit mono PCM WAV around a sample
    * array — shared by the synthetic fixture generators. */
  private def monoWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && samples.nonEmpty)
    val dataLen = samples.length * 2
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
    while (j < samples.length) { buf.putShort(samples(j)); j += 1 }
    buf.array()
  }

  /** Deterministic 16-bit mono PCM WAV: a square wave alternating
    * `+amplitude`/`-amplitude` every sample — every |sample| equals
    * `amplitude`, so the decoded RMS is EXACTLY `amplitude` (n·A² and
    * A² are exactly representable, IEEE division and sqrt of a
    * perfect square are exact) and zero crossings are exactly
    * `nSamples - 1`: full oracle arithmetic for a real decode. */
  def syntheticSquareWav(sampleRate: Int, nSamples: Int,
                         amplitude: Int): Array[Byte] = {
    require(nSamples > 0)
    require(amplitude > 0 && amplitude <= Short.MaxValue)
    val samples = new Array[Short](nSamples)
    var j = 0
    while (j < nSamples) {
      samples(j) = (if (j % 2 == 0) amplitude else -amplitude).toShort
      j += 1
    }
    monoWav(sampleRate, samples)
  }

  /** Frames behind the 64-bit [[rmsFingerprint]]: 65 RMS frames give
    * 64 consecutive-frame loudness comparisons, one per bit. */
  val FingerprintFrames = 65

  /**
   * 64-bit perceptual audio fingerprint — the audio twin of
   * [[Multimodal.dHash]]'s sign-of-delta construction: the decoded
   * mono PCM stream is divided into 65 equal-length frames AT FIXED
   * POSITION FRACTIONS (boundary k·n/65, the 1-D analog of dHash's
   * exact area pooling), each frame's RMS computed in one pass, and
   * bit k set when frame k+1 is louder than frame k.
   *
   * Invariance, by construction: a uniform gain change scales every
   * frame RMS by the same factor, so every delta keeps its sign —
   * the fingerprint is bit-identical; resampling changes n but not
   * the position fractions, so frame RMSs track the same envelope
   * and the fingerprint survives up to envelope-sampling error
   * (exactly, when frame boundaries align — see
   * [[syntheticEnvelopeWav]]). None for payloads that are not
   * decodable 16-bit mono PCM or have fewer samples than frames.
   */
  def rmsFingerprint(payload: Array[Byte]): Option[Long] =
    frameRms(payload, FingerprintFrames).map { rms =>
      var h = 0L
      var bit = 0
      while (bit < 64) {
        if (rms(bit + 1) > rms(bit)) h |= (1L << bit)
        bit += 1
      }
      h
    }

  /** The fixed-position-fraction frame-RMS pass shared by
    * [[rmsFingerprint]] and [[activeSegments]]: ONE stream open, one
    * byte read, one scan — the header is validated inline (the same
    * acceptance set as [[decodeWav]] restricted to mono: 16-bit
    * signed LE PCM, sample count in [frames, MaxSamples]) rather
    * than by a decodeWav call, whose corpus-wide RMS/crossing scan
    * these callers would pay for and never use. RMS per frame at
    * boundaries k·n/frames; None for anything else. */
  private[graft] def frameRms(payload: Array[Byte],
                              frames: Int): Option[Array[Double]] = {
    if (payload.isEmpty) return None
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val f = in.getFormat
        val nFrames = in.getFrameLength
        if (f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED ||
            f.getSampleSizeInBits != 16 || f.isBigEndian ||
            f.getChannels != 1 || nFrames <= 0 || nFrames < frames ||
            nFrames > MaxSamples) None
        else {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          if (n < frames) None
          else {
            val rms = new Array[Double](frames)
            var k = 0
            while (k < frames) {
              val start = (k.toLong * n / frames).toInt
              val end = ((k + 1).toLong * n / frames).toInt
              var sumSq = 0.0
              var j = start
              while (j < end) {
                val s = ((bytes(2 * j + 1) << 8) | (bytes(2 * j) & 0xFF)).toShort.toInt
                sumSq += s.toDouble * s
                j += 1
              }
              rms(k) = math.sqrt(sumSq / (end - start))
              k += 1
            }
            Some(rms)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /**
   * Active-audio segmentation — the silence-trim / voice-activity
   * stage of an audio ingest pipeline (speech corpora drop leading/
   * trailing/internal silence before feature extraction; long-form
   * audio splits into utterances at quiet gaps): the decoded PCM is
   * RMS-profiled over `frames` fixed-fraction frames ([[frameRms]] —
   * one real decode per payload, map-side) and maximal runs of
   * consecutive frames with RMS ≥ `minRms` become segments. Emits
   * (doc_id, seg_idx, start_frame, end_frame) with a 0-based segment
   * index and [start, end) frame bounds; silent or undecodable
   * payloads emit nothing. Frame granularity (not sample) keeps the
   * output metadata-sized; callers scale bounds by n/frames.
   *
   * Shape: flatMap inside mapPartitions — per-row decode, zero
   * shuffle, payloads never leave their partition.
   */
  def activeSegments(media: Dataset[Multimodal.MediaRow],
                     minRms: Double,
                     frames: Int = FingerprintFrames): DataFrame = {
    require(frames > 0, s"frames must be positive, got $frames")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        frameRms(r.payload, frames) match {
          case None => Iterator.empty
          case Some(rms) =>
            val segs = scala.collection.mutable.ArrayBuffer[(Long, Int, Int, Int)]()
            var k = 0
            var start = -1
            while (k <= rms.length) {
              val active = k < rms.length && rms(k) >= minRms
              if (active && start < 0) start = k
              else if (!active && start >= 0) {
                segs += ((r.doc_id, segs.length, start, k))
                start = -1
              }
              k += 1
            }
            segs.iterator
        }
      }
    }.toDF("doc_id", "seg_idx", "start_frame", "end_frame")
  }

  /** Deterministic GATED envelope WAV for the [[activeSegments]]
    * oracle: segment k carries a [[segmentAmp]] square wave when its
    * run `(k / runLen) % 2 == 0` is active and SILENCE (amplitude 0)
    * otherwise, with each [[frameRms]] frame covering exactly one
    * segment — active frames read RMS ≥ 1000 and silent frames
    * exactly 0, so the emitted run structure is pure doc-id
    * arithmetic a SQL oracle replays. */
  def syntheticGatedWav(seed: Long, sampleRate: Int, samplesPerSeg: Int,
                        runLen: Int): Array[Byte] = {
    require(samplesPerSeg > 0 && runLen > 0)
    segmentWav(sampleRate, samplesPerSeg)(k =>
      if ((k / runLen) % 2 == 0) segmentAmp(seed, k) else 0)
  }

  /** Per-payload [[rmsFingerprint]]s as (id, simhash) — named to feed
    * [[Dedup.simhashPairs]]'s banded hamming join directly;
    * undecodable payloads drop out (no signature, stay singletons). */
  def rmsFingerprints(media: Dataset[Multimodal.MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => rmsFingerprint(r.payload).map(h => (r.doc_id, h)))
    }.toDF("id", "simhash")
  }

  /**
   * Perceptual audio near-dup pairs: one real PCM decode per payload
   * (map-side, payloads never shuffle), then [[Dedup.simhashPairs]]'s
   * pigeonhole banding — COMPLETE at the requested hamming radius,
   * one band shuffle of 64-bit signatures, never an O(n²) audio
   * comparison. The audio twin of [[Multimodal.imageNearDupPairs]];
   * same hot-bucket guard semantics.
   */
  def audioNearDupPairs(media: Dataset[Multimodal.MediaRow],
                        maxHamming: Int = 3,
                        maxBucketSize: Option[Int] = None): DataFrame =
    Dedup.simhashPairs(rmsFingerprints(media), maxHamming, maxBucketSize)

  /** Per-segment amplitude for [[syntheticEnvelopeWav]]: a 64-bit mix
    * of (seed, segment) mapped to an EVEN value in [1000, 28998] —
    * even so a /2 gain shift stays exact integer arithmetic and every
    * RMS comparison is preserved strictly. */
  def segmentAmp(seed: Long, k: Int): Int = {
    var h = seed * -7046029254386353131L + (k + 1) * -4417276706812531889L
    h ^= (h >>> 32); h *= -4417276706812531889L; h ^= (h >>> 29)
    1000 + 2 * math.floorMod(h, 14000L).toInt
  }

  /**
   * Deterministic mono WAV with a seed-keyed 65-segment amplitude
   * ENVELOPE: segment k is `samplesPerSeg` samples of a ±A square
   * wave with A = [[segmentAmp]](seed, k) / gainDiv. Total length is
   * 65·samplesPerSeg, so each [[rmsFingerprint]] frame covers EXACTLY
   * one segment and the frame RMS is EXACTLY A (square wave) — the
   * fingerprint is a pure function of the seed: a twin generated at a
   * different sample rate / samplesPerSeg (a resample) and gainDiv
   * (a gain shift) fingerprints bit-identically, while different
   * seeds give effectively independent 64-bit fingerprints. The audio
   * analog of qA3's resized-twin image fixtures.
   */
  def syntheticEnvelopeWav(seed: Long, sampleRate: Int,
                           samplesPerSeg: Int, gainDiv: Int = 1): Array[Byte] = {
    require(samplesPerSeg > 0 && gainDiv > 0)
    segmentWav(sampleRate, samplesPerSeg)(k => segmentAmp(seed, k) / gainDiv)
  }

  /** Shared per-segment square-wave fill of the synthetic WAV
    * fixtures ([[syntheticEnvelopeWav]], [[syntheticGatedWav]]):
    * segment k is `samplesPerSeg` samples at ±ampOf(k), sign
    * alternating on the GLOBAL sample index — one definition so the
    * fixture families cannot diverge on the fill convention. */
  private def segmentWav(sampleRate: Int, samplesPerSeg: Int)
                        (ampOf: Int => Int): Array[Byte] = {
    val samples = new Array[Short](FingerprintFrames * samplesPerSeg)
    var k = 0
    while (k < FingerprintFrames) {
      val amp = ampOf(k)
      var j = 0
      while (j < samplesPerSeg) {
        val idx = k * samplesPerSeg + j
        samples(idx) = (if (idx % 2 == 0) amp else -amp).toShort
        j += 1
      }
      k += 1
    }
    monoWav(sampleRate, samples)
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
