package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads ride as opaque `binary`
 * columns with typed metadata alongside. The Spark-side machinery —
 * schema, batched per-partition processing, partition sizing — is
 * real, and so is the IMAGE kernel: `javax.imageio.ImageIO` ships
 * with the JDK and decodes JPEG/PNG/GIF/BMP/TIFF, so decode, resize
 * (`java.awt.Graphics2D`) and pooled-pixel features run on real
 * pixels. Only audio/video decode (formats ImageIO cannot read —
 * mp3/wav/mp4/webp) stays a deterministic stub.
 *
 * At 100 TB the shape matters: decode runs as `mapPartitions` over a
 * Dataset so each task amortizes decoder init across its whole
 * partition (the same batching contract a Pandas-UDF/Arrow path
 * gives PySpark users), and payload columns are pruned from scans
 * that only touch metadata.
 */
object Multimodal {

  // ImageIO defaults to a DISK-backed stream cache — a temp file per
  // encode/decode, which at corpus scale turns a CPU kernel into
  // ~20 ms of filesystem traffic per image. All payloads here are
  // in-memory byte arrays; cache in memory. (Object init runs once
  // per executor JVM.)
  javax.imageio.ImageIO.setUseCache(false)

  case class MediaRow(doc_id: Long, payload: Array[Byte])

  /** `decoded` says which kernel produced the geometry: true → real
    * ImageIO pixels (width/height/n_frames/mean_luma are ground
    * truth); false → the deterministic stub (audio/video/unknown).
    * `mean_byte` is ALWAYS the raw payload byte mean — cheap, format
    * independent, and what the byte-level oracles check. */
  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, n_frames: Int,
                       mean_byte: Double, decoded: Boolean,
                       mean_luma: Option[Double])

  /** Container-format sniffing from magic bytes — real (not stubbed)
    * logic: this is exactly what a 100 TB media pipeline does before
    * routing payloads to the right decoder. */
  def sniffFormat(payload: Array[Byte]): String = {
    def at(i: Int): Int = if (i < payload.length) payload(i) & 0xFF else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "png"
    else if (at(0) == 0xFF && at(1) == 0xD8 && at(2) == 0xFF) "jpeg"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
      at(8) == 'W' && at(9) == 'E' && at(10) == 'B' && at(11) == 'P') "webp"
    else if (at(4) == 'f' && at(5) == 't' && at(6) == 'y' && at(7) == 'p') "mp4"
    else if (at(0) == 'I' && at(1) == 'D' && at(2) == '3') "mp3"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F') "wav"
    else "unknown"
  }

  /** Decoded frame-0 geometry + Rec.601 mean luminance of a REAL
    * image payload. */
  case class DecodedImage(width: Int, height: Int, nFrames: Int,
                          meanLuma: Double)

  /** Decompression-bomb guard: a ~300 KB PNG can declare 25000×25000
    * and allocate gigabytes at read(0) — and the resulting
    * OutOfMemoryError is NOT an Exception, so it would kill the task
    * (and its retries) rather than fall back to the stub. The header
    * carries the dimensions BEFORE any pixel allocation; images over
    * this pixel count are refused (→ stub path). 64 MP covers every
    * legitimate photo format. */
  private val MaxImagePixels = 64L * 1024 * 1024

  /** Rec.601 luminance of a packed ARGB pixel. */
  private def lumaOf(p: Int): Double =
    0.299 * ((p >> 16) & 0xFF) + 0.587 * ((p >> 8) & 0xFF) + 0.114 * (p & 0xFF)

  /** Shared reader harness: header-check the dimensions, then hand
    * the positioned reader to `f`. None when no reader accepts the
    * payload, the header exceeds [[MaxImagePixels]], or decode throws. */
  private def withReader[T](payload: Array[Byte])(
      f: javax.imageio.ImageReader => T): Option[T] = {
    if (payload.isEmpty) return None
    try {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis, false, true)
            // header-only: no pixel buffers allocated yet
            val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
            if (w <= 0 || h <= 0 || w * h > MaxImagePixels) None
            else Some(f(reader))
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** Real image decode via the JDK's `javax.imageio.ImageIO`
    * (JPEG/PNG/GIF/BMP/TIFF — no external jars). Returns None for
    * payloads no installed reader accepts (audio/video/corrupt) or
    * that fail the [[MaxImagePixels]] guard, which routes them to the
    * deterministic stub. `n_frames` counts the container's images
    * (animated GIF frames, TIFF pages). */
  def decodeImage(payload: Array[Byte]): Option[DecodedImage] =
    withReader(payload) { reader =>
      val img = reader.read(0)
      val w = img.getWidth
      val h = img.getHeight
      // one bulk getRGB, not w×h JNI-ish calls
      val px = img.getRGB(0, 0, w, h, null, 0, w)
      var sum = 0.0
      var i = 0
      while (i < px.length) { sum += lumaOf(px(i)); i += 1 }
      val n = try math.max(reader.getNumImages(true), 1)
              catch { case _: Exception => 1 }
      DecodedImage(w, h, n, sum / px.length)
    }

  /** Decode to a BufferedImage (resize/feature kernels) — same
    * reader path and bomb guard as [[decodeImage]]. */
  private def readBuffered(payload: Array[Byte]): Option[java.awt.image.BufferedImage] =
    withReader(payload)(_.read(0))

  /**
   * Scale to exactly `w`×`h` for IMAGE output: progressive 2× halving
   * while the source is more than 2× the target, then one final
   * bilinear pass. A SINGLE-step Graphics2D bilinear at large factors
   * interpolates between ~2×2 source samples — a 3000px photo squeezed
   * straight to 9px reads a sparse pixel subset. Halving keeps every
   * step inside bilinear's support (the standard mipmap argument).
   * The HASH/FEATURE path does not use this — it pools with the exact
   * [[areaPoolLuma]] box filter, which is what makes [[dHash]] stable
   * across scales (two Graphics2D halving chains of different depths
   * accumulate different phase offsets; an exact area integral of the
   * same underlying field does not).
   */
  private def scaleTo(src: java.awt.image.BufferedImage,
                      w: Int, h: Int): java.awt.image.BufferedImage = {
    var cur = src
    while (cur.getWidth >= 2 * w && cur.getHeight >= 2 * h &&
           (cur.getWidth > 2 * w || cur.getHeight > 2 * h)) {
      cur = drawScaled(cur, math.max(w, cur.getWidth / 2),
        math.max(h, cur.getHeight / 2))
    }
    if (cur.getWidth == w && cur.getHeight == h) cur else drawScaled(cur, w, h)
  }

  /**
   * EXACT fractional box filter of the luminance plane onto a
   * `tw`×`th` mesh: every target cell is the area-weighted mean of
   * the source pixels its back-projected rectangle overlaps (edge
   * pixels weighted by fractional coverage). True area pooling at any
   * scale factor — no sampling sparsity, no interpolation-kernel or
   * JVM-graphics dependence — so pooling a photo and pooling its
   * thumbnail integrate the SAME underlying field and agree up to
   * resampling error. The deterministic core of [[dHash]] and
   * [[imageFeatures]].
   */
  private def areaPoolLuma(img: java.awt.image.BufferedImage,
                           tw: Int, th: Int): Array[Double] = {
    val sw = img.getWidth
    val sh = img.getHeight
    val px = img.getRGB(0, 0, sw, sh, null, 0, sw)
    val out = new Array[Double](tw * th)
    var ty = 0
    while (ty < th) {
      val y0 = ty * sh.toDouble / th
      val y1 = (ty + 1) * sh.toDouble / th
      var tx = 0
      while (tx < tw) {
        val x0 = tx * sw.toDouble / tw
        val x1 = (tx + 1) * sw.toDouble / tw
        var sum = 0.0
        var y = math.floor(y0).toInt
        while (y < math.ceil(y1).toInt) {
          val wy = math.min(y + 1.0, y1) - math.max(y.toDouble, y0)
          var x = math.floor(x0).toInt
          while (x < math.ceil(x1).toInt) {
            val wx = math.min(x + 1.0, x1) - math.max(x.toDouble, x0)
            sum += wx * wy * lumaOf(px(y * sw + x))
            x += 1
          }
          y += 1
        }
        out(ty * tw + tx) = sum / ((x1 - x0) * (y1 - y0))
        tx += 1
      }
      ty += 1
    }
    out
  }

  private def drawScaled(src: java.awt.image.BufferedImage,
                         w: Int, h: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** Deterministic PNG: a `width`×`height` solid-gray image (gray ∈
    * [0,255]) encoded by the JDK PNG writer — the test/oracle fixture
    * generator (decoding it must round-trip the exact geometry and,
    * being lossless, the exact gray level). */
  def syntheticPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    require(width > 0 && height > 0 && gray >= 0 && gray <= 255)
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic textured image: a 9×8 gray grid seeded by
    * splitmix-style hashing of (seed, cell), bilinearly upscaled to
    * `width`×`height` — the fixture family for perceptual-hash tests
    * (smooth enough that a downscaled re-encode keeps the same
    * [[dHash]], textured enough that different seeds do not).
    * `format`: any ImageIO writer name — "png" (lossless, compact) or
    * "bmp" (uncompressed: ~5× cheaper encode/decode, the right
    * fixture for throughput paths). */
  def syntheticGridImage(seed: Long, width: Int, height: Int,
                         format: String): Array[Byte] = {
    require(width >= 9 && height >= 8, "grid fixture needs width≥9, height≥8")
    val grid = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 9) {
        // splitmix64 finalizer over (seed, cell) — stable everywhere
        var z = seed * 0x9E3779B97F4A7C15L + (y * 9 + x + 1) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
        z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
        val g = ((z ^ (z >>> 31)) & 0xFF).toInt
        grid.setRGB(x, y, (g << 16) | (g << 8) | g)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(drawScaled(grid, width, height), format, out)
    out.toByteArray
  }

  /** PNG variant of [[syntheticGridImage]] (lossless, sniffable). */
  def syntheticGridPng(seed: Long, width: Int, height: Int): Array[Byte] =
    syntheticGridImage(seed, width, height, "png")

  /** Local (driver/executor-side) resize of one image payload —
    * decode → bilinear scale → re-encode as `format`. None if
    * undecodable. The Dataset stage [[resizeImages]] wraps this per
    * partition. */
  def resizeImage(payload: Array[Byte], targetW: Int, targetH: Int,
                  format: String): Option[Array[Byte]] = {
    require(targetW > 0 && targetH > 0)
    readBuffered(payload).map { img =>
      val bytes = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaleTo(img, targetW, targetH), format, bytes)
      bytes.toByteArray
    }
  }

  /** PNG variant of [[resizeImage]]. */
  def resizePng(payload: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] =
    resizeImage(payload, targetW, targetH, "png")

  /** Area-filter resize to a grayscale image: each output pixel is
    * the exact [[areaPoolLuma]] box-filter mean of its source
    * rectangle. The kernel real thumbnailers use (area/Lanczos), and
    * the one that composes EXACTLY with [[dHash]]'s own pooling: when
    * the output grid refines the 9×8 hash grid (e.g. 27×24), pooling
    * the resized image equals pooling the original (linearity of the
    * integral over a partition), so the hash is preserved up to 8-bit
    * rounding. */
  def areaResizeGray(payload: Array[Byte], targetW: Int, targetH: Int,
                     format: String): Option[Array[Byte]] = {
    require(targetW > 0 && targetH > 0)
    readBuffered(payload).map { img =>
      val luma = areaPoolLuma(img, targetW, targetH)
      val out = new java.awt.image.BufferedImage(
        targetW, targetH, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < targetH) {
        var x = 0
        while (x < targetW) {
          val g = math.max(0, math.min(255, math.round(luma(y * targetW + x)).toInt))
          out.setRGB(x, y, (g << 16) | (g << 8) | g)
          x += 1
        }
        y += 1
      }
      val bytes = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, format, bytes)
      bytes.toByteArray
    }
  }

  /**
   * 64-bit difference hash (dHash) of an image payload: exact area
   * pooling of the luminance plane onto 9×8, bit (x,y) = "pixel
   * brighter than its left neighbour". Stable under rescaling and
   * re-encoding (the classic perceptual near-dup signature); hamming
   * distance between hashes measures perceptual difference. None for
   * payloads ImageIO cannot decode. Featureless (constant) images all
   * hash to 0 — an inherent dHash property, they form one near-dup
   * class.
   */
  def dHash(payload: Array[Byte]): Option[Long] = readBuffered(payload).map { img =>
    // exact area pooling, not Graphics2D resampling: the hash must be
    // a function of the underlying image field, not of interpolation
    // phase — see areaPoolLuma's doc
    val luma = areaPoolLuma(img, 9, 8)
    var h = 0L
    var bit = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (luma(y * 9 + x + 1) > luma(y * 9 + x)) h |= (1L << bit)
        bit += 1
        x += 1
      }
      y += 1
    }
    h
  }

  /** Per-image dHash signatures as a DataFrame (id, simhash) — named
    * to feed [[Dedup.simhashPairs]]'s banded hamming join directly.
    * Undecodable payloads drop out (no signature, stay singletons). */
  def dHashes(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => dHash(r.payload).map(h => (r.doc_id, h)))
    }.toDF("id", "simhash")
  }

  /**
   * Perceptual image near-dup pairs: dHash per image (one decode
   * pass, map-side), then [[Dedup.simhashPairs]]'s pigeonhole banding
   * — COMPLETE at the requested hamming radius, one band shuffle,
   * never an O(n²) image comparison. The multimodal twin of the text
   * SimHash path; same hot-bucket guard semantics.
   */
  def imageNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3,
                        maxBucketSize: Option[Int] = None): DataFrame =
    Dedup.simhashPairs(dHashes(media), maxHamming, maxBucketSize)

  /** Frame-id packing for [[frameFingerprints]]: `simhashPairs` needs
    * ONE orderable id column, so (video, frame) packs into a long with
    * the video id in the high bits — all frames of a lower video id
    * order before any frame of a higher one, which [[videoNearDupPairs]]
    * relies on to orient its pairs. */
  private[graft] val FRAME_BITS = 20

  /**
   * 64-bit gradient-sign fingerprint of one frame's byte signal: the
   * frame is mean-pooled into 65 equal segments and bit b is the sign
   * of the (b+1 vs b) segment-mean delta — dHash's gradient idea on a
   * 1-D signal (the same scheme `Audio.rmsFingerprints` uses on RMS
   * envelopes). Invariant under any monotone per-byte gain change
   * that preserves segment-mean ordering, e.g. the `gain ÷ n`
   * re-encode of a stub transcode.
   *
   * Frames shorter than `buckets` bytes drop out (and stay near-dup
   * singletons): with fewer bytes than buckets the segment means
   * repeat single bytes, the gradient degenerates to a handful of
   * set bits, and degenerate fingerprints of UNRELATED frames land
   * within any hamming radius of each other (measured: 21-byte frames
   * collapse a corpus to cross-video false pairs).
   *
   * A `frame_idx` at or beyond the 2^FRAME_BITS packing cap FAILS the
   * job rather than dropping the frame: [[videoNearDupPairs]]'s
   * denominators count every sampled frame, so a silent drop would
   * deflate `frame_match_frac` and mask true duplicates of very long
   * videos. Sample more coarsely (larger `everyN`) instead.
   */
  def frameFingerprints(frames: Dataset[Frame], buckets: Int = 65): DataFrame = {
    require(buckets >= 2 && buckets <= 65, "need 2..65 buckets (≤ 64 bits)")
    import frames.sparkSession.implicits._
    frames.mapPartitions { rows =>
      rows.flatMap { fr =>
        val n = fr.frame.length
        require(fr.frame_idx < (1 << FRAME_BITS) && fr.frame_idx >= 0,
          s"frame_idx ${fr.frame_idx} of video ${fr.doc_id} exceeds the " +
            s"2^$FRAME_BITS id-packing cap — sample frames more coarsely " +
            "(silently dropping would deflate videoNearDupPairs coverage)")
        if (n < buckets) None
        else {
          val means = new Array[Double](buckets)
          var b = 0
          while (b < buckets) {
            val from = (n.toLong * b / buckets).toInt
            val until = math.max((n.toLong * (b + 1) / buckets).toInt, from + 1)
            var sum = 0L
            var i = from
            while (i < math.min(until, n)) { sum += (fr.frame(i) & 0xFF); i += 1 }
            means(b) = sum.toDouble / math.max(math.min(until, n) - from, 1)
            b += 1
          }
          var h = 0L
          var bit = 0
          while (bit < buckets - 1) {
            if (means(bit + 1) > means(bit)) h |= (1L << bit)
            bit += 1
          }
          Some(((fr.doc_id << FRAME_BITS) | fr.frame_idx.toLong, h))
        }
      }
    }.toDF("id", "simhash")
  }

  /**
   * Video near-dup pairs on the SAME banded-hamming spine as text
   * SimHash, image dHash and audio RMS fingerprints — not a fourth
   * copy of the join. Keyframes (from [[sampleFrames]] or any frame
   * source) fingerprint map-side; [[Dedup.simhashPairs]] pairs
   * individual frames with ONE band shuffle (linear in total frames,
   * never O(videos²) and never comparing payloads); frame pairs then
   * aggregate per video pair and a pair survives when BOTH videos
   * have ≥ `minFrameMatchFrac` of their sampled frames matched —
   * the conservative two-sided coverage rule.
   *
   * Output: (id_a, id_b, frame_match_frac) with id_a < id_b
   * (guaranteed by the high-bits frame-id packing).
   */
  def videoNearDupPairs(frames: Dataset[Frame], maxHamming: Int = 3,
                        minFrameMatchFrac: Double = 0.5,
                        maxBucketSize: Option[Int] = None): DataFrame =
    videoNearDupPairsFromIndex(
      frameFingerprints(frames),
      // coverage denominators count SAMPLED frames, not
      // fingerprint-surviving ones — otherwise a video whose frames
      // mostly drop (sub-bucket stubs) could pair on a 1-of-1
      // surviving fraction, violating the documented "of their
      // sampled frames"
      frames.toDF()
        .groupBy(col("doc_id").as("vid")).agg(count(lit(1)).as("n_frames")),
      maxHamming, minFrameMatchFrac, maxBucketSize)

  /** [[videoNearDupPairs]] over a PRECOMPUTED fingerprint index +
    * per-video sampled-frame counts — the ingest-artifact shape (a
    * deployment fingerprints media once and stores both frames; see
    * [[FrameCache]]), which also avoids scanning the frame stream
    * twice per query. `frameCounts` must be (vid, n_frames) counting
    * ALL sampled frames (see the denominator note above). */
  def videoNearDupPairsFromIndex(fps: DataFrame, frameCounts: DataFrame,
                                 maxHamming: Int = 3,
                                 minFrameMatchFrac: Double = 0.5,
                                 maxBucketSize: Option[Int] = None): DataFrame = {
    require(minFrameMatchFrac > 0.0 && minFrameMatchFrac <= 1.0,
      "minFrameMatchFrac must be in (0, 1]")
    val nFrames = frameCounts
    val framePairs = Dedup.simhashPairs(fps, maxHamming, maxBucketSize)
      .select(shiftright(col("id_a"), FRAME_BITS).as("vid_a"),
        shiftright(col("id_b"), FRAME_BITS).as("vid_b"),
        col("id_a").as("fid_a"), col("id_b").as("fid_b"))
      .filter(col("vid_a") =!= col("vid_b"))
    framePairs
      .groupBy(col("vid_a"), col("vid_b"))
      .agg(countDistinct(col("fid_a")).as("m_a"),
        countDistinct(col("fid_b")).as("m_b"))
      .join(nFrames.select(col("vid").as("vid_a"), col("n_frames").as("n_a")), "vid_a")
      .join(nFrames.select(col("vid").as("vid_b"), col("n_frames").as("n_b")), "vid_b")
      .withColumn("frame_match_frac",
        least(col("m_a") / col("n_a"), col("m_b") / col("n_b")))
      .filter(col("frame_match_frac") >= minFrameMatchFrac)
      .select(col("vid_a").as("id_a"), col("vid_b").as("id_b"),
        col("frame_match_frac"))
  }

  /**
   * Scene-cut detection — the per-video TEMPORAL segmentation the
   * near-dup family ignores: consecutive frames whose fingerprints
   * disagree in more than `maxHamming` bits mark a cut, and the cut
   * count segments the video into scenes (keyframe selection,
   * per-scene sampling budgets, and trailer/loop detection all start
   * here). Reuses [[frameFingerprints]]' gradient-sign signature —
   * gain-invariant, so a re-encode does not fabricate cuts. Emits one
   * row per video: fingerprinted-frame count, cut count, scene count
   * (= cuts + 1; a video with a single surviving frame is one scene).
   * Frames dropped by the fingerprinter (sub-bucket payloads) leave
   * gaps and the distance is then measured across the gap —
   * documented, not silently padded.
   *
   * Shape: the lag/compare is a per-video window (one
   * O(frames·log frames) sort task per video, bounded by the
   * 2^FRAME_BITS packing cap — per-cell-sort economics, never a
   * join), then one partial/final aggregate.
   */
  def sceneCuts(frames: Dataset[Frame], maxHamming: Int = 8,
                buckets: Int = 65): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 64), got $maxHamming")
    val fps = frameFingerprints(frames, buckets)
      .select(shiftright(col("id"), FRAME_BITS).as("doc_id"),
        col("id").bitwiseAND(lit((1L << FRAME_BITS) - 1)).as("frame_idx"),
        col("simhash"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    fps.withColumn("__prev", lag(col("simhash"), 1).over(w))
      .withColumn("__cut", col("__prev").isNotNull &&
        bit_count(col("simhash").bitwiseXOR(col("__prev"))) > maxHamming)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("__cut"), lit(1L)).otherwise(lit(0L))).as("n_cuts"))
      .withColumn("n_scenes", col("n_cuts") + lit(1L))
  }

  /**
   * STUB decoder for payloads ImageIO cannot read (audio/video — the
   * container has no media-codec libraries beyond the JDK): metadata
   * is derived deterministically from the payload bytes. The
   * per-partition batching, schema, and pruning behavior are the
   * real contract under test.
   */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int, Double) = {
    var h = 1125899906842597L
    var sum = 0L
    var i = 0
    while (i < payload.length) {
      h = 31 * h + (payload(i) & 0xFF); sum += (payload(i) & 0xFF); i += 1
    }
    val width = 64 + math.floorMod(h, 1024L).toInt
    val height = 64 + math.floorMod(h >>> 17, 1024L).toInt
    val frames = 1 + math.floorMod(h >>> 33, 120L).toInt
    val mean = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length
    (width, height, frames, mean)
  }

  private def byteMean(payload: Array[Byte]): Double = {
    if (payload.isEmpty) return 0.0
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += (payload(i) & 0xFF); i += 1 }
    sum.toDouble / payload.length
  }

  /**
   * Attach decoded metadata to a binary media column: REAL ImageIO
   * decode for image payloads (width/height/n_frames/mean_luma are
   * pixel ground truth), deterministic stub geometry for everything
   * else. mapPartitions (not per-row UDF): decoder state is
   * initialized once per task, rows stream through without per-row
   * setup cost.
   */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // ImageIO's reader registry is JVM-global and initialized once —
      // the per-partition amortization a codec pipeline needs
      rows.map { r =>
        val fmt = sniffFormat(r.payload)
        decodeImage(r.payload) match {
          case Some(d) =>
            MediaMeta(r.doc_id, r.payload.length, fmt, d.width, d.height,
              d.nFrames, byteMean(r.payload), decoded = true,
              mean_luma = Some(d.meanLuma))
          case None =>
            val (w, hgt, f, mean) = decodeStub(r.payload)
            MediaMeta(r.doc_id, r.payload.length, fmt, w, hgt, f, mean,
              decoded = false, mean_luma = None)
        }
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Shared FIXTURE builder for the planted-frame oracles and specs
    * (the qAJ/qBN gate queries, the scene-cut specs): one 650-byte
    * frame of 65 ten-byte segments, each segment's 200/40 level taken
    * from the low bit of `splitmix64(keyA·1000003 + keyB·7919 +
    * seg·104729)` — vary `keyB` to re-pattern a frame (a scene
    * boundary), keep it to clone one (within-scene frames). ONE
    * definition so the gate oracles and the specs can never
    * desynchronize on the constants. `gainDiv` divides the levels
    * (both even, so division is exact) to exercise the fingerprints'
    * gain invariance. */
  def plantedFrame(docId: Long, frameIdx: Int, keyA: Long, keyB: Long,
                   gainDiv: Int = 1): Frame = {
    val bytes = new Array[Byte](650)
    var seg = 0
    while (seg < 65) {
      val z = Dedup.splitmix64(keyA * 1000003L + keyB * 7919L + seg * 104729L)
      val v: Byte = ((if ((z & 1L) == 0L) 200 else 40) / gainDiv).toByte
      java.util.Arrays.fill(bytes, seg * 10, seg * 10 + 10, v)
      seg += 1
    }
    Frame(docId, frameIdx, bytes)
  }

  /**
   * Frame sampling: every `everyN`-th frame of each video payload as
   * its own row — the row-EXPLODING stage of a video pipeline
   * (flatMap inside mapPartitions, so output row count is
   * Σ n_frames/everyN, never a per-row UDF returning arrays that get
   * re-exploded). Frame extraction itself is the stub (deterministic
   * payload slices); the fan-out shape, schema and batching are real.
   */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int): Dataset[Frame] = {
    require(everyN > 0, "everyN must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, _, nFrames, _) = decodeStub(r.payload)
        (0 until nFrames by everyN).iterator.map { f =>
          // STUB frame bytes: the f-th of n equal payload slices
          val n = math.max(1, r.payload.length / math.max(nFrames, 1))
          val from = math.min(f * n, r.payload.length)
          val until = math.min(from + n, r.payload.length)
          Frame(r.doc_id, f, java.util.Arrays.copyOfRange(r.payload, from, until))
        }
      }
    }
  }

  /** REAL image resize: decode → `Graphics2D` bilinear scale to
    * `targetW`×`targetH` → lossless PNG re-encode. Payloads ImageIO
    * cannot decode pass through unchanged (a media pipeline routes
    * them to a different executor stage, it doesn't corrupt them).
    * Its own mapPartitions stage because resize dominates
    * media-pipeline CPU and must amortize codec init. */
  def resizeImages(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    require(targetW > 0 && targetH > 0, "target dimensions must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        resizeImage(r.payload, targetW, targetH, "png")
          .map(MediaRow(r.doc_id, _)).getOrElse(r)
      }
    }
  }

  /** Resize stage for NON-image payloads (STUB: byte decimation to a
    * target-proportional length; a real deployment decodes, scales,
    * re-encodes via its audio/video codec). Images go through the
    * real [[resizeImages]]. */
  def resizeStub(media: Dataset[MediaRow], scaleDiv: Int): Dataset[MediaRow] = {
    require(scaleDiv > 0, "scaleDiv must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = new Array[Byte]((r.payload.length + scaleDiv - 1) / scaleDiv)
        var i = 0
        while (i < out.length) { out(i) = r.payload(i * scaleDiv); i += 1 }
        MediaRow(r.doc_id, out)
      }
    }
  }

  /**
   * REAL pooled-pixel image features: decode, average-pool the
   * luminance plane onto a `grid`×`grid` mesh ([[areaPoolLuma]] —
   * exact fractional box filter, not sparse sampling), L2-normalize →
   * `Array[Float]` of dim grid² — the SAME embedding shape the
   * similarity/ANN family consumes, so media plugs straight into
   * [[Similarity.bruteForceTopK]]/IVF/PQ (pinned in MultimodalSpec).
   * Non-image payloads fall back to the byte-histogram projection at
   * the SAME dimension, so one embedding table can hold both.
   */
  def imageFeatures(media: Dataset[MediaRow], grid: Int = 8): DataFrame = {
    require(grid > 0, "grid must be positive")
    import media.sparkSession.implicits._
    val dim = grid * grid
    media.mapPartitions { rows =>
      rows.map { r =>
        val v = readBuffered(r.payload) match {
          case Some(img) =>
            val pooled = areaPoolLuma(img, grid, grid)
            val arr = new Array[Float](dim)
            var i = 0
            while (i < dim) { arr(i) = pooled(i).toFloat; i += 1 }
            arr
          case None => byteHistogram(r.payload, dim)
        }
        (r.doc_id, l2Normalize(v).toSeq)
      }
    }.toDF("doc_id", "embedding")
  }

  private def byteHistogram(payload: Array[Byte], dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    var i = 0
    while (i < payload.length) {
      v(math.floorMod(payload(i), dim)) += 1f / (1 + i % 7)
      i += 1
    }
    v
  }

  private def l2Normalize(v: Array[Float]): Array[Float] = {
    var norm = 0.0
    var j = 0
    while (j < v.length) { norm += v(j) * v(j); j += 1 }
    val inv = if (norm == 0) 0f else (1.0 / math.sqrt(norm)).toFloat
    j = 0
    while (j < v.length) { v(j) *= inv; j += 1 }
    v
  }

  /**
   * Feature extraction for NON-image payloads (STUB: a deterministic
   * byte-histogram projection; a real deployment runs an audio/video
   * encoder per partition-amortized model load). Images go through the
   * real [[imageFeatures]].
   */
  def featureStub(media: Dataset[MediaRow], dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        (r.doc_id, l2Normalize(byteHistogram(r.payload, dim)).toSeq)
      }
    }.toDF("doc_id", "embedding")
  }

  /**
   * Build a synthetic media table from the documents table (text bytes
   * as payload — a deterministic stand-in for real image bytes), then
   * run the decode/metadata pipeline over it.
   */
  def documentsAsMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    val media = docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
    extractMeta(media)
  }
}
