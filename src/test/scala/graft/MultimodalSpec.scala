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

  test("real ImageIO decode round-trips generated PNGs bit-exactly") {
    // geometry and gray level must survive encode→decode exactly
    for ((w, h, g) <- Seq((16, 16, 0), (33, 17, 128), (640, 480, 255), (1, 1, 7))) {
      val png = Multimodal.syntheticPng(w, h, g)
      assert(Multimodal.sniffFormat(png) == "png")
      val d = Multimodal.decodeImage(png).get
      assert(d.width == w && d.height == h && d.nFrames == 1, s"($w,$h,$g)")
      // constant-gray Rec.601 luma == the gray level (coeffs sum to 1)
      assert(math.abs(d.meanLuma - g) < 1e-9, s"luma ${d.meanLuma} want $g")
    }
    // non-images refuse to decode (stub path), corrupt images too
    assert(Multimodal.decodeImage("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeImage(("GIF89a__" + "x" * 50).getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("extractMeta uses real pixels for images, the stub otherwise") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.syntheticPng(40, 25, 200)),
      Multimodal.MediaRow(2L, "just text bytes, long enough to matter".getBytes)
    ).toDS()
    val meta = Multimodal.extractMeta(rows).collect().map(m => m.doc_id -> m).toMap
    assert(meta(1L).decoded && meta(1L).format == "png")
    assert(meta(1L).width == 40 && meta(1L).height == 25 && meta(1L).n_frames == 1)
    assert(math.abs(meta(1L).mean_luma.get - 200.0) < 1e-9)
    assert(!meta(2L).decoded && meta(2L).mean_luma.isEmpty)
    // mean_byte stays the raw byte mean on BOTH paths
    val png = Multimodal.syntheticPng(40, 25, 200)
    assert(math.abs(meta(1L).mean_byte -
      png.map(_ & 0xFF).sum.toDouble / png.length) < 1e-9)
  }

  test("Graphics2D resize produces real target-dimension PNGs") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.syntheticPng(64, 64, 90)),
      Multimodal.MediaRow(2L, "audio payload stand-in".getBytes)
    ).toDS()
    val resized = Multimodal.resizeImages(rows, targetW = 8, targetH = 6)
      .collect().map(r => r.doc_id -> r.payload).toMap
    val d = Multimodal.decodeImage(resized(1L)).get
    assert(d.width == 8 && d.height == 6)
    // bilinear downscale of a constant image stays constant
    assert(math.abs(d.meanLuma - 90.0) < 1e-6)
    // non-images pass through untouched
    assert(new String(resized(2L)) == "audio payload stand-in")
  }

  test("pooled-pixel features: real images and byte-histogram fallback share shape") {
    import spark.implicits._
    val rows = Seq(
      Multimodal.MediaRow(1L, Multimodal.syntheticPng(64, 48, 120)),
      Multimodal.MediaRow(2L, "text payload for the fallback".getBytes)
    ).toDS()
    val feats = Multimodal.imageFeatures(rows, grid = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(feats(1L).length == 16 && feats(2L).length == 16)
    // constant image → every pooled cell equal → unit vector = 1/grid
    feats(1L).foreach(v => assert(math.abs(v - 0.25f) < 1e-6f))
    // both are unit-norm (or zero) — the similarity-family contract
    for (v <- feats.values) {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
  }

  test("dHash: stable under resize/re-encode, discriminative across seeds") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val seeds = (0L until 24L).toSeq
    val hashes = seeds.map { s =>
      val base = Multimodal.syntheticGridPng(s, 90, 80)
      val resized = Multimodal.resizePng(base, 45, 40).get
      val hb = Multimodal.dHash(base).get
      val hr = Multimodal.dHash(resized).get
      // perceptual invariance: a downscaled re-encode stays within
      // the classic near-dup radius
      assert(ham(hb, hr) <= 3, s"seed $s hamming ${ham(hb, hr)}")
      hb
    }
    // different seeds are far apart (expected ~32 bits for independent
    // textures) — far outside the radius-3 pairing
    for (i <- hashes.indices; j <- i + 1 until hashes.size)
      assert(ham(hashes(i), hashes(j)) > 3, s"seeds $i/$j too close")
    // undecodable payloads have no hash
    assert(Multimodal.dHash("not an image".getBytes).isEmpty)
  }

  test("qA3 fixture geometry: twin hamming ≤ 3 for every oracle-gate seed") {
    // sweeps the exact (45×40 bmp → 27×24 bmp) fixture family over all
    // seeds the sf0.01 oracle gate uses (doc_id/2 < 2500) plus margin —
    // pins that qA3's radius-3 pairing recovers every planted twin
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dists = (0L until 2600L).map { s =>
      val base = Multimodal.syntheticGridImage(s, 45, 40, "bmp")
      val resized = Multimodal.areaResizeGray(base, 27, 24, "bmp").get
      ham(Multimodal.dHash(base).get, Multimodal.dHash(resized).get)
    }
    assert(dists.max <= 3, s"max twin hamming ${dists.max}")
  }

  test("oversized image headers are refused, not decoded (bomb guard)") {
    // a tiny payload declaring enormous dimensions must route to the
    // stub path instead of allocating gigabytes at read(0): a valid
    // PNG signature + IHDR declaring 50000×50000 (2.5 GP > 64 MP)
    val baos = new java.io.ByteArrayOutputStream()
    val dos = new java.io.DataOutputStream(baos)
    dos.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = new java.io.ByteArrayOutputStream()
    val d2 = new java.io.DataOutputStream(ihdr)
    d2.writeBytes("IHDR"); d2.writeInt(50000); d2.writeInt(50000)
    d2.write(8); d2.write(2); d2.write(0); d2.write(0); d2.write(0)
    val chunk = ihdr.toByteArray
    dos.writeInt(13); dos.write(chunk)
    val crc = new java.util.zip.CRC32(); crc.update(chunk)
    dos.writeInt(crc.getValue.toInt)
    val bomb = baos.toByteArray
    assert(Multimodal.sniffFormat(bomb) == "png") // it LOOKS like an image
    assert(Multimodal.decodeImage(bomb).isEmpty)  // ...but is refused
    assert(Multimodal.dHash(bomb).isEmpty)
    assert(Multimodal.resizePng(bomb, 8, 8).isEmpty)
    // extractMeta routes it to the stub, the pipeline keeps moving
    import spark.implicits._
    val meta = Multimodal.extractMeta(
      Seq(Multimodal.MediaRow(7L, bomb)).toDS()).collect()(0)
    assert(!meta.decoded && meta.format == "png")
  }

  test("imageNearDupPairs recovers exactly the planted resized twins") {
    import spark.implicits._
    val rows = (0L until 30L).flatMap { s =>
      val base = Multimodal.syntheticGridPng(s, 90, 80)
      Seq(Multimodal.MediaRow(2 * s, base),
        Multimodal.MediaRow(2 * s + 1, Multimodal.resizePng(base, 45, 40).get))
    } :+ Multimodal.MediaRow(999L, "undecodable audio bytes".getBytes)
    val pairs = Multimodal.imageNearDupPairs(rows.toDS(), maxHamming = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == (0L until 30L).map(s => (2 * s, 2 * s + 1)).toSet)
  }

  test("video near-dup: sampleFrames chain, gain invariance, discrimination") {
    import spark.implicits._
    // two byte-identical "videos" (4,5), a half-gain re-encode of a
    // third (6 vs 7), and unrelated payloads (0..3): only the planted
    // pairs may survive the two-sided frame-coverage rule
    // per-BYTE hash levels (not plateaus): the stub frame slicer cuts
    // content-derived lengths, so bucket boundaries are unknowable —
    // independent byte levels give every bucket mean its own value at
    // any slicing. Levels are even, so gain ÷2 halves sums exactly.
    def vid(seed: Long, gainDiv: Int = 1): Array[Byte] = {
      val b = new Array[Byte](100000)
      var i = 0
      while (i < b.length) {
        val z = graft.operators.Dedup.splitmix64(seed * 1000003L + i * 104729L)
        b(i) = ((if ((z & 1L) == 0L) 200 else 40) / gainDiv).toByte
        i += 1
      }
      b
    }
    val rows = Seq(
      Multimodal.MediaRow(0L, vid(100)), Multimodal.MediaRow(1L, vid(200)),
      Multimodal.MediaRow(2L, vid(300)), Multimodal.MediaRow(3L, vid(400)),
      Multimodal.MediaRow(4L, vid(500)), Multimodal.MediaRow(5L, vid(500)),
      Multimodal.MediaRow(6L, vid(600)), Multimodal.MediaRow(7L, vid(600, gainDiv = 2)))
    val frames = Multimodal.sampleFrames(rows.toDS(), everyN = 1)
    val pairs = Multimodal.videoNearDupPairs(frames, maxHamming = 3,
        minFrameMatchFrac = 0.9)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // (4,5) byte-identical → identical stub frames → all match;
    // (6,7): same frame count is NOT guaranteed by the content-hash
    // stub under a gain change, so assert only the identical pair plus
    // the absence of unrelated pairs; fingerprint gain-invariance is
    // pinned directly below at the frame level
    assert(pairs.contains((4L, 5L)), s"missing identical pair in $pairs")
    assert(pairs.forall { case (a, b) => Set(a, b) == Set(4L, 5L) || Set(a, b) == Set(6L, 7L) },
      s"unrelated videos paired: $pairs")
    // frame-level gain invariance of the fingerprint kernel
    val base = Multimodal.Frame(0L, 0, vid(700))
    val half = Multimodal.Frame(1L, 0, vid(700, gainDiv = 2))
    val fps = Multimodal.frameFingerprints(Seq(base, half).toDS())
      .select("simhash").collect().map(_.getLong(0))
    assert(fps(0) == fps(1), "half-gain re-encode changed the fingerprint")
  }

  test("sceneCuts: planted scene boundaries, gain invariance, singletons") {
    import spark.implicits._
    // shared fixture: frames constant WITHIN a scene (same keyB),
    // re-patterned at each boundary
    def frame(vid: Long, idx: Int, scene: Int, gainDiv: Int = 1): Multimodal.Frame =
      Multimodal.plantedFrame(vid, idx, vid, scene, gainDiv)
    val frames = (
      // video 0: scenes of length 3 over 9 frames -> 2 cuts, 3 scenes
      (0 until 9).map(f => frame(0L, f, f / 3)) ++
      // video 1: one scene -> 0 cuts
      (0 until 6).map(f => frame(1L, f, 0)) ++
      // video 2: single frame -> 0 cuts, 1 scene
      Seq(frame(2L, 0, 0)) ++
      // video 3: same scene layout as video 0 but half-gain — the
      // gain-invariant fingerprint must see the SAME cut structure
      (0 until 9).map(f => frame(3L, f, f / 3, gainDiv = 2))
    ).toDS()
    val got = Multimodal.sceneCuts(frames, maxHamming = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(0L) == ((9L, 2L, 3L)), s"v0: ${got(0L)}")
    assert(got(1L) == ((6L, 0L, 1L)), s"v1: ${got(1L)}")
    assert(got(2L) == ((1L, 0L, 1L)), s"v2: ${got(2L)}")
    assert(got(3L) == ((9L, 2L, 3L)), s"half-gain v3: ${got(3L)}")
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
