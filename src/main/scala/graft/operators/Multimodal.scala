package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media payloads ride as opaque `binary`
 * columns with typed metadata alongside. The Spark-side machinery —
 * schema, batched per-partition processing, partition sizing — is
 * real; only the media *decode* itself is stubbed (image/audio codec
 * libraries are not in this container).
 *
 * At 100 TB the shape matters: decode runs as `mapPartitions` over a
 * Dataset so each task amortizes decoder init across its whole
 * partition (the same batching contract a Pandas-UDF/Arrow path
 * gives PySpark users), and payload columns are pruned from scans
 * that only touch metadata.
 */
object Multimodal {

  case class MediaRow(doc_id: Long, payload: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Int, format: String,
                       width: Int, height: Int, n_frames: Int, mean_byte: Double)

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

  /**
   * STUB decoder: a real deployment would decode image/audio here
   * (e.g. via a JNI codec); this container has no media libraries, so
   * metadata is derived deterministically from the payload bytes.
   * The per-partition batching, schema, and pruning behavior are the
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

  /**
   * Attach decoded metadata to a binary media column.
   * mapPartitions (not per-row UDF): decoder state is initialized once
   * per task, rows stream through without per-row setup cost.
   */
  def extractMeta(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here
      rows.map { r =>
        val (w, hgt, f, mean) = decodeStub(r.payload)
        MediaMeta(r.doc_id, r.payload.length, sniffFormat(r.payload),
          w, hgt, f, mean)
      }
    }
  }

  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

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

  /** Resize stage: binary in → binary out (STUB: byte decimation to a
    * target-proportional length; a real deployment decodes, scales,
    * re-encodes). Kept as its own mapPartitions stage because resize
    * dominates media-pipeline CPU and must amortize codec init. */
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
   * Feature extraction: payload → dense float vector (STUB: a
   * deterministic byte-histogram projection; a real deployment runs a
   * vision/audio encoder per partition-amortized model load). Output
   * is `Array[Float]` — the SAME embedding shape the similarity/ANN
   * family consumes, so media plugs straight into
   * [[Similarity.bruteForceTopK]]/IVF/PQ (pinned in MultimodalSpec).
   */
  def featureStub(media: Dataset[MediaRow], dim: Int = 64): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val v = new Array[Float](dim)
        var i = 0
        while (i < r.payload.length) {
          v(math.floorMod(r.payload(i), dim)) += 1f / (1 + i % 7)
          i += 1
        }
        var norm = 0.0
        var j = 0
        while (j < dim) { norm += v(j) * v(j); j += 1 }
        val inv = if (norm == 0) 0f else (1.0 / math.sqrt(norm)).toFloat
        j = 0
        while (j < dim) { v(j) *= inv; j += 1 }
        (r.doc_id, v.toSeq)
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
