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
  case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int,
                       n_frames: Int, mean_byte: Double)

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
        MediaMeta(r.doc_id, r.payload.length, w, hgt, f, mean)
      }
    }
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
