package graft.ops

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * payloads plus typed metadata, with decode / feature-extraction staged
  * as partition-wise transforms over a typed Dataset.
  *
  * The actual media codecs are STUBBED (this container has no image or
  * audio libraries): [[MediaDecoder.decodeStub]] is a deterministic fake
  * that derives "decoded" properties from an md5 of the payload bytes.
  * Everything around the stub — the binary column handling, the case
  * class schema, the `mapPartitions` batch shape (one decoder instance
  * per partition, the Scala analog of a pandas-UDF iterator), the
  * partitioning — is real and tested, so swapping a real codec into
  * `decodeStub` changes no plumbing.
  *
  * At 100 TB: payloads dominate row size, so the decode pass is a
  * narrow map with no shuffle; metadata-only downstream queries prune
  * the binary column at the parquet scan (columnar projection), which
  * is the entire point of carrying media as a column rather than files.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], media_type: String)
  final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
                             width: Long, height: Long)

  object MediaDecoder {
    /** Deterministic fake decode: md5-derived pseudo-dimensions.
      * Mirrors exactly the SQL the oracle runs, so the full
      * binary→metadata path is value-checked end-to-end.
      */
    def decodeStub(payload: Array[Byte]): (Long, Long) = {
      val md = MessageDigest.getInstance("MD5")
      val hex = md.digest(payload).take(4).map("%02x".format(_)).mkString
      val h = java.lang.Long.parseLong(hex, 16)
      (64L + h % 512L, 64L + (h / 512L) % 512L)
    }
  }

  /** The media table: documents' text bytes standing in as payloads,
    * with a deterministic modality assignment.
    */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    documents(s, dir)
      .select($"doc_id",
        $"text".cast("binary").as("payload"),
        when($"n_chars" % 3 === 0, "image")
          .when($"n_chars" % 3 === 1, "audio")
          .otherwise("video").as("media_type"))
      .as[MediaRow]
  }

  /** Decode pass: one decoder instance per partition (the expensive
    * model/codec init happens once per partition, not per row — U3's
    * lazy-singleton pattern in Dataset form).
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = MediaDecoder.decodeStub(r.payload)
        MediaMeta(r.doc_id, r.media_type, r.payload.length.toLong, w, h)
      }
    }
  }

  /** Oracle-checked query: full binary→decode→metadata pipeline. */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeAll(mediaTable(s, dir)).toDF().orderBy($"doc_id")
  }

  /** Frame sampling for "video" payloads: every 1000th byte offset, up
    * to 8 frames, emitted one row per frame with a deterministic
    * stub-"decoded" frame hash. The generate is a narrow explode of a
    * bounded sequence — per-row fanout is capped, so the pass stays
    * shuffle-free at any corpus size.
    */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeAll(mediaTable(s, dir)).toDF()
      .filter($"media_type" === "video")
      .select($"doc_id", $"n_bytes",
        explode(expr("sequence(0, least(cast((n_bytes - 1) / 1000 as int), 7))"))
          .as("frame_idx"))
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        ($"frame_idx" * 1000).cast("long").as("byte_offset"))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Resize planning for image payloads: fit the decoded dimensions
    * into a 256-px box preserving aspect ratio — pure arithmetic on the
    * metadata, no payload touch, so the planner can run it from the
    * metadata columns alone (binary column pruned at the scan).
    */
  def resizePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeAll(mediaTable(s, dir)).toDF()
      .filter($"media_type" === "image")
      .withColumn("scale", lit(256.0) / greatest($"width", $"height"))
      .select($"doc_id", $"width", $"height",
        floor($"width" * $"scale").cast("long").as("out_w"),
        floor($"height" * $"scale").cast("long").as("out_h"))
      .orderBy($"doc_id")
  }

  /** Metadata-only aggregate over the decoded stream — the query shape
    * where column pruning pays off at scale.
    */
  def mediaStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    decodeAll(mediaTable(s, dir)).toDF()
      .groupBy($"media_type")
      .agg(count(lit(1)).as("n"),
           sum($"n_bytes").as("total_bytes"),
           max($"width").as("max_width"),
           min($"height").as("min_height"))
      .orderBy($"media_type")
  }
}
