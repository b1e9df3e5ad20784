package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: opaque `binary` payloads + typed metadata, with the
  * decode / feature-extract step stubbed deterministically (image/audio
  * codecs aren't in this container — the Spark-side plumbing is the real
  * deliverable: schema, batched per-partition execution, partitioning).
  *
  * Two execution shapes:
  *  1. Expression-level metadata extraction (`metadata`) — codegen'd, used
  *     by the oracle-checked query.
  *  2. `decodeBatched` — the mapPartitions shape a real decoder plugs into
  *     (the Scala analogue of a Pandas-UDF-over-mapInPandas pipeline):
  *     rows stream through per partition, the decoder sees a whole
  *     iterator so it can amortize codec init, and output is a typed
  *     Dataset. The stub "decode" derives deterministic fake
  *     width/height/frames from the payload bytes.
  */
object Multimodal {

  /** Payload column: the fixture documents' text as binary (stand-in for
    * real image/audio bytes).
    */
  def withPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", col(textCol).cast("binary"))

  /** Expression-level metadata: byte length, lowercase-hex header preview,
    * deterministic fake decode dims. Everything integer/string-exact.
    */
  def metadata(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    withPayload(docs, textCol).select(
      col(idCol).as("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      lower(hex(substring(col("payload"), 1, 8))).as("header_hex"),
      (octet_length(col("payload")) % 640 + 1).as("width"),
      (octet_length(col("payload")) * 7 % 480 + 1).as("height"),
      (octet_length(col("payload")) % 30 + 1).as("n_frames"),
      when(octet_length(col("payload")) % 3 === 0, "img")
        .when(octet_length(col("payload")) % 3 === 1, "audio")
        .otherwise("video").as("media_type"))

  final case class DecodedMedia(
      doc_id: Long, n_bytes: Int, width: Int, height: Int,
      n_frames: Int, checksum: Long)

  /** Batched per-partition decode plumbing. `decodeOne` is the pluggable
    * codec; the default stub derives deterministic values from the bytes
    * (a real impl would decode pixels/samples here). Repartition upstream
    * by size/key if payloads are skewed; each partition is one codec
    * session.
    */
  def decodeBatched(
      spark: SparkSession, withPayloadDf: DataFrame, idCol: String,
      decodeOne: Array[Byte] => (Int, Int, Int) = stubDecode): Dataset[DecodedMedia] = {
    import spark.implicits._
    withPayloadDf.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition "codec init" happens once here
        rows.map { case (id, bytes) =>
          val (w, h, f) = decodeOne(bytes)
          DecodedMedia(id, bytes.length, w, h, f,
            bytes.foldLeft(0L)((a, b) => a * 31 + (b & 0xff)))
        }
      }
  }

  /** Deterministic fake decoder: dims from byte stats (no codec libs in
    * the container; marks the seam where a real decoder goes).
    */
  def stubDecode(bytes: Array[Byte]): (Int, Int, Int) =
    (bytes.length % 640 + 1, bytes.length * 7 % 480 + 1, bytes.length % 30 + 1)

  /** Frame sampling: every `stride`-th frame index per video payload,
    * exploded to (doc_id, frame_idx, frame_id) rows — the fan-out shape of
    * a video-frame extraction stage (each output row is one decode-work
    * unit downstream). Expression-level and exact: `sequence` explode, a
    * deterministic per-frame fingerprint, no UDF; the frame PIXEL decode
    * belongs in [[decodeBatched]]'s seam, not here. Fan-out is bounded by
    * n_frames/stride per row — partition counts scale with output, not
    * input.
    */
  def frameSample(docs: DataFrame, idCol: String, textCol: String,
      stride: Int): DataFrame =
    metadata(docs, idCol, textCol)
      .filter(col("media_type") === "video")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .withColumn("frame_id",
        conv(substring(md5(concat_ws(":", col("doc_id"), col("frame_idx"))), 1, 8), 16, 10)
          .cast("long"))

  final case class ResizedMedia(
      doc_id: Long, src_width: Int, src_height: Int,
      width: Int, height: Int, payload: Array[Byte])

  /** Resize plumbing: batched per-partition transform emitting a
    * target-dims payload per media row (aspect-preserving fit inside
    * `maxW`×`maxH`, never upscaled). The pixel resample is the stub —
    * deterministic byte subsampling proportional to the area ratio — but
    * the pipeline shape is the deliverable: typed in/out schema, one
    * library/session init per partition, output directly re-ingestable by
    * the decode/feature stages (same `payload` contract).
    */
  def resizeBatched(
      spark: SparkSession, withPayloadDf: DataFrame, idCol: String,
      maxW: Int, maxH: Int,
      resizeOne: (Array[Byte], Int, Int, Int, Int) => Array[Byte] = stubResize)
      : Dataset[ResizedMedia] = {
    import spark.implicits._
    withPayloadDf.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          val (sw, sh, _) = stubDecode(bytes)
          // aspect-preserving integer fit, never upscale (scale in per-mille)
          val scale = math.min(1000L, math.min(maxW * 1000L / sw, maxH * 1000L / sh))
          val (w, h) = (math.max(1, (sw * scale / 1000).toInt),
            math.max(1, (sh * scale / 1000).toInt))
          ResizedMedia(id, sw, sh, w, h, resizeOne(bytes, sw, sh, w, h))
        }
      }
  }

  /** Deterministic fake resampler: keeps every k-th byte so payload size
    * tracks the area ratio (a real impl decodes + resamples pixels here).
    */
  def stubResize(bytes: Array[Byte], sw: Int, sh: Int, w: Int, h: Int): Array[Byte] = {
    val keepRatio = math.max(1L, sw.toLong * sh / (w.toLong * h))
    bytes.zipWithIndex.collect { case (b, i) if i % keepRatio == 0 => b }
  }

  final case class MediaFeatures(doc_id: Long, embedding: Array[Float])

  /** Feature-extraction seam: per-partition batched "model inference"
    * emitting a fixed-dim embedding per payload — the plumbing (schema,
    * batch shape, amortized per-partition init) that a real vision/audio
    * encoder plugs into; output is directly consumable by the
    * [[Similarity]] ANN/near-dup operators (same `embedding` column
    * contract). Stub: deterministic rolling-hash features.
    */
  def extractFeatures(
      spark: SparkSession, withPayloadDf: DataFrame, idCol: String,
      dim: Int = 8,
      embedOne: (Array[Byte], Int) => Array[Float] = stubEmbed): Dataset[MediaFeatures] = {
    import spark.implicits._
    withPayloadDf.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // per-partition model/session init amortizes here
        rows.map { case (id, bytes) => MediaFeatures(id, embedOne(bytes, dim)) }
      }
  }

  /** Deterministic fake encoder (rolling hash per dimension, unit-free). */
  def stubEmbed(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val d = i % dim
      acc(d) = acc(d) * 31 + (bytes(i) & 0xff)
      i += 1
    }
    acc.map(v => ((v % 2000L) - 1000L) / 1000.0f)
  }
}
