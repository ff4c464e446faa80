package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The real decode (image/audio codecs) is STUBBED — this container has no
  * media libraries — behind [[FakeDecoder]], a deterministic stand-in. The
  * Spark-side machinery is real: binary payload column, metadata struct,
  * per-partition batched processing via `mapPartitions` (the Scala analog
  * of a vectorized/batched UDF), frame-sample explode, and aggregation back
  * to per-document features. At scale: payloads never leave their input
  * partition until after feature extraction reduces them to small vectors.
  */
object Multimodal {

  /** STUB decoder: stands in for an image/audio decode. Deterministic:
    * "frames" are fixed-size byte windows; the "feature" per frame is a sum
    * over its bytes. Swap for a real codec by replacing this one object. */
  object FakeDecoder {
    val frameSize = 256
    def frames(payload: Array[Byte]): Iterator[(Int, Array[Byte])] =
      payload.grouped(frameSize).zipWithIndex.map { case (b, i) => (i, b) }
    def frameFeature(frame: Array[Byte]): Long =
      frame.foldLeft(0L)((acc, b) => acc + (b & 0xff))
  }

  final case class MediaDoc(doc_id: Long, payload: Array[Byte])
  final case class FrameFeature(doc_id: Long, frame_id: Int, frame_bytes: Int, feature: Long)

  /** Decode + feature-extract, batched per partition. */
  def extractFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload")).as[MediaDoc]
      .mapPartitions { docs =>
        docs.flatMap { d =>
          FakeDecoder.frames(d.payload).map { case (i, f) =>
            FrameFeature(d.doc_id, i, f.length, FakeDecoder.frameFeature(f))
          }
        }
      }.toDF()
  }

  /** Multimodal pipeline over the documents table, using its UTF-8 bytes as
    * the stand-in payload: binary column → metadata (octet length, sha256)
    * → per-partition frame decode → per-doc feature aggregation. Oracle
    * recomputes the same deterministic quantities in SQL. */
  val q32Multimodal: QueryDef = QueryDef(
    "q32_multimodal_features",
    (s, dir) => {
      val media = Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      val meta = media.select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("payload_bytes"),
        sha2(col("payload"), 256).as("sha"))
      val feats = extractFrames(media)
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_frames"),
             sum(col("feature")).as("byte_sum"))
      meta.join(feats, Seq("doc_id"))
        .select(col("doc_id"), col("payload_bytes"), col("sha"),
                col("n_frames"), col("byte_sum"))
    },
    // text is ASCII-safe synthetic prose: octet length == char length, and
    // the frame feature sum telescopes to the total byte sum of the payload.
    Some("""SELECT doc_id,
      CAST(strlen(text) AS BIGINT) AS payload_bytes,
      sha256(text) AS sha,
      CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames,
      CAST(list_sum(list_transform(range(1, strlen(text) + 1),
        i -> ord(text[i]))) AS BIGINT) AS byte_sum
      FROM documents"""))

  /** Frame-level output of the decode path: one row per sampled frame with
    * its byte count and feature — the shape a video/audio pipeline hands to
    * a downstream embedding stage. Oracle recomputes every frame window
    * byte-for-byte in SQL. */
  val q53FrameFeatures: QueryDef = QueryDef(
    "q53_frame_features",
    (s, dir) => {
      val media = Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      extractFrames(media)
        .select(col("doc_id"), col("frame_id"), col("frame_bytes"), col("feature"))
    },
    Some("""SELECT doc_id, CAST(g.i AS INTEGER) AS frame_id,
        CAST(least(256, strlen(text) - 256 * g.i) AS INTEGER) AS frame_bytes,
        CAST(list_sum(list_transform(
          range(1, least(256, strlen(text) - 256 * g.i) + 1),
          j -> ord(substr(text, 256 * g.i + j, 1)))) AS BIGINT) AS feature
      FROM documents, (SELECT UNNEST(range(0, 100)) AS i) g
      WHERE g.i * 256 < strlen(text)"""))

  val all: Seq[QueryDef] = Seq(q32Multimodal, q53FrameFeatures)
}
