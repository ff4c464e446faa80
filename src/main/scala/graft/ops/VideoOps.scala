package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Video-modality plumbing: shot-boundary keyframe selection over a
  * frame sequence. The "video" is the real PNG payload the multimodal
  * ingest stage builds (Multimodal.ImageCodec — one 256-byte raster row
  * per FRAME, decoded with ImageIO, losslessly), read as a temporal
  * luminance signal; a frame is a KEYFRAME when its mean luminance jumps
  * more than a threshold against the previous frame — the classic
  * intensity-difference shot detector, which is exactly the
  * frame-sample-then-diff shape a real video curation pipeline runs
  * (decode → per-frame feature → temporal diff → sample). The codec is
  * real; only the sensor is synthetic (reference: overseer's ETL family,
  * doc/guide/Introduction.md:3; q32/q53 are the image legs, q146 audio).
  *
  * Scale shape: decode is partition-local (mapPartitions, one ImageIO
  * read per payload); the temporal diff is a per-doc lag window —
  * frame-mass linear, keyed by doc for the downstream sampler.
  *
  * Exactness: mean luminance in exact milli-units (1000·sum DIV bytes,
  * BIGINT); the PNG round-trip is lossless so the oracle recomputes
  * frame sums directly from the source bytes.
  */
object VideoOps {

  private val JumpMilli = 3000L // ≥3 byte-units of mean shift = new shot

  val q553VideoKeyframes: QueryDef = QueryDef(
    "q553_video_keyframes",
    (s, dir) => {
      val frames = Multimodal.extractFrames(
        Multimodal.toMedia(Tables(s, dir).documents))
        .select(col("doc_id"), col("frame_id").cast("long").as("frame_id"),
          expr("1000 * feature DIV frame_bytes").as("mean_milli"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_id"))
      val flagged = frames
        .withColumn("prev", lag(col("mean_milli"), 1).over(w))
        .withColumn("kf",
          (col("prev").isNull ||
            abs(col("mean_milli") - col("prev")) > JumpMilli).cast("long"))
      flagged.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(col("kf")).as("n_keyframes"),
          sum(when(col("kf") === 1, col("frame_id")).otherwise(0L))
            .as("kf_id_sum"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH f AS (
        SELECT doc_id,
          CAST(u.k AS BIGINT) AS frame_id,
          -- byte sum and length of the k-th 256-char frame (ASCII-safe
          -- synthetic prose: octet == char, PNG round-trip lossless)
          CAST(list_sum(list_transform(
            range(256 * u.k + 1,
                  LEAST(strlen(text), 256 * (u.k + 1)) + 1),
            i -> ord(text[i]))) AS BIGINT) AS fsum,
          CAST(LEAST(strlen(text), 256 * (u.k + 1)) - 256 * u.k AS BIGINT)
            AS fbytes
        FROM documents,
          UNNEST(range(0, CAST(ceil(strlen(text) / 256.0) AS BIGINT)))
            AS u(k)),
      m AS (
        SELECT doc_id, frame_id, 1000 * fsum // fbytes AS mean_milli
        FROM f),
      flagged AS (
        SELECT doc_id, frame_id,
          CASE WHEN prev IS NULL
            OR abs(mean_milli - prev) > $JumpMilli THEN 1 ELSE 0 END AS kf
        FROM (SELECT *, LAG(mean_milli, 1) OVER (PARTITION BY doc_id
            ORDER BY frame_id) AS prev FROM m))
      SELECT doc_id,
        CAST(COUNT(*) AS BIGINT) AS n_frames,
        CAST(SUM(kf) AS BIGINT) AS n_keyframes,
        CAST(SUM(CASE WHEN kf = 1 THEN frame_id ELSE 0 END) AS BIGINT)
          AS kf_id_sum
      FROM flagged GROUP BY 1 ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q553VideoKeyframes)
}
