package graft.ops

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, processed per-partition in batches.
  *
  * The payloads are REAL images: each document's bytes are rendered into a
  * grayscale PNG (a genuine compressed codec format) and the feature
  * extraction runs a real `javax.imageio` decode — full pipeline:
  * binary payload column + metadata → per-partition batched decode →
  * frame explode → per-document aggregation. PNG is lossless, so the
  * decoded luminance sums equal the source byte sums and the DuckDB
  * oracle can verify the whole round-trip exactly.
  *
  * At scale: payloads never leave their input partition until after
  * feature extraction reduces them to small per-frame vectors; the encode
  * and decode stages pipeline inside one stage (no shuffle between them).
  */
object Multimodal {

  /** Pure-JDK image codec (javax.imageio ships with the JRE — no
    * dependencies). Layout: a document's bytes fill a width-256 grayscale
    * raster row-major, one image row per 256-byte frame, zero-padded in
    * the final row; pixel luminance == source byte value, losslessly
    * preserved by PNG. */
  object ImageCodec {
    ImageIO.setUseCache(false) // stream in memory, not via temp files
    val frameWidth = 256

    /** Render `bytes` as a real PNG payload (one image row per frame). */
    def encodePng(bytes: Array[Byte]): Array[Byte] = {
      val w = frameWidth
      val h = math.max(1, (bytes.length + w - 1) / w)
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < bytes.length) {
        raster.setSample(i % w, i / w, 0, bytes(i) & 0xff)
        i += 1
      }
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }

    /** Real ImageIO decode → (frame_id, frame_bytes, luminance_sum) per
      * 256-pixel frame row. `nBytes` (ingest metadata) bounds the frame
      * count and the final frame's byte count; zero-padding contributes
      * nothing to the luminance sum, so sums are exact over source bytes. */
    def decodeFrames(png: Array[Byte], nBytes: Int): Iterator[(Int, Int, Long)] = {
      val img = ImageIO.read(new ByteArrayInputStream(png))
      val raster = img.getRaster
      val nFrames = (nBytes + frameWidth - 1) / frameWidth
      (0 until nFrames).iterator.map { y =>
        val fb = math.min(frameWidth, nBytes - frameWidth * y)
        var s = 0L
        var x = 0
        while (x < frameWidth) { s += raster.getSample(x, y, 0); x += 1 }
        (y, fb, s)
      }
    }
  }

  final case class MediaDoc(doc_id: Long, payload: Array[Byte], n_bytes: Int)
  final case class FrameFeature(doc_id: Long, frame_id: Int, frame_bytes: Int, feature: Long)

  /** Ingest stage: source bytes → real PNG payload + byte-count metadata,
    * batched per partition. */
  def toMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        MediaDoc(id, ImageCodec.encodePng(bytes), bytes.length)
      }).toDF()
  }

  /** Decode + feature-extract, batched per partition: one real ImageIO
    * decode per payload, one output row per frame. */
  def extractFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("n_bytes")).as[MediaDoc]
      .mapPartitions { docs =>
        docs.flatMap { d =>
          ImageCodec.decodeFrames(d.payload, d.n_bytes).map { case (i, fb, s) =>
            FrameFeature(d.doc_id, i, fb, s)
          }
        }
      }.toDF()
  }

  /** Multimodal pipeline over the documents table: binary PNG payload +
    * ingest metadata (source octet length, source sha256) → per-partition
    * ImageIO frame decode → per-doc feature aggregation. PNG is lossless,
    * so the oracle recomputes the decoded luminance sums from the source
    * text exactly. */
  val q32Multimodal: QueryDef = QueryDef(
    "q32_multimodal_features",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val meta = docs.select(
        col("doc_id"),
        octet_length(encode(col("text"), "UTF-8")).cast("long").as("payload_bytes"),
        sha2(encode(col("text"), "UTF-8"), 256).as("sha"))
      val feats = extractFrames(toMedia(docs))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_frames"),
             sum(col("feature")).as("byte_sum"))
      meta.join(feats, Seq("doc_id"))
        .select(col("doc_id"), col("payload_bytes"), col("sha"),
                col("n_frames"), col("byte_sum"))
    },
    // text is ASCII-safe synthetic prose: octet length == char length, and
    // the decoded luminance sum telescopes to the total byte sum of the
    // source (PNG round-trip is lossless).
    Some("""SELECT doc_id,
      CAST(strlen(text) AS BIGINT) AS payload_bytes,
      sha256(text) AS sha,
      CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_frames,
      CAST(list_sum(list_transform(range(1, strlen(text) + 1),
        i -> ord(text[i]))) AS BIGINT) AS byte_sum
      FROM documents"""))

  /** Frame-level output of the decode path: one row per decoded image row
    * ("frame") with its source byte count and luminance sum — the shape a
    * video pipeline hands to a downstream embedding stage. Oracle
    * recomputes every frame window byte-for-byte in SQL. */
  val q53FrameFeatures: QueryDef = QueryDef(
    "q53_frame_features",
    (s, dir) => {
      extractFrames(toMedia(Tables(s, dir).documents))
        .select(col("doc_id"), col("frame_id"), col("frame_bytes"), col("feature"))
    },
    Some("""SELECT doc_id, CAST(g.i AS INTEGER) AS frame_id,
        CAST(least(256, strlen(text) - 256 * g.i) AS INTEGER) AS frame_bytes,
        CAST(list_sum(list_transform(
          range(1, least(256, strlen(text) - 256 * g.i) + 1),
          j -> ord(substr(text, 256 * g.i + j, 1)))) AS BIGINT) AS feature
      FROM documents, (SELECT UNNEST(range(0, 100)) AS i) g
      WHERE g.i * 256 < strlen(text)"""))

  /** Pure-JDK audio codec (javax.sound.sampled ships with the JRE): a
    * document's bytes become 8-bit unsigned PCM samples at 8 kHz in a
    * real RIFF/WAVE container — sample value == source byte, losslessly
    * round-tripped, so the oracle can recompute every feature from the
    * source text. The second modality next to [[ImageCodec]]. */
  object AudioCodec {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    val windowSamples = 256
    private val fmt = new AudioFormat(
      AudioFormat.Encoding.PCM_UNSIGNED, 8000f, 8, 1, 1, 8000f, false)

    /** Render `bytes` as a real WAV payload. */
    def encodeWav(bytes: Array[Byte]): Array[Byte] = {
      val ais = new AudioInputStream(
        new ByteArrayInputStream(bytes), fmt, bytes.length.toLong)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }

    /** Real AudioSystem decode → per-256-sample window
      * (window_id, n_samples, sample_sum, n_peaks) where a peak is a
      * sample above 96 (in text terms: lowercase letters and beyond —
      * chosen so the signal is non-degenerate on prose). */
    def decodeWindows(wav: Array[Byte]): Iterator[(Int, Int, Long, Long)] = {
      val ais  = AudioSystem.getAudioInputStream(new ByteArrayInputStream(wav))
      val data = ais.readAllBytes()
      data.grouped(windowSamples).zipWithIndex.map { case (win, i) =>
        var s = 0L; var p = 0L; var j = 0
        while (j < win.length) {
          val v = win(j) & 0xff
          s += v; if (v > 96) p += 1
          j += 1
        }
        (i, win.length, s, p)
      }
    }
  }

  final case class AudioDoc(doc_id: Long, payload: Array[Byte])
  final case class AudioFeature(doc_id: Long, window_id: Int,
                                n_samples: Int, sample_sum: Long, n_peaks: Long)

  /** Audio modality end-to-end: encode each document's bytes as a real
    * WAV, decode it back through AudioSystem per partition, window the
    * samples, aggregate per document. Same plumbing contract as the
    * image path — binary column + typed features + batched
    * mapPartitions, nothing collects — with a genuine codec in the
    * middle, and the oracle recomputing every feature from source text
    * (the WAV round-trip is lossless).
    */
  val q146AudioFeatures: QueryDef = QueryDef(
    "q146_audio_features",
    (s, dir) => {
      val spark = s
      import spark.implicits._
      val media = Tables(s, dir).documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          AudioDoc(id, AudioCodec.encodeWav(bytes))
        })
      media.mapPartitions(_.flatMap { d =>
          AudioCodec.decodeWindows(d.payload).map { case (i, n, ss, np) =>
            AudioFeature(d.doc_id, i, n, ss, np)
          }
        }).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).cast("long").as("n_windows"),
             sum(col("sample_sum")).as("sample_sum"),
             sum(col("n_peaks")).as("n_peaks"))
    },
    Some("""SELECT doc_id,
        CAST(ceil(strlen(text) / 256.0) AS BIGINT) AS n_windows,
        CAST(list_sum(list_transform(range(1, strlen(text) + 1),
          i -> ord(text[i]))) AS BIGINT) AS sample_sum,
        CAST(len(list_filter(range(1, strlen(text) + 1),
          i -> ord(text[i]) > 96)) AS BIGINT) AS n_peaks
      FROM documents
      -- explicit contract: a zero-length document yields zero windows, so
      -- the Spark side (flatMap over windows + groupBy) emits NO row for
      -- it; the oracle filters the same docs out rather than emitting an
      -- n_windows=0 row the Spark side never produces
      WHERE strlen(text) > 0"""))

  val all: Seq[QueryDef] = Seq(q32Multimodal, q53FrameFeatures, q146AudioFeatures)
}
