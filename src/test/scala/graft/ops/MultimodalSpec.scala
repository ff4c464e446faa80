package graft.ops

import graft.SparkTestBase
import graft.ops.Multimodal.ImageCodec
import org.apache.spark.sql.functions._

/** The multimodal path runs a REAL codec: every payload is a genuine PNG
  * (magic-byte checked) produced and decoded by javax.imageio, and the
  * lossless round-trip means frame luminance sums equal source byte sums
  * exactly — which is what lets the DuckDB oracle verify q32/q53. */
class MultimodalSpec extends SparkTestBase {

  test("property: PNG encode/decode round-trip preserves frame sums and counts") {
    val rnd = new scala.util.Random(42)
    val sizes = Seq(0, 1, 255, 256, 257, 511, 512, 513, 1000, 4096) ++
      (1 to 10).map(_ => rnd.nextInt(5000))
    sizes.foreach { n =>
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val png = ImageCodec.encodePng(bytes)
      val frames = ImageCodec.decodeFrames(png, n).toSeq
      val expFrames = (n + 255) / 256
      assert(frames.size == expFrames, s"n=$n frame count")
      frames.foreach { case (i, fb, s) =>
        val lo = i * 256
        val hi = math.min(lo + 256, n)
        assert(fb == hi - lo, s"n=$n frame=$i bytes")
        val expSum = bytes.slice(lo, hi).foldLeft(0L)((a, b) => a + (b & 0xff))
        assert(s == expSum, s"n=$n frame=$i luminance sum")
      }
    }
  }

  test("property: WAV encode/decode round-trip preserves window sums and peaks") {
    import graft.ops.Multimodal.AudioCodec
    val rnd = new scala.util.Random(7)
    val sizes = Seq(0, 1, 255, 256, 257, 512, 1000) ++
      (1 to 10).map(_ => rnd.nextInt(5000))
    sizes.foreach { n =>
      val bytes = Array.fill(n)(rnd.nextInt(256).toByte)
      val wav = AudioCodec.encodeWav(bytes)
      // real RIFF/WAVE container, not a raw buffer
      assert(new String(wav.take(4), "US-ASCII") == "RIFF", s"n=$n magic")
      assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE", s"n=$n wave")
      val wins = AudioCodec.decodeWindows(wav).toSeq
      assert(wins.size == (if (n == 0) 0 else (n + 255) / 256), s"n=$n windows")
      wins.foreach { case (i, len, s, p) =>
        val lo = i * 256
        val slice = bytes.slice(lo, math.min(lo + 256, n))
        assert(len == slice.length)
        assert(s == slice.foldLeft(0L)((a, b) => a + (b & 0xff)), s"n=$n win=$i sum")
        assert(p == slice.count(b => (b & 0xff) > 96).toLong, s"n=$n win=$i peaks")
      }
    }
  }

  test("payloads are real PNG files (magic bytes), not raw buffers") {
    val png = ImageCodec.encodePng("hello multimodal world".getBytes("UTF-8"))
    val magic = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    assert(png.take(8).sameElements(magic), "missing PNG signature")
    // and the codec actually compresses/structures: a PNG is never the
    // identity of its input
    assert(!png.sameElements("hello multimodal world".getBytes("UTF-8")))
  }

  test("pipeline: toMedia produces binary PNG payloads with byte-count metadata") {
    val media = Multimodal.toMedia(Tables(spark, sfDir).documents.limit(20))
    val rows = media.select(col("doc_id"), col("payload"), col("n_bytes")).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val payload = r.getAs[Array[Byte]]("payload")
      assert(payload.length > 8 && (payload(1) & 0xff) == 0x50, "not a PNG payload")
      assert(r.getAs[Int]("n_bytes") >= 0)
    }
  }
}
