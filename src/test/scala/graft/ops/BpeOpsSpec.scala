package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the BPE wave (q385): the whole 10-round greedy
  * trace is replayed by an independent in-memory BPE trainer, and the
  * compression bookkeeping laws hold.
  */
class BpeOpsSpec extends SparkTestBase {

  test("q385: trace equals an independent BPE trainer; compression bookkeeping holds") {
    val rows = BpeOps.q385BpeTrain.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("merge_round"))
    assert(rows.length == 10)
    // bookkeeping: symbols shrink by at most the counted pairs, never grow
    rows.sliding(2).foreach { p =>
      if (p.length == 2) {
        val drop = p(0).getAs[Long]("symbols_after") - p(1).getAs[Long]("symbols_after")
        assert(drop > 0, "a merge must shrink the corpus")
        assert(drop <= p(1).getAs[Long]("pair_count"),
          "cannot merge more occurrences than counted")
      }
    }
    // independent trainer over the same weighted word types
    val words = scala.collection.mutable.Map.empty[Vector[String], Long]
    Tables(spark, sfDir).documents.select(col("text")).collect().foreach { r =>
      val m = java.util.regex.Pattern.compile("\\w+").matcher(r.getString(0).toLowerCase)
      while (m.find()) {
        val w = m.group.map(_.toString).toVector
        words(w) = words.getOrElse(w, 0L) + 1
      }
    }
    var vocab = words.toMap
    rows.foreach { row =>
      // weighted census of ALL adjacent pairs (overlapping included)
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).foreach { p =>
          if (p.length == 2) counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      val ((bx, by), bc) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }
      assert(row.getAs[String]("merged_pair") == s"$bx+$by",
        s"round ${row.getAs[Long]("merge_round")}: merged " +
          s"${row.getAs[String]("merged_pair")} != trainer $bx+$by")
      assert(row.getAs[Long]("pair_count") == bc)
      // leftmost non-overlapping merge
      vocab = vocab.toSeq.map { case (syms, c) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == bx && syms(i + 1) == by) {
            out += bx + by; i += 2
          } else { out += syms(i); i += 1 }
        }
        (out.result(), c)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val total = vocab.map { case (syms, c) => syms.length * c }.sum
      assert(row.getAs[Long]("symbols_after") == total,
        s"round ${row.getAs[Long]("merge_round")}: symbols ${row.getAs[Long]("symbols_after")} != $total")
    }
  }
}
