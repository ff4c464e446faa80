package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q492 semantics: the relational gaps-and-islands pipeline must equal a
  * literal per-document scan — for every reported doc, max_dup_span is
  * the longest run of corpus-duplicated 8-shingles plus 7, and the
  * report is the true global top-20. */
class SuffixDupOpsSpec extends SparkTestBase {

  private val W = 8

  test("q492: join-shaped spans == literal corpus walk; top-20 exact") {
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

    // literal truth: global shingle counts, then per-doc longest dup run
    val shingles = docs.flatMap { case (id, _, text) =>
      val ts = text.split(" ", -1)
      if (ts.length < W) Array.empty[(Long, Int, String)]
      else Array.tabulate(ts.length - W + 1)(i =>
        (id, i, ts.slice(i, i + W).mkString(" ")))
    }
    val occ = shingles.groupBy(_._3).view.mapValues(_.length).toMap
    val truth = docs.flatMap { case (id, src, text) =>
      val ts = text.split(" ", -1)
      if (ts.length < W) None
      else {
        val dup = (0 to ts.length - W).map(i =>
          occ(ts.slice(i, i + W).mkString(" ")) > 1)
        // longest run of true + number of runs
        var best = 0; var cur = 0; var runs = 0L
        dup.foreach { d =>
          if (d) { cur += 1; if (cur == 1) runs += 1; best = math.max(best, cur) }
          else cur = 0
        }
        if (best == 0) None else Some((id, src, (best + W - 1).toLong, runs))
      }
    }.sortBy { case (id, _, span, _) => (-span, id) }.take(20)

    val got = SuffixDupOps.q492DupSpans.fn(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("max_dup_span"), r.getAs[Long]("n_dup_runs")))
    assert(got.toSeq == truth.toSeq,
      s"top-20 mismatch:\ngot   ${got.mkString(", ")}\ntruth ${truth.mkString(", ")}")
  }
}
