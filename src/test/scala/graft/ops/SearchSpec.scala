package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contracts for the search/indexing wave. */
class SearchSpec extends SparkTestBase {

  test("q150: every phrase hit really contains the phrase, counts match regex") {
    val hits = graft.SparkEntry.queries("q150_phrase_search")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = Tables(spark, sfDir).documents
      .select(col("doc_id"),
        size(expr("regexp_extract_all(lower(text), 'table\\\\W+hash', 0)"))
          .cast("long").as("n"))
      .filter(col("n") > 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hits.keySet == docs.keySet,
      s"phrase-index hits ${hits.keySet.size} docs, regex finds ${docs.keySet.size}")
    hits.foreach { case (id, n) => assert(n == docs(id), s"doc $id count") }
  }

  test("q151: banded Hamming join equals brute force (recall 1.0 by pigeonhole)") {
    val banded = graft.SparkEntry.queries("q151_simhash_neighbors")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sigs = Dedup.q29Simhash.fn(spark, sfDir)
      .select(col("doc_id"), col("sig")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val brute = (for {
      (ia, sa) <- sigs; (ib, sb) <- sigs if ia < ib
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (ia, ib, h.toLong)).toSet
    assert(banded == brute,
      s"banded ${banded.size} pairs vs brute ${brute.size}")
  }

  test("q152: ten buckets, ordered non-overlapping ranges, depths near n/10") {
    val rows = graft.SparkEntry.queries("q152_equidepth_histogram")(spark, sfDir)
      .collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).sameElements(0L until 10L))
    val total = rows.map(_.getLong(1)).sum
    rows.foreach { r =>
      assert(r.getLong(1) >= total / 20 && r.getLong(1) <= total / 5,
        s"bucket ${r.getLong(0)} depth ${r.getLong(1)} of $total")
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) <= b.getDouble(2),
        s"bucket ${a.getLong(0)} hi overlaps ${b.getLong(0)} lo")
    }
  }
}
