package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contracts for the round-7 wave-D operators beyond the oracle compare. */
class WaveDSpec extends SparkTestBase {

  test("q135 SNM: one compare per row — pairs are adjacent, scored, above gate") {
    val rows = graft.SparkEntry.queries("q135_sorted_neighborhood")(
      spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty, "no near-dup pairs in the template-heavy fixture")
    rows.foreach { r =>
      assert(r.getLong(0) != r.getLong(1), "self-pair")
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0, s"gate violated: $j")
    }
  }

  test("q136 holdout: splits partition the corpus at ~90/5/5 and are stable") {
    val agg = graft.SparkEntry.queries("q136_holdout_split")(spark, sfDir)
    val total = Tables(spark, sfDir).documents.count()
    val bySplit = agg.groupBy(col("split"))
      .agg(sum(col("n_docs")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum == total, "splits do not partition the corpus")
    assert(bySplit("train").toDouble / total > 0.8, s"train share: $bySplit")
    assert(bySplit.keySet == Set("train", "validation", "test"))
    // determinism: a second evaluation assigns identically
    val again = graft.SparkEntry.queries("q136_holdout_split")(spark, sfDir)
    assert(agg.exceptAll(again).isEmpty && again.exceptAll(agg).isEmpty)
  }

  test("q137 Markov: outgoing probabilities sum to 1 per from-state") {
    val rows = graft.SparkEntry.queries("q137_markov_transitions")(spark, sfDir)
      .groupBy(col("from_type")).agg(sum(col("p")).as("tot")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
        s"${r.getString(0)}: Σp = ${r.getDouble(1)}")
    }
  }
}
