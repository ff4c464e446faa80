package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the l-diversity wave (q403): entropy and
  * distinct-l are replayed per group, and the information-theoretic
  * dominance law holds (entropy-l implies distinct-l, never converse).
  */
class LDiversityOpsSpec extends SparkTestBase {

  test("q403: group entropies match replay; entropy-l implies distinct-l") {
    val rows = LDiversityOps.q403LDiversity.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val h = r.getAs[Double]("entropy")
      val l = r.getAs[Long]("distinct_l")
      assert(h <= math.log(l.toDouble) + 1e-6, "H bounded by ln(distinct)")
      assert(r.getAs[Long]("k") >= l)
      // the strict direction: entropy-l3 passing forces distinct-l3
      if (r.getAs[Boolean]("meets_entropy_l3"))
        assert(r.getAs[Boolean]("meets_distinct_l3"))
    }
    // replay one group end-to-end
    val t = Tables(spark, sfDir)
    val sample = rows.head
    val data = t.customer.join(t.nation,
        col("c_nationkey") === col("n_nationkey"))
      .where(col("c_mktsegment") === sample.getAs[String]("segment") &&
        col("n_name") === sample.getAs[String]("nation"))
      .select(col("c_acctbal")).collect().map(_.getDouble(0))
    val bands = data.map(v =>
      if (v < 0) "debt" else if (v < 3000) "low"
      else if (v < 7000) "mid" else "high")
    val byBand = bands.groupBy(identity).view.mapValues(_.length).toMap
    assert(sample.getAs[Long]("k") == data.length.toLong)
    assert(sample.getAs[Long]("distinct_l") == byBand.size.toLong)
    val h = byBand.values.map { c =>
      val p = c.toDouble / data.length; -p * math.log(p)
    }.sum
    assert(math.abs(sample.getAs[Double]("entropy") - h) < 1e-4)
  }
}
