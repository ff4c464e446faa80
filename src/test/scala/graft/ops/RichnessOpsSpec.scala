package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the species-richness wave (q414): estimators are
  * replayed from a driver-side type census and the estimator laws hold
  * (every richness estimate ≥ observed; coverage in (0,1]).
  */
class RichnessOpsSpec extends SparkTestBase {

  test("q414: census replay and richness laws") {
    val r = RichnessOps.q414SpeciesRichness.fn(spark, sfDir).head()
    val sObs = r.getAs[Long]("s_obs")
    assert(sObs > 10)
    assert(r.getAs[Double]("chao1") >= sObs)
    assert(r.getAs[Double]("chao2") >= sObs)
    assert(r.getAs[Double]("jack1") >= sObs)
    val cov = r.getAs[Double]("coverage")
    assert(cov > 0 && cov <= 1)

    val census = Tables(spark, sfDir).documents
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("f"), countDistinct(col("doc_id")).as("q"))
      .collect().map(x => (x.getAs[Long]("f"), x.getAs[Long]("q")))
    val f1 = census.count(_._1 == 1L)
    val f2 = census.count(_._1 == 2L)
    val q1 = census.count(_._2 == 1L)
    val q2 = census.count(_._2 == 2L)
    val n = census.map(_._1).sum
    val m = Tables(spark, sfDir).documents.select(col("doc_id")).distinct().count()
    assert(r.getAs[Long]("f1") == f1 && r.getAs[Long]("f2") == f2)
    assert(r.getAs[Long]("q1") == q1 && r.getAs[Long]("q2") == q2)
    assert(r.getAs[Long]("n_tokens") == n && census.length == sObs)
    def r4(x: Double) = BigDecimal(x).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("chao1") ==
      r4(sObs + f1.toDouble * (f1 - 1) / (2.0 * (f2 + 1))))
    assert(r.getAs[Double]("chao2") ==
      r4(sObs + (m - 1).toDouble / m * q1.toDouble * (q1 - 1) / (2.0 * (q2 + 1))))
    assert(r.getAs[Double]("jack1") == r4(sObs + q1.toDouble * (m - 1) / m))
  }
}
