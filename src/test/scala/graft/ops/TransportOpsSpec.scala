package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the Wasserstein wave (q392): the binned W1 is
  * recomputed brute-force from the raw documents, and metric laws hold.
  */
class TransportOpsSpec extends SparkTestBase {

  test("q392: W1 matches a brute-force CDF replay and is a metric") {
    val rows = TransportOps.q392WassersteinDrift.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Double]("w1_norm") >= 0.0)
      assert(r.getAs[Double]("w1_norm") <= 1.0 + 1e-9,
        "normalized W1 bounded by 1")
    }

    val docs = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val maxc = docs.map(_._2).max
    def bins(xs: Seq[Long]): Array[Double] = {
      val c = new Array[Long](20)
      xs.foreach(x => c((x * 20 / (maxc + 1)).toInt) += 1)
      val cum = c.scanLeft(0L)(_ + _).drop(1)
      cum.map(_.toDouble / xs.length).toArray
    }
    val gcdf = bins(docs.map(_._2).toSeq)
    docs.groupBy(_._1).foreach { case (src, ds) =>
      val scdf = bins(ds.map(_._2).toSeq)
      val w1 = scdf.zip(gcdf).map { case (a, b) =>
        BigDecimal(math.abs(a - b)).setScale(9,
          BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble / 20.0
      val got = rows.find(_.getAs[String]("source") == src).get
      assert(math.abs(got.getAs[Double]("w1_norm") - w1) < 1e-5,
        s"$src: ${got.getAs[Double]("w1_norm")} vs replay $w1")
    }
  }
}
