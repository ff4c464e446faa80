package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the calibration & shrinkage wave (q374–q375):
  * the minimax isotonic fit against an actual PAV stack, and the
  * James–Stein laws (factor range, contraction toward the grand mean,
  * brute-forced hyperparameters).
  */
class CalibrateOpsSpec extends SparkTestBase {

  test("q374: minimax grid equals the PAV stack algorithm; monotone; mass-preserving") {
    val rows = CalibrateOps.q374IsotonicCalibration.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("bin"))
    assert(rows.length >= 3)
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.sliding(2).forall(p => p.length < 2 || p(0) <= p(1) + 1e-9),
      s"isotonic fit not monotone: ${iso.mkString(",")}")
    // classic PAV stack on the same (n, y_rate) sequence, blocks expanded
    // back to per-bin values
    val ns = rows.map(_.getAs[Long]("n_b").toDouble)
    val raw = rows.map(_.getAs[Double]("y_rate"))
    val pavExpanded = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Double]
      val stack2 = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Int)]
      for (i <- raw.indices) {
        var (w, v, c) = (ns(i), raw(i), 1)
        while (stack2.nonEmpty && stack2.last._2 >= v - 1e-15) {
          val (w2, v2, c2) = stack2.remove(stack2.length - 1)
          v = (v * w + v2 * w2) / (w + w2); w += w2; c += c2
        }
        stack2 += ((w, v, c))
      }
      stack2.foreach { case (_, v, c) => out ++= Seq.fill(c)(v) }
      out.toSeq
    }
    iso.zip(pavExpanded).zipWithIndex.foreach { case ((got, exp), i) =>
      assert(math.abs(got - exp) < 1e-5, s"bin $i: minimax $got != PAV $exp")
    }
    // mass preservation: Σ n·iso = Σ n·raw (within the published rounding)
    val massIso = rows.map(r => r.getAs[Long]("n_b") * r.getAs[Double]("iso_rate")).sum
    val massRaw = rows.map(r => r.getAs[Long]("n_b") * r.getAs[Double]("y_rate")).sum
    assert(math.abs(massIso - massRaw) < 1e-2 * massRaw + 1.0)
  }

  test("q375: shrink factor in [0,1], all means contract toward the grand mean") {
    val rows = CalibrateOps.q375JamesStein.fn(spark, sfDir).collect()
    assert(rows.length >= 4, "James-Stein needs m >= 4 sources")
    val c = rows.head.getAs[Double]("shrink_factor")
    assert(c >= 0.0 && c <= 1.0, s"shrink factor $c outside [0,1]")
    assert(rows.map(_.getAs[Double]("shrink_factor")).distinct.length == 1,
      "shrink factor must be common to all sources")
    // brute-force the hyperparameters
    val data = Tables(spark, sfDir).documents
      .select(col("source"), col("n_chars")).collect()
      .map(r => (r.getString(0), r.getLong(1).toDouble))
    val bySrc = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val means = bySrc.view.mapValues(xs => xs.sum / xs.length).toMap
    val grand = means.values.sum / means.size
    val se2bar = bySrc.map { case (_, xs) =>
      val m = xs.sum / xs.length
      (xs.map(x => (x - m) * (x - m)).sum / (xs.length - 1)) / xs.length
    }.sum / bySrc.size
    val ssDev = means.values.map(v => (v - grand) * (v - grand)).sum
    val expC = math.max(0.0, 1.0 - (means.size - 3) * se2bar / ssDev)
    assert(math.abs(c - expC) < 1e-4, s"shrink factor $c != brute-forced $expC")
    rows.foreach { r =>
      val raw = r.getAs[Double]("raw_mean")
      val js = r.getAs[Double]("js_mean")
      // contraction: js sits between raw and the grand mean
      assert((js - raw) * (grand - raw) >= -1e-6,
        s"${r.getAs[String]("source")}: js $js moved away from grand $grand vs raw $raw")
      assert(math.abs(js - grand) <= math.abs(raw - grand) + 1e-6)
    }
  }
}
