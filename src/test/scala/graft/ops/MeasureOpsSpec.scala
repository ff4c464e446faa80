package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the estimation & measurement wave (q358–q360):
  * KMV's exact-below-capacity and accuracy contracts, Yule's K laws and
  * a brute-forced source, and the Murphy identity Brier = REL − RES + UNC.
  */
class MeasureOpsSpec extends SparkTestBase {

  test("q358: KMV is exact below capacity, positive, and within sketch error above it") {
    val rows = MeasureOps.q358KmvDistinct.fn(spark, "/root/testdata/sf0.01").collect()
    assert(rows.nonEmpty)
    // exact NDV recomputed independently
    val exact = Tables(spark, "/root/testdata/sf0.01").events
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      val n = r.getAs[Long]("n_exact")
      val est = r.getAs[Double]("est_kmv")
      assert(n == exact(t), s"$t: n_exact $n != recomputed ${exact(t)}")
      assert(est > 0.0)
      if (n < 32) {
        assert(est == n.toDouble, s"$t: below capacity KMV must be exact")
        assert(r.getAs[Double]("rel_err") == 0.0)
      } else {
        // k=32 → relative standard error ~ 1/sqrt(k-1) ≈ 0.18; allow 4x
        assert(r.getAs[Double]("rel_err") < 0.72,
          s"$t: rel_err ${r.getAs[Double]("rel_err")} outside sketch error")
      }
    }
  }

  test("q359: spectrum identities hold and one source brute-forces from raw text") {
    val rows = MeasureOps.q359YuleK.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, v, v1) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
        r.getAs[Long]("v1"))
      assert(v1 <= v && v <= n)
      val h = r.getAs[Double]("hapax_ratio")
      assert(h >= 0.0 && h <= 1.0)
      // Σm²Vm ≥ N with equality iff all types are hapax → K ≥ 0
      assert(r.getAs[Double]("yule_k") >= 0.0)
      if (v1 == v) assert(r.getAs[Double]("yule_k") == 0.0)
    }
    // brute-force the first source in plain Scala
    val src = rows.head.getAs[String]("source")
    val texts = Tables(spark, sfDir).documents
      .filter(col("source") === src).select(col("text"))
      .collect().map(_.getString(0))
    val counts = scala.collection.mutable.Map.empty[String, Long]
    val re = java.util.regex.Pattern.compile("\\w+")
    texts.foreach { t =>
      val m = re.matcher(t.toLowerCase)
      while (m.find()) counts(m.group) = counts.getOrElse(m.group, 0L) + 1
    }
    val n = counts.values.sum
    val sumM2 = counts.values.map(m => m * m).sum
    val expK = math.rint(1.0e4 * (sumM2 - n).toDouble / (n.toDouble * n.toDouble) * 1e6) / 1e6
    assert(rows.head.getAs[Long]("n_tokens") == n)
    assert(rows.head.getAs[Long]("n_types") == counts.size.toLong)
    assert(math.abs(rows.head.getAs[Double]("yule_k") - expK) < 1e-9,
      s"$src: yule_k ${rows.head.getAs[Double]("yule_k")} != brute-forced $expK")
  }

  test("q360: Murphy identity REL - RES + UNC = Brier, mass conserved, bins ordered") {
    val rows = MeasureOps.q360BrierDecomposition.fn(spark, sfDir).collect()
    assert(rows.length >= 2)
    val (rel, res, unc, brier) = (rows.head.getAs[Double]("reliability"),
      rows.head.getAs[Double]("resolution"), rows.head.getAs[Double]("uncertainty"),
      rows.head.getAs[Double]("brier"))
    assert(rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25)
    // identity on independently-rounded components: each carries ≤5e-7
    assert(math.abs(rel - res + unc - brier) < 2e-6,
      s"Murphy identity broke: $rel - $res + $unc != $brier")
    assert(brier >= 0.0 && brier <= 1.0)
    // bin mass = all orders; forecasts are the bin midpoints, y_rate a rate
    val nTotal = Tables(spark, sfDir).orders.count()
    assert(rows.map(_.getAs[Long]("n_b")).sum == nTotal)
    rows.foreach { r =>
      val b = r.getAs[Long]("bin")
      assert(r.getAs[Double]("p_forecast") == (b + 0.5) / 10.0)
      val y = r.getAs[Double]("y_rate")
      assert(y >= 0.0 && y <= 1.0)
    }
    // global metrics identical on every row (a report join, not a per-bin stat)
    assert(rows.map(_.getAs[Double]("brier")).distinct.length == 1)
  }
}
