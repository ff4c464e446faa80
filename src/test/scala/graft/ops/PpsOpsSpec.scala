package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the PPS wave (q407): the systematic walk is
  * replayed in Scala, draw-count conservation holds, and every item
  * heavier than the step is necessarily drawn.
  */
class PpsOpsSpec extends SparkTestBase {

  test("q407: systematic draws replay exactly; heavy items always drawn") {
    val rows = PpsOps.q407PpsSample.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nDraws = rows.head.getAs[Long]("n_draws")
    assert(rows.map(_.getAs[Long]("mult")).sum == nDraws)
    assert(math.abs(nDraws - 50L) <= 1, "systematic PPS draw count")

    import graft.functions.VectorFunctions.md5LongLocal
    val parts = Tables(spark, sfDir).part
      .select(col("p_partkey"), col("p_retailprice"), col("p_size"))
      .collect()
      .map(r => (r.getLong(0),
        BigDecimal(r.getDouble(1)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP), r.getInt(2)))
    val ordered = parts.sortBy(p => (md5LongLocal(s"pps|${p._1}"), p._1))
    val wTot = ordered.map(_._2).sum.toDouble
    val step = wTot / 50
    var cum = BigDecimal(0)
    val expect = ordered.flatMap { case (part, w, _) =>
      val prev = cum.toDouble; cum += w
      val m = math.floor(cum.toDouble / step).toLong -
        math.floor(prev / step).toLong
      if (m > 0) Some(part -> m) else None
    }.toMap
    assert(rows.map(r =>
      r.getAs[Long]("part") -> r.getAs[Long]("mult")).toMap == expect)
    // inclusion law: weight >= step => drawn at least once
    val drawn = expect.keySet
    ordered.foreach { case (part, w, _) =>
      if (w.toDouble >= step) assert(drawn.contains(part),
        s"part $part heavier than step must be drawn")
    }
    // HT estimator replay
    val ht = expect.map { case (part, m) =>
      val p = parts.find(_._1 == part).get
      BigDecimal(m * p._3.toDouble / (p._2.toDouble / step)).setScale(6,
        BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(math.abs(rows.head.getAs[Double]("ht_size_est") - ht) < 0.02)
  }
}
