package graft.ops

import graft.SparkTestBase

/** q496 semantics: 10-step power iteration from uniform over the MLE
  * transition matrix, replayed densely on the driver; mass conservation
  * (row-stochastic P keeps Σπ = 1) is asserted as the algebraic law. */
class MarkovChainOpsSpec extends SparkTestBase {

  test("q496: stationary == dense power-iteration replay; Σπ == 1") {
    val ev = EventOps.events(spark, sfDir)
      .selectExpr("user_id", "unix_micros(ts) AS ts_us", "event_id",
        "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._2, r._3)).map(_._4)
      seq.zip(seq.drop(1))
    }
    val counts = trans.groupBy(identity).map { case (k, v) =>
      k -> v.size.toLong
    }
    val states = counts.keys.map(_._1).toSeq.distinct.sorted
    val rowTot = counts.groupBy(_._1._1).map { case (s, m) =>
      s -> m.values.sum
    }
    var pi = states.map(_ -> 1.0 / states.size).toMap
    for (_ <- 1 to 10) {
      pi = states.map { j =>
        j -> states.map { i =>
          pi(i) * counts.getOrElse((i, j), 0L).toDouble / rowTot(i)
        }.sum
      }.toMap
    }
    assert(math.abs(pi.values.sum - 1.0) < 1e-9, "mass conserved")

    val rows = MarkovChainOps.q496MarkovStationary.fn(spark, sfDir).collect()
    assert(rows.length == states.size)
    val nAll = counts.values.sum.toDouble
    rows.foreach { r =>
      val s = r.getAs[String]("state")
      assert(math.abs(r.getAs[Double]("stationary_p") - pi(s)) < 1e-5,
        s"stationary($s)")
      assert(math.abs(r.getAs[Double]("emp_share") - rowTot(s) / nAll) < 1e-5)
      assert(math.abs(r.getAs[Double]("gap") -
        math.abs(pi(s) - rowTot(s) / nAll)) < 1e-5)
    }
  }
}
