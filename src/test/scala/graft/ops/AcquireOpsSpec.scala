package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the acquisition & audit wave (q366–q368): the
  * knapsack certificate is verified against the TRUE optimum (exhaustive
  * subset enumeration), the pinball fit against the quantile-optimality
  * property, and Anderson–Darling against a scalar brute force.
  */
class AcquireOpsSpec extends SparkTestBase {

  test("q366: greedy <= true optimum <= LP bound (exhaustive certificate), prefix law") {
    val rows = AcquireOps.q366DataKnapsack.fn(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 24)
    val budget = rows.head.getAs[Long]("budget")
    val greedy = rows.head.getAs[Long]("greedy_value")
    val lp = rows.head.getAs[Double]("lp_bound")
    // selected is exactly a rank prefix
    val sel = rows.sortBy(_.getAs[Int]("rk")).map(_.getAs[Boolean]("selected"))
    assert(!sel.dropWhile(identity).contains(true), "selected set is not a density prefix")
    // exhaustive optimum over all subsets (|sources| ~ 20)
    val items = rows.map(r => (r.getAs[Long]("value"), r.getAs[Long]("cost")))
    var opt = 0L
    val n = items.length
    var mask = 0
    while (mask < (1 << n)) {
      var v = 0L; var c = 0L; var i = 0
      while (i < n) {
        if ((mask & (1 << i)) != 0) { v += items(i)._1; c += items(i)._2 }
        i += 1
      }
      if (c <= budget && v > opt) opt = v
      mask += 1
    }
    assert(greedy <= opt, s"greedy $greedy exceeds the true optimum $opt")
    assert(opt.toDouble <= lp + 1e-6, s"LP bound $lp does not dominate the optimum $opt")
    assert(rows.head.getAs[Double]("optimality_gap") >= 0.0)
  }

  test("q367: fitted quantiles are monotone in tau and pinball-optimal in sample") {
    val rows = AcquireOps.q367PinballEval.fn(spark, sfDir).collect()
    assert(rows.length == 15) // 5 priorities x 3 taus
    rows.groupBy(_.getAs[String]("prio")).foreach { case (prio, rs) =>
      val byTau = rs.sortBy(_.getAs[Double]("tau")).map(_.getAs[Double]("q_tau"))
      assert(byTau.sliding(2).forall(p => p(0) <= p(1)),
        s"$prio: q_tau not monotone in tau: ${byTau.mkString(",")}")
    }
    // in-sample optimality: the empirical tau-quantile minimizes empirical
    // pinball loss — verify on the model half for one (prio, tau)
    val model = Tables(spark, sfDir).orders
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1)
        .isin("0", "1", "2", "3", "4", "5", "6", "7"))
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_totalprice")).collect().map(_.getDouble(0)).sorted
    val tau = 0.5
    def loss(q: Double): Double = model.map(y =>
      if (y > q) tau * (y - q) else (1 - tau) * (q - y)).sum / model.length
    val fitted = model(math.ceil(tau * model.length).toInt - 1)
    assert(loss(fitted) <= loss(model(math.ceil(tau * model.length).toInt - 2)) + 1e-9)
    assert(loss(fitted) <= loss(model(math.ceil(tau * model.length).toInt)) + 1e-9)
  }

  test("q368: A2 matches a scalar brute force and is tail-positive") {
    val rows = AcquireOps.q368AndersonDarling.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("a2") > -0.01 &&
      !r.getAs[Double]("a2").isNaN))
    val t = rows.head.getAs[String]("event_type")
    val evs = EventOps.events(spark, sfDir)
      .filter(col("event_type") === t)
      .select(unix_micros(col("ts")).as("us"), col("event_id"))
      .orderBy(col("us"), col("event_id"))
      .collect().map(_.getLong(0))
    val gaps = evs.sliding(2).map(p => p(1) - p(0)).filter(_ > 0).toArray.sorted
    val n = gaps.length
    val lambda = n.toDouble / gaps.map(_.toDouble).sum
    var st = BigDecimal(0)
    for (j <- 1 to n) {
      val u = 1.0 - math.exp(-lambda * gaps(j - 1))
      val term = (2.0 * j - 1) * math.log(u) + (2.0 * n + 1 - 2 * j) * math.log(1.0 - u)
      st += BigDecimal(term).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val a2 = math.rint((-n.toDouble - st.toDouble / n) * 1e6) / 1e6
    assert(rows.head.getAs[Long]("n") == n.toLong)
    assert(math.abs(rows.head.getAs[Double]("a2") - a2) < 2e-6,
      s"$t: a2 ${rows.head.getAs[Double]("a2")} != brute-forced $a2")
  }
}
