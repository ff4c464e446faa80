package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the decision & decoding wave (q348–q350): TA
  * soundness against the true top-k, greedy-decode chain consistency,
  * and Hill-estimator stability.
  */
class DecideOpsSpec extends SparkTestBase {

  test("q348: once TA says stop, the seen set really contains the true top-10") {
    val dir = "/root/testdata/sf0.01"
    val rows = DecideOps.q348ThresholdAudit.fn(spark, dir).collect()
      .sortBy(_.getAs[Long]("d"))
    assert(rows.length == 5)
    // thresholds decrease with depth; seen counts increase
    val ts = rows.map(_.getAs[Double]("threshold"))
    ts.zip(ts.tail).foreach { case (a, b) => assert(a >= b) }
    val ns = rows.map(_.getAs[Long]("n_seen"))
    ns.zip(ns.tail).foreach { case (a, b) => assert(a <= b) }
    // brute-force the true top-10 combined
    val docs = Tables(spark, dir).documents
      .select(col("doc_id"), col("text")).collect()
      .flatMap { r =>
        val toks = "\\w+".r.findAllIn(r.getString(1).toLowerCase).toSeq
        if (toks.isEmpty) None else Some((r.getLong(0),
          BigDecimal(math.log(1.0 + toks.size)).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(toks.distinct.size.toDouble / toks.size).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
    val combined = docs.map { case (id, s1, s2) =>
      (id, BigDecimal(s1 + s2).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val true10 = combined.sortBy { case (id, c) => (-c, id) }.take(10).map(_._2)
    rows.filter(_.getAs[Boolean]("can_stop")).foreach { r =>
      // TA soundness: kth_seen at a stopping depth equals the true 10th
      // best (the certified prefix already holds the answer)
      assert(math.abs(r.getAs[Double]("kth_seen") - true10.last) < 1e-9,
        s"d=${r.getAs[Long]("d")}: certified kth ${r.getAs[Double]("kth_seen")} != true ${true10.last}")
    }
    assert(rows.exists(_.getAs[Boolean]("can_stop")), "TA never certifies — audit inert")
    assert(rows.exists(!_.getAs[Boolean]("can_stop")), "TA certifies at depth 10 — no discrimination")
  }

  test("q349: decode chain is consistent with the corpus bigram counts") {
    val dir = sfDir
    val rows = DecideOps.q349GreedyDecode.fn(spark, dir).collect()
      .sortBy(_.getAs[Long]("step"))
    assert(rows.length == 6)
    // brute-force bigram counts
    val texts = Tables(spark, dir).documents.select(col("text")).collect()
      .map(r => "\\w+".r.findAllIn(r.getString(0).toLowerCase).toSeq)
      .filter(_.size >= 2)
    val uni = scala.collection.mutable.HashMap[String, Long]().withDefaultValue(0L)
    val bi = scala.collection.mutable.HashMap[(String, String), Long]().withDefaultValue(0L)
    texts.foreach { t =>
      t.foreach(w => uni(w) += 1)
      t.sliding(2).foreach { case Seq(a, b) => bi((a, b)) += 1; case _ => () }
    }
    val seed = uni.toSeq.minBy { case (w, c) => (-c, w) }
    assert(rows(0).getAs[String]("token") == seed._1)
    var cur = seed._1
    rows.drop(1).foreach { r =>
      val nexts = bi.collect { case ((a, b), c) if a == cur => (b, c) }.toSeq
      val best = nexts.minBy { case (w, c) => (-c, w) }
      assert(r.getAs[String]("token") == best._1,
        s"step ${r.getAs[Long]("step")}: ${r.getAs[String]("token")} vs brute ${best._1}")
      assert(r.getAs[Long]("bigram_count") == best._2)
      cur = best._1
    }
    // log-prob strictly decreases (every transition multiplies p < 1... or = 1)
    val lps = rows.drop(1).map(_.getAs[Double]("cum_logprob"))
    lps.zip(lps.tail).foreach { case (a, b) => assert(b <= a + 1e-12) }
  }

  test("q350: Hill identity matches brute force; a bounded tail reads as high alpha") {
    val dir = "/root/testdata/sf0.01"
    val rows = DecideOps.q350HillTail.fn(spark, dir).collect()
      .sortBy(_.getAs[Long]("k"))
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_top") == r.getAs[Long]("k"))
      assert(r.getAs[Double]("alpha_hat") > 0)
      assert(r.getAs[Double]("x_max") >= r.getAs[Double]("x_kp1"))
    }
    // brute-force the k=50 arm
    val xs = Tables(spark, dir).orders
      .select(col("o_totalprice").cast("double")).collect()
      .map(_.getDouble(0)).sorted(Ordering[Double].reverse)
    val k = 50
    val ref = xs(k) // x_(k+1), 0-indexed
    val sum = xs.take(k).map { x =>
      BigDecimal(math.log(x / ref)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val brute = BigDecimal(k / sum.toDouble).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = rows.find(_.getAs[Long]("k") == 50L).get.getAs[Double]("alpha_hat")
    assert(math.abs(got - brute) < 1e-6, s"alpha $got vs brute $brute")
    // TPC-H prices are draw-sums with a bounded support — NOT power-law —
    // so Hill must read a light tail (alpha far above the heavy-tail
    // regime alpha < 3) and sharpen as k narrows to the extreme tail.
    rows.foreach(r => assert(r.getAs[Double]("alpha_hat") > 10.0,
      "bounded-support prices read as heavy-tailed — estimator broken"))
  }
}
