package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q488 semantics: the emitted estimates are exactly the
  * Duffield–Lund–Thorup estimator — replayed literally (priorities,
  * top-65, τ-quantization, per-class max(w, τ) sums) in plain Scala. */
class PrioritySampleOpsSpec extends SparkTestBase {

  private def hash60(key: Long): Long = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"ps|$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }

  test("q488: estimates replay the DLT estimator exactly") {
    val t = Tables(spark, sfDir)
    val orders = t.orders.select("o_orderkey", "o_orderpriority", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        math.floor(r.getDouble(2) * 100).toLong))
    val pri = orders.map { case (k, cls, w) =>
      (k, cls, w, w.toDouble * 1.152921504606846976e18 / (hash60(k).toDouble + 1.0))
    }.sortBy { case (k, _, _, q) => (-q, k) }
    val top = pri.take(64)
    val tau4 = math.floor(pri(64)._4 * 1e4).toLong
    val estByClass = top.groupBy(_._2).map { case (cls, items) =>
      cls -> (items.length.toLong,
        items.map { case (_, _, w, _) => math.max(w * 10000L, tau4) }.sum)
    }
    val exactByClass = orders.groupBy(_._2)
      .map { case (cls, items) => cls -> items.map(_._3).sum }

    val rows = PrioritySampleOps.q488PrioritySample.fn(spark, sfDir).collect()
    assert(rows.length == exactByClass.size, "one row per priority class")
    rows.foreach { r =>
      val cls = r.getAs[String]("o_orderpriority")
      assert(r.getAs[Long]("exact_cents") == exactByClass(cls))
      val (n, est4) = estByClass.getOrElse(cls, (0L, 0L))
      assert(r.getAs[Long]("n_sampled") == n, s"$cls: sample count")
      assert(r.getAs[Double]("est_cents") == est4.toDouble / 1e4,
        s"$cls: estimate mismatch")
    }
    // the sample covers several classes on this fixture — the estimator
    // path (not just the zero branch) is exercised
    assert(rows.count(_.getAs[Long]("n_sampled") > 0) >= 2)
  }
}
