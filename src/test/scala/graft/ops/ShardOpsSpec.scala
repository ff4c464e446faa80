package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q478/q480 semantics: driver-side replay of ring ownership and of the
  * design-effect algebra, plus the theory bands (ring moves ≈ 1/5 of
  * keys, modulo ≈ 4/5; weights sum to 1; deff ratio scale-free). */
class ShardOpsSpec extends SparkTestBase {

  test("q478: driver ring replay; ring moves ~1/5, modulo ~4/5") {
    val r = ShardOps.q478ConsistentHash.fn(spark, sfDir).collect().head

    def h(x: String): Long = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(x).take(15), 16)
    def ring(n: Int): Seq[(Long, String)] =
      (for (s <- 0 until n; v <- 0 until 32) yield (h(s"s$s#$v"), s"s$s"))
        .sortBy(_._1)
    def owner(rg: Seq[(Long, String)], kh: Long): String =
      rg.find(_._1 >= kh).getOrElse(rg.head)._2
    val (r4, r5) = (ring(4), ring(5))

    val keys = Tables(spark, sfDir).customer
      .select(col("c_custkey")).collect().map(_.getLong(0))
    val ringMoved = keys.count { k =>
      val kh = h(k.toString); owner(r4, kh) != owner(r5, kh) }
    val modMoved = keys.count(k => k % 4 != k % 5)
    assert(r.getAs[Long]("n_keys") == keys.length)
    assert(r.getAs[Long]("ring_moved") == ringMoved.toLong, "ring replay")
    assert(r.getAs[Long]("mod_moved") == modMoved.toLong, "modulo replay")
    // theory bands: ring ~ 1/5 (vnode variance), modulo ~ 4/5
    val rf = r.getAs[Double]("ring_moved_frac")
    val mf = r.getAs[Double]("mod_moved_frac")
    assert(rf > 0.08 && rf < 0.40, s"ring moved $rf outside the ~1/5 band")
    assert(mf > 0.70 && mf < 0.90, s"modulo moved $mf outside the ~4/5 band")
    assert(rf < mf / 2, "consistent hashing must move far fewer keys than modulo")
  }

  test("q480: driver replay of the design-effect algebra; weights sum to 1") {
    val rows = ShardOps.q480DesignEffect.fn(spark, sfDir).collect()
    val data = Tables(spark, sfDir).orders
      .join(Tables(spark, sfDir).customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment"), col("o_totalprice")).collect()
      .map(r => r.getString(0) -> math.floor(r.getDouble(1) * 100).toLong)
    val n = data.length.toLong
    val byH = data.groupBy(_._1)
    def popVar(xs: Seq[Long]): Double = {
      val s1 = xs.map(BigInt(_)).sum
      val s2 = xs.map(x => BigInt(x) * BigInt(x)).sum
      (s2.toDouble - s1.toDouble * s1.toDouble / xs.size) / xs.size
    }
    val varG = popVar(data.map(_._2).toSeq)
    val deff = byH.map { case (_, xs) =>
      (xs.length.toDouble / n) * popVar(xs.map(_._2).toSeq) }.sum / varG
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.foreach { r =>
      val xs = byH(r.getAs[String]("segment")).map(_._2).toSeq
      assert(r.getAs[Long]("n_h") == xs.length.toLong)
      assert(r.getAs[Double]("deff") == r6(deff), "deff replay")
      assert(r.getAs[Double]("var_h") >= 0.0)
    }
    assert(math.abs(rows.map(_.getAs[Double]("w_h")).sum - 1.0) < 1e-4)
    // the fixture's segments separate means at least slightly: deff < 1
    assert(deff < 1.0, s"deff $deff — stratification shows no gain on fixture")
  }
}
