package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the paired-binary wave (q435 McNemar, q436
  * Cochran's Q) and the Fisher exact test (q437): driver-side cell
  * replays, the k = 2 Cochran → McNemar reduction, the constant-row
  * invariance of Q, and the pmf mass laws of the hypergeometric sweep.
  */
class PairedBinaryOpsSpec extends SparkTestBase {

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q435: cell replay, chi-square algebra, exact-p laws") {
    val row = PairedBinaryOps.q435McnemarTest.fn(spark, sfDir).head()
    // driver replay of the 2x2 concordance cells
    val flags = Tables(spark, sfDir).orders
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_orderpriority")).collect()
      .map(r => (r.getLong(0), r.getString(1) < "1998-04-01",
        r.getString(2) == "1-URGENT"))
      .groupBy(_._1).toSeq
      .collect { case (_, xs) if xs.exists(_._2) && xs.exists(!_._2) =>
        (xs.exists(x => x._2 && x._3), xs.exists(x => !x._2 && x._3)) }
    val (b, c) = (flags.count(f => f._1 && !f._2).toLong,
      flags.count(f => !f._1 && f._2).toLong)
    assert(row.getAs[Long]("n_pairs") == flags.size.toLong)
    assert(row.getAs[Long]("n10") == b && row.getAs[Long]("n01") == c)
    val nd = b + c
    assert(row.getAs[Double]("chi2") == r6((c - b).toDouble * (c - b) / nd))
    assert(row.getAs[Double]("chi2_cc") ==
      r6((math.abs(c - b) - 1.0) * (math.abs(c - b) - 1.0) / nd))
    // exact binomial two-sided p: replay the engine's spine discipline
    val lf = Array.fill(nd.toInt + 1)(BigDecimal(0))
    (1 to nd.toInt).foreach(j => lf(j) = lf(j - 1) +
      BigDecimal(math.log(j.toDouble)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
    val pSum = (0L to math.min(b, c)).map { k =>
      val lnp = (lf(nd.toInt) - lf(k.toInt) - lf((nd - k).toInt)).toDouble -
        nd * math.log(2.0)
      BigDecimal(math.exp(lnp)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    val pExact = r6(math.min(1.0, (pSum * 2).toDouble))
    assert(row.getAs[Double]("p_exact") == pExact)
    assert(row.getAs[Double]("p_exact") >= 0 && row.getAs[Double]("p_exact") <= 1)
  }

  test("q436: exact-integer Q replay and constant-row invariance") {
    val rows = PairedBinaryOps.q436CochranQ.fn(spark, sfDir).collect()
    assert(rows.length == 3)
    // driver replay over complete blocks
    val cell = Tables(spark, sfDir).orders
      .select(col("o_custkey"), col("o_orderdate").cast("string"),
        col("o_orderpriority")).collect()
      .map { r =>
        val d = r.getString(1)
        val era = if (d < "1997-01-01") 0 else if (d < "1999-01-01") 1 else 2
        ((r.getLong(0), era), r.getString(2) == "1-URGENT")
      }
      .groupBy(_._1).map { case (k, xs) => k -> (if (xs.exists(_._2)) 1L else 0L) }
    val blocks = cell.groupBy(_._1._1).filter(_._2.size == 3)
    val n = blocks.size
    assert(rows.head.getAs[Long]("n_blocks") == n.toLong)
    val colTot = (0 to 2).map(e =>
      blocks.values.map(_.collect { case ((_, `e`), x) => x }.sum).sum)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_success") == colTot(r.getAs[Long]("era").toInt))
    }
    val t = colTot.sum
    val sr2 = blocks.values.map { m => val s = m.values.sum; s * s }.sum
    val q = r6(2.0 * colTot.map(cj => (3 * cj - t) * (3 * cj - t)).sum /
      (3.0 * (3 * t - sr2)))
    assert(rows.head.getAs[Double]("q_stat") == q)
    assert(rows.head.getAs[Double]("p_value") == r6(math.exp(-q / 2)))
    // constant-row invariance: adding all-0 or all-1 blocks leaves Q fixed
    val withConst = blocks ++ Map(
      -1L -> Map((-1L, 0) -> 0L, (-1L, 1) -> 0L, (-1L, 2) -> 0L),
      -2L -> Map((-2L, 0) -> 1L, (-2L, 1) -> 1L, (-2L, 2) -> 1L))
    val colTot2 = (0 to 2).map(e =>
      withConst.values.map(_.collect { case ((_, `e`), x) => x }.sum).sum)
    val t2 = colTot2.sum
    val sr22 = withConst.values.map { m => val s = m.values.sum; s * s }.sum
    val q2 = r6(2.0 * colTot2.map(cj => (3 * cj - t2) * (3 * cj - t2)).sum /
      (3.0 * (3 * t2 - sr22)))
    assert(q2 == q, "Q is invariant to constant blocks")
  }

  test("q437: pmf mass laws and tail identity") {
    val row = FisherOps.q437FisherExact.fn(spark, sfDir).head()
    val (a, b, c, d) = (row.getAs[Long]("a"), row.getAs[Long]("b"),
      row.getAs[Long]("c"), row.getAs[Long]("d"))
    // cells replay
    val os = Tables(spark, sfDir).orders
      .select(col("o_orderpriority") === "1-URGENT",
        col("o_totalprice") > 300000.0).collect()
    assert(a == os.count(r => r.getBoolean(0) && r.getBoolean(1)).toLong)
    assert(b == os.count(r => r.getBoolean(0) && !r.getBoolean(1)).toLong)
    assert(c == os.count(r => !r.getBoolean(0) && r.getBoolean(1)).toLong)
    assert(d == os.count(r => !r.getBoolean(0) && !r.getBoolean(1)).toLong)
    val n = a + b + c + d
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("support_lo") == math.max(0L, a + b + a + c - n))
    assert(row.getAs[Long]("support_hi") == math.min(a + b, a + c))
    // pmf replay with the engine's exact rounding discipline:
    // Σ pm(k) over the support must be 1 up to the rounding budget,
    // and p_left + p_right − pm(obs) must equal that same mass
    val lf = Array.fill(n.toInt + 1)(BigDecimal(0))
    (1 to n.toInt).foreach(j => lf(j) = lf(j - 1) +
      BigDecimal(math.log(j.toDouble)).setScale(9, BigDecimal.RoundingMode.HALF_UP))
    def lfd(i: Long) = lf(i.toInt).toDouble
    val (r1, c1) = (a + b, a + c)
    val lconst = lfd(r1) + lfd(n - r1) + lfd(c1) + lfd(n - c1) - lfd(n)
    def lnp(k: Long) = {
      val v = lconst - lfd(k) - lfd(r1 - k) - lfd(c1 - k) - lfd(n - r1 - c1 + k)
      math.round(v * 1e9) / 1e9
    }
    def pm(k: Long) =
      BigDecimal(math.exp(lnp(k))).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    val lo = math.max(0L, r1 + c1 - n); val hi = math.min(r1, c1)
    val mass = (lo to hi).map(pm).sum.toDouble
    assert(math.abs(mass - 1.0) < 1e-6, s"pmf mass $mass")
    val pl = r6(math.min(1.0, (lo to a).map(pm).sum.toDouble))
    val pr = r6(math.min(1.0, (a to hi).map(pm).sum.toDouble))
    assert(row.getAs[Double]("p_left") == pl)
    assert(row.getAs[Double]("p_right") == pr)
    val pt = r6(math.min(1.0,
      (lo to hi).filter(k => lnp(k) <= lnp(a) + 1e-7).map(pm).sum.toDouble))
    assert(row.getAs[Double]("p_two") == pt)
    assert(pl + pr - pm(a).toDouble >= 1.0 - 1e-6)
    assert(row.getAs[Double]("p_two") <= math.min(1.0, pl + pr))
  }
}
