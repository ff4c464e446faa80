package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the entropy-rate wave (q386): the conditioning
  * ladder law (conditioning never raises entropy — true for any
  * empirical joint) and a brute-forced source.
  */
class EntropyOpsSpec extends SparkTestBase {

  test("q386: conditioning lowers entropy down the ladder; source brute-forces") {
    val rows = EntropyOps.q386EntropyRate.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (h1, h2, h3) = (r.getAs[Double]("h1_bits"),
        r.getAs[Double]("h2_cond_bits"), r.getAs[Double]("h3_cond_bits"))
      assert(h1 > 0.0)
      // H(X2|X1) <= H(X2) ≈ H1 on a stationary-ish corpus; the strict law
      // is conditioning monotonicity within the ladder
      assert(h2 <= h1 + 1e-6, s"${r.getAs[String]("source")}: H(X2|X1)=$h2 > H1=$h1")
      assert(h3 <= h2 + 1e-6, s"${r.getAs[String]("source")}: H(X3|X1X2)=$h3 > H(X2|X1)=$h2")
      assert(h3 >= -1e-9)
      val red = r.getAs[Double]("redundancy")
      assert(red >= -1e-6 && red <= 1.0 + 1e-6)
    }
    // brute-force the first source's ladder from raw text
    val src = rows.head.getAs[String]("source")
    val texts = Tables(spark, sfDir).documents
      .filter(col("source") === src).select(col("text")).collect().map(_.getString(0))
    val re = java.util.regex.Pattern.compile("\\w+")
    def toks(t: String): Array[String] = {
      val m = re.matcher(t.toLowerCase)
      Iterator.continually(if (m.find()) Some(m.group) else None)
        .takeWhile(_.isDefined).flatten.toArray
    }
    val tss = texts.map(toks)
    def ent(counts: Iterable[Long]): Double = {
      val n = counts.sum.toDouble
      counts.map { c =>
        BigDecimal(-(c / n) * (math.log(c / n) / math.log(2.0)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble
    }
    def gramCounts(n: Int): Map[String, Long] = tss.filter(_.length >= n)
      .flatMap(_.sliding(n).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val h1 = ent(gramCounts(1).values)
    val g2 = gramCounts(2); val g3 = gramCounts(3)
    val c1 = g2.toSeq.groupBy(_._1.split(' ')(0)).view.mapValues(_.map(_._2).sum)
    val c2 = g3.toSeq.groupBy(k => k._1.split(' ').take(2).mkString(" "))
      .view.mapValues(_.map(_._2).sum)
    val h2c = ent(g2.values) - ent(c1.values.toSeq)
    val h3c = ent(g3.values) - ent(c2.values.toSeq)
    assert(math.abs(rows.head.getAs[Double]("h1_bits") - math.rint(h1 * 1e6) / 1e6) < 2e-6)
    assert(math.abs(rows.head.getAs[Double]("h2_cond_bits") - math.rint(h2c * 1e6) / 1e6) < 2e-6)
    assert(math.abs(rows.head.getAs[Double]("h3_cond_bits") - math.rint(h3c * 1e6) / 1e6) < 2e-6)
  }
}
