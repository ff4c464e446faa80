package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q497 semantics: the sort-window kNN imputation is replayed row by
  * row — same holdout coin, same per-date ±8 frame, same donor-only
  * integer floor-division — and the per-year MAE must match exactly
  * (the errors are exact integers, so there is no tolerance). */
class ImputeOpsSpec extends SparkTestBase {

  private def holdout(ok: Long, ln: Int): Boolean = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"${ok}_$ln".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) + 1.0) / 1152921504606846976.0 < 0.02
  }

  test("q497: windowed kNN impute == exact per-date frame replay") {
    val li = Tables(spark, sfDir).lineitem
      .selectExpr("l_orderkey", "l_linenumber",
        "CAST(l_shipdate AS DATE) AS d", "year(l_shipdate) AS y",
        "CAST(floor(l_extendedprice * 100 + 0.5) AS LONG) AS price_c",
        "CAST(floor(l_quantity * 1000 + 0.5) AS LONG) AS qty_m")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDate(2).toString,
        r.getInt(3), r.getLong(4), r.getLong(5)))

    case class Err(year: Int, absErr: Long, sgnErr: Long)
    val errs = li.groupBy(_._3).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._5, r._1, r._2))
      sorted.indices.flatMap { i =>
        val r = sorted(i)
        if (!holdout(r._1, r._2)) None
        else {
          val frame = sorted.slice(math.max(0, i - 8),
            math.min(sorted.length, i + 9))
          val donors = frame.filter(x => !holdout(x._1, x._2))
          if (donors.isEmpty) None
          else {
            val imp = donors.map(_._6).sum * 1000L / donors.length
            val truth = r._6 * 1000L
            Some(Err(r._4, math.abs(imp - truth), imp - truth))
          }
        }
      }
    }
    val byYear = errs.groupBy(_.year)

    val rows = ImputeOps.q497KnnImpute.fn(spark, sfDir).collect()
    assert(rows.length == byYear.size, "one row per ship year with holdouts")
    rows.foreach { r =>
      val es = byYear(r.getAs[Long]("ship_year").toInt)
      assert(r.getAs[Long]("n_imputed") == es.size.toLong)
      val mae = es.map(_.absErr).sum.toDouble / (es.size * 1e6)
      val bias = es.map(_.sgnErr).sum.toDouble / (es.size * 1e6)
      assert(math.abs(r.getAs[Double]("mae_units") - mae) < 1e-3, "MAE")
      assert(math.abs(r.getAs[Double]("bias_units") - bias) < 1e-3, "bias")
    }
    assert(errs.nonEmpty, "fixture exercises the holdout path")
  }
}
