package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest
import java.time.LocalDate

/** q503 semantics: the bitemporal snapshot at (V, T) replayed entity by
  * entity — same fact log, same (valid, tx, seq) winner rule — plus the
  * axis laws: moving T forward reveals retroactive reclasses at FIXED V,
  * moving V forward reveals closes. */
class BitemporalOpsSpec extends SparkTestBase {

  private def coin(key: Long): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"bt|$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) + 1.0) / 1152921504606846976.0
  }

  test("q503: snapshot grid == per-entity replay; both axes move counts") {
    val orders = Tables(spark, sfDir).orders
      .selectExpr("o_orderkey", "o_orderpriority", "o_orderstatus",
        "CAST(o_orderdate AS DATE) AS d")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getDate(3).toLocalDate))

    case class Fact(v: String, valid: LocalDate, tx: LocalDate, seq: Long)
    val facts: Map[Long, Seq[Fact]] = orders.map { case (k, pri, st, d) =>
      val f = Seq(Fact(pri, d, d, 0L)) ++
        (if (coin(k) < 0.10) Seq(Fact("RECLASS", d, d.plusDays(30), 1L))
         else Nil) ++
        (if (st == "F") Seq(Fact("CLOSED", d.plusDays(60), d.plusDays(60), 2L))
         else Nil)
      k -> f
    }.toMap

    val cuts = Seq(LocalDate.parse("1994-07-01"), LocalDate.parse("1997-07-01"))
    def snap(vc: LocalDate, tc: LocalDate): Map[String, Long] =
      facts.values.flatMap { fs =>
        val vis = fs.filter(f => !f.valid.isAfter(vc) && !f.tx.isAfter(tc))
        if (vis.isEmpty) None
        else Some(vis.maxBy(f => (f.valid.toEpochDay, f.tx.toEpochDay, f.seq)).v)
      }.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }

    val rows = BitemporalOps.q503BitemporalAsof.fn(spark, sfDir).collect()
    val got = rows.map { r =>
      ((r.getDate(0).toLocalDate, r.getDate(1).toLocalDate),
        r.getAs[String]("value")) -> r.getAs[Long]("n")
    }.toMap
    val expected = (for {
      vc <- cuts; tc <- cuts; (v, n) <- snap(vc, tc)
    } yield ((vc, tc), v) -> n).toMap
    assert(got == expected, "grid replay")

    // axis laws on the fixture
    val (v1, t1, t2) = (cuts(0), cuts(0), cuts(1))
    assert(snap(v1, t2).getOrElse("RECLASS", 0L) >
      snap(v1, t1).getOrElse("RECLASS", 0L) - 1,
      "later tx cutoff reveals (or keeps) retroactive reclasses at fixed V")
    assert(snap(cuts(1), t2).getOrElse("CLOSED", 0L) >
      snap(v1, t2).getOrElse("CLOSED", 0L),
      "later valid cutoff reveals closes")
  }
}
