package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the skyline wave (q389): the sort-based sweep is
  * replayed against a quadratic brute-force dominance check on the same
  * fixture, and the frontier laws hold.
  */
class SkylineOpsSpec extends SparkTestBase {

  test("q389: sweep frontier equals brute-force non-dominated set") {
    val got = SkylineOps.q389ParetoSkyline.fn(spark, sfDir).collect()
      .map(r => (r.getAs[String]("brand"), r.getAs[Double]("price"),
        r.getAs[Int]("size"), r.getAs[Long]("n_parts")))

    val parts = Tables(spark, sfDir).part
      .select(col("p_brand"), col("p_retailprice"), col("p_size")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getInt(2)))
    val byBrand = parts.groupBy(_._1)
    val brute = byBrand.flatMap { case (brand, ps) =>
      ps.filter { case (_, pr, sz) =>
        !ps.exists { case (_, dpr, dsz) =>
          dpr <= pr && dsz >= sz && (dpr < pr || dsz > sz)
        }
      }.groupBy(p => (p._2, p._3)).map { case ((pr, sz), g) =>
        (brand, pr, sz, g.length.toLong)
      }
    }.toSet
    assert(got.toSet == brute)

    // frontier law: within a brand, prices strictly increase and sizes
    // strictly increase along the frontier rank order
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._2, r._3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._2 < b._2 && a._3 < b._3)
        case _ =>
      }
    }
  }
}
