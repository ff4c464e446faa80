package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the facility-location wave (q397): the greedy
  * trace is replayed in Scala over the same candidate pool, and the
  * submodular-greedy laws hold (diminishing marginal gains, monotone
  * objective, consistent increments).
  */
class FacilityOpsSpec extends SparkTestBase {

  test("q397: greedy trace matches replay; gains diminish") {
    val rows = FacilityOps.q397FacilityLocation.fn(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 6)

    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val cands = emb.filter(e => e._1 % 40 == 0 && e._1 < 4000)
    assert(cands.nonEmpty)
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      val r = dot / (math.sqrt(na) * math.sqrt(nb))
      BigDecimal(r).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val sims = cands.map { case (c, ce) =>
      c -> emb.map { case (v, ve) => v -> cos(ce, ve) }.toMap
    }.toMap
    var cur = emb.map(_._1 -> 0.0).toMap
    var chosen = Set.empty[Long]
    rows.foreach { r =>
      val gains = sims.keys.filterNot(chosen).map { c =>
        c -> BigDecimal(sims(c).map { case (v, s) =>
          BigDecimal(math.max(s - cur(v), 0.0)).setScale(9,
            BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble).toDouble
      }.toSeq
      val (pick, g) = gains.minBy { case (c, g) => (-g, c) }
      assert(r.getAs[Long]("picked") == pick,
        s"round ${r.getAs[Long]("round")}: ${r.getAs[Long]("picked")} vs $pick")
      assert(math.abs(r.getAs[Double]("gain") - g) < 1e-6)
      chosen += pick
      cur = cur.map { case (v, c) => v -> math.max(c, math.max(sims(pick)(v), 0.0)) }
    }
    // submodularity of the greedy trace: marginal gains never increase
    val gs = rows.map(_.getAs[Double]("gain"))
    gs.sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, "diminishing returns")
      case _ =>
    }
    // objective increments equal the reported gains
    val objs = rows.map(_.getAs[Double]("objective"))
    objs.sliding(2).foreach {
      case Array(a, b) => assert(b >= a - 1e-9, "monotone objective")
      case _ =>
    }
    (1 until rows.length).foreach { i =>
      assert(math.abs((objs(i) - objs(i - 1)) - gs(i)) < 1e-5,
        s"objective increment at round ${i + 1}")
    }
  }
}
