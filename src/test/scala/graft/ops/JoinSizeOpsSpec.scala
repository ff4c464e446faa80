package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q493 semantics: join_exact IS the materialized equi-join count, and
  * the AMS inner-product estimate is consistent with its own error
  * column and usefully tight on this fixture. */
class JoinSizeOpsSpec extends SparkTestBase {

  test("q493: exact side == materialized join count; estimate consistent") {
    val row = JoinSizeOps.q493JoinSizeSketch.fn(spark, sfDir).head()
    val exact  = row.getAs[Long]("join_exact")
    val est    = row.getAs[Double]("join_est")
    val relErr = row.getAs[Double]("rel_err")

    // the ground truth the sketch prices: the actual equi-join count
    val ev = EventOps.events(spark, sfDir).select(col("user_id"))
    val od = Tables(spark, sfDir).orders.select(col("o_custkey"))
    val joined = ev.join(od, col("user_id") === col("o_custkey")).count()
    assert(exact == joined, s"join_exact $exact != materialized $joined")
    assert(row.getAs[Long]("n_shared_keys") ==
      ev.distinct().join(od.distinct(),
        col("user_id") === col("o_custkey")).count())

    assert(math.abs(relErr - math.abs(est - exact) / exact) < 1e-4)
    assert(relErr < 0.6, s"AMS inner-product estimate off by ${relErr * 100}%")
  }
}
