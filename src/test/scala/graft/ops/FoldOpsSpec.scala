package graft.ops

import graft.SparkTestBase

/** Semantic checks for the CV-fold wave (q404): group hashing is
  * structurally leak-free, row hashing leaks, and the counts match a
  * replay over the raw events.
  */
class FoldOpsSpec extends SparkTestBase {

  test("q404: group folds never leak; row folds do; counts replay") {
    val rows = FoldOps.q404FoldLeakage.fn(spark, sfDir).collect()
      .map(r => r.getAs[String]("scheme") -> r).toMap
    assert(rows.size == 2)
    val grp = rows("group_hash"); val row = rows("row_hash")
    // structural: a function of user_id cannot split a user
    assert(grp.getAs[Long]("leaky_groups") == 0L)
    assert(grp.getAs[Double]("leaky_row_share") == 0.0)
    // row-hashing splits almost every multi-event user
    assert(row.getAs[Long]("leaky_groups") > 0L)
    assert(row.getAs[Double]("leaky_row_share") >
      grp.getAs[Double]("leaky_row_share"))
    assert(grp.getAs[Long]("n_groups") == row.getAs[Long]("n_groups"))

    // replay the row-hash leak census
    import graft.functions.VectorFunctions.md5LongLocal
    val ev = EventOps.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def pmod(x: Long, m: Long): Long = ((x % m) + m) % m
    val byUser = ev.groupBy(_._2)
    val leaky = byUser.count { case (_, es) =>
      es.map(e => pmod(md5LongLocal(s"row|${e._1}"), 5)).distinct.length > 1
    }
    assert(row.getAs[Long]("leaky_groups") == leaky.toLong)
    assert(row.getAs[Long]("n_groups") == byUser.size.toLong)
  }
}
