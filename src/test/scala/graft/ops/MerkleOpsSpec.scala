package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q476 fixture-level check: on THIS snapshot pair (replica = strict
  * time-cut subset of primary) divergence always shows in the count
  * comparison, so in_sync coincides exactly with "no post-cut rows in
  * the bucket". In general the digest is a sketch — two diverged
  * equal-count buckets collide with ~2^-60 probability (see the
  * MerkleOps header) — so this equivalence is a property of the
  * fixture, not an iff-law of the operator. */
class MerkleOpsSpec extends SparkTestBase {

  test("q476: in_sync <=> no post-cut rows in the bucket; rescan = dirty primary mass") {
    val rows = MerkleOps.q476MerkleDiff.fn(spark, sfDir).collect()
    assert(rows.length == 32, "one row per bucket")

    val post = Tables(spark, sfDir).orders
      .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .groupBy(pmod(col("o_orderkey"), lit(32)).as("bucket"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      val dirtyTruth = post.getOrElse(b, 0L) > 0
      assert(r.getAs[Boolean]("in_sync") == !dirtyTruth, s"bucket $b sync flag")
      assert(r.getAs[Long]("row_lag") == post.getOrElse(b, 0L), s"bucket $b lag")
      val expectRescan = if (dirtyTruth) r.getAs[Long]("n_primary") else 0L
      assert(r.getAs[Long]("rows_to_rescan") == expectRescan, s"bucket $b rescan")
    }
    // the fixture diverges somewhere but not everywhere — both paths run
    val dirty = rows.count(!_.getAs[Boolean]("in_sync"))
    assert(dirty > 0, "no diverged bucket — diff path untested")
  }
}
