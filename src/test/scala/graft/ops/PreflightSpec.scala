package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contracts for the pre-flight/survivorship wave. */
class PreflightSpec extends SparkTestBase {

  test("q156: the pre-flight cardinality equals the actually-run join") {
    val rows = graft.SparkEntry.queries("q156_join_cardinality")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val t = Tables(spark, sfDir)
    val real = Map(
      "orders=lineitem@orderkey" ->
        t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey")).count(),
      "customer=orders@custkey" ->
        t.customer.join(t.orders, col("c_custkey") === col("o_custkey")).count(),
      "supplier=customer@nationkey" ->
        t.supplier.join(t.customer, col("s_nationkey") === col("c_nationkey")).count())
    real.foreach { case (name, n) =>
      assert(rows(name) == n, s"$name: pre-flight ${rows(name)} vs actual $n")
    }
  }

  test("q157: one survivor per cluster, from inside the cluster, sizes match q79") {
    val golden = graft.SparkEntry.queries("q157_golden_record")(spark, sfDir)
      .collect()
    val clusters = Dedup.q79DupClusters.fn(spark, sfDir).collect()
      .groupBy(_.getLong(1)).view.mapValues(_.map(_.getLong(0)).toSet).toMap
    assert(golden.length == clusters.size)
    golden.foreach { r =>
      val (cid, sid, size) = (r.getLong(0), r.getLong(1), r.getLong(2))
      assert(clusters(cid).contains(sid), s"survivor $sid outside cluster $cid")
      assert(clusters(cid).size == size)
    }
  }
}
