package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Closure modes: the driver-frontier fast path and the distributed path
  * must compute identical closures, and the auto-switch must let a graph
  * whose reachable set dwarfs any sensible driver bound close without
  * collecting it. */
class GraphOpsSpec extends SparkTestBase {

  private def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("driver-frontier and distributed closures agree on the part graph") {
    val edges = Tables(spark, sfDir).part
      .select(col("p_partkey").as("child"),
              expr("p_partkey div 2").cast("long").as("parent"))
      .filter(col("child") > 1)
    val roots = spark.range(1, 2).select(col("id").as("node"))
    val drv = asMap(GraphOps.descendantsWithDepth(spark, edges, roots))
    val dst = asMap(GraphOps.descendantsWithDepthDistributed(spark, edges, roots))
    assert(drv == dst)
    assert(drv(1L) == 0L && drv.nonEmpty)
  }

  test("auto-switch kicks in mid-closure and still returns the exact closure") {
    val edges = Tables(spark, sfDir).part
      .select(col("p_partkey").as("child"),
              expr("p_partkey div 2").cast("long").as("parent"))
      .filter(col("child") > 1)
    val roots = spark.range(1, 2).select(col("id").as("node"))
    val full = asMap(GraphOps.descendantsWithDepth(spark, edges, roots))
    // bound far below the reachable count → the hybrid MUST switch modes
    assert(full.size > 64)
    val switched = asMap(GraphOps.descendantsWithDepth(spark, edges, roots, maxDriverNodes = 64))
    assert(switched == full)
  }

  test("a million-edge graph closes without driver-resident state") {
    val n = 1 << 20
    // implicit binary tree over [2, n): child -> child div 2; reachable
    // set from node 1 is ALL n-2 nodes — collecting it under a small
    // driver bound would be the exact failure mode the switch prevents
    val edges = spark.range(2, n)
      .select(col("id").as("child"), expr("id div 2").as("parent"))
    val roots = spark.range(1, 2).select(col("id").as("node"))
    val res = GraphOps.descendantsWithDepth(spark, edges, roots, maxDriverNodes = 1000)
    res.createOrReplaceTempView("closure_res")
    val byDepth = spark.sql(
      "SELECT depth, count(*) AS c FROM closure_res GROUP BY depth").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // depth of node k is floor(log2 k): exactly 2^d nodes per depth d < 19
    assert(byDepth(0L) == 1L && byDepth(1L) == 2L && byDepth(10L) == 1024L)
    assert(byDepth.values.sum == (n - 1).toLong)
    assert(byDepth.keys.max == 19L)
  }

  test("connected components: chain, cycle, and disjoint pieces resolve to min ids") {
    import spark.implicits._
    // a 3-chain, an isolated pair, a triangle given as a cycle, and a
    // 16-node path (forces multi-round label propagation: min travels one
    // hop per round)
    val path = (100L until 115L).map(i => (i, i + 1))
    val edges = (Seq((1L, 2L), (2L, 3L), (10L, 11L),
                     (20L, 21L), (21L, 22L), (22L, 20L)) ++ path)
      .toDF("id_a", "id_b")
    val cc = GraphOps.connectedComponents(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L).forall(cc(_) == 10L))
    assert(Seq(20L, 21L, 22L).forall(cc(_) == 20L))
    assert((100L to 115L).forall(cc(_) == 100L))
    assert(cc.size == 3 + 2 + 3 + 16)
  }
}
