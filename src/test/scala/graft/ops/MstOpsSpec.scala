package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Semantic check for q447: Borůvka's output equals an INDEPENDENT
  * driver-side Kruskal with union–find under the same (w, u, v) total
  * order — the two classical MST algorithms agree only on a correct
  * implementation (the total order makes the MST unique). Plus the
  * spanning laws: |E| = |V| − #components, acyclic by construction.
  */
class MstOpsSpec extends SparkTestBase {

  test("q447: Boruvka equals Kruskal under the shared total order") {
    val rows = MstOps.q447BoruvkaMst.fn(spark, sfDir).collect()
    // rebuild the same symmetrized edge census driver-side
    val t = Tables(spark, sfDir)
    val li = t.lineitem
      .select(col("l_partkey").as("p"), col("l_suppkey").as("sid"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("ts"))
    val wSeq = Window.partitionBy(col("p")).orderBy(col("ts"), col("sid"))
    val supNation = t.supplier.select(col("s_suppkey").as("sid"),
      col("s_nationkey").as("nk"))
    val edges = li
      .withColumn("nv", lead(col("sid"), 1).over(wSeq))
      .where(col("nv").isNotNull && col("nv") =!= col("sid"))
      .join(broadcast(supNation), Seq("sid"))
      .join(broadcast(supNation.select(col("sid").as("nv"),
        col("nk").as("nk2"))), Seq("nv"))
      .where(col("nk") =!= col("nk2"))
      .groupBy(least(col("nk"), col("nk2")).as("a"),
        greatest(col("nk"), col("nk2")).as("b"))
      .agg(count(lit(1)).as("w"))
      .collect()
      .map(r => (r.getAs[Long]("w"), r.getAs[Number]("a").longValue,
        r.getAs[Number]("b").longValue))
    // Kruskal with union-find over the (w, a, b) total order
    val parent = collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = edges.sorted.flatMap { case (w, a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra == rb) None
      else { parent(ra) = rb; Some((a, b, w)) }
    }.toSet
    val got = rows.map(r => (r.getAs[Number]("u").longValue,
      r.getAs[Number]("v").longValue, r.getAs[Long]("weight"))).toSet
    assert(got == kruskal, "Boruvka == Kruskal edge set")
    // spanning laws
    val nodes = edges.flatMap(e => Seq(e._2, e._3)).distinct.length
    val comps = nodes - kruskal.size
    assert(rows.head.getAs[Long]("mst_edges") == kruskal.size.toLong)
    assert(comps >= 1)
    assert(rows.head.getAs[Long]("total_weight") ==
      kruskal.toSeq.map(_._3).sum)
    // every non-MST edge is at least as heavy as the path max? (cheap
    // cycle-property spot check: total weight is minimal vs swapping
    // any single non-tree edge in — verified transitively by the
    // Kruskal equality above)
    assert(rows.map(_.getAs[Long]("round_added")).forall(r => r >= 1 && r <= 5))
  }
}
