package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bottleneck-path wave: widest-path (max-min) propagation — "how much
  * can actually flow from the seed suppliers to each reachable
  * supplier", the capacity question shortest-path algebra can't answer.
  * Same iteration shape as q395's earliest-arrival (one equi-join per
  * round, per-node dominance pruning) but over the (max, min) semiring
  * — together they demonstrate the general path-algebra pattern:
  * swap the semiring, keep the plan.
  *
  * Scale shape: per-node max-bottleneck pruning is lossless (a wider
  * bottleneck at u dominates any narrower one for every onward edge),
  * so the frontier stays |V|-bounded; the DuckDB oracle enumerates the
  * unpruned path states recursively as the cross-check.
  */
object BottleneckOps {

  /** Max-min capacity from suppliers 0-3 over the consecutive-shipment
    * contact edges (q395's graph), capacity = the later shipment's
    * quantity; 4 propagation rounds. Output: supplier, bottleneck
    * capacity, first round reached. */
  val q409WidestPath: QueryDef = QueryDef(
    "q409_widest_path",
    (s, dir) => {
      // r16: the handoff pass is the shared GraphBase.contactHandoffs
      // base (q395's graph, as the scaladoc already said) — this query
      // only max-aggregates its capacities
      val edges = GraphBase.contactHandoffs(s, dir)
        .groupBy(col("u"), col("v"))
        .agg(max(col("cap")).as("cap"))
        .localCheckpoint()
      var state = Tables(s, dir).supplier
        .where(col("s_suppkey") <= 3)
        .select(col("s_suppkey").as("node"),
          lit(1000000L).as("b"), lit(0L).as("wave"))
        .localCheckpoint()
      for (r <- 1 to 4) {
        val next = edges
          .join(state.select(col("node").as("u"), col("b").as("ub")), Seq("u"))
          .select(col("v").as("node"), least(col("ub"), col("cap")).as("b"),
            lit(r.toLong).as("wave"))
        state = state.unionByName(next)
          .groupBy(col("node"))
          .agg(max(col("b")).as("b"), min(col("wave")).as("wave"))
          .localCheckpoint()
      }
      state
        .select(col("node").as("supplier"), col("b").as("bottleneck"),
          col("wave"))
        .orderBy(col("wave"), col("supplier"))
    },
    Some("""WITH RECURSIVE
      sh AS (SELECT l_partkey AS p, l_suppkey AS sid,
          epoch_us(l_shipdate) AS t, CAST(l_quantity AS BIGINT) AS q
        FROM lineitem),
      seq AS (SELECT sid,
          LEAD(sid) OVER (PARTITION BY p ORDER BY t, sid) AS nv,
          LEAD(q) OVER (PARTITION BY p ORDER BY t, sid) AS cap
        FROM sh),
      edges AS (SELECT sid AS u, nv AS v, CAST(MAX(cap) AS BIGINT) AS cap
        FROM seq WHERE nv IS NOT NULL AND nv <> sid GROUP BY 1, 2),
      reach(node, b, wave) AS (
        SELECT s_suppkey, CAST(1000000 AS BIGINT), CAST(0 AS BIGINT)
          FROM supplier WHERE s_suppkey <= 3
        UNION
        SELECT e.v, least(r.b, e.cap), r.wave + 1
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.wave < 4)
      SELECT node AS supplier, CAST(MAX(b) AS BIGINT) AS bottleneck,
        CAST(MIN(wave) AS BIGINT) AS wave
      FROM reach GROUP BY 1
      ORDER BY wave, supplier"""))

  val all: Seq[QueryDef] = Seq(q409WidestPath)
}
