package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Cycle-audit wave: feedback-loop census on the nation-level trade
  * graph — "which entities sit on a directed cycle, and how short is
  * their shortest loop?" The DAG analytics (q101/q102, critical path)
  * ASSUME acyclicity; this operator is the audit that earns that
  * assumption, the same integrity question overseer's valid-graph?
  * answers for job DAGs (reference: src/overseer/core.clj job-graph
  * validation), asked of a data-derived graph.
  *
  * Scale shape: the corpus collapses to the |nations|²-bounded directed
  * edge census in one scan (consecutive-shipment handoffs per part,
  * the q395/q409 contact construction, rolled up to nations); the
  * k ≤ 6 hop self-reachability BFS runs on the ≤ 625-pair state frame.
  * At 100 TB the same shape holds: entity-graph first, then
  * model-sized cycle analysis.
  */
object CycleOps {

  /** Min directed cycle length (≤ 6) per nation on the trade handoff
    * graph: nation, loop length, 2-cycle partner count, out/in degree;
    * nations on no short cycle report NULL length. */
  val q425CycleCensus: QueryDef = QueryDef(
    "q425_cycle_census",
    (s, dir) => {
      val t = Tables(s, dir)
      // shared derived base table (GraphBase): directed nation trade
      // edges, parquet-backed — BFS rounds + degree audit read it
      val edges = GraphBase.tradeEdgesDirected(s, dir)
      // bounded multi-source BFS: state = (origin, node), k <= 6
      var state = edges.select(col("u").as("o"), col("v").as("node"),
        lit(1L).as("len"))
        .groupBy(col("o"), col("node")).agg(min(col("len")).as("len"))
        .localCheckpoint()
      var closed = state.where(col("o") === col("node"))
        .select(col("o"), col("len"))
      for (k <- 2 to 6) {
        state = state
          .join(edges.select(col("u").as("node"), col("v").as("nxt")),
            Seq("node"))
          .select(col("o"), col("nxt").as("node"), lit(k.toLong).as("len"))
          .groupBy(col("o"), col("node")).agg(min(col("len")).as("len"))
          .localCheckpoint()
        closed = closed.unionByName(
          state.where(col("o") === col("node")).select(col("o"), col("len")))
      }
      val minCycle = closed.groupBy(col("o").as("nk"))
        .agg(min(col("len")).as("min_cycle_len"))
      val mutual = edges.join(edges.select(col("v").as("u"),
        col("u").as("v")), Seq("u", "v"), "left_semi")
        .groupBy(col("u").as("nk")).agg(count(lit(1)).as("n_mutual"))
      val deg = edges.groupBy(col("u").as("nk"))
        .agg(count(lit(1)).as("out_deg"), sum(col("w")).as("out_handoffs"))
        .join(edges.groupBy(col("v").as("nk"))
          .agg(count(lit(1)).as("in_deg")), Seq("nk"), "outer")
        .na.fill(0L, Seq("out_deg", "in_deg", "out_handoffs"))
      deg
        .join(minCycle, Seq("nk"), "left")
        .join(mutual, Seq("nk"), "left")
        .na.fill(0L, Seq("n_mutual"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("nk"),
          col("n_name").as("nation"))), Seq("nk"))
        .select(col("nation"), col("out_deg"), col("in_deg"),
          col("out_handoffs"), col("n_mutual"), col("min_cycle_len"))
        .orderBy(col("nation"))
    },
    Some("""WITH RECURSIVE sh AS (SELECT l_partkey AS p, l_suppkey AS sid,
          epoch_us(l_shipdate) AS ts
        FROM lineitem),
      seq AS (SELECT sid,
          LEAD(sid) OVER (PARTITION BY p ORDER BY ts, sid) AS nv
        FROM sh),
      handoffs AS (SELECT a.s_nationkey AS u, b.s_nationkey AS v
        FROM seq
        JOIN supplier a ON a.s_suppkey = seq.sid
        JOIN supplier b ON b.s_suppkey = seq.nv
        WHERE seq.nv IS NOT NULL AND seq.nv <> seq.sid
          AND a.s_nationkey <> b.s_nationkey),
      edges AS (SELECT u, v, CAST(COUNT(*) AS BIGINT) AS w
        FROM handoffs GROUP BY 1, 2),
      reach(o, node, len) AS (
        SELECT u, v, CAST(1 AS BIGINT) FROM edges
        UNION
        SELECT r.o, e.v, r.len + 1
        FROM reach r JOIN edges e ON e.u = r.node
        WHERE r.len < 6),
      mincyc AS (SELECT o AS nk, CAST(MIN(len) AS BIGINT) AS min_cycle_len
        FROM reach WHERE o = node GROUP BY 1),
      mutual AS (SELECT e.u AS nk, CAST(COUNT(*) AS BIGINT) AS n_mutual
        FROM edges e WHERE EXISTS (SELECT 1 FROM edges r
          WHERE r.u = e.v AND r.v = e.u)
        GROUP BY 1),
      outd AS (SELECT u AS nk, CAST(COUNT(*) AS BIGINT) AS out_deg,
          CAST(SUM(w) AS BIGINT) AS out_handoffs
        FROM edges GROUP BY 1),
      ind AS (SELECT v AS nk, CAST(COUNT(*) AS BIGINT) AS in_deg
        FROM edges GROUP BY 1),
      deg AS (SELECT COALESCE(o.nk, i.nk) AS nk,
          COALESCE(o.out_deg, 0) AS out_deg,
          COALESCE(i.in_deg, 0) AS in_deg,
          COALESCE(o.out_handoffs, 0) AS out_handoffs
        FROM outd o FULL OUTER JOIN ind i ON i.nk = o.nk)
      SELECT n.n_name AS nation, d.out_deg, d.in_deg, d.out_handoffs,
        COALESCE(m.n_mutual, 0) AS n_mutual, mc.min_cycle_len
      FROM deg d
      LEFT JOIN mincyc mc ON mc.nk = d.nk
      LEFT JOIN mutual m ON m.nk = d.nk
      JOIN nation n ON n.n_nationkey = d.nk
      ORDER BY nation"""))

  val all: Seq[QueryDef] = Seq(q425CycleCensus)
}
