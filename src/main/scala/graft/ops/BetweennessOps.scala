package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Centrality wave: betweenness centrality, exact WITHIN a 6-hop
  * horizon, on the thinned nation trade graph — "which entities sit on the shortest paths between
  * others?", the brokerage question degree (q103), PageRank (q101),
  * HITS (q246) and Katz (q263) all miss. The raw handoff graph is
  * near-complete (every betweenness ≈ 0), so the operator runs on the
  * top-3-out-edges-per-nation graph — the deterministic k-NN thinning
  * a 100 TB entity graph needs anyway.
  *
  * Shortest-path counts σ_st come from walk counts at the shortest
  * length (a shortest walk cannot revisit, so walks = paths there);
  * the Brandes backward pass is replaced by the pair-sum identity
  * bc(v) = Σ_{s≠v≠t} σ_sv·σ_vt/σ_st · [d(s,v)+d(v,t)=d(s,t)],
  * a |V|³-bounded join on the model-sized distance frame. Per-triple
  * ratios go through scaled-long sums (exact: σ ≤ 3⁶ < 1024 makes a
  * 9-dp tie impossible — see the q413 accumulator note).
  *
  * Scale shape: one corpus scan → |V|²-bounded edge census; 6 unrolled
  * walk-count joins and the triple join all run on ≤|V|² rows.
  *
  * CONTRACT — distance horizon: walk counts stop at length k = 6, so a
  * node pair whose shortest thinned-graph distance exceeds 6 is treated
  * as unreachable and contributes to neither sigma, closeness, nor
  * betweenness. On the 25-node top-3 trade graph the spec asserts the
  * observed diameter is ≤ 6 (BetweennessOpsSpec "horizon is vacuous"),
  * making the result exact there; on a graph with a larger diameter the
  * operator computes 6-hop-truncated centrality by design (raise the
  * unroll bound if exactness beyond 6 hops is needed).
  */
object BetweennessOps {

  /** Betweenness + closeness on the top-3 trade graph: per nation the
    * raw and normalized betweenness, closeness, reach count, and kept
    * out-edges. */
  val q432Betweenness: QueryDef = QueryDef(
    "q432_betweenness",
    (s, dir) => {
      val t = Tables(s, dir)
      // shared derived base table (GraphBase): directed nation trade edges
      val full = GraphBase.tradeEdgesDirected(s, dir)
      // deterministic top-3 thinning per source
      val edges = full
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("u")).orderBy(col("w").desc, col("v"))))
        .where(col("rn") <= 3)
        .select(col("u"), col("v"))
        .localCheckpoint() // 6 walk rounds + degree audit read it
      // walk counts per length k = 1..6
      var wk = edges.select(col("u").as("s"), col("v").as("t"),
        lit(1L).as("c"))
        .groupBy(col("s"), col("t")).agg(sum(col("c")).as("c"))
        .localCheckpoint()
      var allWalks = wk.withColumn("k", lit(1L))
      for (k <- 2 to 6) {
        wk = wk.join(edges.select(col("u").as("t"), col("v").as("nxt")),
          Seq("t"))
          .groupBy(col("s"), col("nxt").as("t")).agg(sum(col("c")).as("c"))
          .localCheckpoint()
        allWalks = allWalks.unionByName(wk.withColumn("k", lit(k.toLong)))
      }
      // shortest distance + path count σ = walk count at min k
      val sp = allWalks.where(col("s") =!= col("t"))
        .groupBy(col("s"), col("t"))
        .agg(min(struct(col("k"), col("c"))).as("m"))
        .select(col("s"), col("t"), col("m.k").as("d"), col("m.c").as("sigma"))
        .localCheckpoint() // triple join reads it three times
      // pair-sum dependency: all (s,v,t) with d(s,v)+d(v,t)=d(s,t)
      val bc = sp.select(col("s"), col("t").as("vx"), col("d").as("d1"),
          col("sigma").as("s1"))
        .join(sp.select(col("s").as("vx"), col("t"), col("d").as("d2"),
          col("sigma").as("s2")), Seq("vx"))
        .where(col("s") =!= col("t"))
        .join(sp.select(col("s"), col("t"), col("d"), col("sigma")),
          Seq("s", "t"))
        .where(col("d1") + col("d2") === col("d"))
        .groupBy(col("vx").as("nk"))
        .agg(sum(round(col("s1") * col("s2") / col("sigma") * 1e9)
          .cast("long")).as("bc9"))
      val clo = sp.groupBy(col("s").as("nk"))
        .agg(count(lit(1)).as("n_reach"), sum(col("d")).as("sum_d"))
      val nodes = edges.select(col("u").as("nk"))
        .union(edges.select(col("v").as("nk"))).distinct()
      val nTot = nodes.agg(count(lit(1)).as("n_nodes"))
      nodes
        .join(bc, Seq("nk"), "left").na.fill(0L, Seq("bc9"))
        .join(clo, Seq("nk"), "left").na.fill(0L, Seq("n_reach", "sum_d"))
        .crossJoin(broadcast(nTot))
        .join(broadcast(t.nation.select(col("n_nationkey").as("nk"),
          col("n_name").as("nation"))), Seq("nk"))
        .withColumn("betweenness", round(col("bc9").cast("double") / 1e9, 6))
        .withColumn("betweenness_norm", round(col("bc9").cast("double") / 1e9
          / ((col("n_nodes") - 1) * (col("n_nodes") - 2)), 9))
        .withColumn("closeness", when(col("sum_d") > 0,
          round(col("n_reach").cast("double") / col("sum_d"), 9))
          .otherwise(lit(0.0)))
        .select(col("nation"), col("betweenness"), col("betweenness_norm"),
          col("closeness"), col("n_reach"), col("sum_d"), col("n_nodes"))
        .orderBy(col("nation"))
    },
    Some {
      val walkCtes = (2 to 6).map { k =>
        s"""w$k AS (SELECT w.s, e.v AS t, CAST(SUM(w.c) AS BIGINT) AS c
          FROM w${k - 1} w JOIN edges e ON e.u = w.t GROUP BY 1, 2)"""
      }.mkString(",\n      ")
      val walkUnion = (1 to 6).map(k =>
        s"SELECT s, t, c, CAST($k AS BIGINT) AS k FROM w$k").mkString("\n        UNION ALL ")
      s"""WITH sh AS (SELECT l_partkey AS p, l_suppkey AS sid,
          epoch_us(l_shipdate) AS ts
        FROM lineitem),
      seq AS (SELECT sid,
          LEAD(sid) OVER (PARTITION BY p ORDER BY ts, sid) AS nv
        FROM sh),
      full_e AS (SELECT a.s_nationkey AS u, b.s_nationkey AS v,
          CAST(COUNT(*) AS BIGINT) AS w
        FROM seq
        JOIN supplier a ON a.s_suppkey = seq.sid
        JOIN supplier b ON b.s_suppkey = seq.nv
        WHERE seq.nv IS NOT NULL AND seq.nv <> seq.sid
          AND a.s_nationkey <> b.s_nationkey
        GROUP BY 1, 2),
      edges AS (SELECT u, v FROM (SELECT u, v,
          ROW_NUMBER() OVER (PARTITION BY u ORDER BY w DESC, v) AS rn
        FROM full_e) WHERE rn <= 3),
      w1 AS (SELECT u AS s, v AS t, CAST(COUNT(*) AS BIGINT) AS c
        FROM edges GROUP BY 1, 2),
      $walkCtes,
      allw AS ($walkUnion),
      sp AS (SELECT s, t,
          MIN(k) AS d,
          MIN_BY(c, k) AS sigma
        FROM allw WHERE s <> t GROUP BY 1, 2),
      bc AS (SELECT a.t AS nk,
          CAST(SUM(CAST(round(a.sigma * b.sigma / CAST(st.sigma AS DOUBLE)
            * 1e9) AS BIGINT)) AS BIGINT) AS bc9
        FROM sp a
        JOIN sp b ON b.s = a.t
        JOIN sp st ON st.s = a.s AND st.t = b.t
        WHERE a.s <> b.t AND a.d + b.d = st.d
        GROUP BY 1),
      clo AS (SELECT s AS nk, CAST(COUNT(*) AS BIGINT) AS n_reach,
          CAST(SUM(d) AS BIGINT) AS sum_d
        FROM sp GROUP BY 1),
      nodes AS (SELECT u AS nk FROM edges UNION SELECT v FROM edges),
      ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)
      SELECT n.n_name AS nation,
        round(CAST(COALESCE(b.bc9, 0) AS DOUBLE) / 1e9, 6) AS betweenness,
        round(CAST(COALESCE(b.bc9, 0) AS DOUBLE) / 1e9
          / ((t.n_nodes - 1) * (t.n_nodes - 2)), 9) AS betweenness_norm,
        CASE WHEN COALESCE(c.sum_d, 0) > 0
          THEN round(CAST(c.n_reach AS DOUBLE) / c.sum_d, 9)
          ELSE 0.0 END AS closeness,
        COALESCE(c.n_reach, 0) AS n_reach, COALESCE(c.sum_d, 0) AS sum_d,
        t.n_nodes
      FROM nodes nd
      LEFT JOIN bc b ON b.nk = nd.nk
      LEFT JOIN clo c ON c.nk = nd.nk
      CROSS JOIN ntot t
      JOIN nation n ON n.n_nationkey = nd.nk
      ORDER BY nation"""
    })

  val all: Seq[QueryDef] = Seq(q432Betweenness)
}
