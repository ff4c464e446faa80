package graft.ops

import org.apache.spark.sql.functions._

/** Personalized PageRank (random walk with restart; Jeh & Widom 2003's
  * "Scaling personalized web search") from a SEED SET — the "related
  * to THESE nodes" ranking that powers recommendation and local graph
  * exploration, where plain PageRank (q101) ranks global importance.
  * Seeds are the AMERICA-region nations; the walk runs 3 iterations at
  * damping 0.85 over the directed nation trade graph with
  * weight-proportional transitions (reference: overseer's arbitrary
  * handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: each iteration is one (edges ⋈ ranks) equi-join +
  * hash-agg — rank state is |V| rows, edge fan-out is the only
  * data-sized object, identical to q101's loop. Teleport mass is a
  * seed-only constant, not a global broadcast.
  *
  * Exactness: INTEGER-LATTICE PageRank — mass is carried in units of
  * 1e-12 of the walk (START = 10¹²), per-edge contributions are
  * (pr DIV out_w)·w (divide-then-multiply keeps every intermediate ≤
  * pr, so nothing overflows at any SF), and damping is ·85 DIV 100.
  * Floor-division loses ≤ out_w units per node per round — a
  * documented quantization of the OPERATOR's contract, in exchange for
  * bit-identical cross-engine ranks (the q488 τ-quantization
  * discipline). Ties in rank order are broken by node id.
  */
object PprOps {

  private val Start = 1000000000000L // 1e12 mass units

  val q513PersonalizedPagerank: QueryDef = QueryDef(
    "q513_personalized_pagerank",
    (s, dir) => {
      val t = Tables(s, dir)
      val edges = GraphBase.tradeEdgesDirected(s, dir).localCheckpoint()
      val outw = edges.groupBy(col("u")).agg(sum(col("w")).as("out_w"))
      val seeds = t.nation
        .join(broadcast(t.region.where(col("r_name") === "AMERICA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey").as("node")).localCheckpoint()
      val nSeeds = seeds.count()
      val teleport = Start / nSeeds * 15L / 100L
      val nodes = edges.select(col("u").as("node"))
        .union(edges.select(col("v"))).distinct()
        .join(seeds.withColumn("is_seed", lit(true)), Seq("node"), "left")
        .na.fill(false, Seq("is_seed")).localCheckpoint()
      var pr = nodes.select(col("node"), col("is_seed"),
        when(col("is_seed"), lit(Start / nSeeds)).otherwise(lit(0L)).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(pr.select(col("node").as("u"), col("pr")), Seq("u"))
          .join(outw, Seq("u"))
          .groupBy(col("v").as("node"))
          // integer DIV, not `/` (double division could round up across
          // an integer boundary and diverge from the oracle's floor)
          .agg(sum(expr("(pr DIV out_w) * w")).as("inflow"))
        pr = nodes.join(contrib, Seq("node"), "left")
          .select(col("node"), col("is_seed"),
            (expr("coalesce(inflow, 0L) * 85 DIV 100") +
              when(col("is_seed"), lit(teleport)).otherwise(lit(0L))).as("pr"))
          .localCheckpoint()
      }
      pr.select(col("node"), col("pr").as("ppr_mass"))
    },
    Some {
      val iter = (k: Int) => s"""
      c$k AS (SELECT e.v AS node,
          CAST(SUM((p.pr // o.out_w) * e.w) AS BIGINT) AS inflow
        FROM edges e
        JOIN pr${k - 1} p ON p.node = e.u
        JOIN outw o ON o.u = e.u
        GROUP BY 1),
      pr$k AS (SELECT n.node, n.is_seed,
          CAST(COALESCE(c.inflow, 0) * 85 // 100 +
            CASE WHEN n.is_seed THEN (SELECT t FROM tp) ELSE 0 END AS BIGINT)
            AS pr
        FROM nodes n LEFT JOIN c$k c ON c.node = n.node)"""
      s"""WITH handoff AS MATERIALIZED (SELECT l_partkey AS p, l_suppkey AS sid,
          epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS ts,
          LEAD(l_suppkey) OVER (PARTITION BY l_partkey
            ORDER BY epoch_us(CAST(l_shipdate AS TIMESTAMP)), l_suppkey)
            AS nv
        FROM lineitem),
      edges AS MATERIALIZED (SELECT s1.s_nationkey AS u, s2.s_nationkey AS v,
          CAST(COUNT(*) AS BIGINT) AS w
        FROM handoff h
        JOIN supplier s1 ON s1.s_suppkey = h.sid
        JOIN supplier s2 ON s2.s_suppkey = h.nv
        WHERE h.nv IS NOT NULL AND h.nv <> h.sid
          AND s1.s_nationkey <> s2.s_nationkey
        GROUP BY 1, 2),
      outw AS (SELECT u, SUM(w) AS out_w FROM edges GROUP BY 1),
      seeds AS (SELECT n_nationkey AS node FROM nation
        JOIN region ON r_regionkey = n_regionkey WHERE r_name = 'AMERICA'),
      ns AS (SELECT COUNT(*) AS n FROM seeds),
      tp AS (SELECT $Start // n * 15 // 100 AS t FROM ns),
      nodes AS (
        SELECT x.node, s.node IS NOT NULL AS is_seed
        FROM (SELECT DISTINCT u AS node FROM edges
              UNION SELECT v FROM edges) x
        LEFT JOIN seeds s ON s.node = x.node),
      pr0 AS (SELECT node, is_seed,
          CASE WHEN is_seed THEN $Start // (SELECT n FROM ns) ELSE 0 END AS pr
        FROM nodes),
      ${iter(1)},
      ${iter(2)},
      ${iter(3)}
      SELECT node, pr AS ppr_mass FROM pr3"""
    })

  val all: Seq[QueryDef] = Seq(q513PersonalizedPagerank)
}
