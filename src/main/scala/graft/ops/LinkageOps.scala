package graft.ops

import org.apache.spark.sql.functions._

/** Flat single-linkage clustering by dendrogram cut (Sibson 1973's
  * SLINK semantics, extracted relationally): merge any two nations
  * whose trade similarity meets the cut level τ, where τ is the
  * 75th-percentile edge weight (an order statistic of the edge list,
  * so the cut tracks the data across SFs). Connected components of the
  * τ-thresholded graph ARE the single-linkage flat clusters at level τ
  * — the same extraction a dendrogram cut performs, without
  * materializing the dendrogram (reference: overseer's arbitrary
  * handler fns, src/overseer/executor.clj:12-39; clustering is a
  * first-class curation op here).
  *
  * Scale shape: the corpus-sized work is GraphBase's one trade-edge
  * scan (shared, parquet-materialized); thresholding is a 1-row
  * order-statistic broadcast; components run label propagation on the
  * |nations|-bounded backbone — O(diameter) rounds of equi-joins.
  *
  * Exactness: weights are BIGINT handoff counts, τ is the exact
  * rank-⌈0.75·E⌉ order statistic (no interpolation), labels are MIN
  * node ids — every column integer, cross-engine deterministic.
  */
object LinkageOps {

  val q512SingleLinkage: QueryDef = QueryDef(
    "q512_single_linkage",
    (s, dir) => {
      val sym = GraphBase.tradeEdgesUndirected(s, dir).localCheckpoint()
      // τ = exact order statistic at rank ceil(0.75·E), ascending
      val tau = sym
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window.orderBy(col("w"), col("a"), col("b"))))
        .crossJoin(broadcast(sym.agg(count(lit(1)).as("e"))))
        .where(col("rn") === ceil(col("e") * 0.75).cast("int"))
        .select(col("w").as("tau"))
      val strong = sym.crossJoin(broadcast(tau))
        .where(col("w") >= col("tau"))
        .select(col("a").as("id_a"), col("b").as("id_b"))
      val labels = GraphOps.connectedComponents(s, strong)
      val nodes = sym.select(col("a").as("id"))
        .union(sym.select(col("b"))).distinct()
      val member = nodes.join(labels, Seq("id"), "left")
        .select(col("id").as("node"),
          coalesce(col("label"), col("id")).as("cluster"))
      member.groupBy(col("cluster"))
        .agg(count(lit(1)).as("cluster_size"))
        .join(member, Seq("cluster"))
        .select(col("node"), col("cluster"), col("cluster_size"))
    },
    Some("""WITH RECURSIVE handoff AS MATERIALIZED (SELECT l_partkey AS p, l_suppkey AS sid,
          epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS ts,
          LEAD(l_suppkey) OVER (PARTITION BY l_partkey
            ORDER BY epoch_us(CAST(l_shipdate AS TIMESTAMP)), l_suppkey)
            AS nv
        FROM lineitem),
      sym AS MATERIALIZED (SELECT LEAST(s1.s_nationkey, s2.s_nationkey) AS a,
          GREATEST(s1.s_nationkey, s2.s_nationkey) AS b,
          CAST(COUNT(*) AS BIGINT) AS w
        FROM handoff h
        JOIN supplier s1 ON s1.s_suppkey = h.sid
        JOIN supplier s2 ON s2.s_suppkey = h.nv
        WHERE h.nv IS NOT NULL AND h.nv <> h.sid
          AND s1.s_nationkey <> s2.s_nationkey
        GROUP BY 1, 2),
      ranked AS (SELECT w, row_number() OVER (ORDER BY w, a, b) AS rn FROM sym),
      tau AS (SELECT w AS tau FROM ranked
        WHERE rn = CAST(ceil((SELECT COUNT(*) FROM sym) * 0.75) AS INT)),
      strong AS (SELECT a, b FROM sym CROSS JOIN tau WHERE w >= tau),
      e AS (SELECT a AS src, b AS dst FROM strong
            UNION ALL SELECT b, a FROM strong),
      reach AS (
        SELECT src AS id, src AS r FROM e
        UNION
        SELECT reach.id, e.dst FROM reach JOIN e ON e.src = reach.r),
      cl AS (SELECT id, MIN(r) AS cluster FROM reach GROUP BY 1),
      nodes AS (SELECT DISTINCT node FROM
        (SELECT a AS node FROM sym UNION ALL SELECT b FROM sym)),
      member AS (
        SELECT n.node, COALESCE(cl.cluster, n.node) AS cluster
        FROM nodes n LEFT JOIN cl ON cl.id = n.node)
      SELECT node, cluster,
        CAST(COUNT(*) OVER (PARTITION BY cluster) AS BIGINT) AS cluster_size
      FROM member"""))

  val all: Seq[QueryDef] = Seq(q512SingleLinkage)
}
