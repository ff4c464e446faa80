package graft.ops

import org.apache.spark.sql.functions._

/** Network-structure statistics over the nation trade graph — the three
  * global shape numbers a graph report leads with beyond centralities:
  *
  *  - q522 degree assortativity (Newman 2002): do high-degree nodes
  *    link to high-degree nodes? The Pearson correlation of degrees at
  *    the two ends of every (directed-orientation) edge.
  *  - q523 rich-club coefficient (Zhou & Mondragón 2004): among nodes
  *    with degree > k, what fraction of possible edges exist? Swept
  *    over k ∈ {2,4,6,8}.
  *  - q524 reciprocity: what fraction of directed trade edges are
  *    returned in the opposite direction?
  *
  * (Reference: overseer's graph family — the dependency DAG analytics
  * of SURVEY §2E; arbitrary handler fns, src/overseer/executor.clj:12-39.)
  *
  * Scale shape: the corpus-sized work is GraphBase's one shared trade
  * scan; every statistic is then equi-joins + hash-aggs on the
  * |V|²-bounded edge census (degrees broadcast onto edges; the
  * rich-club sweep is a 4-row dimension fan-out).
  *
  * Exactness: degrees and edge counts are BIGINTs; each coefficient is
  * ONE float expression over exact integer sums (assortativity uses
  * the 2E-orientation sums so no rational means appear), rounded for
  * display. Cross-engine deterministic.
  */
object NetStructOps {

  private val tradeSql = """handoff AS MATERIALIZED (SELECT l_partkey AS p, l_suppkey AS sid,
          epoch_us(CAST(l_shipdate AS TIMESTAMP)) AS ts,
          LEAD(l_suppkey) OVER (PARTITION BY l_partkey
            ORDER BY epoch_us(CAST(l_shipdate AS TIMESTAMP)), l_suppkey)
            AS nv
        FROM lineitem),
      dedges AS MATERIALIZED (SELECT s1.s_nationkey AS u, s2.s_nationkey AS v,
          CAST(COUNT(*) AS BIGINT) AS w
        FROM handoff h
        JOIN supplier s1 ON s1.s_suppkey = h.sid
        JOIN supplier s2 ON s2.s_suppkey = h.nv
        WHERE h.nv IS NOT NULL AND h.nv <> h.sid
          AND s1.s_nationkey <> s2.s_nationkey
        GROUP BY 1, 2),
      sym AS MATERIALIZED (
        SELECT LEAST(u, v) AS a, GREATEST(u, v) AS b, SUM(w) AS w
        FROM dedges GROUP BY 1, 2)"""

  /** Undirected degree (distinct neighbors) per node. */
  private def degrees(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val sym = GraphBase.tradeEdgesUndirected(s, dir)
    sym.select(col("a").as("node")).union(sym.select(col("b")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
  }

  /** q522 runs on the τ-thresholded STRONG backbone (q512's
    * 75th-percentile cut): the raw trade graph saturates to K_|V| as SF
    * grows (every degree equal → zero degree variance → the coefficient
    * is undefined); the backbone keeps the degree distribution
    * informative at every SF. */
  val q522Assortativity: QueryDef = QueryDef(
    "q522_assortativity",
    (s, dir) => {
      val raw = GraphBase.tradeEdgesUndirected(s, dir)
      val tau = raw
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("w"), col("a"), col("b"))))
        .crossJoin(broadcast(raw.agg(count(lit(1)).as("e"))))
        .where(col("rn") === ceil(col("e") * 0.75).cast("int"))
        .select(col("w").as("tau"))
      val sym = raw.crossJoin(broadcast(tau)).where(col("w") >= col("tau"))
        .select(col("a"), col("b")).localCheckpoint()
      val deg = sym.select(col("a").as("node")).union(sym.select(col("b")))
        .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      // both orientations: (j, k) and (k, j) — Newman's M = 2|E| sums
      val ends = sym
        .join(deg.select(col("node").as("a"), col("deg").as("ja")), Seq("a"))
        .join(deg.select(col("node").as("b"), col("deg").as("jb")), Seq("b"))
        .select(col("ja").as("j"), col("jb").as("k"))
        .union(sym
          .join(deg.select(col("node").as("a"), col("deg").as("jb")), Seq("a"))
          .join(deg.select(col("node").as("b"), col("deg").as("ja")), Seq("b"))
          .select(col("ja").as("j"), col("jb").as("k")))
      ends.agg(count(lit(1)).as("m"),
          sum(col("j") * col("k")).as("sjk"),
          sum(col("j") + col("k")).as("sj"),
          sum(col("j") * col("j") + col("k") * col("k")).as("sq"))
        .select(col("m"),
          round((col("m").cast("double") * col("sjk") -
              (col("sj").cast("double") / 2) * (col("sj").cast("double") / 2)) /
            (col("m").cast("double") * col("sq") / 2 -
              (col("sj").cast("double") / 2) * (col("sj").cast("double") / 2)),
            9).as("assortativity"))
    },
    Some(s"""WITH $tradeSql,
      ranked AS (SELECT w, row_number() OVER (ORDER BY w, a, b) AS rn FROM sym),
      tau AS (SELECT w AS tau FROM ranked
        WHERE rn = CAST(ceil((SELECT COUNT(*) FROM sym) * 0.75) AS INT)),
      strong AS MATERIALIZED (
        SELECT a, b FROM sym CROSS JOIN tau WHERE w >= tau),
      deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
          (SELECT a AS node FROM strong UNION ALL SELECT b FROM strong)
        GROUP BY 1),
      ends AS (
        SELECT da.deg AS j, db.deg AS k FROM strong
          JOIN deg da ON da.node = strong.a JOIN deg db ON db.node = strong.b
        UNION ALL
        SELECT db.deg, da.deg FROM strong
          JOIN deg da ON da.node = strong.a JOIN deg db ON db.node = strong.b),
      sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS m,
          CAST(SUM(j * k) AS BIGINT) AS sjk,
          CAST(SUM(j + k) AS BIGINT) AS sj,
          CAST(SUM(j * j + k * k) AS BIGINT) AS sq
        FROM ends)
      SELECT m,
        round((CAST(m AS DOUBLE) * sjk -
            (CAST(sj AS DOUBLE) / 2) * (CAST(sj AS DOUBLE) / 2)) /
          (CAST(m AS DOUBLE) * sq / 2 -
            (CAST(sj AS DOUBLE) / 2) * (CAST(sj AS DOUBLE) / 2)), 9)
          AS assortativity
      FROM sums"""))

  val q523RichClub: QueryDef = QueryDef(
    "q523_rich_club",
    (s, dir) => {
      val sym = GraphBase.tradeEdgesUndirected(s, dir).localCheckpoint()
      val deg = degrees(s, dir).localCheckpoint()
      val ks = s.range(1, 5).select((col("id") * 2).as("k"))
      val club = broadcast(ks).join(deg, col("deg") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("n_k"))
      val edges = broadcast(ks)
        .join(sym
          .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
          .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b")),
          col("da") > col("k") && col("db") > col("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("e_k"))
      club.join(edges, Seq("k"), "left").na.fill(0L, Seq("e_k"))
        .select(col("k"), col("n_k"), col("e_k"),
          round(lit(2.0) * col("e_k") / (col("n_k") * (col("n_k") - 1)), 9)
            .as("phi"))
    },
    Some(s"""WITH $tradeSql,
      deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM
          (SELECT a AS node FROM sym UNION ALL SELECT b FROM sym)
        GROUP BY 1),
      ks AS (SELECT unnest([2, 4, 6, 8]) AS k),
      club AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k
        FROM ks JOIN deg ON deg.deg > ks.k GROUP BY 1),
      edges AS (
        SELECT k, CAST(COUNT(*) AS BIGINT) AS e_k
        FROM ks JOIN (
          SELECT da.deg AS da, db.deg AS db FROM sym
          JOIN deg da ON da.node = sym.a
          JOIN deg db ON db.node = sym.b) e
          ON e.da > ks.k AND e.db > ks.k
        GROUP BY 1)
      SELECT CAST(c.k AS BIGINT) AS k, c.n_k, COALESCE(e.e_k, 0) AS e_k,
        round(2.0 * COALESCE(e.e_k, 0) / (c.n_k * (c.n_k - 1)), 9) AS phi
      FROM club c LEFT JOIN edges e ON e.k = c.k"""))

  val q524Reciprocity: QueryDef = QueryDef(
    "q524_reciprocity",
    (s, dir) => {
      val d = GraphBase.tradeEdgesDirected(s, dir).localCheckpoint()
      val back = d.select(col("v").as("u"), col("u").as("v"),
        lit(1L).as("has_back"))
      d.join(back, Seq("u", "v"), "left")
        .agg(count(lit(1)).as("n_edges"),
          sum(coalesce(col("has_back"), lit(0L))).as("n_recip"))
        .select(col("n_edges"), col("n_recip"),
          round(col("n_recip").cast("double") / col("n_edges"), 9)
            .as("reciprocity"))
    },
    Some(s"""WITH $tradeSql
      SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
        CAST(SUM(CASE WHEN r.u IS NULL THEN 0 ELSE 1 END) AS BIGINT)
          AS n_recip,
        round(CAST(SUM(CASE WHEN r.u IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
          / COUNT(*), 9) AS reciprocity
      FROM dedges d
      LEFT JOIN dedges r ON r.u = d.v AND r.v = d.u"""))

  val all: Seq[QueryDef] = Seq(q522Assortativity, q523RichClub, q524Reciprocity)
}
