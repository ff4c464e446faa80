package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sixth wave — graph analytics over the job-DAG shape: PageRank,
  * critical-path (longest-path) depth, the degree profile, and
  * reciprocal-rank fusion of independent document rankings. The reference
  * schedules DAGs but never analyzes them (/root/reference/src/overseer/
  * api.clj:64-88 builds graphs, jdbc.clj:96-116 walks them); these are the
  * introspection operators a 100 TB pipeline runs over its own dependency
  * structure — and, for q104, over its retrieval rankings.
  *
  * The test graph is deterministic and data-derived: node k (a part key)
  * points to k div 2 and k div 3 — a DAG with out-degree ≤ 2, in-degree
  * ≤ 5, and exponentially many root paths, so longest-path and PageRank
  * are non-trivial while every edge is reproducible in SQL on both
  * engines. */
object GraphAnalytics {

  /** (child, parent) edge table: k → k div 2 (k > 1) ∪ k → k div 3
    * (k > 2, where it differs from the div-2 parent). */
  private def dagEdges(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir).part.select(col("p_partkey").cast("long").as("child"))
    p.filter(col("child") > 1)
      .select(col("child"), expr("child div 2").as("parent"))
      .union(p.filter(col("child") > 2)
        .select(col("child"), expr("child div 3").as("parent"))
        .filter(col("parent") =!= expr("child div 2")))
  }

  private val edgesSql =
    """SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part WHERE p_partkey > 1
      |        UNION ALL
      |        SELECT p_partkey, p_partkey // 3 FROM part
      |        WHERE p_partkey > 2 AND p_partkey // 3 <> p_partkey // 2""".stripMargin

  /** PageRank, 3 unrolled power iterations, d = 0.85, uniform init 1/N —
    * the influence measure over the dependency DAG (which upstream jobs
    * does everything lean on?). The simplified formulation: dangling mass
    * is not redistributed (node 1 absorbs in-flow and emits none), which
    * both engines state identically. Shape per iteration: one equi-join
    * rank ⋈ edges on the source key, one hash agg on the destination key,
    * one left join back to the node frame — all linear in |E|, the
    * canonical distributed PageRank round. N is a metadata scalar read
    * once (like Tables.embeddingDim, no per-row action). Checkpoint per
    * iteration truncates the 3-round lineage. */
  val q101Pagerank: QueryDef = QueryDef(
    "q101_pagerank",
    (s, dir) => {
      val d = 0.85
      val edges = dagEdges(s, dir).localCheckpoint()
      val nodes = edges.select(col("child").as("node"))
        .union(edges.select(col("parent"))).distinct().localCheckpoint()
      val n = nodes.count()
      val outdeg = edges.groupBy(col("child")).agg(count(lit(1)).as("outdeg"))
      var pr = nodes.withColumn("pr", lit(1.0 / n))
      for (_ <- 1 to 3) {
        val contrib = edges
          .join(pr.withColumnRenamed("node", "child"), Seq("child"))
          .join(outdeg, Seq("child"))
          .groupBy(col("parent"))
          .agg(sum(col("pr") / col("outdeg")).as("inflow"))
        pr = nodes.join(contrib.withColumnRenamed("parent", "node"), Seq("node"), "left")
          .select(col("node"),
            (lit((1.0 - d) / n) + lit(d) * coalesce(col("inflow"), lit(0.0))).as("pr"))
          .localCheckpoint()
      }
      pr.select(col("node"), round(col("pr") * lit(1000.0), 9).as("pr_permille"))
    },
    Some(s"""WITH edges AS ($edgesSql),
      nodes AS (SELECT DISTINCT node FROM
        (SELECT child AS node FROM edges UNION ALL SELECT parent FROM edges)),
      n AS (SELECT COUNT(*) AS n FROM nodes),
      outdeg AS (SELECT child, COUNT(*) AS outdeg FROM edges GROUP BY 1),
      pr0 AS (SELECT node, 1.0 / n.n AS pr FROM nodes CROSS JOIN n),
      c1 AS (SELECT e.parent, SUM(p.pr / o.outdeg) AS inflow FROM edges e
        JOIN pr0 p ON p.node = e.child JOIN outdeg o ON o.child = e.child GROUP BY 1),
      pr1 AS (SELECT nodes.node, 0.15 / n.n + 0.85 * COALESCE(c1.inflow, 0.0) AS pr
        FROM nodes CROSS JOIN n LEFT JOIN c1 ON c1.parent = nodes.node),
      c2 AS (SELECT e.parent, SUM(p.pr / o.outdeg) AS inflow FROM edges e
        JOIN pr1 p ON p.node = e.child JOIN outdeg o ON o.child = e.child GROUP BY 1),
      pr2 AS (SELECT nodes.node, 0.15 / n.n + 0.85 * COALESCE(c2.inflow, 0.0) AS pr
        FROM nodes CROSS JOIN n LEFT JOIN c2 ON c2.parent = nodes.node),
      c3 AS (SELECT e.parent, SUM(p.pr / o.outdeg) AS inflow FROM edges e
        JOIN pr2 p ON p.node = e.child JOIN outdeg o ON o.child = e.child GROUP BY 1),
      pr3 AS (SELECT nodes.node, 0.15 / n.n + 0.85 * COALESCE(c3.inflow, 0.0) AS pr
        FROM nodes CROSS JOIN n LEFT JOIN c3 ON c3.parent = nodes.node)
      SELECT node, round(pr * 1000.0, 9) AS pr_permille FROM pr3"""))

  /** Critical-path depth: the LONGEST path from every node up to the root
    * — the DAG statistic that bounds pipeline makespan (a job at depth d
    * cannot start before d sequential waves). Where q21 computes min-depth
    * (BFS reachability), this is the max-fold: depth(v) = 1 +
    * max(depth(parents of v)), iterated to fixpoint. Two round-count
    * levers keep the driver loop off the critical path (a 15-round loop
    * of two jobs per round was 4.6 s at sf0.1; this shape halves it):
    *
    *  - 1..3-hop edge tables (GraphOps' trick widened, correct for max
    *    as for min: every hop-edge is a real path, and any path
    *    decomposes into ≤3-hop segments, so rounds = ceil(L/3) and the
    *    fold never overshoots; table size stays ≤ 3·|closure pairs ≤3
    *    apart|, built once in one checkpoint job);
    *  - ONE action per round: the next frame is LAZILY checkpointed and
    *    materialized by the convergence probe itself — a (Σ depth, n)
    *    aggregate, which under a monotone max-fold strictly increases
    *    until, exactly at the fixpoint, it is unchanged.
    *
    * The oracle enumerates every root path recursively and takes the max
    * — exponentially many paths, affordable only at oracle scale; the
    * Spark side never enumerates paths at all (the max-fold carries just
    * (node, best-so-far), which is what survives at 100 TB). */
  val q102CriticalPath: QueryDef = QueryDef(
    "q102_critical_path",
    (s, dir) => {
      val e1 = dagEdges(s, dir)
      val hopWidth = 3
      val byHop = Iterator.iterate(e1) { ek =>
        ek.select(col("child"), col("parent").as("mid"))
          .join(e1.select(col("child").as("mid"), col("parent")), Seq("mid"))
          .select(col("child"), col("parent")).distinct()
      }.take(hopWidth).toSeq
      val hops = byHop.zipWithIndex
        .map { case (e, i) => e.withColumn("hop", lit((i + 1).toLong)) }
        .reduce(_ union _)
        .localCheckpoint()
      var depth = s.range(1, 2).select(col("id").as("node"), lit(0L).as("depth"))
      var fp = (-1L, -1L)
      var prev = (-2L, -2L)
      while (fp != prev) {
        prev = fp
        val viaAncestor = hops
          .join(depth.withColumnRenamed("node", "parent"), Seq("parent"))
          .select(col("child").as("node"), (col("depth") + col("hop")).as("depth"))
        val next = depth.union(viaAncestor)
          .groupBy(col("node")).agg(max(col("depth")).as("depth"))
          .localCheckpoint(eager = false)
        val probe = next.agg(sum(col("depth")), count(lit(1))).head()
        fp = (probe.getLong(0), probe.getLong(1))
        depth = next
      }
      depth.filter(col("depth") > 0)
    },
    Some(s"""WITH RECURSIVE edges AS ($edgesSql),
      d AS (
        SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
        UNION ALL
        SELECT e.child, d.depth + 1 FROM d JOIN edges e ON e.parent = d.node)
      SELECT node, MAX(depth) AS depth FROM d GROUP BY 1 HAVING MAX(depth) > 0"""))

  /** Degree profile of the DAG: per (in-degree, out-degree) pair, how many
    * nodes — the shape diagnostic that catches degenerate graphs (a
    * million-child fan-in means a hot shuffle key downstream) before they
    * hit the scheduler. Two hash aggs on node keys + one left join from
    * the node frame; linear, and the profile itself is degree-bounded
    * (tiny) at any graph size. */
  val q103DegreeProfile: QueryDef = QueryDef(
    "q103_degree_profile",
    (s, dir) => {
      val edges = dagEdges(s, dir).localCheckpoint()
      val nodes = edges.select(col("child").as("node"))
        .union(edges.select(col("parent"))).distinct()
      val out = edges.groupBy(col("child").as("node")).agg(count(lit(1)).as("outdeg"))
      val in  = edges.groupBy(col("parent").as("node")).agg(count(lit(1)).as("indeg"))
      nodes.join(out, Seq("node"), "left").join(in, Seq("node"), "left")
        .select(coalesce(col("indeg"), lit(0L)).as("indeg"),
                coalesce(col("outdeg"), lit(0L)).as("outdeg"))
        .groupBy(col("indeg"), col("outdeg"))
        .agg(count(lit(1)).as("n_nodes"))
    },
    Some(s"""WITH edges AS ($edgesSql),
      nodes AS (SELECT DISTINCT node FROM
        (SELECT child AS node FROM edges UNION ALL SELECT parent FROM edges)),
      o AS (SELECT child AS node, COUNT(*) AS outdeg FROM edges GROUP BY 1),
      i AS (SELECT parent AS node, COUNT(*) AS indeg FROM edges GROUP BY 1)
      SELECT COALESCE(i.indeg, 0) AS indeg, COALESCE(o.outdeg, 0) AS outdeg,
        CAST(COUNT(*) AS BIGINT) AS n_nodes
      FROM nodes LEFT JOIN o USING (node) LEFT JOIN i USING (node)
      GROUP BY 1, 2"""))

  /** Reciprocal-rank fusion (k = 60) of two independent document
    * rankings: lexical relevance (q91's BM25 over the fixed query terms)
    * and a quality prior (type-token ratio, q83's signal) — the standard
    * score-free way to merge heterogeneous retrieval signals when mining
    * domain-relevant, high-quality training documents. Absent from a
    * ranking contributes 0 (the full-outer-join convention). 1/(60+rank)
    * on integer ranks is bit-identical on both engines; the top-50 cut
    * breaks ties by doc_id. Shape: two window ranks over already-tiny
    * frames + one full outer join on doc_id + one global top-k. */
  val q104RrfFusion: QueryDef = QueryDef(
    "q104_rrf_fusion",
    (s, dir) => {
      // both full input rankings size-adaptive (r15): window at bench
      // scale, spine above. r15-opt: the probe is ONE shared parquet
      // row count of documents — an upper bound on both rank frames
      // (each is ≤ one row per doc), so the physical window-vs-spine
      // choice stays safe while the two score-frame localCheckpoints
      // and per-frame count jobs the first rewrite added are gone
      // (measured +0.3–0.4 s at sf0.1; see OPTIMIZATION_r15.md).
      val nDocsBound = Tables(s, dir).documents.count()
      val bm = Spine.adaptiveRank(CurationOps.q91Bm25.fn(s, dir),
          Seq(col("bm25").desc, col("doc_id").asc),
          rankCol = "r_bm25", knownCount = nDocsBound)
        .select(col("doc_id"), col("r_bm25"))
      val ttrScores = Tables(s, dir).documents
        .withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .withColumn("ttr", round(
          size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")).cast("double"), 9))
        .select(col("doc_id"), col("ttr"))
      val ttr = Spine.adaptiveRank(ttrScores,
          Seq(col("ttr").desc, col("doc_id").asc),
          rankCol = "r_ttr", knownCount = nDocsBound)
        .select(col("doc_id"), col("r_ttr"))
      bm.join(ttr, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60.0) + col("r_bm25")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60.0) + col("r_ttr")), lit(0.0)), 9))
        .orderBy(col("rrf").desc, col("doc_id").asc).limit(50)
        .withColumn("rank", row_number().over( // 50-row slice (r15)
          Window.orderBy(col("rrf").desc, col("doc_id").asc)).cast("long"))
        .select(col("doc_id"), col("rrf"), col("rank"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\w+')) AS token
        FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      bm AS (SELECT tf.doc_id,
          round(SUM(
            ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 6) AS bm25
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s
        GROUP BY 1),
      rb AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
          ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_bm25 FROM bm),
      t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS tk FROM documents),
      q AS (SELECT doc_id, round(
            CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 9) AS ttr
        FROM t WHERE len(tk) > 0),
      rt AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
          ORDER BY ttr DESC, doc_id) AS BIGINT) AS r_ttr FROM q),
      fused AS (SELECT COALESCE(rb.doc_id, rt.doc_id) AS doc_id,
          round(COALESCE(1.0 / (60.0 + rb.r_bm25), 0.0)
              + COALESCE(1.0 / (60.0 + rt.r_ttr), 0.0), 9) AS rrf
        FROM rb FULL OUTER JOIN rt ON rb.doc_id = rt.doc_id)
      SELECT doc_id, rrf, rank FROM (
        SELECT doc_id, rrf, CAST(ROW_NUMBER() OVER (
          ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank FROM fused)
      WHERE rank <= 50"""))

  /** Triangle counting on the co-purchase graph (parts sharing ≥2 orders)
    * with DEGREE ORIENTATION — the standard trick that makes distributed
    * triangle counting feasible: orient every edge from its lower-degree
    * endpoint to its higher-degree one (ties by id), so wedges are only
    * enumerated at each triangle's lowest-degree vertex. The wedge count
    * drops from Σ deg(v)² (quadratic in hub degree — fatal on skewed
    * graphs) to O(m^1.5), and every triangle is produced exactly once, so
    * no distinct/dedup stage is needed. Three equi-joins, all on vertex
    * keys; the oracle is the naive id-oriented triple self-join, proving
    * the orientation loses nothing. Output: per-vertex triangle counts.
    */
  val q111TriangleCount: QueryDef = QueryDef(
    "q111_triangle_count",
    (s, dir) => {
      // shared derived base table (GraphBase): a parquet-backed leaf scan,
      // re-read for degrees, wedges, and the closing join
      val edges = GraphBase.coPurchaseEdgesRaw(s, dir)
      val deg = edges.select(col("x").as("v"))
        .unionAll(edges.select(col("y").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      // orient by (deg, id): lo -> hi
      val oriented = edges
        .join(deg.select(col("v").as("x"), col("deg").as("dx")), "x")
        .join(deg.select(col("v").as("y"), col("deg").as("dy")), "y")
        .select(
          when(col("dx") < col("dy") ||
               (col("dx") === col("dy") && col("x") < col("y")), col("x"))
            .otherwise(col("y")).as("lo"),
          when(col("dx") < col("dy") ||
               (col("dx") === col("dy") && col("x") < col("y")), col("y"))
            .otherwise(col("x")).as("hi"),
          when(col("dx") < col("dy") ||
               (col("dx") === col("dy") && col("x") < col("y")), col("dy"))
            .otherwise(col("dx")).as("dhi"))
      val o1 = oriented.select(col("lo").as("a"), col("hi").as("b"), col("dhi").as("db"))
      val o2 = oriented.select(col("lo").as("a"), col("hi").as("c"), col("dhi").as("dc"))
      val wedges = o1.join(o2, "a")
        .filter(col("db") < col("dc") ||
                (col("db") === col("dc") && col("b") < col("c")))
        .select(col("a"), col("b"), col("c"))
      val tris = wedges.join(
        oriented.select(col("lo").as("b"), col("hi").as("c")), Seq("b", "c"))
      tris.select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
        .groupBy(col("part_id")).agg(count(lit(1)).as("n_triangles"))
    },
    Some("""WITH e AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      tri AS (
        SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM e e1 JOIN e e2 ON e1.y = e2.x
                  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
      SELECT part_id, COUNT(*) AS n_triangles FROM (
        SELECT a AS part_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
      GROUP BY 1"""))

  /** Degree-capped triangle counting — the documented q111 mitigation for
    * catalog-fixed scaling, now in code. Under ScaleGen's convention the
    * part catalog is fixed while orders grow, so co-purchase degrees grow
    * ~linearly with SF and q111's wedge volume (even degree-oriented,
    * O(m^1.5)) outgrows any one machine: sf10 measured ~2,400 median
    * degree on 20k vertices — a near-complete graph whose exact triangle
    * count is neither computable in the sandbox nor interesting. The
    * standard production answer (cap hub degrees): keep each vertex's
    * `cap` lowest-id neighbors, keep an edge only when it survives in
    * BOTH endpoints' capped lists (so the capped graph is well-defined
    * and symmetric), and count EXACTLY on that graph — wedges are bounded
    * by N·cap² at any scale. The report states what was excluded: edge
    * counts before/after and an upper bound on lost triangles
    * (Σ over dropped edges of min(deg_u, deg_v) − 1 common-neighbor
    * slots; a lost triangle has ≥ 1 dropped edge, so the sum dominates
    * the true loss — GraphAnalyticsSpec asserts the bound against the
    * uncapped q111 count). cap = 8 binds on the sf0.01 gate fixture
    * (max degree 15) so the oracle exercises the capping path, and keeps
    * the sf10 near-complete graph at ~N·32 wedges. */
  val q338CappedTriangles: QueryDef = QueryDef(
    "q338_capped_triangles",
    (s, dir) => {
      val cap = 8
      // shared derived base tables (GraphBase): both parquet-backed, so
      // the ranking/degree/audit passes below are re-reads of a leaf scan
      val edges = GraphBase.coPurchaseEdgesRaw(s, dir)
      val deg = edges.select(col("x").as("v"))
        .unionAll(edges.select(col("y").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val kept = GraphBase.cappedCoPurchase(s, dir, cap)
      // id-oriented exact count on the capped graph: with per-vertex
      // adjacency ≤ cap the wedge frame is ≤ N·cap²/2 rows at ANY scale —
      // no degree orientation needed
      val wedges = kept.select(col("x").as("a"), col("y").as("b"))
        .join(kept.select(col("x").as("a"), col("y").as("c")), "a")
        .filter(col("b") < col("c"))
      val tris = wedges.join(kept.select(col("x").as("b"), col("y").as("c")), Seq("b", "c"))
      val perV = tris.select(explode(array(col("a"), col("b"), col("c"))).as("part_id"))
        .groupBy(col("part_id")).agg(count(lit(1)).as("n_triangles"))
      val dropped = edges.join(kept, Seq("x", "y"), "left_anti")
      val bound = dropped
        .join(deg.select(col("v").as("x"), col("deg").as("dx")), "x")
        .join(deg.select(col("v").as("y"), col("deg").as("dy")), "y")
        .agg(count(lit(1)).as("n_edges_dropped"),
          coalesce(sum(least(col("dx"), col("dy")) - 1), lit(0L)).as("excluded_bound"))
      perV
        .crossJoin(broadcast(edges.agg(count(lit(1)).as("n_edges"))))
        .crossJoin(broadcast(kept.agg(count(lit(1)).as("n_edges_kept"))))
        .crossJoin(broadcast(bound))
    },
    Some("""WITH e AS (
        SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      adj AS (SELECT x AS v, y AS n FROM e UNION ALL SELECT y, x FROM e),
      ranked AS (SELECT v, n,
          ROW_NUMBER() OVER (PARTITION BY v ORDER BY n) AS rk FROM adj),
      deg AS (SELECT v, COUNT(*) AS d FROM adj GROUP BY 1),
      keptdir AS (SELECT v, n FROM ranked WHERE rk <= 8),
      kept AS (SELECT k1.v AS x, k1.n AS y FROM keptdir k1
        JOIN keptdir k2 ON k2.v = k1.n AND k2.n = k1.v
        WHERE k1.v < k1.n),
      tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
        FROM kept e1 JOIN kept e2 ON e1.x = e2.x AND e1.y < e2.y
        JOIN kept e3 ON e3.x = e1.y AND e3.y = e2.y),
      perv AS (SELECT part_id, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM (
        SELECT a AS part_id FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri) GROUP BY 1),
      dropped AS (SELECT e.x, e.y FROM e
        LEFT JOIN kept k ON k.x = e.x AND k.y = e.y WHERE k.x IS NULL),
      db AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges_dropped,
          CAST(COALESCE(SUM(LEAST(dx.d, dy.d) - 1), 0) AS BIGINT) AS excluded_bound
        FROM dropped JOIN deg dx ON dx.v = dropped.x
                     JOIN deg dy ON dy.v = dropped.y)
      SELECT part_id, n_triangles,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM kept) AS n_edges_kept,
        n_edges_dropped, excluded_bound
      FROM perv CROSS JOIN db"""))

  val all: Seq[QueryDef] = Seq(q101Pagerank, q102CriticalPath,
    q103DegreeProfile, q104RrfFusion, q111TriangleCount, q338CappedTriangles)
}
