package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** K-truss wave: iterative 4-truss peeling on the capped co-purchase
  * graph — the cohesion filter between q228's k-core (degree-based)
  * and exact community detection: an edge survives only while it sits
  * in ≥ 2 triangles, and removals cascade.
  *
  * Scale shape: every round is the q338 wedge join on the CURRENT
  * (shrinking) edge set — ≤ N·cap² wedge rows at any scale — with a
  * localCheckpoint per round so Catalyst analysis stays linear (the
  * q21 closure discipline). The round count is FIXED (6, unrolled
  * identically in the oracle), not data-dependent: converged rounds
  * peel zero edges and the trace proves the fixpoint.
  */
object TrussOps {

  private val Rounds = 6

  /** One peeling round: keep edges with triangle support ≥ 2. */
  private def peel(kept: DataFrame): DataFrame = {
    val wedges = kept.select(col("x").as("a"), col("y").as("b"))
      .join(kept.select(col("x").as("a"), col("y").as("c")), "a")
      .filter(col("b") < col("c"))
    val tris = wedges.join(kept.select(col("x").as("b"), col("y").as("c")),
      Seq("b", "c"))
    val sup = tris
      .select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("a").as("x"), col("c").as("y")),
        struct(col("b").as("x"), col("c").as("y")))).as("e"))
      .groupBy(col("e.x").as("x"), col("e.y").as("y"))
      .agg(count(lit(1)).as("sup"))
    kept.join(sup, Seq("x", "y"), "left")
      .filter(coalesce(col("sup"), lit(0L)) >= 2)
      .select(col("x"), col("y"))
  }

  /** 4-truss peeling trace: 6 fixed rounds over q338's capped graph,
    * reporting edges before/after and removals per round. The trace
    * reaching a 0-removal round IS the fixpoint certificate; the spec
    * replays the peeling over an adjacency-set brute force. */
  val q380KtrussPeeling: QueryDef = QueryDef(
    "q380_ktruss_peeling",
    (s, dir) => {
      val cap = 8
      // shared derived base table (GraphBase): capped co-purchase edges
      var kept = GraphBase.cappedCoPurchase(s, dir, cap)
      val trace = (1 to Rounds).map { r =>
        val before = kept.count()
        kept = peel(kept).localCheckpoint() // the q21 per-level discipline
        val after = kept.count()
        (r.toLong, before, after, before - after)
      }
      s.createDataFrame(trace)
        .toDF("iteration", "edges_before", "edges_after", "n_removed")
        .orderBy(col("iteration"))
    },
    Some {
      val rounds = (1 to Rounds).map { r =>
        val prev = if (r == 1) "kept" else s"e${r - 1}"
        s"""sup$r AS MATERIALIZED (SELECT u.s2.x AS x, u.s2.y AS y, CAST(COUNT(*) AS BIGINT) AS sup FROM (
           |    SELECT w1.a, w1.b, w1.c FROM
           |      (SELECT e1.x AS a, e1.y AS b, e2.y AS c
           |       FROM $prev e1 JOIN $prev e2 ON e1.x = e2.x AND e1.y < e2.y) w1
           |    JOIN $prev e3 ON e3.x = w1.b AND e3.y = w1.c) t,
           |  UNNEST([{'x': t.a, 'y': t.b}, {'x': t.a, 'y': t.c}, {'x': t.b, 'y': t.c}]) AS u(s2)
           |  GROUP BY 1, 2),
           |e$r AS MATERIALIZED (SELECT p.x, p.y FROM $prev p JOIN sup$r s
           |  ON s.x = p.x AND s.y = p.y WHERE s.sup >= 2)""".stripMargin
      }.mkString(",\n")
      val traceRows = (1 to Rounds).map { r =>
        val prev = if (r == 1) "kept" else s"e${r - 1}"
        s"""SELECT ${r}::BIGINT AS iteration,
           |  (SELECT COUNT(*) FROM $prev)::BIGINT AS edges_before,
           |  (SELECT COUNT(*) FROM e$r)::BIGINT AS edges_after,
           |  ((SELECT COUNT(*) FROM $prev) - (SELECT COUNT(*) FROM e$r))::BIGINT AS n_removed""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH e0src AS MATERIALIZED (SELECT a.l_partkey AS x, b.l_partkey AS y
         |  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
         |  WHERE a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         |adj AS (SELECT x AS v, y AS n FROM e0src UNION ALL SELECT y, x FROM e0src),
         |rk AS (SELECT v, n, ROW_NUMBER() OVER (PARTITION BY v ORDER BY n) AS rk FROM adj),
         |kd AS MATERIALIZED (SELECT v, n FROM rk WHERE rk <= 8),
         |kept AS MATERIALIZED (SELECT lo.v AS x, lo.n AS y
         |  FROM (SELECT * FROM kd WHERE v < n) lo
         |  WHERE EXISTS (SELECT 1 FROM kd hi WHERE hi.v = lo.n AND hi.n = lo.v)),
         |$rounds
         |$traceRows
         |ORDER BY iteration""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(q380KtrussPeeling)
}
