package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph operators — the reference's transitive-closure BFS
  * (jdbc.clj:101-113, SURVEY.md §2D row 6) generalized to DataFrames.
  * Catalyst can't express recursion, so the fixpoint loop runs on the
  * driver; each level is one distributed join, and `localCheckpoint`
  * periodically truncates lineage so deep graphs don't stack plans.
  */
object GraphOps {

  /** BFS closure with per-node depth over an arbitrary (child, parent) edge
    * table. Cycle-safe: previously-visited nodes are anti-joined away each
    * round.
    *
    * Each round expands the frontier by 1-, 2-, AND 3-hop edges (the hop
    * tables are two extra self-joins, precomputed once), cutting the
    * number of sequential rounds to ceil(depth/3) — the driver-side round
    * count, not the data volume, dominates deep closures. Min-depth
    * aggregation keeps depths exact for any hop width H: a node whose min
    * depth d falls in round r's window ((r−1)·H, r·H] has an ancestor at
    * depth d−h ∈ the previous window for some h ≤ H, discovered in the
    * previous frontier; and no node can be discovered before its window,
    * because that would imply a shorter path than its min depth.
    * (Full path-doubling would reach O(log d) rounds but materializes the
    * transitive edge set — O(n²) — which does not survive a big graph;
    * the 2-/3-hop tables are only ~3× the input edges.)
    */
  def descendantsWithDepth(spark: SparkSession, edgesIn: DataFrame, roots: DataFrame): DataFrame = {
    // materialize the edge table once: every round re-reads it, and
    // without this each round would re-run the source scan
    val edges1 = edgesIn.select(col("child"), col("parent"), lit(1L).as("hop"))
    val e2a = edgesIn.select(col("child").as("mid"), col("parent"))
    val e2b = edgesIn.select(col("child"), col("parent").as("mid"))
    val edges2 = e2b.join(e2a, "mid").select(col("child"), col("parent"), lit(2L).as("hop"))
    val edges3 = edges2.select(col("child"), col("parent").as("mid"))
      .join(e2a, "mid").select(col("child"), col("parent"), lit(3L).as("hop"))
    val edges = edges1.union(edges2).union(edges3).localCheckpoint()

    var visited  = roots.select(col("node"), lit(0L).as("depth")).localCheckpoint()
    var frontier = visited
    while (!frontier.isEmpty) {
      // localCheckpoint EVERY round: the frontier feeds both the next round
      // and the visited union, so an unmaterialized plan doubles per round
      // (exponential Catalyst analysis cost); checkpointing keeps it flat.
      // the frontier is small relative to the edge table: broadcast it so
      // the edges never shuffle
      val next = edges
        .join(broadcast(frontier), edges("parent") === frontier("node"))
        .select(edges("child").as("node"), (frontier("depth") + edges("hop")).as("depth"))
        .groupBy(col("node")).agg(min(col("depth")).as("depth"))
        // visited can reach full-graph size: no broadcast hint — let
        // Catalyst/AQE pick broadcast vs shuffle from its observed size
        .join(visited.select("node"), Seq("node"), "left_anti")
        .localCheckpoint()
      visited = visited.union(next)
      frontier = next
    }
    visited
  }

  /** Transitive closure demo on real data: the implicit binary tree
    * child → child div 2 over part keys; descendants of node 1 with BFS
    * depth. Oracle: DuckDB WITH RECURSIVE. */
  val q21Closure: QueryDef = QueryDef(
    "q21_transitive_closure",
    (s, dir) => {
      val edges = Tables(s, dir).part
        .select(col("p_partkey").as("child"),
                expr("p_partkey div 2").cast("long").as("parent"))
        .filter(col("child") > 1)
      val roots = s.range(1, 2).select(col("id").as("node"))
      descendantsWithDepth(s, edges, roots)
        .filter(col("depth") > 0)
        .select(col("node"), col("depth"))
    },
    Some("""WITH RECURSIVE edges AS (
        SELECT p_partkey AS child, p_partkey // 2 AS parent FROM part WHERE p_partkey > 1),
      d AS (
        SELECT CAST(1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS depth
        UNION ALL
        SELECT e.child, d.depth + 1 FROM d JOIN edges e ON e.parent = d.node)
      SELECT node, depth FROM d WHERE depth > 0"""))

  val all: Seq[QueryDef] = Seq(q21Closure)
}
