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
    import scala.jdk.CollectionConverters._
    // materialize the hop tables once: every round re-reads them, and
    // without this each round would re-run the source scan + self-joins
    val edges1 = edgesIn.select(col("child"), col("parent"), lit(1L).as("hop"))
    val e2a = edgesIn.select(col("child").as("mid"), col("parent"))
    val e2b = edgesIn.select(col("child"), col("parent").as("mid"))
    val edges2 = e2b.join(e2a, "mid").select(col("child"), col("parent"), lit(2L).as("hop"))
    val edges3 = edges2.select(col("child"), col("parent").as("mid"))
      .join(e2a, "mid").select(col("child"), col("parent"), lit(3L).as("hop"))
    val edges = edges1.union(edges2).union(edges3).localCheckpoint()

    // Frontier and visited set live on the DRIVER as local relations.
    // This is not a scale concession: the frontier was already broadcast
    // (i.e. required to fit in memory on every executor), and visited is
    // bounded by the reachable-node count — job-graph metadata, not data.
    // Driver-residency removes the per-round checkpoint + isEmpty cluster
    // jobs and lets the broadcast build from a LocalRelation without a
    // job, leaving exactly ONE distributed action per round (the hop-join
    // against the full edge table, which is the part that scales).
    // For closures whose reachable set outgrows driver memory, revert to
    // the all-DataFrame variant (git history) — same round structure.
    val nodeType = roots.schema("node").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("depth", org.apache.spark.sql.types.LongType)))
    val visited = scala.collection.mutable.LinkedHashMap[Any, Long]()
    roots.select(col("node")).collect().foreach(r => visited(r.get(0)) = 0L)
    var frontier: Seq[org.apache.spark.sql.Row] =
      visited.keysIterator.map(n => org.apache.spark.sql.Row(n, 0L)).toSeq
    while (frontier.nonEmpty) {
      val fDF = spark.createDataFrame(frontier.asJava, outSchema)
      // one shuffle-FREE stage per round: broadcast-join the frontier into
      // the hop tables and collect the raw (child, candidate-depth) pairs;
      // the min-by-node and visited-filter fold on the driver (candidate
      // count is O(hops × frontier out-degree) — bounded by the same
      // memory budget the broadcast frontier already set)
      val candidates = edges
        .join(broadcast(fDF), edges("parent") === fDF("node"))
        .select(edges("child").as("node"), (fDF("depth") + edges("hop")).as("depth"))
        .collect()
      val mins = scala.collection.mutable.HashMap[Any, Long]()
      candidates.foreach { r =>
        val n = r.get(0)
        if (!visited.contains(n)) {
          val d = r.getLong(1)
          if (d < mins.getOrElse(n, Long.MaxValue)) mins(n) = d
        }
      }
      mins.foreach { case (n, d) => visited(n) = d }
      frontier = mins.iterator.map { case (n, d) => org.apache.spark.sql.Row(n, d) }.toSeq
    }
    spark.createDataFrame(
      visited.iterator.map { case (n, d) => org.apache.spark.sql.Row(n, d) }.toSeq.asJava,
      outSchema)
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
