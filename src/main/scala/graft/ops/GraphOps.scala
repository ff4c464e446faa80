package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph operators — the reference's transitive-closure BFS
  * (jdbc.clj:101-113, SURVEY.md §2D row 6) generalized to DataFrames.
  * Catalyst can't express recursion, so the fixpoint loop runs on the
  * driver; each level is one distributed join, and `localCheckpoint`
  * truncates lineage so deep graphs don't stack plans.
  *
  * Two execution modes share one round structure (3-hop frontier
  * expansion, min-depth fold):
  *
  *  - DRIVER-FRONTIER: frontier and visited set live on the driver as
  *    local relations; each round is ONE shuffle-free cluster job (hop
  *    table ⋈ broadcast frontier, collect). Fastest when the reachable
  *    set is metadata-scale (job graphs: the frontier was going to be
  *    broadcast anyway, so driver-residency adds no new memory bound).
  *  - DISTRIBUTED: frontier and visited are DataFrames; each round is a
  *    shuffle join + min-agg + anti-join, checkpointed. Nothing is ever
  *    collected, so the reachable set is bounded by cluster storage, not
  *    driver heap — the mode a DATA-scale graph (q21 over an arbitrary
  *    edge table) needs.
  *
  * [[descendantsWithDepth]] starts in driver mode and switches itself to
  * distributed the moment the tracked node count crosses
  * `maxDriverNodes` — the collected state it hands over is by
  * construction no larger than that bound, so the switch happens BEFORE
  * the driver can be overwhelmed, not after. Large frontiers also get
  * their candidate set pre-aggregated (min per node) on the cluster, so
  * a single round's collect is bounded by the new-node count rather than
  * the raw candidate multiplicity.
  */
object GraphOps {

  /** Hop tables: 1-, 2- and 3-hop edges, materialized once — every round
    * re-reads them, and without this each round would re-run the source
    * scan + self-joins. ~3× the input edge count, vs the O(n²) transitive
    * edge set full path-doubling would materialize. */
  private def hopTables(edgesIn: DataFrame): DataFrame = {
    val edges1 = edgesIn.select(col("child"), col("parent"), lit(1L).as("hop"))
    val e2a = edgesIn.select(col("child").as("mid"), col("parent"))
    val e2b = edgesIn.select(col("child"), col("parent").as("mid"))
    val edges2 = e2b.join(e2a, "mid").select(col("child"), col("parent"), lit(2L).as("hop"))
    val edges3 = edges2.select(col("child"), col("parent").as("mid"))
      .join(e2a, "mid").select(col("child"), col("parent"), lit(3L).as("hop"))
    edges1.union(edges2).union(edges3).localCheckpoint()
  }

  /** BFS closure with per-node depth over an arbitrary (child, parent) edge
    * table. Cycle-safe: previously-visited nodes are dropped each round.
    *
    * Each round expands the frontier by 1-, 2-, AND 3-hop edges, cutting
    * the number of sequential rounds to ceil(depth/3) — the driver-side
    * round count, not the data volume, dominates deep closures. Min-depth
    * aggregation keeps depths exact for any hop width H: a node whose min
    * depth d falls in round r's window ((r−1)·H, r·H] has an ancestor at
    * depth d−h ∈ the previous window for some h ≤ H, discovered in the
    * previous frontier; and no node can be discovered before its window,
    * because that would imply a shorter path than its min depth.
    *
    * Starts driver-resident and auto-switches to the distributed variant
    * when visited+frontier exceeds `maxDriverNodes` (see object doc).
    */
  def descendantsWithDepth(
      spark: SparkSession,
      edgesIn: DataFrame,
      roots: DataFrame,
      maxDriverNodes: Int = 200000): DataFrame = {
    import scala.jdk.CollectionConverters._
    val edges = hopTables(edgesIn)
    val nodeType = roots.schema("node").dataType
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", nodeType),
      org.apache.spark.sql.types.StructField("depth", org.apache.spark.sql.types.LongType)))

    // a root set already past the driver bound goes straight to distributed
    val rootRows = roots.select(col("node")).limit(maxDriverNodes + 1).collect()
    if (rootRows.length > maxDriverNodes)
      return descendantsWithDepthDistributed(spark, edgesIn, roots)
    val visited = scala.collection.mutable.LinkedHashMap[Any, Long]()
    rootRows.foreach(r => visited(r.get(0)) = 0L)
    var frontier: Seq[org.apache.spark.sql.Row] =
      visited.keysIterator.map(n => org.apache.spark.sql.Row(n, 0L)).toSeq

    // every driver-side collect below is CAPPED; hitting a cap hands the
    // current (≤ maxDriverNodes) state to the distributed loop, which
    // re-runs the unfinished round — nothing oversized ever lands on the
    // driver, and the handoff costs one redone round, not redone work
    def switchToDistributed(): DataFrame = {
      val visitedDF = spark.createDataFrame(
        visited.iterator.map { case (n, d) => org.apache.spark.sql.Row(n, d) }.toSeq.asJava,
        outSchema)
      val frontierDF = spark.createDataFrame(frontier.asJava, outSchema)
      closureRounds(spark, edges, visitedDF, frontierDF)
    }
    // raw candidate rows tolerated in one collect (~64 MB of pairs);
    // beyond it the round pre-aggregates min-by-node on the cluster
    val rawCap = 4 * 1024 * 1024

    while (frontier.nonEmpty) {
      if (visited.size + frontier.size > maxDriverNodes)
        return switchToDistributed()
      val fDF = spark.createDataFrame(frontier.asJava, outSchema)
      val raw = edges
        .join(broadcast(fDF), edges("parent") === fDF("node"))
        .select(edges("child").as("node"), (fDF("depth") + edges("hop")).as("depth"))
      // fast path: collect raw candidates — ONE shuffle-free job; a limit
      // that comes back un-hit proves the set is complete. If candidate
      // multiplicity blows past the cap, fold min-by-node on the cluster
      // (one shuffle), bounding the collect by the NEW-node count; if even
      // that exceeds the driver budget, the reachable set is data-scale —
      // switch modes.
      val rawRows = raw.limit(rawCap + 1).collect()
      val candidates =
        if (rawRows.length <= rawCap) rawRows
        else {
          val newCap = maxDriverNodes - visited.size
          val agg = raw.groupBy(col("node")).agg(min(col("depth")).as("depth"))
            .limit(newCap + 1).collect()
          if (agg.length > newCap) return switchToDistributed()
          agg
        }
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

  /** Fully distributed closure: same rounds, no driver-side state. Exposed
    * for callers that KNOW the reachable set is data-scale. */
  def descendantsWithDepthDistributed(
      spark: SparkSession, edgesIn: DataFrame, roots: DataFrame): DataFrame = {
    val seed = roots.select(col("node"), lit(0L).as("depth")).localCheckpoint()
    closureRounds(spark, hopTables(edgesIn), seed, seed)
  }

  /** The distributed rounds: candidates = hop tables ⋈ frontier, min per
    * node, anti-join visited → next frontier. Every per-round DataFrame is
    * localCheckpoint()ed — the frontier feeds two consumers, and without
    * truncation Catalyst's analysis goes exponential in round count. Three
    * actions per round (checkpoint×2 + isEmpty) instead of driver mode's
    * one — the price of unbounded reachable sets. */
  private def closureRounds(
      spark: SparkSession,
      edges: DataFrame,
      visited0: DataFrame,
      frontier0: DataFrame): DataFrame = {
    var visited = visited0.localCheckpoint()
    var frontier = frontier0.localCheckpoint()
    while (!frontier.isEmpty) {
      val next = edges
        .join(frontier, edges("parent") === frontier("node"))
        .select(edges("child").as("node"), (frontier("depth") + edges("hop")).as("depth"))
        .groupBy(col("node")).agg(min(col("depth")).as("depth"))
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint()
      visited = visited.union(next).localCheckpoint()
      frontier = next
    }
    visited
  }

  /** Connected components over an undirected edge set by min-label
    * propagation: every node starts labeled with its own id; each round a
    * node takes the min of its label and its neighbors' labels; fixpoint
    * when no label changes. Converges in O(component diameter) rounds —
    * for dup-cluster resolution (the intended use, [[Dedup
    * .q79DupClusters]]) diameters are tiny. Each round is ONE equi-join +
    * hash agg, shuffling (id, label) longs only; every per-round frame is
    * localCheckpoint()ed (same Catalyst-growth reason as [[closureRounds]])
    * and the only driver value is the converged? count. The previous label
    * rides through the round so convergence is a filter-count on the
    * already-checkpointed frame — one shuffle job per round, not two (the
    * old separate next⋈prev convergence join doubled the round cost).
    * Returns (id, label) with label = min node id in the component. */
  def connectedComponents(spark: SparkSession, edges: DataFrame): DataFrame = {
    val und = edges.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
      .localCheckpoint()
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = und.join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .select(col("src").as("id"), col("label"))
        .groupBy(col("id")).agg(min(col("label")).as("nbr"))
      // left join: isolated self-labeled nodes keep their label; least()
      // is null-safe on the missing-neighbor side
      val next = labels.withColumnRenamed("label", "prev")
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("prev"), col("nbr")).as("label"), col("prev"))
        .localCheckpoint()
      changed = next.filter(col("label") =!= col("prev")).count()
      labels = next.select(col("id"), col("label"))
    }
    labels
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
