package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** The store's relational surface as Spark DataFrames — every query the
  * reference issues against its own tables (SURVEY.md §2D), re-expressed as
  * Catalyst plans so it scales from a 10-row local store to a 100 TB job
  * table unchanged.
  *
  * At cluster scale the jobs/deps tables would be parquet-backed; here they
  * can also be materialized from an [[InMemoryJobStore]] snapshot. Either
  * way the operators below only see DataFrames.
  */
object StoreViews {

  def jobsDF(spark: SparkSession, store: JobStore): Dataset[Job] = {
    import spark.implicits._
    spark.createDataset(store.snapshotJobs)
  }

  def depsDF(spark: SparkSession, store: JobStore): Dataset[Dep] = {
    import spark.implicits._
    spark.createDataset(store.snapshotDeps)
  }

  /** §2D row 1 — point lookup: filter + project + limit 1. */
  def jobInfo(jobs: DataFrame, id: String): DataFrame =
    jobs.filter(col("id") === lit(id)).limit(1)

  /** §2D row 4 — the scheduler's readiness anti-join (jdbc.clj:230-242):
    * unstarted jobs with NO dependency whose parent is non-finished.
    * `blocked` = deps ⋈ jobs on dep_id where parent status ≠ finished;
    * ready = unstarted ∖ blocked via left_anti. At scale both joins shuffle
    * on job id; the jobs side is filtered to non-finished parents first so
    * the join input shrinks as the run progresses.
    */
  def jobsReady(jobs: DataFrame, deps: DataFrame): DataFrame = {
    val blocked = deps
      .join(jobs.filter(col("status") =!= JobStatus.Finished).select(col("id")),
            deps("depId") === col("id"), "left_semi")
      .select(col("jobId").as("id"))
      .distinct()
    jobs.filter(col("status") === JobStatus.Unstarted)
      .join(blocked, Seq("id"), "left_anti")
  }

  /** §2D row 5 — liveness range filter: started ∧ heartbeat < threshold. */
  def jobsDead(jobs: DataFrame, threshold: Long): DataFrame =
    jobs.filter(col("status") === JobStatus.Started && col("heartbeat") < lit(threshold))

  /** Status dashboard view — per-status id sets as a DataFrame (the
    * Monitoring.md equivalent at the relational layer): one hash
    * aggregate, no join. */
  def statusCounts(jobs: DataFrame): DataFrame =
    jobs.groupBy(col("status")).agg(count(lit(1)).as("n"))

  /** §2D row 3 — direct dependents: distinct semi-join projection. */
  def directDependents(deps: DataFrame, frontier: DataFrame): DataFrame =
    deps.join(frontier, deps("depId") === frontier("id"), "left_semi")
      .select(col("jobId").as("id"))
      .distinct()

  /** §2D row 6 — transitive closure of dependents: iterative BFS fixpoint
    * over the edge table, cycle-safe via the accumulated visited set
    * (reference jdbc.clj:101-113). Catalyst can't express recursion, so the
    * loop runs on the driver; each level is one distributed semi-join.
    * `localCheckpoint` truncates the growing lineage so the plan stays flat
    * at high depth (a 1000-level chain would otherwise stack 1000 joins).
    */
  def dependents(spark: SparkSession, deps: DataFrame, rootIds: Seq[String]): DataFrame = {
    import spark.implicits._
    val roots = rootIds.toDF("id")
    var visited  = spark.emptyDataset[String].toDF("id")
    var frontier = roots
    while (!frontier.isEmpty) {
      // localCheckpoint EVERY level: the frontier feeds both the next level
      // and the visited union, so an unmaterialized plan doubles per level
      // (exponential analysis cost); checkpointing keeps every plan flat.
      val next = directDependents(deps, broadcast(frontier))
        .join(visited, Seq("id"), "left_anti")
        .join(broadcast(roots), Seq("id"), "left_anti")
        .localCheckpoint()
      visited = visited.union(next)
      frontier = next
    }
    visited.distinct()
  }

  /** §2D row 7 — cascading bulk status update: closure ∪ self → overwrite of
    * the status column for non-terminal members (abort cascade). */
  def abortCascade(spark: SparkSession, jobs: DataFrame, deps: DataFrame, id: String): DataFrame = {
    val targets = dependents(spark, deps, Seq(id)).union(spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(id)),
      new org.apache.spark.sql.types.StructType().add("id", "string")))
    jobs.join(targets.withColumnRenamed("id", "t_id"), col("id") === col("t_id"), "left")
      .withColumn("status",
        when(col("t_id").isNotNull &&
             col("status").isin(JobStatus.Unstarted, JobStatus.Started),
             lit(JobStatus.Aborted))
          .otherwise(col("status")))
      .drop("t_id")
  }
}
