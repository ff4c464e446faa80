package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Operational dashboard reads over a SERIALIZED STORE SNAPSHOT — the
  * reference's Monitoring.md surface (status counts, the readiness
  * anti-join, the dead-heartbeat sweep) exercised through the actual
  * [[graft.engine.StoreViews]] operators and oracle-checked (r9 verdict
  * #7: only q33/q34 covered this family, and neither ran StoreViews'
  * own plans).
  *
  * The snapshot fixture is derived deterministically from `orders`, so
  * the DuckDB oracle can rebuild it from the same parquet: every order
  * is a job (id = order key as text), the 5-state FSM comes from
  * o_orderstatus with an md5 gate splitting the O pool into
  * failed/aborted/unstarted (all five states populated), heartbeat =
  * order-date epoch µs, and deps chain each customer's consecutive
  * orders (same derivation q33 uses). At cluster scale this snapshot IS
  * the parquet-serialized job table a monitoring job would scan;
  * StoreViews' plans run on it unchanged.
  */
object StoreDashboardQueries {

  /** The deterministic store snapshot: (jobs, deps) with the
    * [[graft.engine.Job]] / [[graft.engine.Dep]] column names StoreViews
    * expects (id, status, heartbeat / jobId, depId). */
  private def snapshot(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val o = Tables(s, dir).orders
    val gate = substring(md5(col("o_orderkey").cast("string")), 1, 1)
    val jobs = o.select(
      col("o_orderkey").cast("string").as("id"),
      col("o_custkey"), col("o_orderdate"),
      when(col("o_orderstatus") === "F", lit("finished"))
        .when(col("o_orderstatus") === "P", lit("started"))
        .when(gate === "0", lit("failed"))
        .when(gate === "f", lit("aborted"))
        .otherwise(lit("unstarted")).as("status"),
      unix_micros(col("o_orderdate").cast("timestamp")).as("heartbeat"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("id").asc)
    val deps = jobs.withColumn("depId", lag(col("id"), 1).over(w))
      .filter(col("depId").isNotNull)
      .select(col("id").as("jobId"), col("depId"))
    (jobs, deps)
  }

  private val snapshotSql =
    """jobs AS (
        SELECT CAST(o_orderkey AS VARCHAR) AS id, o_custkey, o_orderdate,
          CASE WHEN o_orderstatus = 'F' THEN 'finished'
               WHEN o_orderstatus = 'P' THEN 'started'
               WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0' THEN 'failed'
               WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = 'f' THEN 'aborted'
               ELSE 'unstarted' END AS status,
          epoch_us(o_orderdate) AS heartbeat
        FROM orders),
      deps AS (
        SELECT id AS job_id,
          lag(id) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, id) AS dep_id
        FROM jobs)"""

  /** Monitoring.md's status dashboard: StoreViews.statusCounts — one
    * hash aggregate over the snapshot, all five FSM states populated. */
  val q470StoreStatusCounts: QueryDef = QueryDef(
    "q470_store_status_counts",
    (s, dir) => {
      val (jobs, _) = snapshot(s, dir)
      graft.engine.StoreViews.statusCounts(jobs)
    },
    Some(s"""WITH $snapshotSql
      SELECT status, COUNT(*) AS n FROM jobs GROUP BY 1"""))

  /** The scheduler's readiness view: StoreViews.jobsReady — unstarted
    * jobs whose every dependency is finished (left_semi on non-finished
    * parents, then left_anti), run on the snapshot. */
  val q471StoreReady: QueryDef = QueryDef(
    "q471_store_ready",
    (s, dir) => {
      val (jobs, deps) = snapshot(s, dir)
      graft.engine.StoreViews.jobsReady(jobs, deps)
        .select(col("id"), col("o_custkey"))
    },
    Some(s"""WITH $snapshotSql,
      blocked AS (
        SELECT DISTINCT d.job_id AS id FROM deps d
        JOIN jobs p ON d.dep_id = p.id
        WHERE p.status <> 'finished')
      SELECT j.id, j.o_custkey FROM jobs j
      WHERE j.status = 'unstarted'
        AND NOT EXISTS (SELECT 1 FROM blocked b WHERE b.id = j.id)"""))

  /** The monitor's dead-job sweep: StoreViews.jobsDead — started jobs
    * whose heartbeat predates the liveness threshold (1996-07-01 UTC on
    * this snapshot; in production `now − tolerance`). */
  val q472StoreDead: QueryDef = QueryDef(
    "q472_store_dead",
    (s, dir) => {
      val (jobs, _) = snapshot(s, dir)
      graft.engine.StoreViews.jobsDead(jobs, 836179200000000L)
        .select(col("id"), col("heartbeat"))
    },
    Some(s"""WITH $snapshotSql
      SELECT id, heartbeat FROM jobs
      WHERE status = 'started' AND heartbeat < 836179200000000"""))

  val all: Seq[QueryDef] =
    Seq(q470StoreStatusCounts, q471StoreReady, q472StoreDead)
}
