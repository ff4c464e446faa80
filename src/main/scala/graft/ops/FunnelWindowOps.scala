package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Windowed funnel (the ClickHouse `windowFunnel` semantics): per user,
  * the deepest view → click → purchase chain completed within ONE HOUR
  * of the anchoring view, where the anchor is the user's EARLIEST view
  * (reference: overseer's funnel handler family,
  * doc/guide/Introduction.md:3; q81 is the unwindowed
  * join-chain funnel — this is the time-budgeted variant a growth team
  * actually reads, and a different PLAN: no join chain at all).
  *
  * Scale shape: three chained conditional window aggregates over the
  * SAME user partitioning — Catalyst plans one Exchange and reuses it
  * for all three passes, so the whole funnel is one shuffle by user_id
  * plus linear window math (vs q81's three join-shuffles). That
  * exchange-reuse is the reason to write windowed funnels this way at
  * 100 TB. The rollup is a ≤4-row depth histogram.
  *
  * Exactness: all times are epoch-µs BIGINTs; per-depth latency sums
  * are BIGINT µs divided once at the surface; counts BIGINT.
  */
object FunnelWindowOps {

  private val WindowUs = 3600L * 1000000L // 1 hour

  val q504WindowFunnel: QueryDef = QueryDef(
    "q504_window_funnel",
    (s, dir) => {
      val e = EventOps.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("tus"),
          col("event_type"))
      val wu = Window.partitionBy(col("user_id"))
      val t1 = e.withColumn("t_view",
        min(when(col("event_type") === "view", col("tus"))).over(wu))
      val t2 = t1.withColumn("t_click",
        min(when(col("event_type") === "click" &&
          col("tus") > col("t_view") &&
          col("tus") <= col("t_view") + WindowUs, col("tus"))).over(wu))
      val t3 = t2.withColumn("t_purchase",
        min(when(col("event_type") === "purchase" &&
          col("tus") > col("t_click") &&
          col("tus") <= col("t_view") + WindowUs, col("tus"))).over(wu))
      val perUser = t3.groupBy(col("user_id"))
        .agg(first(col("t_view")).as("t_view"),
          first(col("t_click")).as("t_click"),
          first(col("t_purchase")).as("t_purchase"))
        .select(col("user_id"),
          when(col("t_purchase").isNotNull, lit(3L))
            .when(col("t_click").isNotNull, lit(2L))
            .when(col("t_view").isNotNull, lit(1L))
            .otherwise(lit(0L)).as("depth"),
          coalesce(col("t_purchase") - col("t_view"), lit(0L)).as("lat_us"))
      perUser.groupBy(col("depth"))
        .agg(count(lit(1)).as("n_users"), sum(col("lat_us")).as("lat_sum_us"))
        .select(col("depth"), col("n_users"),
          round(col("lat_sum_us").cast("double") /
            (col("n_users").cast("double") * 1e6), 4).as("avg_complete_sec"))
        .orderBy(col("depth"))
    },
    Some(s"""WITH e AS (
        SELECT user_id, epoch_us(ts) AS tus, event_type FROM events),
      t1 AS (
        SELECT *, MIN(CASE WHEN event_type = 'view' THEN tus END)
          OVER (PARTITION BY user_id) AS t_view
        FROM e),
      t2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND tus > t_view
            AND tus <= t_view + $WindowUs THEN tus END)
          OVER (PARTITION BY user_id) AS t_click
        FROM t1),
      t3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tus > t_click
            AND tus <= t_view + $WindowUs THEN tus END)
          OVER (PARTITION BY user_id) AS t_purchase
        FROM t2),
      per_user AS (
        SELECT user_id,
          CASE WHEN MAX(t_purchase) IS NOT NULL THEN 3
               WHEN MAX(t_click) IS NOT NULL THEN 2
               WHEN MAX(t_view) IS NOT NULL THEN 1
               ELSE 0 END AS depth,
          COALESCE(MAX(t_purchase) - MAX(t_view), 0) AS lat_us
        FROM t3 GROUP BY 1)
      SELECT CAST(depth AS BIGINT) AS depth,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        round(CAST(SUM(lat_us) AS DOUBLE) /
          (CAST(COUNT(*) AS DOUBLE) * 1e6), 4) AS avg_complete_sec
      FROM per_user GROUP BY depth ORDER BY depth"""))

  val all: Seq[QueryDef] = Seq(q504WindowFunnel)
}
