package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SRE & operations-analytics wave: multiwindow error-budget burn rates,
  * retry-storm detection, capacity headroom from activity peaks, and a
  * Little's-law consistency audit over the order lifecycle. The
  * run-the-service layer next to the run-the-data layers.
  */
object SreOps {

  /** Multiwindow error-budget burn (the SRE alerting standard): with a
    * 99% success SLO, the burn rate of each hour is err_share/0.01,
    * rolled up over 1 h and 6 h windows (RANGE frames over the hourly
    * spine); an alert fires when the 1 h burn exceeds 14.4 or the 6 h
    * burn exceeds 6 — the fast/slow pair. Output per window config: max
    * burn and alert-hour count. One hourly aggregation; the rolling
    * pass runs on the hours frame. */
  val q290ErrorBudgetBurn: QueryDef = QueryDef(
    "q290_error_budget_burn",
    (s, dir) => {
      val hourly = EventOps.events(s, dir)
        .groupBy(floor(col("ts").cast("long") / 3600.0).cast("long").as("h"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("event_type") === "error", 1L).otherwise(0L)).as("n_err"))
        .localCheckpoint() // both window configs read the same spine
      def rolled(wHours: Long, threshold: Double) = {
        val w = Window.partitionBy().orderBy(col("h").asc)
          .rangeBetween(-(wHours - 1), 0)
        hourly
          .withColumn("burn", round(
            (sum(col("n_err")).over(w).cast("double") /
             sum(col("n")).over(w)) / 0.01, 6))
          .agg(count(lit(1)).as("n_hours"),
            round(max(col("burn")), 6).as("max_burn"),
            sum(when(col("burn") > threshold, 1L).otherwise(0L)).as("n_alert_hours"))
          .select(lit(wHours).as("window_hours"), lit(threshold).as("threshold"),
            col("n_hours"), col("max_burn"), col("n_alert_hours"))
      }
      rolled(1L, 14.4).union(rolled(6L, 6.0))
    },
    Some("""WITH hourly AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h, COUNT(*) AS n,
          SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_err
        FROM events GROUP BY 1),
      b1 AS (SELECT h, round((CAST(SUM(n_err) OVER w AS DOUBLE)
            / SUM(n) OVER w) / 0.01, 6) AS burn
        FROM hourly WINDOW w AS (ORDER BY h RANGE BETWEEN 0 PRECEDING AND 0 FOLLOWING)),
      b6 AS (SELECT h, round((CAST(SUM(n_err) OVER w AS DOUBLE)
            / SUM(n) OVER w) / 0.01, 6) AS burn
        FROM hourly WINDOW w AS (ORDER BY h RANGE BETWEEN 5 PRECEDING AND 0 FOLLOWING))
      SELECT 1::BIGINT AS window_hours, 14.4::DOUBLE AS threshold,
        CAST(COUNT(*) AS BIGINT) AS n_hours, round(MAX(burn), 6) AS max_burn,
        CAST(SUM(CASE WHEN burn > 14.4 THEN 1 ELSE 0 END) AS BIGINT) AS n_alert_hours
      FROM b1
      UNION ALL
      SELECT 6, 6.0::DOUBLE, CAST(COUNT(*) AS BIGINT), round(MAX(burn), 6),
        CAST(SUM(CASE WHEN burn > 6.0 THEN 1 ELSE 0 END) AS BIGINT)
      FROM b6"""))

  /** Retry-storm detection: per user, error events within an hour of the
    * previous error (1-hour chain window) chain into a storm (the gaps-and-islands shape on
    * the error sub-stream); users whose longest storm reaches 2 are the
    * retry-loop suspects. Output: every such user with storm counts and
    * the longest chain. Per-user ordered windows only — no joins. */
  val q291RetryStorms: QueryDef = QueryDef(
    "q291_retry_storms",
    (s, dir) => {
      val wUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val errs = EventOps.events(s, dir)
        .filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), col("ts"))
        .withColumn("gap_s",
          col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(wUser))
        .withColumn("new_storm",
          when(col("gap_s").isNull || col("gap_s") > 3600, 1L).otherwise(0L))
        .withColumn("storm", sum(col("new_storm")).over(wUser))
      errs.groupBy(col("user_id"), col("storm"))
        .agg(count(lit(1)).as("storm_len"))
        .groupBy(col("user_id"))
        .agg(sum(col("storm_len")).as("n_error_events"),
          count(lit(1)).as("n_storms"),
          max(col("storm_len")).as("max_storm_len"))
        .filter(col("max_storm_len") >= 2)
    },
    Some("""WITH errs AS (SELECT user_id, event_id, ts,
          CAST(floor(epoch(ts)) AS BIGINT) - LAG(CAST(floor(epoch(ts)) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        FROM events WHERE event_type = 'error'),
      st AS (SELECT user_id, event_id,
          SUM(CASE WHEN gap_s IS NULL OR gap_s > 3600 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS storm
        FROM errs),
      sl AS (SELECT user_id, storm, COUNT(*) AS storm_len FROM st GROUP BY 1, 2)
      SELECT user_id, CAST(SUM(storm_len) AS BIGINT) AS n_error_events,
        CAST(COUNT(*) AS BIGINT) AS n_storms,
        CAST(MAX(storm_len) AS BIGINT) AS max_storm_len
      FROM sl GROUP BY 1 HAVING MAX(storm_len) >= 2"""))

  /** Capacity headroom: peak hourly active users per day against the
    * all-time peak as "provisioned" capacity — per-day headroom share
    * and the days burning more than 80% of provisioned. The
    * capacity-planning read-out over the activity spine; two
    * aggregations, a day-sized frame, one global window over it. */
  val q292CapacityHeadroom: QueryDef = QueryDef(
    "q292_capacity_headroom",
    (s, dir) => {
      val wAll = Window.partitionBy()
      val hourly = EventOps.events(s, dir)
        .groupBy(floor(col("ts").cast("long") / 3600.0).cast("long").as("h"))
        .agg(countDistinct(col("user_id")).as("active"))
      val daily = hourly
        .groupBy(floor(col("h") / 24.0).cast("long").as("day"))
        .agg(max(col("active")).as("peak_active"))
      daily
        .withColumn("provisioned", max(col("peak_active")).over(wAll))
        .select(col("day"), col("peak_active"), col("provisioned"),
          round(lit(1.0) - col("peak_active").cast("double") / col("provisioned"), 6)
            .as("headroom"),
          (col("peak_active").cast("double") > lit(0.8) * col("provisioned"))
            .as("over_80pct"))
    },
    Some("""WITH hourly AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
          COUNT(DISTINCT user_id) AS active
        FROM events GROUP BY 1),
      daily AS (SELECT h // 24 AS day, MAX(active) AS peak_active
        FROM hourly GROUP BY 1)
      SELECT day, CAST(peak_active AS BIGINT) AS peak_active,
        CAST(MAX(peak_active) OVER () AS BIGINT) AS provisioned,
        round(1.0 - CAST(peak_active AS DOUBLE) / MAX(peak_active) OVER (), 6) AS headroom,
        CAST(peak_active AS DOUBLE) > 0.8 * MAX(peak_active) OVER () AS over_80pct
      FROM daily"""))

  /** Little's-law audit over the order lifecycle: each order is
    * "in flight" from o_orderdate to its last l_shipdate; λ = arrivals
    * per day, W = mean days in flight (exact DECIMAL mean), and L =
    * mean daily WIP measured INDEPENDENTLY by sweep-line (±1 deltas at
    * entry/exit days, running sum — q200's construction). The audit
    * reports both sides of L = λ·W and their ratio: identity-level
    * agreement says the three pipelines (arrival counting, lifetime
    * measurement, concurrency sweep) are mutually consistent — the
    * queueing-theory cross-check a latency dashboard should run on
    * itself. Edge effects make the ratio ≈1, not exactly 1. */
  val q293LittlesLaw: QueryDef = QueryDef(
    "q293_littles_law",
    (s, dir) => {
      val t = Tables(s, dir)
      val wOrd = Window.partitionBy().orderBy(col("day").asc)
      val wAll = Window.partitionBy()
      val life = t.lineitem
        .groupBy(col("l_orderkey")).agg(max(to_date(col("l_shipdate"))).as("ship_day"))
        .join(t.orders.select(col("o_orderkey").as("l_orderkey"),
          to_date(col("o_orderdate")).as("start_day")), Seq("l_orderkey"))
        .select(datediff(col("start_day"), lit("1992-01-01")).cast("long").as("d0"),
          datediff(col("ship_day"), lit("1992-01-01")).cast("long").as("d1"))
        .localCheckpoint() // feeds λ/W and the sweep-line independently
      val lamW = life.agg(
        count(lit(1)).as("n_orders"),
        (max(col("d0")) - min(col("d0")) + 1L).as("span_days"),
        sum(col("d1") - col("d0") + 1L).as("wip_days"))
      val deltas = life.select(col("d0").as("day"), lit(1L).as("delta"))
        .union(life.select((col("d1") + 1L).as("day"), lit(-1L).as("delta")))
        .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
      val wip = deltas
        .withColumn("wip", sum(col("delta")).over(wOrd))
        .withColumn("next_day", lead(col("day"), 1).over(wOrd))
        .filter(col("next_day").isNotNull)
        .agg(sum(col("wip") * (col("next_day") - col("day"))).as("wip_day_mass"),
          (max(col("next_day")) - min(col("day"))).as("sweep_days"))
      lamW.crossJoin(broadcast(wip))
        .select(col("n_orders"),
          round(col("n_orders").cast("double") / col("span_days"), 6).as("lambda_per_day"),
          round(col("wip_days").cast("double") / col("n_orders"), 6).as("w_days"),
          round(col("wip_day_mass").cast("double") / col("sweep_days"), 6).as("l_measured"),
          round((col("n_orders").cast("double") / col("span_days")) *
            (col("wip_days").cast("double") / col("n_orders")), 6).as("l_littles"),
          round((col("wip_day_mass").cast("double") / col("sweep_days")) /
            ((col("n_orders").cast("double") / col("span_days")) *
             (col("wip_days").cast("double") / col("n_orders"))), 6).as("ratio"))
    },
    Some("""WITH life AS (SELECT
          datediff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE)) AS d0,
          datediff('day', DATE '1992-01-01', s.ship_day) AS d1
        FROM orders o JOIN (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS ship_day
          FROM lineitem GROUP BY 1) s ON s.l_orderkey = o.o_orderkey),
      lamw AS (SELECT COUNT(*) AS n_orders,
          MAX(d0) - MIN(d0) + 1 AS span_days,
          SUM(d1 - d0 + 1) AS wip_days FROM life),
      deltas AS (SELECT day, SUM(delta) AS delta FROM (
          SELECT d0 AS day, 1 AS delta FROM life
          UNION ALL SELECT d1 + 1, -1 FROM life) GROUP BY 1),
      sweep AS (SELECT day,
          SUM(delta) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS wip,
          LEAD(day) OVER (ORDER BY day) AS next_day
        FROM deltas),
      wipm AS (SELECT SUM(wip * (next_day - day)) AS wip_day_mass,
          MAX(next_day) - MIN(day) AS sweep_days
        FROM sweep WHERE next_day IS NOT NULL)
      SELECT CAST(l.n_orders AS BIGINT) AS n_orders,
        round(CAST(l.n_orders AS DOUBLE) / l.span_days, 6) AS lambda_per_day,
        round(CAST(l.wip_days AS DOUBLE) / l.n_orders, 6) AS w_days,
        round(CAST(w.wip_day_mass AS DOUBLE) / w.sweep_days, 6) AS l_measured,
        round((CAST(l.n_orders AS DOUBLE) / l.span_days)
          * (CAST(l.wip_days AS DOUBLE) / l.n_orders), 6) AS l_littles,
        round((CAST(w.wip_day_mass AS DOUBLE) / w.sweep_days)
          / ((CAST(l.n_orders AS DOUBLE) / l.span_days)
            * (CAST(l.wip_days AS DOUBLE) / l.n_orders)), 6) AS ratio
      FROM lamw l CROSS JOIN wipm w"""))

  val all: Seq[QueryDef] =
    Seq(q290ErrorBudgetBurn, q291RetryStorms, q292CapacityHeadroom,
        q293LittlesLaw)
}
