package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Layout- and sensitivity-audit operators: zone-map skipping
  * effectiveness, attribution-window sensitivity, order-statistic
  * median confidence bounds, and TTL retention projection — the
  * pre-flight numbers that justify a layout, a metric definition, or a
  * retention policy before anyone pays for the full run.
  */
object PruneOps {

  /** Zone-map (min/max) skipping audit: partition orders by month,
    * collect each partition's totalprice zone map, and report — for ten
    * candidate `totalprice > t` predicates — how many partitions and
    * rows a file-skipping reader would prune. The question every
    * layout decision answers BEFORE the 100 TB rewrite: is this sort
    * key worth it? One scan to the model-sized zone table; the ×10
    * predicate fan-out runs on 84 rows.
    */
  val q210ZonemapSkipping: QueryDef = QueryDef(
    "q210_zonemap_skipping",
    (s, dir) => {
      val wAll = Window.partitionBy(col("t"))
      Tables(s, dir).orders
        .groupBy((year(col("o_orderdate")) * 100 + month(col("o_orderdate")))
          .cast("long").as("part_month"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("o_totalprice")).as("zmin"),
          max(col("o_totalprice")).as("zmax"))
        .withColumn("t", explode(expr(
          "transform(sequence(1, 10), i -> CAST(i * 60000 AS DOUBLE))")))
        .withColumn("prunable", (col("zmax") <= col("t")).cast("long"))
        .groupBy(col("t").as("threshold"))
        .agg(count(lit(1)).as("n_partitions"),
          sum(col("prunable")).as("n_prunable"),
          sum(col("prunable") * col("n_rows")).as("rows_skipped"),
          round(sum(col("prunable") * col("n_rows")).cast("double") /
            sum(col("n_rows")).cast("double"), 6).as("row_skip_share"))
    },
    Some("""WITH zm AS (SELECT
          CAST(EXTRACT(year FROM o_orderdate) * 100 +
               EXTRACT(month FROM o_orderdate) AS BIGINT) AS part_month,
          COUNT(*) AS n_rows,
          MIN(o_totalprice) AS zmin, MAX(o_totalprice) AS zmax
        FROM orders GROUP BY 1),
      fan AS (SELECT zm.*, CAST(t.i * 60000 AS DOUBLE) AS threshold,
          CASE WHEN zmax <= CAST(t.i * 60000 AS DOUBLE) THEN 1 ELSE 0 END
            AS prunable
        FROM zm CROSS JOIN (SELECT UNNEST(range(1, 11)) AS i) t)
      SELECT threshold, COUNT(*) AS n_partitions,
        CAST(SUM(prunable) AS BIGINT) AS n_prunable,
        CAST(SUM(prunable * n_rows) AS BIGINT) AS rows_skipped,
        round(CAST(SUM(prunable * n_rows) AS DOUBLE) /
          CAST(SUM(n_rows) AS DOUBLE), 6) AS row_skip_share
      FROM fan GROUP BY 1"""))

  /** Attribution-window sensitivity: how does the click→purchase
    * attribution rate move as the lookback window sweeps 1 h → 48 h?
    * If the metric jumps at the window edge, the definition — not the
    * marketing — is driving the number. ONE interval join builds each
    * purchase's minimum click gap; the six-window sweep is a bounded
    * fan-out over that model-sized frame. The meta-analysis that turns
    * a metric choice into a measured decision.
    */
  val q211WindowSensitivity: QueryDef = QueryDef(
    "q211_window_sensitivity",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          unix_micros(col("ts")).as("p_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), unix_micros(col("ts")).as("t_us"))
      // band lives in the JOIN condition: a purchase whose clicks are all
      // out-of-band keeps its row (null gap), so n_purchases stays total
      val minGap = purchases.join(clicks,
          col("user_id") === col("c_user") &&
          col("t_us") < col("p_us") &&
          col("t_us") >= col("p_us") - lit(172800000000L), "left")
        .groupBy(col("purchase_id"))
        .agg(min(col("p_us") - col("t_us")).as("min_gap_us"))
      minGap
        .withColumn("window_h", explode(expr(
          "transform(array(1, 2, 4, 8, 24, 48), h -> CAST(h AS BIGINT))")))
        .groupBy(col("window_h"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("min_gap_us") <= col("window_h") * lit(3600000000L), 1L)
            .otherwise(0L)).as("n_attributed"),
          round(sum(when(col("min_gap_us") <= col("window_h") * lit(3600000000L),
              1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double"), 6).as("attribution_rate"))
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
      c AS (SELECT user_id, epoch_us(ts) AS t_us
        FROM events WHERE event_type = 'click'),
      mg AS (SELECT p.purchase_id, MIN(p.p_us - c.t_us) AS min_gap_us
        FROM p LEFT JOIN c ON p.user_id = c.user_id
          AND c.t_us < p.p_us AND c.t_us >= p.p_us - 172800000000
        GROUP BY 1),
      fan AS (SELECT mg.*, CAST(w.h AS BIGINT) AS window_h
        FROM mg CROSS JOIN (SELECT UNNEST([1, 2, 4, 8, 24, 48]) AS h) w)
      SELECT window_h, COUNT(*) AS n_purchases,
        CAST(SUM(CASE WHEN min_gap_us <= window_h * 3600000000
          THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
        round(CAST(SUM(CASE WHEN min_gap_us <= window_h * 3600000000
            THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          AS attribution_rate
      FROM fan GROUP BY 1"""))

  /** Distribution-free median confidence interval per event type via
    * binomial order statistics: the CI comes from the values at ranks
    * n/2 ± z√n/2 — no normality assumption, exact for any
    * distribution. One ranking window per type and one conditional
    * agg; the rank arithmetic is integer-exact in both engines. The
    * robust-stats companion to q182's jackknife (which bounds a MEAN).
    */
  val q212MedianCi: QueryDef = QueryDef(
    "q212_median_ci",
    (s, dir) => {
      val wSeq = Window.partitionBy(col("event_type"))
        .orderBy(col("value"), col("event_id"))
      val wN = Window.partitionBy(col("event_type"))
      val n = col("n").cast("double")
      EventOps.events(s, dir)
        .select(col("event_type"), col("event_id"), col("value"))
        .withColumn("rn", row_number().over(wSeq))
        .withColumn("n", count(lit(1)).over(wN))
        .withColumn("k_lo",
          greatest(lit(1L), floor((n - lit(1.96) * sqrt(n)) / lit(2.0))
            .cast("long")))
        .withColumn("k_med", ((col("n") + 1) / 2).cast("long"))
        .withColumn("k_hi",
          least(col("n"), ceil((n + lit(1.96) * sqrt(n)) / lit(2.0) + lit(1.0))
            .cast("long")))
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_obs"),
          round(max(when(col("rn") === col("k_lo"), col("value"))), 6)
            .as("ci_lo"),
          round(max(when(col("rn") === col("k_med"), col("value"))), 6)
            .as("median"),
          round(max(when(col("rn") === col("k_hi"), col("value"))), 6)
            .as("ci_hi"))
    },
    Some("""WITH r AS (SELECT event_type, event_id, value,
          ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY value, event_id) AS rn,
          COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events),
      k AS (SELECT *,
          greatest(1, CAST(floor((CAST(n AS DOUBLE) - 1.96 * sqrt(CAST(n AS DOUBLE)))
            / 2.0) AS BIGINT)) AS k_lo,
          CAST((n + 1) // 2 AS BIGINT) AS k_med,
          least(n, CAST(ceil((CAST(n AS DOUBLE) + 1.96 * sqrt(CAST(n AS DOUBLE)))
            / 2.0 + 1.0) AS BIGINT)) AS k_hi
        FROM r)
      SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_obs,
        round(MAX(CASE WHEN rn = k_lo THEN value END), 6) AS ci_lo,
        round(MAX(CASE WHEN rn = k_med THEN value END), 6) AS median,
        round(MAX(CASE WHEN rn = k_hi THEN value END), 6) AS ci_hi
      FROM k GROUP BY 1"""))

  /** TTL retention projection: for candidate TTLs of 7/14/30 days
    * against the corpus horizon (the in-plan max timestamp — never a
    * driver action), what fraction of events and payload bytes
    * survive? The storage-policy what-if, answered from one scan with
    * a ×3 fan-out and exact-int reductions.
    */
  val q213TtlProjection: QueryDef = QueryDef(
    "q213_ttl_projection",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(unix_micros(col("ts")).as("ts_us"),
          length(col("props")).cast("long").as("payload"))
      val horizon = ev.agg(max(col("ts_us")).as("h_us"))
      ev.crossJoin(broadcast(horizon))
        .withColumn("ttl_days", explode(expr(
          "transform(array(7, 14, 30), d -> CAST(d AS BIGINT))")))
        .withColumn("kept",
          (col("ts_us") >= col("h_us") - col("ttl_days") * lit(86400000000L))
            .cast("long"))
        .groupBy(col("ttl_days"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("kept")).as("n_kept"),
          round(sum(col("kept")).cast("double") / count(lit(1)).cast("double"), 6)
            .as("event_share"),
          sum(col("kept") * col("payload")).as("payload_kept"),
          round(sum(col("kept") * col("payload")).cast("double") /
            sum(col("payload")).cast("double"), 6).as("payload_share"))
    },
    Some("""WITH ev AS (SELECT epoch_us(ts) AS ts_us,
          CAST(length(props) AS BIGINT) AS payload FROM events),
      h AS (SELECT MAX(ts_us) AS h_us FROM ev),
      fan AS (SELECT ev.*, h.h_us, CAST(t.d AS BIGINT) AS ttl_days,
          CASE WHEN ev.ts_us >= h.h_us - CAST(t.d AS BIGINT) * 86400000000
            THEN 1 ELSE 0 END AS kept
        FROM ev CROSS JOIN h
        CROSS JOIN (SELECT UNNEST([7, 14, 30]) AS d) t)
      SELECT ttl_days, COUNT(*) AS n_events,
        CAST(SUM(kept) AS BIGINT) AS n_kept,
        round(CAST(SUM(kept) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          AS event_share,
        CAST(SUM(kept * payload) AS BIGINT) AS payload_kept,
        round(CAST(SUM(kept * payload) AS DOUBLE) /
          CAST(SUM(payload) AS DOUBLE), 6) AS payload_share
      FROM fan GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q210ZonemapSkipping, q211WindowSensitivity,
    q212MedianCi, q213TtlProjection)
}
