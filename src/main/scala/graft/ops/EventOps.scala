package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Event-stream operators in batch form: JSON decode, as-of join,
  * sessionization (gaps-and-islands), tumbling windows. The same plans run
  * under Structured Streaming (graft.streaming) — watermark + window for
  * tumbling, flatMapGroupsWithState for sessions.
  */
object EventOps {

  private val M = DecimalType(18, 4)

  /** events.parquet's ts column has changed physical type across driver
    * data generations: TIMESTAMP(NANOS) (which vanilla Spark scans reject —
    * read as long nanos, truncate to µs exactly like DuckDB does) vs plain
    * µs TIMESTAMP, surfaced as TIMESTAMP_NTZ when isAdjustedToUTC=false.
    * Dispatch on the scanned type so either generation yields the same
    * session-UTC TimestampType column and every downstream unix_micros /
    * date_trunc / window agrees with the DuckDB oracle's epoch_us(ts). */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // NTZ→LTZ: wall clock reinterpreted in the session zone (UTC, set
        // by every entry point) — identical µs instant to the oracle's
        raw.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }

  /** JSON-string column decode (§2E scan/source row 3 — the reference's
    * args/failure EDN columns, jdbc.clj:33-34). */
  val q17JsonExtract: QueryDef = QueryDef(
    "q17_json_extract",
    (s, dir) => events(s, dir)
      .withColumn("k_val", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"), col("k_val"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast(M)).cast("double").as("total_value")),
    Some("""SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
      COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2"""))

  /** As-of join (§2E join row 7): each purchase matched to the latest click
    * at-or-before it by the same user. Spark-first formulation: tag both
    * sides, union, and carry the last click forward with a running
    * `last(_, ignoreNulls)` window — one shuffle on user_id, no range
    * explosion, scales linearly in events. Clicks are pre-deduped to one per
    * (user, ts) so ties resolve identically everywhere. */
  val q18AsofJoin: QueryDef = QueryDef(
    "q18_asof_join",
    (s, dir) => {
      val ev = events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts"), col("click_id"),
                lit(0).as("side"), lit(null).cast("long").as("p_event_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"), lit(null).cast("long").as("click_id"),
                lit(1).as("side"), col("event_id").as("p_event_id"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("side").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      clicks.union(purchases)
        .withColumn("last_click_id", last(col("click_id"), ignoreNulls = true).over(w))
        .withColumn("last_click_ts",
          last(when(col("side") === 0, col("ts")), ignoreNulls = true).over(w))
        .filter(col("side") === 1)
        .select(
          col("p_event_id").as("event_id"),
          col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("last_click_id").as("click_id"),
          unix_micros(col("last_click_ts")).as("click_ts_us"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
             c.click_id, epoch_us(c.ts) AS click_ts_us
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"""))

  /** The SAME as-of contract as q18, executed by the NATIVE operator
    * ([[graft.plans.AsofJoinPlan]] → AsofJoinStrategy → AsofJoinExec):
    * a custom logical node planned by an injected SparkStrategy into a
    * physical sort-merge forward pass — one Exchange per side on
    * user_id, one buffered right row per partition, O(|L|+|R|). q18's
    * union+window formulation funnels BOTH sides through one window
    * stream; the native operator keeps them separate and streaming.
    * Same oracle as q18 — two implementations, one contract.
    */
  val q118AsofNative: QueryDef = QueryDef(
    "q118_asof_native",
    (s, dir) => {
      val ev = events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts")).agg(max(col("event_id")).as("click_id"))
        .select(col("user_id"), col("ts").as("click_ts"), col("click_id"))
      graft.plans.AsofJoin(purchases, clicks,
          key = "user_id", leftTime = "ts", rightTime = "click_ts")
        .toDF("event_id", "user_id", "ts", "r_user_id", "click_ts", "click_id")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("click_id"),
          unix_micros(col("click_ts")).as("click_ts_us"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
           c AS (SELECT user_id, ts, max(event_id) AS click_id
                 FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us,
             c.click_id, epoch_us(c.ts) AS click_ts_us
      FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts"""))

  /** Sessionization: 30-minute-gap sessions per user (gaps-and-islands:
    * lag → new-session flag → running sum → aggregate). */
  val q19Sessionize: QueryDef = QueryDef(
    "q19_sessionize",
    (s, dir) => {
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, dir)
        .withColumn("prev_us", unix_micros(lag(col("ts"), 1).over(wOrd)))
        .withColumn("new_s",
          when(col("prev_us").isNull ||
               unix_micros(col("ts")) - col("prev_us") > 1800000000L, lit(1))
            .otherwise(lit(0)))
        .withColumn("session_id", sum(col("new_s")).over(wRun).cast("long"))
        .groupBy(col("user_id"), col("session_id"))
        .agg(count(lit(1)).as("n_events"),
             unix_micros(min(col("ts"))).as("start_us"),
             unix_micros(max(col("ts"))).as("end_us"),
             sum(col("value").cast(M)).cast("double").as("total_value"))
    },
    Some("""WITH flags AS (
        SELECT user_id, ts, value, event_id,
          CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, value,
          CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        FROM flags)
      SELECT user_id, session_id, COUNT(*) AS n_events,
        epoch_us(MIN(ts)) AS start_us, epoch_us(MAX(ts)) AS end_us,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM sess GROUP BY 1, 2"""))

  /** Tumbling window aggregation via Spark's `window()` — epoch-aligned
    * 1-hour buckets with count / distinct users / exact sum. */
  val q20Tumbling: QueryDef = QueryDef(
    "q20_tumbling_hourly",
    (s, dir) => events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
           countDistinct(col("user_id")).as("n_users"),
           sum(col("value").cast(M)).cast("double").as("total_value"))
      .select(unix_micros(col("w.start")).as("hour_us"), col("event_type"),
              col("n"), col("n_users"), col("total_value")),
    Some("""SELECT epoch_us(date_trunc('hour', ts)) AS hour_us, event_type,
      COUNT(*) AS n, COUNT(DISTINCT user_id) AS n_users,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2"""))

  /** Interval (range) join: clicks within 10 minutes BEFORE each purchase
    * by the same user. Planned as an equi-join on user_id with the time
    * band as a post-join filter — hash/merge join, never a cartesian
    * product; the band bounds the per-key fan-out. */
  val q48IntervalJoin: QueryDef = QueryDef(
    "q48_interval_join",
    (s, dir) => {
      val ev = events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
                unix_micros(col("ts")).as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
                unix_micros(col("ts")).as("c_us"))
      p.join(c, Seq("user_id"))
        .filter(col("c_us") >= col("p_us") - lit(600000000L) && col("c_us") < col("p_us"))
        .groupBy(col("user_id"), col("purchase_id"), col("p_us"))
        .agg(count(lit(1)).as("clicks_before"), max(col("c_us")).as("last_click_us"))
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        c AS (SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
          FROM events WHERE event_type = 'click')
      SELECT p.user_id, p.purchase_id, p.p_us,
        COUNT(*) AS clicks_before, MAX(c.c_us) AS last_click_us
      FROM p JOIN c ON p.user_id = c.user_id
        AND c.c_us >= p.p_us - 600000000 AND c.c_us < p.p_us
      GROUP BY 1, 2, 3"""))

  /** Sliding window in batch form: 1-hour windows every 15 minutes — each
    * event lands in 4 windows (the `window(ts, span, slide)` generator
    * explodes to window structs). */
  val q49SlidingWindow: QueryDef = QueryDef(
    "q49_sliding_window",
    (s, dir) => events(s, dir)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_us"), col("event_type"), col("n")),
    // oracle: each event belongs to the 4 slide-aligned windows covering it
    // (7 candidate starts around its hour always include those 4)
    Some("""SELECT win_us, event_type, COUNT(*) AS n FROM (
        SELECT epoch_us(date_trunc('hour', ts)) - 2700000000 + 900000000 * g.i AS win_us,
               epoch_us(ts) AS e_us, event_type
        FROM events, (SELECT UNNEST(range(0, 7)) AS i) g) x
      WHERE e_us >= win_us AND e_us < win_us + 3600000000
      GROUP BY 1, 2"""))

  /** Time-series resampling with LINEAR interpolation (q73's forward-fill
    * is the step-function cousin): per-user daily purchase means resampled
    * onto each user's complete day spine, gaps filled by interpolating
    * between the surrounding observations
    * (v = v_prev + (v_next − v_prev)·(d − d_prev)/(d_next − d_prev)),
    * boundary gaps clamped to the nearest observation. The spine is a
    * per-user `sequence` + explode (no cross join); prev/next observations
    * come from two IGNORE-NULLS window frames over the day order — all
    * work partitions by user, so 1000 executors each interpolate their
    * own keys. Interpolation math is mirrored expression-for-expression
    * in the oracle (IEEE determinism), rounded at 6 decimals.
    */
  val q117LinearInterp: QueryDef = QueryDef(
    "q117_linear_interp",
    (s, dir) => {
      val M4 = DecimalType(18, 4)
      val obs = events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("day", to_date(col("ts")))
        .groupBy(col("user_id"), col("day"))
        .agg((sum(col("value").cast(M4)) / count(lit(1))).cast("double").as("v"))
      val spine = obs.groupBy(col("user_id"))
        .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
        .select(col("user_id"),
          explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
      val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      spine.join(obs, Seq("user_id", "day"), "left_outer")
        .withColumn("dn", datediff(col("day"), lit("2024-01-01").cast("date")).cast("long"))
        .withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
        .withColumn("pd", last(when(col("v").isNotNull, col("dn")), ignoreNulls = true).over(wPrev))
        .withColumn("nv", first(col("v"), ignoreNulls = true).over(wNext))
        .withColumn("nd", first(when(col("v").isNotNull, col("dn")), ignoreNulls = true).over(wNext))
        .withColumn("v_filled", round(
          when(col("v").isNotNull, col("v"))
            .when(col("pv").isNull, col("nv"))
            .when(col("nv").isNull, col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("dn") - col("pd")).cast("double") /
              (col("nd") - col("pd")).cast("double")), 6))
        .withColumn("observed", when(col("v").isNotNull, 1L).otherwise(0L))
        .select(col("user_id"), col("day"), col("v_filled"), col("observed"))
    },
    Some("""WITH obs AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) / COUNT(*) AS DOUBLE) AS v
        FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
      spine AS (
        SELECT user_id, unnest(generate_series(MIN(day), MAX(day),
          INTERVAL 1 DAY))::DATE AS day
        FROM obs GROUP BY user_id),
      j AS (
        SELECT s.user_id, s.day, obs.v,
          s.day - DATE '2024-01-01' AS dn
        FROM spine s LEFT JOIN obs ON obs.user_id = s.user_id AND obs.day = s.day),
      f AS (
        SELECT *,
          LAST_VALUE(v IGNORE NULLS) OVER wp AS pv,
          LAST_VALUE(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS) OVER wp AS pd,
          FIRST_VALUE(v IGNORE NULLS) OVER wn AS nv,
          FIRST_VALUE(CASE WHEN v IS NOT NULL THEN dn END IGNORE NULLS) OVER wn AS nd
        FROM j
        WINDOW wp AS (PARTITION BY user_id ORDER BY day ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wn AS (PARTITION BY user_id ORDER BY day ASC
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
      SELECT user_id, day,
        round(CASE WHEN v IS NOT NULL THEN v
          WHEN pv IS NULL THEN nv
          WHEN nv IS NULL THEN pv
          ELSE pv + (nv - pv) * CAST(dn - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)
        END, 6) AS v_filled,
        CASE WHEN v IS NOT NULL THEN CAST(1 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS observed
      FROM f"""))

  /** Binned range join — the containment join with NO equi key, which
    * Spark would otherwise plan as a nested-loop: each event matched to
    * the maintenance window containing it (36 derived 6-hour windows
    * spaced 20 hours apart over January). The bin trick makes it an
    * EQUI-join: time is quantized to 6-hour bins, each interval explodes
    * to the bins it covers (≤2 here), events join on their single bin,
    * and the exact containment predicate filters the candidates. At
    * 100 TB the fan-out per event is the number of intervals per bin —
    * bounded by construction — instead of |intervals|. All arithmetic is
    * epoch-microsecond integers, so the oracle (a plain theta join) is
    * timezone-free and exact.
    */
  val q119BinRangeJoin: QueryDef = QueryDef(
    "q119_bin_range_join",
    (s, dir) => {
      val binUs = 21600000000L // 6 h
      val baseUs = 1704067200000000L // 2024-01-01 00:00:00 UTC
      val periods = s.range(36)
        .select(col("id").as("period_id"),
          (lit(baseUs) + col("id") * lit(72000000000L)).as("w_start_us")) // 20 h spacing
        .withColumn("w_end_us", col("w_start_us") + lit(binUs)) // 6 h long
        .withColumn("bin", explode(sequence(
          expr(s"w_start_us div ${binUs}L"),
          expr(s"(w_end_us - 1) div ${binUs}L"))))
      val ev = events(s, dir)
        .select(col("event_id"), col("value"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("bin", expr(s"ts_us div ${binUs}L"))
      ev.join(periods, "bin")
        .filter(col("ts_us") >= col("w_start_us") && col("ts_us") < col("w_end_us"))
        .groupBy(col("period_id"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("value").cast(M)).cast("double").as("total_value"))
    },
    Some("""WITH periods AS (
        SELECT i AS period_id,
          1704067200000000 + i * 72000000000 AS w_start_us,
          1704067200000000 + i * 72000000000 + 21600000000 AS w_end_us
        FROM range(0, 36) t(i)),
      ev AS (SELECT event_id, value, epoch_us(ts) AS ts_us FROM events)
      SELECT period_id, COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM ev JOIN periods
        ON ev.ts_us >= w_start_us AND ev.ts_us < w_end_us
      GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q17JsonExtract, q18AsofJoin, q19Sessionize, q20Tumbling,
    q48IntervalJoin, q49SlidingWindow, q117LinearInterp, q118AsofNative,
    q119BinRangeJoin)
}
