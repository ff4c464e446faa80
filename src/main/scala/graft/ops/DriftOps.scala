package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-drift and time-structure operators: PSI drift detection,
  * lag-k autocorrelation, interval-merge sessionization islands, and
  * time-weighted averages — the monitoring layer a pipeline runs over
  * every refresh to decide whether yesterday's model still sees
  * yesterday's distribution.
  */
object DriftOps {

  /** Population Stability Index of the order-value distribution,
    * reference era (1995–1997) vs current (1998+) — THE drift metric a
    * scoring pipeline alarms on. One orders scan → conditional hash-agg
    * to the model-sized bucket table; period totals are windows over
    * those buckets, never a rescan; PSI contribution per bucket so the
    * alarm names the shifted band. Buckets empty on either side are
    * excluded (ln undefined) but still reported via the counts.
    */
  val q174PsiDrift: QueryDef = QueryDef(
    "q174_psi_drift",
    (s, dir) => {
      val t = Tables(s, dir)
      val w = Window.partitionBy()
      t.orders
        .withColumn("bucket", floor(col("o_totalprice") / lit(50000.0)).cast("long"))
        .withColumn("is_cur", (year(col("o_orderdate")) >= 1998).cast("long"))
        .groupBy(col("bucket"))
        .agg(sum(lit(1L) - col("is_cur")).as("cnt_ref"),
             sum(col("is_cur")).as("cnt_cur"))
        // DuckDB SUM(BIGINT) is HUGEINT; both engines pin BIGINT counts
        .withColumn("p_ref", col("cnt_ref").cast("double") /
          sum(col("cnt_ref")).over(w).cast("double"))
        .withColumn("p_cur", col("cnt_cur").cast("double") /
          sum(col("cnt_cur")).over(w).cast("double"))
        .select(col("bucket"), col("cnt_ref"), col("cnt_cur"),
          round(col("p_ref"), 6).as("share_ref"),
          round(col("p_cur"), 6).as("share_cur"),
          when(col("cnt_ref") > 0 && col("cnt_cur") > 0,
            round((col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")), 6))
            .as("psi_contrib"))
    },
    Some("""WITH b AS (SELECT CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT) AS bucket,
          CAST(EXTRACT(year FROM o_orderdate) >= 1998 AS BIGINT) AS is_cur
        FROM orders),
      cells AS (SELECT bucket, CAST(SUM(1 - is_cur) AS BIGINT) AS cnt_ref,
          CAST(SUM(is_cur) AS BIGINT) AS cnt_cur
        FROM b GROUP BY 1),
      sh AS (SELECT *,
          CAST(cnt_ref AS DOUBLE) / CAST(SUM(cnt_ref) OVER () AS DOUBLE) AS p_ref,
          CAST(cnt_cur AS DOUBLE) / CAST(SUM(cnt_cur) OVER () AS DOUBLE) AS p_cur
        FROM cells)
      SELECT bucket, cnt_ref, cnt_cur,
        round(p_ref, 6) AS share_ref, round(p_cur, 6) AS share_cur,
        CASE WHEN cnt_ref > 0 AND cnt_cur > 0
          THEN round((p_cur - p_ref) * ln(p_cur / p_ref), 6) END AS psi_contrib
      FROM sh"""))

  /** Lag-k autocorrelation (k = 1…7) of each event type's daily count
    * series — the weekly-rhythm detector that tells a capacity planner
    * whether a stream has memory. Daily counts reduce to a model-sized
    * (|types| × 31) frame in one keyed agg; per-type mean and the
    * centered denominator are windows over that frame; the seven
    * shifted pairings are an equi-join of the checkpointed frame with
    * itself on (type, day + k) — never a rescan of events.
    */
  val q175Autocorrelation: QueryDef = QueryDef(
    "q175_autocorrelation",
    (s, dir) => {
      val wT = Window.partitionBy(col("event_type"))
      val daily = EventOps.events(s, dir)
        .groupBy(col("event_type"), dayofmonth(col("ts")).as("d"))
        .agg(count(lit(1)).as("c"))
        .withColumn("mu", sum(col("c")).over(wT).cast("double") /
          count(lit(1)).over(wT).cast("double"))
        .withColumn("den",
          sum((col("c").cast("double") - col("mu")) *
              (col("c").cast("double") - col("mu"))).over(wT))
        .localCheckpoint() // |types|×31 rows feed both sides of 7 lag joins
      val shifted = daily.select(col("event_type").as("et2"), col("d").as("d2"),
        col("c").as("c2"))
      daily
        .withColumn("lag", explode(sequence(lit(1L), lit(7L))))
        .join(shifted,
          col("event_type") === col("et2") && col("d2") === col("d") + col("lag"))
        .groupBy(col("event_type"), col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          round(sum((col("c").cast("double") - col("mu")) *
                    (col("c2").cast("double") - col("mu"))) /
                max(col("den")), 6).as("acf"))
    },
    Some("""WITH daily AS (SELECT event_type, EXTRACT(day FROM ts) AS d, COUNT(*) AS c
          FROM events GROUP BY 1, 2),
      m AS (SELECT *,
          CAST(SUM(c) OVER (PARTITION BY event_type) AS DOUBLE) /
            CAST(COUNT(*) OVER (PARTITION BY event_type) AS DOUBLE) AS mu
        FROM daily),
      ctr AS (SELECT *,
          SUM((CAST(c AS DOUBLE) - mu) * (CAST(c AS DOUBLE) - mu))
            OVER (PARTITION BY event_type) AS den
        FROM m)
      SELECT a.event_type, k.lag, COUNT(*) AS n_pairs,
        round(SUM((CAST(a.c AS DOUBLE) - a.mu) * (CAST(b.c AS DOUBLE) - a.mu))
          / MAX(a.den), 6) AS acf
      FROM ctr a
      CROSS JOIN (SELECT UNNEST(range(1, 8)) AS lag) k
      JOIN ctr b ON b.event_type = a.event_type AND b.d = a.d + k.lag
      GROUP BY 1, 2"""))

  /** Interval-merge sessionization islands: pad each event to a 30-min
    * interval, merge overlaps per user with the cumulative-max-end
    * window (an island starts where the event opens past every prior
    * end), and roll each island to (start, end, n_events). The gaps-and-
    * islands shape — downtime stitching, visit reconstruction, coverage
    * spans — in one sort per user partition, no self-join, no fixpoint.
    * All time math in epoch-µs int64 so both engines agree bit-exactly.
    */
  val q176IntervalIslands: QueryDef = QueryDef(
    "q176_interval_islands",
    (s, dir) => {
      val pad = 1800000000L // 30 min in µs
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wPrev = wSeq.rowsBetween(Window.unboundedPreceding, -1)
      EventOps.events(s, dir)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("end_us", col("ts_us") + lit(pad))
        .withColumn("prev_max", max(col("end_us")).over(wPrev))
        .withColumn("fresh",
          when(col("prev_max").isNull || col("ts_us") > col("prev_max"), 1L)
            .otherwise(0L))
        .withColumn("island", sum(col("fresh")).over(
          wSeq.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("island"))
        .agg(min(col("ts_us")).as("start_us"), max(col("end_us")).as("end_us"),
          count(lit(1)).as("n_events"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
          epoch_us(ts) + 1800000000 AS end_us
        FROM events),
      marked AS (SELECT *,
          MAX(end_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
        FROM ev),
      isl AS (SELECT *,
          SUM(CASE WHEN prev_max IS NULL OR ts_us > prev_max THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
        FROM marked)
      SELECT user_id, CAST(island AS BIGINT) AS island,
        MIN(ts_us) AS start_us, MAX(end_us) AS end_us,
        COUNT(*) AS n_events
      FROM isl GROUP BY 1, 2"""))

  /** Time-weighted average of each event type's value per day — the
    * TWAP/mean-holding metric for irregularly sampled readings, where a
    * value counts for as long as it was the latest one. Each reading's
    * weight is the µs gap to the day's next reading (the day's last
    * reading closes the books and carries no weight); the weighted sum
    * runs through exact DECIMAL (value quantized at 1e-4 both engines)
    * so partitioning can't move the result. One scan, one window, one agg.
    */
  val q177TimeWeightedAvg: QueryDef = QueryDef(
    "q177_time_weighted_avg",
    (s, dir) => {
      val wSeq = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("ts_us"), col("event_id"))
      EventOps.events(s, dir)
        .select(col("event_type"), col("event_id"), to_date(col("ts")).as("day"),
          unix_micros(col("ts")).as("ts_us"), col("value"))
        .withColumn("dur", lead(col("ts_us"), 1).over(wSeq) - col("ts_us"))
        .filter(col("dur").isNotNull)
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("dur")).as("total_us"),
          round(sum((col("value").cast(DecimalType(18, 4)) * col("dur"))
                      .cast(DecimalType(38, 4))).cast("double") /
                sum(col("dur")).cast("double"), 6).as("twap"))
    },
    Some("""WITH ev AS (SELECT event_type, event_id, CAST(ts AS DATE) AS day,
          epoch_us(ts) AS ts_us, value
        FROM events),
      sp AS (SELECT *,
          LEAD(ts_us, 1) OVER (PARTITION BY event_type, day
            ORDER BY ts_us, event_id) - ts_us AS dur
        FROM ev)
      SELECT event_type, day, COUNT(*) AS n_spans,
        CAST(SUM(dur) AS BIGINT) AS total_us,
        round(CAST(SUM(CAST(CAST(value AS DECIMAL(18,4)) * dur AS DECIMAL(38,4)))
            AS DOUBLE) / CAST(SUM(dur) AS DOUBLE), 6) AS twap
      FROM sp WHERE dur IS NOT NULL
      GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q174PsiDrift, q175Autocorrelation,
    q176IntervalIslands, q177TimeWeightedAvg)
}
