package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus- and cadence-profiling operators: weekday seasonal indices,
  * temporal cold-start coverage, inter-arrival tail percentiles, and
  * the vocabulary-growth (Heaps) curve — the profile a pipeline
  * publishes so downstream consumers know what the data looks like
  * before they query it.
  */
object ProfileOps {

  /** Weekday seasonal index of order revenue: each weekday's mean
    * daily revenue over the overall mean daily revenue — the
    * ratio-to-average decomposition that separates "Mondays are slow"
    * from real trend (complementing q129's additive baseline). Daily
    * totals reduce through exact DECIMAL; both means are windows over
    * the model-sized daily frame, so the index is one scan + one agg
    * + windows.
    */
  val q194SeasonalIndex: QueryDef = QueryDef(
    "q194_seasonal_index",
    (s, dir) => {
      val wAll = Window.partitionBy()
      EventOps.events(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).as("rev"))
        .withColumn("weekday", dayofweek(col("day")).cast("long"))
        .groupBy(col("weekday"))
        .agg(count(lit(1)).as("n_days"),
             sum(col("rev")).as("wd_rev"))
        .withColumn("mean_daily",
          col("wd_rev").cast("double") / col("n_days").cast("double"))
        .withColumn("grand_mean",
          sum(col("wd_rev")).over(wAll).cast("double") /
            sum(col("n_days")).over(wAll).cast("double"))
        .select(col("weekday"), col("n_days"),
          round(col("mean_daily"), 6).as("mean_daily_rev"),
          round(col("mean_daily") / col("grand_mean"), 6).as("seasonal_index"))
    },
    Some("""WITH daily AS (SELECT CAST(ts AS DATE) AS day,
          SUM(CAST(value AS DECIMAL(18,4))) AS rev
        FROM events WHERE event_type = 'purchase' GROUP BY 1),
      wd AS (SELECT CAST(dayofweek(day) + 1 AS BIGINT) AS weekday,
          COUNT(*) AS n_days, SUM(rev) AS wd_rev
        FROM daily GROUP BY 1),
      m AS (SELECT *,
          CAST(wd_rev AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_daily,
          CAST(SUM(wd_rev) OVER () AS DOUBLE) /
            CAST(SUM(n_days) OVER () AS DOUBLE) AS grand_mean
        FROM wd)
      SELECT weekday, n_days,
        round(mean_daily, 6) AS mean_daily_rev,
        round(mean_daily / grand_mean, 6) AS seasonal_index
      FROM m"""))

  /** Temporal cold-start coverage: split orders at 1999-01-01 into
    * train/test eras and measure, per test year, how many lineitems
    * touch a part NEVER seen in the train era — the leakage-direction
    * twin of decontamination (q78) that tells a recsys/demand model how
    * much of tomorrow it has literally never observed. Train parts are
    * a distinct projection; the probe is a left-anti-style flag via
    * left join, aggregated to exact counts.
    */
  val q195ColdStart: QueryDef = QueryDef(
    "q195_cold_start",
    (s, dir) => {
      val t = Tables(s, dir)
      val cut = lit("1999-01-01").cast("timestamp")
      val li = t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")), col("l_orderkey") === col("o_orderkey"))
      val trainParts = li.filter(col("o_orderdate") < cut)
        .select(col("l_partkey")).distinct()
        .withColumn("seen", lit(1L))
      li.filter(col("o_orderdate") >= cut)
        .join(trainParts, Seq("l_partkey"), "left")
        .groupBy(year(col("o_orderdate")).cast("long").as("test_year"))
        .agg(count(lit(1)).as("n_lineitems"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_cold"),
          countDistinct(when(col("seen").isNull, col("l_partkey")))
            .as("n_new_parts"),
          round(sum(when(col("seen").isNull, 1L).otherwise(0L)).cast("double") /
            count(lit(1)).cast("double"), 6).as("cold_rate"))
    },
    Some("""WITH li AS (SELECT l.l_partkey, o.o_orderdate
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      train AS (SELECT DISTINCT l_partkey FROM li
        WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'),
      test AS (SELECT li.l_partkey, li.o_orderdate,
          CASE WHEN t.l_partkey IS NULL THEN 1 ELSE 0 END AS cold
        FROM li LEFT JOIN train t ON li.l_partkey = t.l_partkey
        WHERE li.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS test_year,
        COUNT(*) AS n_lineitems,
        CAST(SUM(cold) AS BIGINT) AS n_cold,
        CAST(COUNT(DISTINCT CASE WHEN cold = 1 THEN l_partkey END) AS BIGINT)
          AS n_new_parts,
        round(CAST(SUM(cold) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
          AS cold_rate
      FROM test GROUP BY 1"""))

  /** Inter-arrival tail percentiles (p50/p90/p99) of each event type's
    * gap distribution — the latency-SLO shape for irregular streams,
    * where the p99 gap is what a freshness alert must tolerate. Gaps
    * come from one lag window per type partition (epoch-µs int64); the
    * exact interpolated percentiles ride the q152-proven
    * percentile ≡ quantile_cont parity.
    */
  val q196GapPercentiles: QueryDef = QueryDef(
    "q196_gap_percentiles",
    (s, dir) => {
      val wSeq = Window.partitionBy(col("event_type"))
        .orderBy(col("ts_us"), col("event_id"))
      EventOps.events(s, dir)
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("gap", col("ts_us") - lag(col("ts_us"), 1).over(wSeq))
        .filter(col("gap").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_gaps"),
          expr("percentile(gap, array(0.5D, 0.9D, 0.99D))").as("q"))
        .select(col("event_type"), col("n_gaps"),
          round(col("q").getItem(0), 4).as("p50_us"),
          round(col("q").getItem(1), 4).as("p90_us"),
          round(col("q").getItem(2), 4).as("p99_us"))
    },
    Some("""WITH g AS (SELECT event_type,
          epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (PARTITION BY event_type
            ORDER BY epoch_us(ts), event_id) AS gap
        FROM events),
      p AS (SELECT event_type, COUNT(*) AS n_gaps,
          quantile_cont(gap, [0.5, 0.9, 0.99]) AS q
        FROM g WHERE gap IS NOT NULL GROUP BY 1)
      SELECT event_type, n_gaps,
        round(q[1], 4) AS p50_us,
        round(q[2], 4) AS p90_us,
        round(q[3], 4) AS p99_us
      FROM p"""))

  /** Vocabulary-growth (Heaps' law) curve over ingestion order: docs
    * bucket by doc_id into batches of 100; each token's FIRST batch is
    * a min-agg, new-type counts per batch roll up, and the running
    * vocabulary is a cumulative window over the model-sized batch
    * frame — the curve that predicts how much vocab the next 10 TB of
    * corpus will add. One tokenize pass, two hash aggs, one window.
    */
  val q197VocabGrowth: QueryDef = QueryDef(
    "q197_vocab_growth",
    (s, dir) => {
      val wCum = Window.orderBy(col("batch"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val dt = Tables(s, dir).documents
        .select((col("doc_id") / lit(100L)).cast("long").as("batch"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .localCheckpoint() // one tokenize pass feeds occurrences AND first-seen
      val occ = dt.groupBy(col("batch")).agg(count(lit(1)).as("n_tokens"))
      val fresh = dt.groupBy(col("tok")).agg(min(col("batch")).as("batch"))
        .groupBy(col("batch")).agg(count(lit(1)).as("n_new_types"))
      occ.join(fresh, Seq("batch"), "left")
        .withColumn("n_new_types", coalesce(col("n_new_types"), lit(0L)))
        .withColumn("cum_vocab", sum(col("n_new_types")).over(wCum))
        .select(col("batch"), col("n_tokens"), col("n_new_types"),
          col("cum_vocab"),
          round(col("n_new_types").cast("double") /
            col("n_tokens").cast("double"), 6).as("novelty_rate"))
    },
    Some("""WITH dt AS (SELECT CAST(doc_id // 100 AS BIGINT) AS batch,
          UNNEST(regexp_extract_all(lower(text), '\w+')) AS tok
        FROM documents),
      occ AS (SELECT batch, COUNT(*) AS n_tokens FROM dt GROUP BY 1),
      fresh AS (SELECT batch, COUNT(*) AS n_new_types FROM (
          SELECT tok, MIN(batch) AS batch FROM dt GROUP BY 1) GROUP BY 1)
      SELECT o.batch, o.n_tokens,
        COALESCE(f.n_new_types, 0) AS n_new_types,
        CAST(SUM(COALESCE(f.n_new_types, 0)) OVER (ORDER BY o.batch
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS cum_vocab,
        round(CAST(COALESCE(f.n_new_types, 0) AS DOUBLE) /
          CAST(o.n_tokens AS DOUBLE), 6) AS novelty_rate
      FROM occ o LEFT JOIN fresh f ON o.batch = f.batch"""))

  val all: Seq[QueryDef] = Seq(q194SeasonalIndex, q195ColdStart,
    q196GapPercentiles, q197VocabGrowth)
}
