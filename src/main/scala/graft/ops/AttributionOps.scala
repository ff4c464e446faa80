package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Marketing-analytics operators: conversion attribution, fixed-quota
  * sampling, and revenue-concentration statistics. Window/band-join
  * shapes with exact decimal money math.
  */
object AttributionOps {

  private val M = DecimalType(18, 4)

  /** First-touch attribution: each purchase credits its value to the
    * EARLIEST click/view by the same user in the 24 h before it
    * (unattributed purchases fall to 'direct'). The candidate set rides
    * the user equi-join with the time band as a residual predicate
    * (q48's interval-join plan — hash join, fan-out bounded by per-user
    * activity in the window), then one ranking window picks the first
    * touch and one hash agg rolls up per channel. Revenue stays exact
    * DECIMAL until the final cast.
    */
  val q138FirstTouchAttribution: QueryDef = QueryDef(
    "q138_first_touch",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
                unix_micros(col("ts")).as("p_us"), col("value"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("channel"),
                unix_micros(col("ts")).as("t_us"),
                col("event_id").as("touch_id"))
      val cand = purchases.join(touches, Seq("user_id"))
        .filter(col("t_us") < col("p_us") &&
                col("t_us") >= col("p_us") - lit(86400000000L))
      val w = Window.partitionBy(col("purchase_id"))
        .orderBy(col("t_us").asc, col("touch_id").asc)
      val first = cand.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("purchase_id"), col("channel"))
      purchases.join(first, Seq("purchase_id"), "left")
        .withColumn("channel", coalesce(col("channel"), lit("direct")))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_conversions"),
             sum(col("value").cast(M)).cast("double").as("revenue"))
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id,
            epoch_us(ts) AS p_us, value
          FROM events WHERE event_type = 'purchase'),
        t AS (SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us,
            event_id AS touch_id
          FROM events WHERE event_type IN ('click', 'view')),
        cand AS (SELECT p.purchase_id, t.channel, t.t_us, t.touch_id
          FROM p JOIN t USING (user_id)
          WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 86400000000),
        first AS (SELECT purchase_id, channel FROM (
            SELECT purchase_id, channel,
              ROW_NUMBER() OVER (PARTITION BY purchase_id
                ORDER BY t_us ASC, touch_id ASC) AS rn
            FROM cand) WHERE rn = 1)
      SELECT COALESCE(f.channel, 'direct') AS channel,
        COUNT(*) AS n_conversions,
        CAST(SUM(CAST(p.value AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM p LEFT JOIN first f USING (purchase_id)
      GROUP BY 1"""))

  /** Fixed-quota stratified sampling: exactly min(k, |stratum|) documents
    * per language, chosen by md5(doc_id) order — deterministic across
    * engines and partitionings (no rand()), and unlike q77's
    * fraction-based sampler the quota holds regardless of stratum skew.
    * One ranking window per stratum; k=30.
    */
  val q139FixedQuotaSample: QueryDef = QueryDef(
    "q139_fixed_quota_sample",
    (s, dir) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
      Tables(s, dir).documents
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 30)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_sampled"),
             sum(col("n_chars")).as("sample_chars"),
             max(col("rn")).cast("long").as("max_rank"))
    },
    Some("""WITH r AS (SELECT lang, n_chars,
          ROW_NUMBER() OVER (PARTITION BY lang
            ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS rn
        FROM documents)
      SELECT lang, COUNT(*) AS n_sampled,
        CAST(SUM(n_chars) AS BIGINT) AS sample_chars,
        CAST(MAX(rn) AS BIGINT) AS max_rank
      FROM r WHERE rn <= 30 GROUP BY 1"""))

  /** Revenue concentration per nation: exact Gini coefficient over
    * customer revenue totals via the sorted-cumulative formula
    * G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n. Revenue and the rank-weighted sum
    * stay exact DECIMAL (i·xᵢ sums are DECIMAL(38,4) — no double drift),
    * with ONE double division at the end mirrored in the oracle. Shapes:
    * two hash aggs and a per-nation ranking window over the customer
    * grain (bounded by |customers|, sub-sharded by nation).
    */
  val q140GiniConcentration: QueryDef = QueryDef(
    "q140_gini_concentration",
    (s, dir) => {
      val t = Tables(s, dir)
      val custRev = t.orders
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(M)).as("rev"))
        .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
              col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
              col("c_nationkey") === col("n_nationkey"))
      val w = Window.partitionBy(col("n_name"))
        .orderBy(col("rev").asc, col("o_custkey").asc)
      custRev
        .withColumn("i", row_number().over(w))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_customers"),
             sum(col("rev")).as("total_rev"),
             sum(col("rev") * col("i")).as("weighted"))
        .select(col("n_name"), col("n_customers"),
          col("total_rev").cast("double").as("total_rev"),
          (lit(2.0) * col("weighted").cast("double") /
            (col("n_customers") * col("total_rev").cast("double")) -
            (col("n_customers") + lit(1)).cast("double") / col("n_customers"))
            .as("gini"))
    },
    Some("""WITH cr AS (SELECT o_custkey,
            SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
          FROM orders GROUP BY 1),
        j AS (SELECT n.n_name, cr.o_custkey, cr.rev
          FROM cr JOIN customer c ON cr.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey),
        r AS (SELECT n_name, rev,
            ROW_NUMBER() OVER (PARTITION BY n_name
              ORDER BY rev ASC, o_custkey ASC) AS i
          FROM j)
      SELECT n_name, COUNT(*) AS n_customers,
        CAST(SUM(rev) AS DOUBLE) AS total_rev,
        2.0 * CAST(SUM(rev * i) AS DOUBLE)
            / (COUNT(*) * CAST(SUM(rev) AS DOUBLE))
          - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*) AS gini
      FROM r GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q138FirstTouchAttribution, q139FixedQuotaSample, q140GiniConcentration)
}
