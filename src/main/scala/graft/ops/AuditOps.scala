package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pipeline-audit operators: rank-based signal blending, inter-gate
  * agreement, join-key skew measurement, conversion-latency stats, and
  * winsorized means — the checks a 100 TB pipeline runs over itself.
  */
object AuditOps {

  private val M = DecimalType(18, 4)

  /** Rank-normalized quality blend: percent_rank each raw signal inside
    * its language stratum (rank normalization is scale-free — it cannot
    * be dominated by one signal's units, unlike z-scores under heavy
    * tails) and average the ranks. percent_rank depends only on the
    * ORDER BY values (peers share a rank), so ties are deterministic
    * across engines without a tiebreaker column; the per-lang partition
    * keeps the sort sub-sharded (never a global single-partition window).
    */
  val q141RankBlend: QueryDef = QueryDef(
    "q141_rank_blend",
    (s, dir) => {
      val d = Tables(s, dir).documents
        .withColumn("n_tokens", size(TextOps.tokens(col("text"))).cast("long"))
      val w1 = Window.partitionBy(col("lang")).orderBy(col("n_chars").asc)
      val w2 = Window.partitionBy(col("lang")).orderBy(col("n_tokens").asc)
      d.select(col("doc_id"), col("lang"),
          percent_rank().over(w1).as("pr_chars"),
          percent_rank().over(w2).as("pr_tokens"))
        .withColumn("blend", (col("pr_chars") + col("pr_tokens")) / 2.0)
        .select(col("doc_id"), col("lang"), col("blend"))
    },
    Some("""WITH d AS (SELECT doc_id, lang, n_chars,
          len(regexp_extract_all(lower(text), '\w+')) AS n_tokens
        FROM documents)
      SELECT doc_id, lang,
        (PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_chars ASC)
         + PERCENT_RANK() OVER (PARTITION BY lang ORDER BY n_tokens ASC))
          / 2.0 AS blend
      FROM d"""))

  /** Cohen's kappa between two quality gates (length gate vs vocabulary
    * gate), per language: the agreement-beyond-chance statistic that
    * tells a curation team whether two cheap filters are redundant. The
    * confusion matrix is four conditional int64 sums in ONE scan; kappa
    * is double math on exact counts, mirrored verbatim.
    */
  val q142CohensKappa: QueryDef = QueryDef(
    "q142_cohens_kappa",
    (s, dir) => Tables(s, dir).documents
      .withColumn("a", (col("n_chars") >= 900).cast("long"))
      .withColumn("b",
        (size(array_distinct(TextOps.tokens(col("text")))) >= 25).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"),
           sum(col("a") * col("b")).as("n11"),
           sum(col("a") * (lit(1) - col("b"))).as("n10"),
           sum((lit(1) - col("a")) * col("b")).as("n01"),
           sum((lit(1) - col("a")) * (lit(1) - col("b"))).as("n00"))
      .select(col("lang"), col("n"),
        round(
          ((col("n11") + col("n00")).cast("double") / col("n") -
            ((col("n11") + col("n10")).cast("double") * (col("n11") + col("n01")) +
             (col("n01") + col("n00")).cast("double") * (col("n10") + col("n00")))
              / (col("n").cast("double") * col("n"))) /
          (lit(1.0) -
            ((col("n11") + col("n10")).cast("double") * (col("n11") + col("n01")) +
             (col("n01") + col("n00")).cast("double") * (col("n10") + col("n00")))
              / (col("n").cast("double") * col("n"))), 6).as("kappa")),
    Some("""WITH g AS (SELECT lang,
          CASE WHEN n_chars >= 900 THEN 1 ELSE 0 END AS a,
          CASE WHEN len(list_distinct(regexp_extract_all(lower(text), '\w+'))) >= 25
               THEN 1 ELSE 0 END AS b
        FROM documents),
      m AS (SELECT lang, COUNT(*) AS n,
          CAST(SUM(a*b) AS BIGINT) AS n11,
          CAST(SUM(a*(1-b)) AS BIGINT) AS n10,
          CAST(SUM((1-a)*b) AS BIGINT) AS n01,
          CAST(SUM((1-a)*(1-b)) AS BIGINT) AS n00
        FROM g GROUP BY 1)
      SELECT lang, n,
        round(
          (CAST(n11 + n00 AS DOUBLE) / n -
            (CAST(n11 + n10 AS DOUBLE) * (n11 + n01) +
             CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
              / (CAST(n AS DOUBLE) * n)) /
          (1.0 -
            (CAST(n11 + n10 AS DOUBLE) * (n11 + n01) +
             CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
              / (CAST(n AS DOUBLE) * n)), 6) AS kappa
      FROM m"""))

  /** Join-key skew audit across the three hot keys of the star schema:
    * per-key cardinality profile (max, mean, skew factor) — the number
    * that decides whether a join needs salting (q105) BEFORE it runs.
    * One hash agg per audited key plus a 5-row union; at 100 TB this is
    * the cheap pre-flight that prevents the expensive straggler.
    */
  val q143SkewAudit: QueryDef = QueryDef(
    "q143_skew_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      def audit(df: org.apache.spark.sql.DataFrame, key: String, tag: String) = {
        df.groupBy(col(key)).agg(count(lit(1)).as("c"))
          .agg(count(lit(1)).as("n_keys"),
               sum(col("c")).as("n_rows"),
               max(col("c")).as("max_key_rows"))
          .select(lit(tag).as("audited_key"), col("n_rows"), col("n_keys"),
            col("max_key_rows"),
            round(col("max_key_rows").cast("double") /
              (col("n_rows").cast("double") / col("n_keys")), 6).as("skew"))
      }
      audit(EventOps.events(s, dir), "user_id", "events.user_id")
        .unionAll(audit(t.lineitem, "l_orderkey", "lineitem.l_orderkey"))
        .unionAll(audit(t.orders, "o_custkey", "orders.o_custkey"))
    },
    Some("""WITH a1 AS (SELECT user_id AS k, COUNT(*) AS c FROM events GROUP BY 1),
        a2 AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        a3 AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1)
      SELECT 'events.user_id' AS audited_key,
        CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_keys,
        CAST(MAX(c) AS BIGINT) AS max_key_rows,
        round(CAST(MAX(c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6) AS skew
      FROM a1
      UNION ALL
      SELECT 'lineitem.l_orderkey', CAST(SUM(c) AS BIGINT), COUNT(*),
        CAST(MAX(c) AS BIGINT),
        round(CAST(MAX(c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6)
      FROM a2
      UNION ALL
      SELECT 'orders.o_custkey', CAST(SUM(c) AS BIGINT), COUNT(*),
        CAST(MAX(c) AS BIGINT),
        round(CAST(MAX(c) AS DOUBLE) / (CAST(SUM(c) AS DOUBLE) / COUNT(*)), 6)
      FROM a3"""))

  /** Conversion latency: per user, first signup → first later purchase;
    * the funnel's time-to-convert distribution (exact percentiles over
    * int64 microsecond durations, surfaced in hours). Two tiny per-user
    * min-aggs and one global percentile — every stage keyed, no windows
    * over the raw stream.
    */
  val q144TimeToConvert: QueryDef = QueryDef(
    "q144_time_to_convert",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("s_us"))
      val purchase = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      signup.join(purchase, Seq("user_id"))
        .filter(col("p_us") > col("s_us"))
        .groupBy(col("user_id"))
        .agg(min(col("p_us") - col("s_us")).as("latency_us"))
        .agg(count(lit(1)).as("n_converted"),
          round(expr("percentile(latency_us, 0.5)") / 3600000000.0, 6)
            .as("median_hours"),
          round(expr("percentile(latency_us, 0.9)") / 3600000000.0, 6)
            .as("p90_hours"))
    },
    Some("""WITH s AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
          FROM events WHERE event_type = 'signup' GROUP BY 1),
        p AS (SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
        l AS (SELECT s.user_id, MIN(p.p_us - s.s_us) AS latency_us
          FROM s JOIN p USING (user_id) WHERE p.p_us > s.s_us
          GROUP BY 1)
      SELECT COUNT(*) AS n_converted,
        round(quantile_cont(latency_us, 0.5) / 3600000000.0, 6) AS median_hours,
        round(quantile_cont(latency_us, 0.9) / 3600000000.0, 6) AS p90_hours
      FROM l"""))

  /** Winsorized mean per event type: clip values at the exact p05/p95
    * before averaging — the robust aggregate for metrics with heavy
    * tails. Percentile bounds broadcast back onto one linear pass;
    * the clipped sum goes through DECIMAL for order-independence.
    */
  val q145WinsorizedMean: QueryDef = QueryDef(
    "q145_winsorized_mean",
    (s, dir) => {
      val ev = EventOps.events(s, dir).select(col("event_type"), col("value"))
      val bounds = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.05)").as("lo"),
             expr("percentile(value, 0.95)").as("hi"))
      ev.join(broadcast(bounds), Seq("event_type"))
        .withColumn("clipped",
          when(col("value") < col("lo"), col("lo"))
            .when(col("value") > col("hi"), col("hi"))
            .otherwise(col("value")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("clipped").cast(M)).cast("double") / count(lit(1)), 6)
            .as("winsorized_mean"),
          round(sum(col("value").cast(M)).cast("double") / count(lit(1)), 6)
            .as("raw_mean"))
    },
    Some("""WITH b AS (SELECT event_type,
            quantile_cont(value, 0.05) AS lo,
            quantile_cont(value, 0.95) AS hi
          FROM events GROUP BY 1)
      SELECT e.event_type, COUNT(*) AS n,
        round(CAST(SUM(CAST(
          CASE WHEN e.value < b.lo THEN b.lo
               WHEN e.value > b.hi THEN b.hi
               ELSE e.value END AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
          AS winsorized_mean,
        round(CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6)
          AS raw_mean
      FROM events e JOIN b USING (event_type)
      GROUP BY 1"""))

  /** Join-cardinality pre-flight: the EXACT output size of a join,
    * computed from per-key counts without running it —
    * |A ⋈ B| = Σ_k c_A(k)·c_B(k). Two hash-aggs plus a join of the
    * (key, count) profiles, each profile orders of magnitude smaller
    * than its table. Paired with q143's skew audit, this is the planner
    * arithmetic a pipeline runs BEFORE committing to a join order at
    * 100 TB. Products stay int64 (per-key fan-outs are bounded; the sum
    * equals the join's row count).
    */
  val q156JoinCardinality: QueryDef = QueryDef(
    "q156_join_cardinality",
    (s, dir) => {
      val t = Tables(s, dir)
      def profile(df: org.apache.spark.sql.DataFrame, key: String) =
        df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))
      def preflight(a: org.apache.spark.sql.DataFrame, ka: String,
                    b: org.apache.spark.sql.DataFrame, kb: String,
                    tag: String) =
        profile(a, ka).join(profile(b, kb).withColumnRenamed("c", "c2"), Seq("k"))
          .agg(lit(tag).as("join_name"),
               count(lit(1)).as("n_matching_keys"),
               sum(col("c") * col("c2")).as("exact_join_rows"))
      preflight(t.orders, "o_orderkey", t.lineitem, "l_orderkey",
          "orders=lineitem@orderkey")
        .unionAll(preflight(t.customer, "c_custkey", t.orders, "o_custkey",
          "customer=orders@custkey"))
        .unionAll(preflight(t.supplier, "s_nationkey", t.customer, "c_nationkey",
          "supplier=customer@nationkey"))
    },
    Some("""WITH p1 AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        p2 AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
        p3 AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
        p4 AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
        p5 AS (SELECT s_nationkey AS k, COUNT(*) AS c FROM supplier GROUP BY 1),
        p6 AS (SELECT c_nationkey AS k, COUNT(*) AS c FROM customer GROUP BY 1)
      SELECT 'orders=lineitem@orderkey' AS join_name,
        COUNT(*) AS n_matching_keys,
        CAST(SUM(p1.c * p2.c) AS BIGINT) AS exact_join_rows
      FROM p1 JOIN p2 USING (k)
      UNION ALL
      SELECT 'customer=orders@custkey', COUNT(*),
        CAST(SUM(p3.c * p4.c) AS BIGINT)
      FROM p3 JOIN p4 USING (k)
      UNION ALL
      SELECT 'supplier=customer@nationkey', COUNT(*),
        CAST(SUM(p5.c * p6.c) AS BIGINT)
      FROM p5 JOIN p6 USING (k)"""))

  val all: Seq[QueryDef] = Seq(q141RankBlend, q142CohensKappa, q143SkewAudit,
    q144TimeToConvert, q145WinsorizedMean, q156JoinCardinality)
}
