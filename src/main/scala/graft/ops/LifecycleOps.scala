package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-lifecycle and ledger-audit operators: Kaplan-Meier survival with
  * right-censoring, Benford first-digit fraud screening, and per-user
  * activity bitmaps — longitudinal analyses computed as keyed scans plus
  * model-sized curve aggregations.
  */
object LifecycleOps {

  /** Kaplan-Meier survival estimator over signup→purchase conversion,
    * with right-censoring: users who signed up but never purchased are
    * censored at the corpus horizon instead of being dropped (dropping
    * them — what q144's conversion-latency percentiles do — biases any
    * "time to convert" estimate toward the fast converters). Durations
    * are bucketed to hours; the heavy stages are per-user min-aggs, and
    * the curve itself (≤ one row per distinct duration) is model-sized,
    * so its suffix-sum/cumsum windows order a tiny frame — never the
    * raw stream. At-risk counts come from a suffix-window (no second
    * scan); the survival product is exp∘Σln with the d=n final-row case
    * guarded INSIDE the ln argument (DuckDB raises on ln(0)) and forced
    * to exact 0.0 by a cumulative dead flag.
    */
  val q161KaplanMeier: QueryDef = QueryDef(
    "q161_kaplan_meier",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(unix_micros(col("ts"))).as("s_us"))
      val pu = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
      val horizon = ev.agg(max(unix_micros(col("ts"))).as("h_us"))
      val durs = su.join(pu, Seq("user_id"), "left")
        .withColumn("p_ok", when(col("p_us") > col("s_us"), col("p_us")))
        .groupBy(col("user_id"), col("s_us")).agg(min(col("p_ok")).as("first_p"))
        .crossJoin(broadcast(horizon))
        .withColumn("observed", col("first_p").isNotNull.cast("long"))
        .withColumn("end_us", coalesce(col("first_p"), col("h_us")))
        .withColumn("t_hours", expr("(end_us - s_us) div 3600000000"))
      val grp = durs.groupBy(col("t_hours"))
        .agg(sum(col("observed")).as("d_events"),
             sum(lit(1L) - col("observed")).as("c_censored"))
      val ord = Window.orderBy(col("t_hours"))
      val suffix = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grp
        .withColumn("n_risk", sum(col("d_events") + col("c_censored")).over(suffix))
        .withColumn("term", log(
          when(col("d_events") < col("n_risk"),
            lit(1.0) - col("d_events").cast("double") / col("n_risk"))
            .otherwise(lit(1.0))))
        .withColumn("dead",
          max((col("d_events") === col("n_risk")).cast("long")).over(prefix))
        .withColumn("logsum", sum(col("term")).over(prefix))
        .select(col("t_hours"), col("n_risk"), col("d_events"), col("c_censored"),
          round(when(col("dead") === 1L, lit(0.0)).otherwise(exp(col("logsum"))), 6)
            .as("survival"))
    },
    Some("""WITH su AS (SELECT user_id, MIN(epoch_us(ts)) AS s_us
          FROM events WHERE event_type = 'signup' GROUP BY 1),
      pu AS (SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase'),
      h AS (SELECT MAX(epoch_us(ts)) AS h_us FROM events),
      durs AS (SELECT su.user_id, su.s_us,
          MIN(CASE WHEN pu.p_us > su.s_us THEN pu.p_us END) AS first_p
        FROM su LEFT JOIN pu USING (user_id) GROUP BY 1, 2),
      d2 AS (SELECT durs.*, h.h_us,
          CASE WHEN first_p IS NOT NULL THEN 1 ELSE 0 END AS observed,
          (COALESCE(first_p, h_us) - s_us) // 3600000000 AS t_hours
        FROM durs, h),
      grp AS (SELECT t_hours,
          CAST(SUM(observed) AS BIGINT) AS d_events,
          CAST(SUM(1 - observed) AS BIGINT) AS c_censored
        FROM d2 GROUP BY 1),
      nr AS (SELECT *,
          CAST(SUM(d_events + c_censored) OVER (ORDER BY t_hours
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        FROM grp),
      tm AS (SELECT *,
          ln(CASE WHEN d_events < n_risk
             THEN 1.0 - CAST(d_events AS DOUBLE) / n_risk
             ELSE 1.0 END) AS term,
          MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t_hours
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        FROM nr),
      lg AS (SELECT *,
          SUM(term) OVER (ORDER BY t_hours
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS logsum
        FROM tm)
      SELECT t_hours, n_risk, d_events, c_censored,
        round(CASE WHEN dead = 1 THEN 0.0 ELSE exp(logsum) END, 6) AS survival
      FROM lg"""))

  /** Benford first-significant-digit audit over the two money ledgers
    * (o_totalprice, l_extendedprice): observed digit shares vs the
    * Benford expectation log10(1+1/d), with per-digit χ² contributions —
    * the standard forensic screen for fabricated amounts. The digit is
    * extracted through exact integer math (floor to cents, first char of
    * the int64's decimal string) — never floor(log10(x)), whose
    * float rounding flips digits at powers of ten. One hash-agg per
    * ledger; the 9-digit profile is model-sized, so the share window is
    * free. χ² uses the UNROUNDED expectation; only outputs round.
    */
  val q162BenfordAudit: QueryDef = QueryDef(
    "q162_benford_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      val vals = t.orders
        .select(lit("o_totalprice").as("measure"), col("o_totalprice").as("x"))
        .unionAll(t.lineitem
          .select(lit("l_extendedprice").as("measure"), col("l_extendedprice").as("x")))
      val dig = vals
        .withColumn("digit",
          substring(floor(col("x") * 100).cast("long").cast("string"), 1, 1))
        .groupBy(col("measure"), col("digit"))
        .agg(count(lit(1)).as("n_obs"))
      val w = Window.partitionBy(col("measure"))
      dig
        .withColumn("total", sum(col("n_obs")).over(w))
        .withColumn("e", col("total").cast("double") *
          log10(lit(1.0) + lit(1.0) / col("digit").cast("double")))
        .select(col("measure"), col("digit"), col("n_obs"),
          round(col("n_obs").cast("double") / col("total"), 6).as("share"),
          round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double")), 6)
            .as("benford_share"),
          round((col("n_obs").cast("double") - col("e")) *
                (col("n_obs").cast("double") - col("e")) / col("e"), 6)
            .as("chi2_contrib"))
    },
    Some("""WITH vals AS (
        SELECT 'o_totalprice' AS measure, o_totalprice AS x FROM orders
        UNION ALL
        SELECT 'l_extendedprice', l_extendedprice FROM lineitem),
      dig AS (SELECT measure,
          substr(CAST(CAST(floor(x * 100) AS BIGINT) AS VARCHAR), 1, 1) AS digit,
          COUNT(*) AS n_obs
        FROM vals GROUP BY 1, 2),
      tot AS (SELECT *,
          SUM(n_obs) OVER (PARTITION BY measure) AS total,
          CAST(SUM(n_obs) OVER (PARTITION BY measure) AS DOUBLE) *
            log10(1.0 + 1.0 / CAST(digit AS DOUBLE)) AS e
        FROM dig)
      SELECT measure, digit, n_obs,
        round(CAST(n_obs AS DOUBLE) / total, 6) AS share,
        round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_share,
        round((CAST(n_obs AS DOUBLE) - e) * (CAST(n_obs AS DOUBLE) - e) / e, 6)
          AS chi2_contrib
      FROM tot"""))

  /** Per-user activity bitmap: one int64 whose bit k marks activity on
    * day-of-month k — the roaring-bitmap-style presence encoding that
    * answers day-level engagement questions (active-day counts, overlap
    * between users, streaks) with bitwise ops instead of day-grain rows.
    * bit_or is a partial-aggregating hash-agg (64 days of presence fold
    * into 8 bytes per user before any shuffle); bit_count reads the
    * answer without re-touching events. The fixture's event horizon is
    * one calendar month; a production variant keys bits off an epoch-day
    * offset with one int64 per 64-day window.
    */
  val q163ActivityBitmap: QueryDef = QueryDef(
    "q163_activity_bitmap",
    (s, dir) => EventOps.events(s, dir)
      .withColumn("d", (dayofmonth(col("ts")) - 1).cast("long"))
      .groupBy(col("user_id"))
      .agg(expr("bit_or(shiftleft(CAST(1 AS BIGINT), CAST(d AS INT)))").as("active_mask"),
           count(lit(1)).as("n_events"),
           min(col("d")).as("first_day"),
           max(col("d")).as("last_day"))
      .withColumn("n_active_days", expr("CAST(bit_count(active_mask) AS BIGINT)")),
    Some("""SELECT user_id,
        bit_or(1::BIGINT << CAST(EXTRACT(day FROM ts) - 1 AS INT)) AS active_mask,
        COUNT(*) AS n_events,
        CAST(MIN(EXTRACT(day FROM ts) - 1) AS BIGINT) AS first_day,
        CAST(MAX(EXTRACT(day FROM ts) - 1) AS BIGINT) AS last_day,
        CAST(bit_count(bit_or(1::BIGINT << CAST(EXTRACT(day FROM ts) - 1 AS INT)))
          AS BIGINT) AS n_active_days
      FROM events GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q161KaplanMeier, q162BenfordAudit, q163ActivityBitmap)
}
