package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Causal-design wave: propensity-stratified treatment effects
  * (subclassification — the observational-causal estimator between
  * q242's IPS and q259's diff-in-diff) and the two-proportion power
  * planner (the design-side inverse of q215's test).
  *
  * Scale shapes: q383 is one broadcast-dimension join + a per-stratum
  * conditional aggregation; q384 collapses the log to two scalars and
  * fans a 10-row effect-size grid.
  */
object DesignOps {

  private val M = DecimalType(18, 4)
  private val dec = DecimalType(28, 10)

  /** Subclassification ATE/ATT (Rosenbaum & Rubin 1984): treatment =
    * urgent priority, outcome = order value, strata = exact covariate
    * cells (market segment × order year — subclassification IS
    * propensity stratification when the propensity is constant within
    * cells). Per stratum with both arms: the arm means (exact DECIMAL
    * sums), the in-stratum effect, and the ATE/ATT as n_s/N- and
    * n1_s/N1-weighted averages — computed from per-stratum exact sums
    * with one division each, q344's round→DECIMAL for the weighted
    * folds. Strata missing an arm are excluded and counted (the
    * overlap-violation audit every subclassification must report). */
  val q383PsStratification: QueryDef = QueryDef(
    "q383_ps_stratification",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          year(col("o_orderdate")).as("o_year"),
          col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int").as("z"),
          col("o_totalprice").cast(M).as("y"))
      val strata = base.groupBy(col("segment"), col("o_year"))
        .agg(count(lit(1)).as("n_s"),
          sum(when(col("z") === 1, 1L).otherwise(0L)).as("n1"),
          sum(when(col("z") === 0, 1L).otherwise(0L)).as("n0"),
          sum(when(col("z") === 1, col("y"))).as("sy1"),
          sum(when(col("z") === 0, col("y"))).as("sy0"))
        .localCheckpoint() // feeds the report and the row output
      val ok = strata.filter(col("n1") > 0 && col("n0") > 0)
        .withColumn("eff", round(
          col("sy1").cast("double") / col("n1") -
            col("sy0").cast("double") / col("n0"), 6))
      val report = ok
        .agg(sum(col("n_s")).as("n_total"), sum(col("n1")).as("n1_total"),
          sum(round(col("eff") * col("n_s"), 6).cast(dec)).as("wate"),
          sum(round(col("eff") * col("n1"), 6).cast(dec)).as("watt"))
        .crossJoin(strata.filter(col("n1") === 0 || col("n0") === 0)
          .agg(count(lit(1)).as("n_strata_no_overlap")))
        .select(
          round(col("wate").cast("double") / col("n_total"), 6).as("ate"),
          round(col("watt").cast("double") / col("n1_total"), 6).as("att"),
          col("n_strata_no_overlap"))
      ok.crossJoin(report)
        .select(col("segment"), col("o_year"), col("n_s"), col("n1"), col("n0"),
          round(col("sy1").cast("double") / col("n1"), 4).as("y1_mean"),
          round(col("sy0").cast("double") / col("n0"), 4).as("y0_mean"),
          col("eff").as("stratum_effect"),
          col("ate"), col("att"), col("n_strata_no_overlap"))
        .orderBy(col("segment"), col("o_year"))
    },
    Some("""WITH base AS (SELECT c.c_mktsegment AS segment, year(o.o_orderdate) AS o_year,
          CAST(o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS INT) AS z,
          CAST(o.o_totalprice AS DECIMAL(18,4)) AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      strata AS (SELECT segment, o_year, CAST(COUNT(*) AS BIGINT) AS n_s,
          CAST(SUM(CASE WHEN z = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN z = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
          SUM(CASE WHEN z = 1 THEN y END) AS sy1,
          SUM(CASE WHEN z = 0 THEN y END) AS sy0
        FROM base GROUP BY 1, 2),
      ok AS (SELECT *, round(CAST(sy1 AS DOUBLE) / n1 - CAST(sy0 AS DOUBLE) / n0, 6) AS eff
        FROM strata WHERE n1 > 0 AND n0 > 0),
      rep AS (SELECT
          round(CAST(SUM(CAST(round(eff * n_s, 6) AS DECIMAL(28,10))) AS DOUBLE)
            / SUM(n_s), 6) AS ate,
          round(CAST(SUM(CAST(round(eff * n1, 6) AS DECIMAL(28,10))) AS DOUBLE)
            / SUM(n1), 6) AS att,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM strata WHERE n1 = 0 OR n0 = 0)
            AS n_strata_no_overlap
        FROM ok)
      SELECT ok.segment, ok.o_year, ok.n_s, ok.n1, ok.n0,
        round(CAST(ok.sy1 AS DOUBLE) / ok.n1, 4) AS y1_mean,
        round(CAST(ok.sy0 AS DOUBLE) / ok.n0, 4) AS y0_mean,
        ok.eff AS stratum_effect,
        rep.ate, rep.att, rep.n_strata_no_overlap
      FROM ok CROSS JOIN rep
      ORDER BY ok.segment, ok.o_year"""))

  /** Two-proportion experiment power planner: baseline conversion p₀ =
    * purchase share of events, and for relative lifts of 2%..20% the
    * per-arm sample size n = (z_{α/2}+z_β)²·(p₀q₀+p₁q₁)/(p₁−p₀)² at
    * α = 0.05, power = 0.8 (z constants 1.959964, 0.841621), plus the
    * runway in days at current daily event traffic — the planning table
    * every experimentation platform (q208/q215/q351) shows before a
    * launch. The log collapses to two scalars; the grid is a 10-row
    * fan-out; ceilings are exact integer arithmetic on rounded doubles. */
  val q384PowerPlanner: QueryDef = QueryDef(
    "q384_power_planner",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      val baseRate = ev.agg(
        (sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("double") / count(lit(1))).as("p0"),
        (count(lit(1)).cast("double") /
          countDistinct(to_date(col("ts")))).as("daily_events"))
      val lifts = s.range(1, 11).toDF("k")
        .select((col("k") * 2).cast("int").as("lift_pct"))
      broadcast(lifts).crossJoin(baseRate)
        .withColumn("p1", col("p0") * (lit(1.0) + col("lift_pct") / 100.0))
        .withColumn("n_per_arm", ceil(round(
          lit(7.848886) * // (1.959964 + 0.841621)^2
            (col("p0") * (lit(1.0) - col("p0")) + col("p1") * (lit(1.0) - col("p1"))) /
            ((col("p1") - col("p0")) * (col("p1") - col("p0"))), 6)).cast("long"))
        .withColumn("days_needed", ceil(round(
          lit(2.0) * col("n_per_arm") / col("daily_events"), 6)).cast("long"))
        .select(col("lift_pct"), round(col("p0"), 6).as("p0"),
          round(col("p1"), 6).as("p1"), col("n_per_arm"), col("days_needed"))
        .orderBy(col("lift_pct"))
    },
    Some("""WITH br AS (SELECT
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*) AS p0,
          CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT CAST(ts AS DATE)) AS daily_events
        FROM events),
      lifts AS (SELECT CAST(k * 2 AS INT) AS lift_pct FROM range(1, 11) r(k)),
      g AS (SELECT lift_pct, p0, daily_events,
          p0 * (1.0 + lift_pct / 100.0) AS p1
        FROM lifts CROSS JOIN br),
      g2 AS (SELECT *,
          CAST(ceil(round(7.848886 * (p0 * (1.0 - p0) + p1 * (1.0 - p1))
            / ((p1 - p0) * (p1 - p0)), 6)) AS BIGINT) AS n_per_arm
        FROM g)
      SELECT lift_pct, round(p0, 6) AS p0, round(p1, 6) AS p1, n_per_arm,
        CAST(ceil(round(2.0 * n_per_arm / daily_events, 6)) AS BIGINT) AS days_needed
      FROM g2 ORDER BY lift_pct"""))

  val all: Seq[QueryDef] = Seq(q383PsStratification, q384PowerPlanner)
}
