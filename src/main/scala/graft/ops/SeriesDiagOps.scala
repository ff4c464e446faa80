package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Series-diagnostics wave: Ljung–Box portmanteau, Wald–Wolfowitz runs
  * test, Durbin–Watson — the "is this series actually noise?" family
  * that sits downstream of q175's per-type ACF, q426's periodogram and
  * q125's OLS trend. Ljung–Box pools the first 10 autocorrelations of
  * the zero-filled daily order-count series into one χ² verdict; the
  * runs test asks the distribution-free version of the same question
  * (too few/many sign runs around the median); Durbin–Watson scores
  * lag-1 residual correlation AFTER the linear trend is removed, which
  * raw ACF cannot (a trend masquerades as autocorrelation).
  *
  * Determinism: counts are integers and revenues exact DECIMAL sums, so
  * every centered moment is assembled from exact integer/decimal
  * aggregates (Σc, Σc², Σc·c₊ₖ) and only combined in double inside one
  * fixed-order expression written identically in both dialects;
  * residuals are rounded at 6 dp and squared/summed as DECIMAL.
  *
  * Scale shape: one corpus scan to the daily census, a calendar-bounded
  * spine (~2 400 rows at any SF), k equi-joins of the spine with itself
  * for the lag pairings, and 1-row reports — nothing grows with the
  * corpus except the first census.
  */
object SeriesDiagOps {

  private val Chi95 = Seq(3.841458820694124, 5.991464547107979,
    7.814727903251179, 9.487729036781154, 11.070497693516351,
    12.591587243743977, 14.067140449340169, 15.50731305586545,
    16.918977604620448, 18.307038053275146)

  /** Ljung–Box test on the zero-filled daily order-count series, lags
    * 1–10: per-lag ACF, the cumulative Q statistic, per-df 5% verdict,
    * and the closed-form df = 10 p-value on the final row. */
  val q438LjungBox: QueryDef = QueryDef(
    "q438_ljung_box",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(count(lit(1)).as("c"))
      val bounds = daily.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
      // zero-filled spine: a day with no orders is a real 0 in the series
      val series = bounds
        .select(explode(sequence(col("tmin"), col("tmax"))).as("t"))
        .join(daily, Seq("t"), "left")
        .na.fill(0L, Seq("c"))
        .localCheckpoint() // moment pass + both sides of 10 lag joins
      val d38 = DecimalType(38, 0)
      val mom = series.agg(count(lit(1)).as("n"),
        sum(col("c").cast(d38)).as("s"),
        sum((col("c") * col("c")).cast(d38)).as("s2"))
      val shifted = series.select(col("t").as("t2"), col("c").as("c2"))
      val pairs = series
        .withColumn("lag", explode(sequence(lit(1L), lit(10L))))
        .join(shifted, col("t2") === col("t") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_pairs"),
          sum((col("c") * col("c2")).cast(d38)).as("sp"),
          sum(col("c").cast(d38)).as("sa"),
          sum(col("c2").cast(d38)).as("sb"))
      val acf = pairs.crossJoin(broadcast(mom))
        .withColumn("mu", col("s").cast("double") / col("n"))
        .withColumn("acf", round(
          (col("sp").cast("double")
            - col("mu") * (col("sa") + col("sb")).cast("double")
            + col("n_pairs") * col("mu") * col("mu"))
            / (col("s2").cast("double") - col("n") * col("mu") * col("mu")),
          9))
      val wCum = Window.orderBy(col("lag"))
      val chiCase = Chi95.zipWithIndex.foldLeft(lit(null).cast("double")) {
        case (acc, (q, i)) => when(col("lag") === (i + 1), q).otherwise(acc)
      }
      acf
        .withColumn("cum", sum(
          round(col("acf") * col("acf") / (col("n") - col("lag")), 15)
            .cast(DecimalType(38, 15))).over(wCum))
        .withColumn("q_lb", round(
          col("n") * (col("n") + 2) * col("cum").cast("double"), 6))
        .withColumn("h", col("q_lb") / 2)
        .select(col("lag"), col("n_pairs"), col("acf"), col("q_lb"),
          col("lag").as("df"),
          (col("q_lb") > chiCase).as("reject_5pct"),
          when(col("lag") === 10, round(exp(-col("h")) *
            (lit(1.0) + col("h") + col("h") * col("h") / 2
              + col("h") * col("h") * col("h") / 6
              + col("h") * col("h") * col("h") * col("h") / 24), 6))
            .as("p_value"))
        .orderBy(col("lag"))
    },
    Some {
      val chiCase = Chi95.zipWithIndex
        .map { case (q, i) => s"WHEN lag = ${i + 1} THEN $q" }
        .mkString("CASE ", " ", " END")
      s"""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
      bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM daily),
      spine AS (SELECT UNNEST(range(tmin, tmax + 1)) AS t FROM bounds),
      series AS (SELECT s.t, COALESCE(d.c, 0) AS c
        FROM spine s LEFT JOIN daily d ON d.t = s.t),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(c AS DECIMAL(38,0))) AS s,
          SUM(CAST(c * c AS DECIMAL(38,0))) AS s2
        FROM series),
      fan AS (SELECT l.lag, a.t, a.c
        FROM (SELECT UNNEST(range(1, 11)) AS lag) l CROSS JOIN series a),
      pairs AS (SELECT f.lag, CAST(COUNT(*) AS BIGINT) AS n_pairs,
          SUM(CAST(f.c * b.c AS DECIMAL(38,0))) AS sp,
          SUM(CAST(f.c AS DECIMAL(38,0))) AS sa,
          SUM(CAST(b.c AS DECIMAL(38,0))) AS sb
        FROM fan f JOIN series b ON b.t = f.t + f.lag GROUP BY 1),
      acf AS (SELECT p.*, m.n,
          round((CAST(p.sp AS DOUBLE)
            - (CAST(m.s AS DOUBLE) / m.n) * CAST(p.sa + p.sb AS DOUBLE)
            + p.n_pairs * (CAST(m.s AS DOUBLE) / m.n)
              * (CAST(m.s AS DOUBLE) / m.n))
            / (CAST(m.s2 AS DOUBLE)
              - m.n * (CAST(m.s AS DOUBLE) / m.n)
                * (CAST(m.s AS DOUBLE) / m.n)), 9) AS acf
        FROM pairs p, mom m),
      cum AS (SELECT *, round(n * (n + 2) * CAST(SUM(
            CAST(round(acf * acf / (n - lag), 15) AS DECIMAL(38,15)))
            OVER (ORDER BY lag) AS DOUBLE), 6) AS q_lb
        FROM acf)
      SELECT lag, n_pairs, acf, q_lb, lag AS df,
        (q_lb > $chiCase) AS reject_5pct,
        CASE WHEN lag = 10 THEN round(exp(-q_lb / 2) * (1.0 + q_lb / 2
          + (q_lb / 2) * (q_lb / 2) / 2
          + (q_lb / 2) * (q_lb / 2) * (q_lb / 2) / 6
          + (q_lb / 2) * (q_lb / 2) * (q_lb / 2) * (q_lb / 2) / 24), 6)
        END AS p_value
      FROM cum ORDER BY lag"""
    })

  /** Wald–Wolfowitz runs test on daily revenue around its (lower)
    * median: run count vs its exact-moment expectation, continuity-
    * corrected z, 5% verdict. Median-valued days are excluded, the
    * test's convention. */
  val q439RunsTest: QueryDef = QueryDef(
    "q439_runs_test",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("v"))
        .localCheckpoint() // median pass + sign pass
      val med = daily
        .withColumn("r", row_number().over(Window.orderBy(col("v"), col("t"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .where(col("r") === expr("(n + 1) div 2"))
        .select(col("v").as("med"), col("n").as("n_days"))
      val signs = daily.crossJoin(broadcast(med))
        .where(col("v") =!= col("med"))
        .withColumn("sgn", col("v") > col("med"))
        .withColumn("prev", lag(col("sgn"), 1).over(Window.orderBy(col("t"))))
        .withColumn("chg",
          when(col("prev").isNull || col("prev") =!= col("sgn"), 1L)
            .otherwise(0L))
      signs.groupBy(col("n_days"))
        .agg(count(lit(1)).as("n_used"),
          sum(when(col("sgn"), 1L).otherwise(0L)).as("n_above"),
          sum(when(col("sgn"), 0L).otherwise(1L)).as("n_below"),
          sum(col("chg")).as("n_runs"))
        .withColumn("p2", lit(2.0) * col("n_above") * col("n_below"))
        .withColumn("e_runs", col("p2") / col("n_used") + 1)
        .withColumn("var_runs",
          col("p2") * (col("p2") - col("n_used"))
            / (col("n_used").cast("double") * col("n_used")
              * (col("n_used") - 1)))
        .withColumn("z", round(
          (col("n_runs") - col("e_runs")
            - when(col("n_runs") > col("e_runs"), 0.5)
              .when(col("n_runs") < col("e_runs"), -0.5).otherwise(0.0))
            / sqrt(col("var_runs")), 6))
        .select(col("n_days"), col("n_used"), col("n_above"), col("n_below"),
          col("n_runs"), round(col("e_runs"), 6).as("e_runs"),
          round(col("var_runs"), 6).as("var_runs"), col("z"),
          (abs(col("z")) > 1.959963984540054).as("reject_5pct"))
    },
    Some("""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders GROUP BY 1),
      med AS (SELECT v AS med, n AS n_days FROM (SELECT v,
          ROW_NUMBER() OVER (ORDER BY v, t) AS r,
          CAST(COUNT(*) OVER () AS BIGINT) AS n
        FROM daily) WHERE r = (n + 1) // 2),
      signs AS (SELECT d.t, (d.v > m.med) AS sgn, m.n_days
        FROM daily d, med m WHERE d.v <> m.med),
      runs AS (SELECT *, CASE WHEN LAG(sgn) OVER (ORDER BY t) IS NULL
            OR LAG(sgn) OVER (ORDER BY t) <> sgn THEN 1 ELSE 0 END AS chg
        FROM signs),
      agg AS (SELECT ANY_VALUE(n_days) AS n_days,
          CAST(COUNT(*) AS BIGINT) AS n_used,
          CAST(SUM(CASE WHEN sgn THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
          CAST(SUM(CASE WHEN sgn THEN 0 ELSE 1 END) AS BIGINT) AS n_below,
          CAST(SUM(chg) AS BIGINT) AS n_runs
        FROM runs),
      alg AS (SELECT *, 2.0 * n_above * n_below AS p2 FROM agg),
      alg2 AS (SELECT *, p2 / n_used + 1 AS e_runs,
          p2 * (p2 - n_used)
            / (CAST(n_used AS DOUBLE) * n_used * (n_used - 1)) AS var_runs
        FROM alg)
      SELECT n_days, n_used, n_above, n_below, n_runs,
        round(e_runs, 6) AS e_runs, round(var_runs, 6) AS var_runs,
        round((n_runs - e_runs
          - CASE WHEN n_runs > e_runs THEN 0.5
              WHEN n_runs < e_runs THEN -0.5 ELSE 0.0 END)
          / sqrt(var_runs), 6) AS z,
        (abs(round((n_runs - e_runs
          - CASE WHEN n_runs > e_runs THEN 0.5
              WHEN n_runs < e_runs THEN -0.5 ELSE 0.0 END)
          / sqrt(var_runs), 6)) > 1.959963984540054) AS reject_5pct
      FROM alg2"""))

  /** Durbin–Watson on the residuals of the daily-revenue OLS trend:
    * exact-decimal normal equations (the q125 idiom), 6-dp residuals
    * squared/summed as DECIMAL, DW and the implied lag-1 ρ̂. */
  val q440DurbinWatson: QueryDef = QueryDef(
    "q440_durbin_watson",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("v"))
        .localCheckpoint() // moment pass + residual pass
      val d38 = DecimalType(38, 0)
      val dm = DecimalType(38, 2)
      val fit = daily.agg(count(lit(1)).as("n"),
        sum(col("t").cast(d38)).as("st"),
        sum((col("t") * col("t")).cast(d38)).as("stt"),
        sum(col("v").cast(dm)).as("sy"),
        sum((col("v") * col("t")).cast(dm)).as("sty"))
        .withColumn("slope", round(
          (col("n") * col("sty").cast("double")
            - col("st").cast("double") * col("sy").cast("double"))
            / (col("n") * col("stt").cast("double")
              - col("st").cast("double") * col("st").cast("double")), 9))
        .withColumn("icept", round(
          (col("sy").cast("double")
            - col("slope") * col("st").cast("double")) / col("n"), 9))
      val de = DecimalType(18, 6)
      val resid = daily.crossJoin(broadcast(fit))
        .withColumn("e", round(col("v").cast("double")
          - col("icept") - col("slope") * col("t"), 6).cast(de))
        .withColumn("ep", lag(col("e"), 1).over(Window.orderBy(col("t"))))
        // keep the difference at (18,6): the (19,6)×(19,6) product would
        // exceed precision 38 and the engines' scale-adjustment rules
        // differ in the 12th decimal
        .withColumn("de", (col("e") - col("ep")).cast(de))
      resid.groupBy(col("n"), col("slope"), col("icept"))
        .agg(
          sum(col("de") * col("de")).as("num"),
          sum(col("e") * col("e")).as("den"))
        .withColumn("dw", round(
          col("num").cast("double") / col("den").cast("double"), 6))
        .select(col("n").as("n_days"),
          round(col("slope"), 6).as("slope"),
          round(col("icept"), 2).as("intercept"),
          col("dw"), round(lit(1.0) - col("dw") / 2, 6).as("rho_hat"),
          (col("dw") < 1.5).as("positive_autocorr"))
    },
    Some("""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders GROUP BY 1),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(t AS DECIMAL(38,0))) AS st,
          SUM(CAST(t * t AS DECIMAL(38,0))) AS stt,
          SUM(CAST(v AS DECIMAL(38,2))) AS sy,
          SUM(CAST(v * t AS DECIMAL(38,2))) AS sty
        FROM daily),
      fit AS (SELECT n,
          round((n * CAST(sty AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n * CAST(stt AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 9) AS slope,
          st, sy FROM mom),
      fit2 AS (SELECT n, slope,
          round((CAST(sy AS DOUBLE) - slope * CAST(st AS DOUBLE)) / n, 9)
            AS icept FROM fit),
      resid AS (SELECT d.t, f.n, f.slope, f.icept,
          CAST(round(CAST(d.v AS DOUBLE) - f.icept - f.slope * d.t, 6)
            AS DECIMAL(18,6)) AS e
        FROM daily d, fit2 f),
      lagd AS (SELECT *, CAST(e - LAG(e) OVER (ORDER BY t)
            AS DECIMAL(28,6)) AS de FROM resid),
      agg AS (SELECT ANY_VALUE(n) AS n, ANY_VALUE(slope) AS slope,
          ANY_VALUE(icept) AS icept,
          SUM(de * de) AS num,
          SUM(CAST(e AS DECIMAL(28,6)) * CAST(e AS DECIMAL(28,6))) AS den
        FROM lagd)
      SELECT n AS n_days, round(slope, 6) AS slope,
        round(icept, 2) AS intercept,
        round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS dw,
        round(1.0 - round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) / 2, 6)
          AS rho_hat,
        (round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) < 1.5)
          AS positive_autocorr
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(q438LjungBox, q439RunsTest, q440DurbinWatson)
}
