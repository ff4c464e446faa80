package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Engle–Granger cointegration test (Engle & Granger 1987) between the
  * daily order-count and daily revenue series — "do these two series
  * share a long-run equilibrium, or does their spread wander?" The
  * two-step recipe every econometrics stack ships: (1) OLS of y on x,
  * (2) a Dickey–Fuller regression on the residual spread
  * Δu_t = ρ·u_{t−1} + e_t; a strongly negative t(ρ) rejects a unit
  * root in the spread, i.e. the series are cointegrated (reference:
  * overseer's monitoring/series family — arbitrary handler fns,
  * src/overseer/executor.clj:12-39; the statistic is the operator here).
  *
  * Scale shape: the series is CALENDAR-BOUNDED (~2,400 days at every
  * SF), so after ONE linear scan with map-side partial aggregation the
  * whole test runs on a ≤2,400-row frame; the single-partition window
  * that forms the lag is a constant-size object, not a data-sized sort
  * (q408/q507's calendar-melt precedent).
  *
  * Exactness: both series are BIGINTs (counts; exact cents → kilodollar
  * revenue, the q484 overflow discipline). The OLS sums are exact; a and
  * b are formed from those sums cast to double in ONE fixed expression
  * (identical in both engines), the residual is quantized to whole
  * kilodollars (floor(u + 0.5) — both engines floor the SAME double),
  * and every Dickey–Fuller sum is again an exact BIGINT. The reported
  * ρ and t(ρ) are single float expressions over exact integers.
  * BIGINT headroom at sf100: u ≈ ±1e7 k$, Σu² ≈ 2.4e17 < 2⁶³.
  */
object CointegOps {

  val q510Cointegration: QueryDef = QueryDef(
    "q510_cointegration",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("x"),
          expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
            "DIV 100000").as("y"))
      val sums = daily.agg(
        count(lit(1)).cast("double").as("n"),
        sum(col("x")).cast("double").as("sx"),
        sum(col("y")).cast("double").as("sy"),
        sum(col("x") * col("x")).cast("double").as("sxx"),
        sum(col("x") * col("y")).cast("double").as("sxy"),
        count(lit(1)).as("n_days"))
      val fit = sums.select(col("n_days"), col("n"), col("sx"), col("sy"),
        ((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx"))).as("b"))
        .select(col("n_days"), col("b"),
          ((col("sy") - col("b") * col("sx")) / col("n")).as("a"))
      val resid = daily.crossJoin(broadcast(fit))
        .select(col("day"), col("n_days"), col("b"),
          floor(col("y").cast("double") - col("a") -
            col("b") * col("x").cast("double") + lit(0.5))
            .cast("long").as("u"))
      val w = Window.orderBy(col("day"))
      val df = resid
        .select(col("n_days"), col("b"), col("u"),
          lag(col("u"), 1).over(w).as("up"))
        .where(col("up").isNotNull)
        .select(col("n_days"), col("b"), col("up"),
          (col("u") - col("up")).as("du"))
      df.groupBy(col("n_days"), col("b"))
        .agg(sum(col("up") * col("du")).as("sud"),
          sum(col("up") * col("up")).as("suu"),
          sum(col("du") * col("du")).as("sdd"),
          count(lit(1)).as("t"))
        .select(col("n_days"),
          round(col("b"), 9).as("slope"),
          round(col("sud").cast("double") / col("suu"), 9).as("rho"),
          round((col("sud").cast("double") / col("suu")) /
            sqrt(((col("sdd") - col("sud").cast("double") * col("sud") / col("suu")) /
              (col("t") - 1)) / col("suu")), 9).as("adf_t"))
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS x,
          CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // 100000 AS BIGINT) AS y
        FROM orders GROUP BY 1),
      sums AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(x) AS DOUBLE) AS sx,
          CAST(SUM(y) AS DOUBLE) AS sy,
          CAST(SUM(x * x) AS DOUBLE) AS sxx,
          CAST(SUM(x * y) AS DOUBLE) AS sxy,
          CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily),
      fit0 AS (
        SELECT n_days, n, sx, sy,
          (n * sxy - sx * sy) / (n * sxx - sx * sx) AS b
        FROM sums),
      fit AS (SELECT n_days, b, (sy - b * sx) / n AS a FROM fit0),
      resid AS (
        SELECT d.day, f.n_days, f.b,
          CAST(floor(CAST(d.y AS DOUBLE) - f.a
            - f.b * CAST(d.x AS DOUBLE) + 0.5) AS BIGINT) AS u
        FROM daily d CROSS JOIN fit f),
      lagged AS (
        SELECT n_days, b, u,
          lag(u, 1) OVER (ORDER BY day) AS up
        FROM resid QUALIFY up IS NOT NULL),
      adf AS (
        SELECT n_days, b,
          CAST(SUM(up * (u - up)) AS BIGINT) AS sud,
          CAST(SUM(up * up) AS BIGINT) AS suu,
          CAST(SUM((u - up) * (u - up)) AS BIGINT) AS sdd,
          CAST(COUNT(*) AS BIGINT) AS t
        FROM lagged GROUP BY 1, 2)
      SELECT n_days,
        round(b, 9) AS slope,
        round(CAST(sud AS DOUBLE) / suu, 9) AS rho,
        round((CAST(sud AS DOUBLE) / suu) /
          sqrt(((sdd - CAST(sud AS DOUBLE) * sud / suu) / (t - 1)) / suu),
          9) AS adf_t
      FROM adf"""))

  val all: Seq[QueryDef] = Seq(q510Cointegration)
}
