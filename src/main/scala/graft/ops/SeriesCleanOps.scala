package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Series-hygiene operators over the daily order-count control chart:
  *
  *  - q534 Hampel identifier (Hampel 1974; the rolling median/MAD
  *    outlier filter every telemetry pipeline runs before modeling):
  *    a day is flagged when |x − med₇| exceeds 3·1.4826·MAD₇ of its
  *    centered 7-day window. INTEGER-EXACT: medians of 7 BIGINTs are
  *    BIGINTs, and the 3·1.4826 threshold is compared as
  *    |x − med|·10000 > 44478·MAD — no float anywhere.
  *  - q537 Western Electric run rules (WECO 1956): the four classic
  *    zone tests (1 beyond 3σ; 2-of-3 beyond 2σ one-sided; 4-of-5
  *    beyond 1σ one-sided; 8 in a row one side of center) as window
  *    counts against μ ± kσ limits from exact integer moments.
  *
  * (Reference: overseer's monitoring family — arbitrary handler fns,
  * src/overseer/executor.clj:12-39; q294's EWMA chart and q129's seasonal
  * gate are the neighboring alarms.)
  *
  * Scale shape: ONE corpus scan to the calendar-bounded daily census;
  * everything after is constant-width windows over ≤2,400 rows.
  * Exactness: q534 is all-BIGINT; q537's limits are fixed float
  * expressions over exact moments, and every rule decision is a
  * same-double comparison — cross-engine deterministic.
  */
object SeriesCleanOps {

  private def daily(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables(s, dir).orders
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("x"))

  val q534HampelFilter: QueryDef = QueryDef(
    "q534_hampel_filter",
    (s, dir) => {
      val w = Window.orderBy(col("day")).rowsBetween(-3, 3)
      daily(s, dir)
        .withColumn("win", sort_array(collect_list(col("x")).over(w)))
        .where(size(col("win")) === 7) // full centered windows only
        .select(col("day"), col("x"),
          expr("win[3]").as("med"),
          expr("sort_array(transform(win, v -> abs(v - win[3])))[3]").as("mad"))
        .where(abs(col("x") - col("med")) * 10000 > col("mad") * 44478)
        .select(col("day"), col("x"), col("med"), col("mad"),
          (abs(col("x") - col("med")) * 10000).as("dev_e4"))
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1),
      win AS (
        SELECT day, x,
          list_sort(list(x) OVER (ORDER BY day
            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS w
        FROM daily),
      full7 AS (
        SELECT day, x, w[4] AS med,
          list_sort(list_transform(w, v -> abs(v - w[4])))[4] AS mad
        FROM win WHERE len(w) = 7)
      SELECT day, x, CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
        CAST(abs(x - med) * 10000 AS BIGINT) AS dev_e4
      FROM full7
      WHERE abs(x - med) * 10000 > mad * 44478"""))

  val q537WesternElectric: QueryDef = QueryDef(
    "q537_western_electric",
    (s, dir) => {
      val d = daily(s, dir)
      val mom = d.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"))
      val lim = mom.select(
        (col("sx").cast("double") / col("n")).as("mu"),
        sqrt((col("n").cast("double") * col("sxx") -
          col("sx").cast("double") * col("sx")) /
          (col("n").cast("double") * (col("n") - 1))).as("sigma"))
      val z = d.crossJoin(broadcast(lim))
        .select(col("day"), col("x"), col("mu"), col("sigma"),
          when(col("x") > col("mu") + lit(3) * col("sigma"), 1L)
            .when(col("x") < col("mu") - lit(3) * col("sigma"), -1L)
            .otherwise(0L).as("z3"),
          when(col("x") > col("mu") + lit(2) * col("sigma"), 1L)
            .when(col("x") < col("mu") - lit(2) * col("sigma"), -1L)
            .otherwise(0L).as("z2"),
          when(col("x") > col("mu") + col("sigma"), 1L)
            .when(col("x") < col("mu") - col("sigma"), -1L)
            .otherwise(0L).as("z1"),
          when(col("x") > col("mu"), 1L).otherwise(-1L).as("side"))
      val w3 = Window.orderBy(col("day")).rowsBetween(-2, 0)
      val w5 = Window.orderBy(col("day")).rowsBetween(-4, 0)
      val w8 = Window.orderBy(col("day")).rowsBetween(-7, 0)
      z.withColumn("r1", (col("z3") =!= 0).cast("long"))
        .withColumn("r2",
          (greatest(sum(when(col("z2") === 1, 1L).otherwise(0L)).over(w3),
            sum(when(col("z2") === -1, 1L).otherwise(0L)).over(w3)) >= 2 &&
            count(lit(1)).over(w3) === 3).cast("long"))
        .withColumn("r3",
          (greatest(sum(when(col("z1") === 1, 1L).otherwise(0L)).over(w5),
            sum(when(col("z1") === -1, 1L).otherwise(0L)).over(w5)) >= 4 &&
            count(lit(1)).over(w5) === 5).cast("long"))
        .withColumn("r4",
          (abs(sum(col("side")).over(w8)) === 8 &&
            count(lit(1)).over(w8) === 8).cast("long"))
        .where(col("r1") + col("r2") + col("r3") + col("r4") > 0)
        .select(col("day"), col("x"), col("r1"), col("r2"), col("r3"),
          col("r4"))
    },
    Some("""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
        FROM orders GROUP BY 1),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM daily),
      lim AS (SELECT CAST(sx AS DOUBLE) / n AS mu,
        sqrt((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) /
          (CAST(n AS DOUBLE) * (n - 1))) AS sigma
        FROM mom),
      z AS (
        SELECT day, x,
          CASE WHEN x > mu + 3 * sigma THEN 1
               WHEN x < mu - 3 * sigma THEN -1 ELSE 0 END AS z3,
          CASE WHEN x > mu + 2 * sigma THEN 1
               WHEN x < mu - 2 * sigma THEN -1 ELSE 0 END AS z2,
          CASE WHEN x > mu + sigma THEN 1
               WHEN x < mu - sigma THEN -1 ELSE 0 END AS z1,
          CASE WHEN x > mu THEN 1 ELSE -1 END AS side
        FROM daily CROSS JOIN lim),
      rules AS (
        SELECT day, x,
          CAST(z3 <> 0 AS BIGINT) AS r1,
          CAST(GREATEST(
              SUM(CASE WHEN z2 = 1 THEN 1 ELSE 0 END) OVER w3,
              SUM(CASE WHEN z2 = -1 THEN 1 ELSE 0 END) OVER w3) >= 2
            AND COUNT(*) OVER w3 = 3 AS BIGINT) AS r2,
          CAST(GREATEST(
              SUM(CASE WHEN z1 = 1 THEN 1 ELSE 0 END) OVER w5,
              SUM(CASE WHEN z1 = -1 THEN 1 ELSE 0 END) OVER w5) >= 4
            AND COUNT(*) OVER w5 = 5 AS BIGINT) AS r3,
          CAST(abs(SUM(side) OVER w8) = 8
            AND COUNT(*) OVER w8 = 8 AS BIGINT) AS r4
        FROM z
        WINDOW
          w3 AS (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
          w5 AS (ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
          w8 AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
      SELECT day, x, r1, r2, r3, r4
      FROM rules WHERE r1 + r2 + r3 + r4 > 0"""))

  val all: Seq[QueryDef] = Seq(q534HampelFilter, q537WesternElectric)
}
