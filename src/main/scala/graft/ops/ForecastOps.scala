package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Forecast wave: Holt double-exponential smoothing (level + trend,
  * α = β = 1/2) over the monthly revenue spine, with the one-step-ahead
  * forecast error series, a MASE backtest against the naive lag-1
  * forecaster, and the next-month forecast. EWMA (q294) smooths level
  * only; this is the trend-aware member of the family.
  *
  * Scale shape: the corpus collapses to the monthly spine in one scan;
  * the smoothing recursion is a fold over the ~84-element month array —
  * a higher-order `aggregate` on one model-sized row, never a
  * corpus-sized sequential pass. Both engines walk the identical state
  * trajectory: level/trend/forecast are rounded to 4 dp at every step
  * (the q340 trajectory-rounding discipline), and the DuckDB oracle
  * replays the recursion as a recursive CTE.
  */
object ForecastOps {

  private val foldExpr = """
    aggregate(
      rs,
      named_struct('i', CAST(0 AS BIGINT), 'l', CAST(0.0 AS DOUBLE),
        'b', CAST(0.0 AS DOUBLE),
        'out', CAST(NULL AS ARRAY<STRUCT<t: BIGINT, y: DOUBLE,
          level: DOUBLE, trend: DOUBLE, fc: DOUBLE>>)),
      (a, r) -> IF(a.i = 0,
        named_struct('i', CAST(1 AS BIGINT), 'l', r.y,
          'b', CAST(0.0 AS DOUBLE),
          'out', array(named_struct('t', r.t, 'y', r.y, 'level', r.y,
            'trend', CAST(NULL AS DOUBLE), 'fc', CAST(NULL AS DOUBLE)))),
        named_struct(
          'i', a.i + 1,
          'l', round(0.5d * r.y
            + 0.5d * round(a.l + IF(a.i = 1, round(r.y - a.l, 4), a.b), 4), 4),
          'b', round(
            0.5d * (round(0.5d * r.y
                + 0.5d * round(a.l + IF(a.i = 1, round(r.y - a.l, 4), a.b), 4), 4)
              - a.l)
            + 0.5d * IF(a.i = 1, round(r.y - a.l, 4), a.b), 4),
          'out', a.out || array(named_struct(
            't', r.t, 'y', r.y,
            'level', round(0.5d * r.y
              + 0.5d * round(a.l + IF(a.i = 1, round(r.y - a.l, 4), a.b), 4), 4),
            'trend', round(
              0.5d * (round(0.5d * r.y
                  + 0.5d * round(a.l + IF(a.i = 1, round(r.y - a.l, 4), a.b), 4), 4)
                - a.l)
              + 0.5d * IF(a.i = 1, round(r.y - a.l, 4), a.b), 4),
            'fc', round(a.l + IF(a.i = 1, round(r.y - a.l, 4), a.b), 4))))),
      a -> named_struct('rows', a.out, 'll', a.l, 'lb', a.b))"""

  /** Holt smoothing of monthly order revenue: per-month level/trend/
    * one-step forecast/|error|, the MASE vs the naive lag-1 forecast,
    * and the next-month forecast from the final state. */
  val q411HoltSmoothing: QueryDef = QueryDef(
    "q411_holt_smoothing",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .withColumn("m",
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long"))
      val m0 = o.agg(min(col("m"))).head().getLong(0)
      val monthly = o
        .withColumn("t", col("m") - m0)
        .groupBy(col("t"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("y"))
      val folded = monthly
        .agg(sort_array(collect_list(struct(col("t"), col("y")))).as("rs"))
        .select(expr(foldExpr).as("f"))
        .select(explode(col("f.rows")).as("r"),
          round(col("f.ll") + col("f.lb"), 4).as("fc_next"))
        .select(col("r.t").as("t"), col("r.y").as("y"),
          col("r.level").as("level"), col("r.trend").as("trend"),
          col("r.fc").as("fc"), col("fc_next"))
      val w = Window.partitionBy()
      val wT = Window.partitionBy().orderBy(col("t"))
      folded
        .withColumn("abs_err", round(abs(col("y") - col("fc")), 4))
        .withColumn("nd", round(abs(col("y") - lag(col("y"), 1).over(wT)), 4))
        .withColumn("mase", round(
          sum(col("abs_err").cast(DecimalType(18, 4))).over(w).cast("double") /
            sum(col("nd").cast(DecimalType(18, 4))).over(w).cast("double"), 6))
        .select(col("t"), col("y"), col("level"), col("trend"), col("fc"),
          col("abs_err"), col("mase"), col("fc_next"))
        .orderBy(col("t"))
    },
    Some("""WITH RECURSIVE o AS (SELECT
          (EXTRACT(year FROM o_orderdate) * 12
            + EXTRACT(month FROM o_orderdate) - 1) AS m,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders),
      monthly AS (SELECT m - (SELECT MIN(m) FROM o) AS t,
          CAST(SUM(v) AS DOUBLE) AS y
        FROM o GROUP BY 1),
      rec(t, l, b, fc) AS (
        SELECT CAST(0 AS BIGINT), a.y, round(b.y - a.y, 4),
            CAST(NULL AS DOUBLE)
          FROM monthly a, monthly b WHERE a.t = 0 AND b.t = 1
        UNION ALL
        SELECT m.t,
          round(0.5 * m.y + 0.5 * round(r.l + r.b, 4), 4),
          round(0.5 * (round(0.5 * m.y + 0.5 * round(r.l + r.b, 4), 4) - r.l)
            + 0.5 * r.b, 4),
          round(r.l + r.b, 4)
        FROM rec r JOIN monthly m ON m.t = r.t + 1),
      outr AS (SELECT r.t, m.y, r.l AS level,
          CASE WHEN r.t = 0 THEN NULL ELSE r.b END AS trend, r.fc,
          round(abs(m.y - r.fc), 4) AS abs_err
        FROM rec r JOIN monthly m ON m.t = r.t),
      naive AS (SELECT t, round(abs(y - LAG(y) OVER (ORDER BY t)), 4) AS nd
        FROM monthly),
      ms AS (SELECT round(
          CAST(SUM(CAST(o.abs_err AS DECIMAL(18,4))) AS DOUBLE)
          / CAST(SUM(CAST(n.nd AS DECIMAL(18,4))) AS DOUBLE), 6) AS mase
        FROM outr o JOIN naive n ON n.t = o.t),
      fcn AS (SELECT round(l + b, 4) AS fc_next FROM rec
        WHERE t = (SELECT MAX(t) FROM rec))
      SELECT o.t, o.y, o.level, o.trend, o.fc, o.abs_err, m.mase, f.fc_next
      FROM outr o, ms m, fcn f ORDER BY o.t"""))

  val all: Seq[QueryDef] = Seq(q411HoltSmoothing)
}
