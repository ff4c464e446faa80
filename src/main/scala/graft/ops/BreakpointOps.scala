package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Breakpoint-regression wave: the two-piece (segmented) OLS trend fit
  * — "the trend changed; WHEN, and from what slope to what slope?" —
  * the structural-break question CUSUM (q130, mean shifts) does not
  * answer. Every candidate breakpoint's two-sided SSE comes from
  * closed-form prefix-sum algebra, so the whole grid search is one
  * melt + one aggregation, no per-candidate regression jobs (the q377
  * one-shuffle-grid lesson).
  *
  * Scale shape: the corpus collapses to a monthly spine first; the
  * breakpoint sweep runs on (months × candidates) — model-sized both
  * ways — and the certificate (best SSE ≤ single-line SSE) is part of
  * the output.
  */
object BreakpointOps {

  /** Monthly order-revenue trend, candidate breaks at every interior
    * month: fit OLS left and right of each candidate, pick the SSE-
    * minimizing break (tie → earliest), report slopes, the SSE drop vs
    * the single-line fit, and the pseudo-F statistic. Month index is
    * the regressor; revenue sums go through DECIMAL. */
  val q408TrendBreakpoint: QueryDef = QueryDef(
    "q408_trend_breakpoint",
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
        .localCheckpoint()
      val nM = monthly.count()
      // candidate break k: left = months [0, k], right = (k, n)
      val cands = monthly.select(col("t").as("k"))
        .where(col("k") >= 2 && col("k") <= nM - 3)
      val melt = monthly.crossJoin(cands)
        .withColumn("side", when(col("t") <= col("k"), "l").otherwise("r"))
      def sseAgg = {
        // closed-form residual SSE of an OLS fit from the five sums
        val n = count(lit(1)).cast("double")
        val sx = sum(col("t")).cast("double")
        val sy = sum(round(col("y"), 4).cast(DecimalType(24, 4)))
          .cast("double")
        val sxx = sum(col("t") * col("t")).cast("double")
        val sxy = sum(round(col("y") * col("t"), 4)
          .cast(DecimalType(28, 4))).cast("double")
        val syy = sum(round(col("y") * col("y"), 4)
          .cast(DecimalType(38, 4))).cast("double")
        val sxxc = n * sxx - sx * sx
        val b = (n * sxy - sx * sy) / sxxc
        struct(
          ((n * syy - sy * sy) / n - b * b * sxxc / n).as("sse"),
          b.as("slope"))
      }
      val perSide = melt.groupBy(col("k"), col("side")).agg(sseAgg.as("f"))
      val perK = perSide.groupBy(col("k"))
        .agg(
          sum(when(col("side") === "l", col("f.sse"))).as("sse_l"),
          sum(when(col("side") === "r", col("f.sse"))).as("sse_r"),
          sum(when(col("side") === "l", col("f.slope"))).as("slope_l"),
          sum(when(col("side") === "r", col("f.slope"))).as("slope_r"))
        .withColumn("sse2", round(col("sse_l") + col("sse_r"), 4))
      val single = monthly.agg(sseAgg.as("f"))
        .select(round(col("f.sse"), 4).as("sse1"),
          round(col("f.slope"), 6).as("slope_single"))
      val best = perK
        .withColumn("rn", row_number().over(
          Window.orderBy(col("sse2"), col("k"))))
        .where(col("rn") === 1)
      best.crossJoin(broadcast(single))
        .withColumn("f_stat", round(
          (col("sse1") - col("sse2")) / lit(2.0) /
            (col("sse2") / lit((nM - 4).toDouble)), 4))
        .select(col("k").as("break_month"),
          round(col("slope_l"), 6).as("slope_before"),
          round(col("slope_r"), 6).as("slope_after"),
          col("sse2").as("sse_two_piece"), col("sse1").as("sse_single"),
          round(lit(1.0) - col("sse2") / col("sse1"), 6).as("sse_drop"),
          col("f_stat"),
          col("slope_single"))
    },
    Some("""WITH o AS (SELECT
          (EXTRACT(year FROM o_orderdate) * 12
            + EXTRACT(month FROM o_orderdate) - 1) AS m,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders),
      m0 AS (SELECT MIN(m) AS m0 FROM o),
      monthly AS (SELECT m - (SELECT m0 FROM m0) AS t,
          CAST(SUM(v) AS DOUBLE) AS y
        FROM o GROUP BY 1),
      nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM monthly),
      cands AS (SELECT t AS k FROM monthly
        WHERE t >= 2 AND t <= (SELECT n FROM nm) - 3),
      melt AS (SELECT mo.t, mo.y, c.k,
          CASE WHEN mo.t <= c.k THEN 'l' ELSE 'r' END AS side
        FROM monthly mo CROSS JOIN cands c),
      sides AS (SELECT k, side,
          CAST(COUNT(*) AS DOUBLE) AS n,
          CAST(SUM(t) AS DOUBLE) AS sx,
          CAST(SUM(CAST(round(y, 4) AS DECIMAL(24,4))) AS DOUBLE) AS sy,
          CAST(SUM(t * t) AS DOUBLE) AS sxx,
          CAST(SUM(CAST(round(y * t, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
          CAST(SUM(CAST(round(y * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syy
        FROM melt GROUP BY 1, 2),
      fits AS (SELECT k, side,
          (n * syy - sy * sy) / n
            - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
              * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
              * (n * sxx - sx * sx) / n AS sse,
          (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope
        FROM sides),
      perk AS (SELECT k,
          SUM(CASE WHEN side = 'l' THEN sse END) AS sse_l,
          SUM(CASE WHEN side = 'r' THEN sse END) AS sse_r,
          SUM(CASE WHEN side = 'l' THEN slope END) AS slope_l,
          SUM(CASE WHEN side = 'r' THEN slope END) AS slope_r
        FROM fits GROUP BY 1),
      perk2 AS (SELECT *, round(sse_l + sse_r, 4) AS sse2 FROM perk),
      single AS (SELECT
          round((n * syy - sy * sy) / n
            - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
              * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
              * (n * sxx - sx * sx) / n, 4) AS sse1,
          round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
            AS slope_single
        FROM (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
            CAST(SUM(t) AS DOUBLE) AS sx,
            CAST(SUM(CAST(round(y, 4) AS DECIMAL(24,4))) AS DOUBLE) AS sy,
            CAST(SUM(t * t) AS DOUBLE) AS sxx,
            CAST(SUM(CAST(round(y * t, 4) AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
            CAST(SUM(CAST(round(y * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS syy
          FROM monthly)),
      best AS (SELECT * FROM perk2 ORDER BY sse2, k LIMIT 1)
      SELECT b.k AS break_month,
        round(b.slope_l, 6) AS slope_before,
        round(b.slope_r, 6) AS slope_after,
        b.sse2 AS sse_two_piece, s.sse1 AS sse_single,
        round(1.0 - b.sse2 / s.sse1, 6) AS sse_drop,
        round((s.sse1 - b.sse2) / 2.0
          / (b.sse2 / ((SELECT n FROM nm) - 4)), 4) AS f_stat,
        s.slope_single
      FROM best b, single s"""))

  val all: Seq[QueryDef] = Seq(q408TrendBreakpoint)
}
