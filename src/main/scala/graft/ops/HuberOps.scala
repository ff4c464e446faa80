package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Robust-regression wave: Huber M-estimation of the daily-revenue
  * trend via three unrolled IRLS rounds — the outlier-resistant middle
  * ground between OLS (q125, breakdown 0) and Theil–Sen (q254,
  * O(pairs)). Round 0 is plain OLS; each round re-weights
  * w = min(1, k·s/|r|) with k = 1.345 and s = the exact lower median of
  * |r|, then refits weighted OLS in closed form.
  *
  * Determinism: the spine carries y as exact DECIMAL(12,2) and the
  * weight as DECIMAL(10,9), so every weighted moment is an EXACT
  * decimal product-sum — no per-term rounding anywhere (per-term
  * round-at-k of large products is exactly where engines' double
  * rounding semantics diverge; the first cut of this query failed its
  * oracle that way). Fit parameters are rounded where the decimal
  * quantum is far above the double ulp (a at 4 dp, b at 6 dp), the
  * residual at 2 dp.
  *
  * Scale shape: one corpus scan to the calendar-bounded spine
  * (~2 400 rows at ANY scale factor); all IRLS work is spine-sized.
  */
object HuberOps {

  private val K = 1.345

  /** Three IRLS rounds on daily order revenue vs day index: per round
    * the fit (a, b), the |r| median scale, total weight, and the
    * downweighted-day count; OLS is round 0. */
  val q418HuberIrls: QueryDef = QueryDef(
    "q418_huber_irls",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast(DecimalType(12, 2)).as("yd"))
        .withColumn("y", col("yd").cast("double"))
        .withColumn("td", col("t").cast(DecimalType(4, 0)))
        .localCheckpoint() // spine: every round reads it
      def fit(weighted: DataFrame): DataFrame = weighted
        .withColumn("wd", col("w").cast(DecimalType(10, 9)))
        .agg(
          sum(col("wd")).as("sw"),
          sum(col("wd") * col("td")).as("swx"),
          sum(col("wd") * col("yd")).as("swy"),
          sum((col("wd") * col("td")).cast(DecimalType(20, 9)) * col("td"))
            .as("swxx"),
          sum((col("wd") * col("yd")).cast(DecimalType(30, 11)) * col("td"))
            .as("swxy"),
          sum(when(col("w") < 1.0, 1L).otherwise(0L)).as("n_down"))
        .withColumn("b", round(
          (col("sw").cast("double") * col("swxy").cast("double") -
            col("swx").cast("double") * col("swy").cast("double")) /
          (col("sw").cast("double") * col("swxx").cast("double") -
            col("swx").cast("double") * col("swx").cast("double")), 6))
        .withColumn("a", round(
          (col("swy").cast("double") - col("b") * col("swx").cast("double")) /
            col("sw").cast("double"), 4))
        .select(col("a"), col("b"),
          round(col("sw").cast("double"), 4).as("sum_w"), col("n_down"))
        .localCheckpoint()

      var f = fit(daily.withColumn("w", round(lit(1.0), 9)))
      var out = f.select(lit(0L).as("iter"), col("a"), col("b"),
        lit(null).cast("double").as("scale_s"), col("sum_w"), col("n_down"))
      for (i <- 1 to 3) {
        val resid = daily.crossJoin(broadcast(f.select(col("a"), col("b"))))
          .withColumn("r", round(abs(col("y") - col("a") - col("b") * col("t")), 2))
        val n = daily.count()
        val sFrame = resid
          .withColumn("rn", row_number().over(Window.orderBy(col("r"), col("t"))))
          .where(col("rn") === (n + 1) / 2)
          .select(col("r").as("s0"))
        val weighted = resid.crossJoin(broadcast(sFrame))
          .withColumn("w", round(least(lit(1.0),
            lit(K) * col("s0") / greatest(col("r"), lit(0.01))), 9))
        val fNew = fit(weighted)
        f = fNew
        out = out.unionByName(fNew
          .crossJoin(broadcast(sFrame))
          .select(lit(i.toLong).as("iter"), col("a"), col("b"),
            col("s0").as("scale_s"), col("sum_w"), col("n_down")))
      }
      out.orderBy(col("iter"))
    },
    Some {
      def fitSql(src: String, iter: Int, scale: String) =
        s"""a$iter AS (SELECT
            SUM(wd) AS sw,
            SUM(wd * td) AS swx,
            SUM(wd * yd) AS swy,
            SUM(CAST(wd * td AS DECIMAL(20,9)) * td) AS swxx,
            SUM(CAST(wd * yd AS DECIMAL(30,11)) * td) AS swxy,
            CAST(SUM(CASE WHEN w < 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
          FROM $src),
        b$iter AS (SELECT *,
            round((CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
              - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE))
            / (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
              - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)), 6) AS b
          FROM a$iter),
        f$iter AS (SELECT
            round((CAST(swy AS DOUBLE) - b * CAST(swx AS DOUBLE))
              / CAST(sw AS DOUBLE), 4) AS a, b,
            round(CAST(sw AS DOUBLE), 4) AS sum_w, n_down, $scale AS scale_s
          FROM b$iter)"""
      def roundSql(i: Int): String =
        s"""r$i AS (SELECT d.t, d.td, d.y, d.yd,
            round(abs(d.y - f.a - f.b * d.t), 2) AS r
          FROM daily d, f${i - 1} f),
        s$i AS (SELECT r AS s0 FROM (SELECT r,
            ROW_NUMBER() OVER (ORDER BY r, t) AS rn FROM r$i)
          WHERE rn = ((SELECT COUNT(*) FROM daily) + 1) // 2),
        w$i AS (SELECT t, td, y, yd,
            round(least(1.0, $K * (SELECT s0 FROM s$i)
              / greatest(r, 0.01)), 9) AS w,
            CAST(round(least(1.0, $K * (SELECT s0 FROM s$i)
              / greatest(r, 0.01)), 9) AS DECIMAL(10,9)) AS wd
          FROM r$i),
        ${fitSql(s"w$i", i, s"(SELECT s0 FROM s$i)")}"""
      s"""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(datediff('day', DATE '1992-01-01', o_orderdate)
            AS DECIMAL(4,0)) AS td,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS y,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(12,2))
            AS yd
        FROM orders GROUP BY 1, 2),
      w0 AS (SELECT t, td, y, yd, 1.0 AS w,
          CAST(1.0 AS DECIMAL(10,9)) AS wd FROM daily),
      ${fitSql("w0", 0, "CAST(NULL AS DOUBLE)")},
      ${roundSql(1)},
      ${roundSql(2)},
      ${roundSql(3)}
      SELECT * FROM (
        SELECT CAST(0 AS BIGINT) AS iter, a, b, scale_s, sum_w, n_down FROM f0
        UNION ALL
        SELECT CAST(1 AS BIGINT), a, b, scale_s, sum_w, n_down FROM f1
        UNION ALL
        SELECT CAST(2 AS BIGINT), a, b, scale_s, sum_w, n_down FROM f2
        UNION ALL
        SELECT CAST(3 AS BIGINT), a, b, scale_s, sum_w, n_down FROM f3)
      ORDER BY iter"""
    })

  val all: Seq[QueryDef] = Seq(q418HuberIrls)
}
