package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Metric-decomposition wave: the mix-vs-rate (Oaxaca–Blinder style)
  * breakdown of a KPI movement — "did average order value move because
  * segment composition shifted, or because within-segment value
  * changed?" — the first question any metrics review asks about a
  * moved topline.
  *
  * Scale shape: one scan of orders collapsed to a (segment × period)
  * frame; all arithmetic happens on that ≤10-row frame. Money sums go
  * through DECIMAL so partition order cannot perturb the doubles.
  */
object DecompOps {

  /** Average order value, early era (orderdate < 1998-05-01) vs late
    * era, decomposed by order priority. With share_ps = n_ps/n_p and
    * rate_ps = value_ps/n_ps, the exact two-part split is
    * mix_s = (share2−share1)·rate1 and rate_s = share2·(rate2−rate1);
    * the effects sum to the topline delta by construction, and the
    * delta_check column carries that invariant into the output. */
  val q391MixRateDecomp: QueryDef = QueryDef(
    "q391_mix_rate_decomp",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .withColumn("period",
          when(col("o_orderdate") < lit("1998-05-01").cast("timestamp"), 1)
            .otherwise(2))
      val per = o.groupBy(col("o_orderpriority").as("segment"), col("period"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("val"))
      val w = Window.partitionBy(col("period"))
      val shares = per
        .withColumn("n_tot", sum(col("n")).over(w))
        .withColumn("share", col("n").cast("double") / col("n_tot"))
        .withColumn("rate", col("val").cast("double") / col("n"))
      val wide = shares.groupBy(col("segment"))
        .agg(
          sum(when(col("period") === 1, col("n")).otherwise(0L)).as("n1"),
          sum(when(col("period") === 2, col("n")).otherwise(0L)).as("n2"),
          sum(when(col("period") === 1, col("share")).otherwise(0.0)).as("share1"),
          sum(when(col("period") === 2, col("share")).otherwise(0.0)).as("share2"),
          sum(when(col("period") === 1, col("rate")).otherwise(0.0)).as("rate1"),
          sum(when(col("period") === 2, col("rate")).otherwise(0.0)).as("rate2"))
      val wAll = Window.partitionBy()
      wide
        .withColumn("mix_effect",
          (col("share2") - col("share1")) * col("rate1"))
        .withColumn("rate_effect",
          col("share2") * (col("rate2") - col("rate1")))
        .withColumn("delta_check", round(
          sum(round(col("mix_effect") + col("rate_effect"), 9)
            .cast(DecimalType(24, 9))).over(wAll).cast("double"), 4))
        .select(col("segment"), col("n1"), col("n2"),
          round(col("share1"), 6).as("share1"),
          round(col("share2"), 6).as("share2"),
          round(col("rate1"), 4).as("rate1"),
          round(col("rate2"), 4).as("rate2"),
          round(col("mix_effect"), 4).as("mix_effect"),
          round(col("rate_effect"), 4).as("rate_effect"),
          col("delta_check"))
        .orderBy(col("segment"))
    },
    Some("""WITH o AS (SELECT o_orderpriority AS segment,
          CASE WHEN o_orderdate < TIMESTAMP '1998-05-01' THEN 1 ELSE 2 END
            AS period,
          CAST(o_totalprice AS DECIMAL(18,2)) AS price
        FROM orders),
      per AS (SELECT segment, period, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(price) AS val
        FROM o GROUP BY 1, 2),
      sh AS (SELECT *,
          CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY period) AS share,
          CAST(val AS DOUBLE) / n AS rate
        FROM per),
      wide AS (SELECT segment,
          CAST(SUM(CASE WHEN period = 1 THEN n ELSE 0 END) AS BIGINT) AS n1,
          CAST(SUM(CASE WHEN period = 2 THEN n ELSE 0 END) AS BIGINT) AS n2,
          SUM(CASE WHEN period = 1 THEN share ELSE 0.0 END) AS share1,
          SUM(CASE WHEN period = 2 THEN share ELSE 0.0 END) AS share2,
          SUM(CASE WHEN period = 1 THEN rate ELSE 0.0 END) AS rate1,
          SUM(CASE WHEN period = 2 THEN rate ELSE 0.0 END) AS rate2
        FROM sh GROUP BY 1),
      eff AS (SELECT *,
          (share2 - share1) * rate1 AS mix_effect,
          share2 * (rate2 - rate1) AS rate_effect
        FROM wide)
      SELECT segment, n1, n2,
        round(share1, 6) AS share1, round(share2, 6) AS share2,
        round(rate1, 4) AS rate1, round(rate2, 4) AS rate2,
        round(mix_effect, 4) AS mix_effect,
        round(rate_effect, 4) AS rate_effect,
        round(CAST(SUM(CAST(round(mix_effect + rate_effect, 9)
          AS DECIMAL(24,9))) OVER () AS DOUBLE), 4) AS delta_check
      FROM eff ORDER BY segment"""))

  val all: Seq[QueryDef] = Seq(q391MixRateDecomp)
}
