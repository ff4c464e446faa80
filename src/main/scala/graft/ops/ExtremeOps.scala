package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Extreme-value wave: Gumbel block-maxima fit with return levels —
  * "what daily-revenue spike should we expect once a year? once a
  * decade?" Hill (q350) fits the tail exponent of the sorted tail;
  * this is the EVT block-maxima route: monthly maxima → Gumbel(μ, β)
  * by method of moments → T-block return levels, with the empirical
  * exceedance count of the 12-month level as the calibration check.
  *
  * Determinism: daily revenue and monthly maxima are exact 2-dp
  * DECIMAL values; mean/sd come from exact DECIMAL moment sums; μ, β
  * and the return levels are closed-form (√6, π, γ constants spelled
  * identically in both engines).
  *
  * Scale shape: corpus → daily census → monthly maxima (calendar-
  * bounded, ~84 rows); everything after is closed form.
  */
object ExtremeOps {

  private val EulerGamma = "0.5772156649015329"

  /** Gumbel MoM fit on monthly maxima of daily revenue: (μ, β), the
    * 12/60/120-month return levels, and the 12-month level's empirical
    * exceedance count. */
  val q423GumbelReturnLevels: QueryDef = QueryDef(
    "q423_gumbel_return_levels",
    (s, dir) => {
      val blocks = Tables(s, dir).orders
        .groupBy(col("o_orderdate").as("d"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("rev"))
        .groupBy((year(col("d")) * 12 + month(col("d")) - 1).cast("long")
          .as("blk"))
        .agg(max(col("rev")).as("mx"))
        .localCheckpoint() // moment pass + exceedance pass
      val mom = blocks.agg(count(lit(1)).as("n_blocks"),
        sum(col("mx")).as("s"),
        sum((col("mx") * col("mx")).cast(DecimalType(38, 6))).as("ss"))
        .withColumn("mean_max", round(col("s").cast("double") / col("n_blocks"), 6))
        .withColumn("sd_max", round(sqrt(
          col("ss").cast("double") / col("n_blocks") -
            col("mean_max") * col("mean_max")), 6))
        .withColumn("beta", round(col("sd_max") * sqrt(lit(6.0)) / lit(math.Pi), 6))
        .withColumn("mu", round(col("mean_max") -
          lit(EulerGamma.toDouble) * col("beta"), 6))
      def rl(t: Int) = round(col("mu") - col("beta") *
        log(-log(lit(1.0) - lit(1.0) / t)), 6)
      val fit = mom
        .withColumn("rl_12", rl(12))
        .withColumn("rl_60", rl(60))
        .withColumn("rl_120", rl(120))
        .localCheckpoint()
      blocks.crossJoin(broadcast(fit))
        .groupBy(col("n_blocks"), col("mean_max"), col("sd_max"),
          col("mu"), col("beta"), col("rl_12"), col("rl_60"), col("rl_120"))
        .agg(sum(when(col("mx").cast("double") > col("rl_12"), 1L)
          .otherwise(0L)).as("n_exceed_rl12"))
        .select(col("n_blocks"), col("mean_max"), col("sd_max"),
          col("mu"), col("beta"), col("rl_12"), col("rl_60"), col("rl_120"),
          col("n_exceed_rl12"))
    },
    Some(s"""WITH dailyrev AS (SELECT o_orderdate AS d,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1),
      blocks AS (SELECT
          (EXTRACT(year FROM d) * 12 + EXTRACT(month FROM d) - 1) AS blk,
          MAX(rev) AS mx
        FROM dailyrev GROUP BY 1),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
          SUM(mx) AS s,
          SUM(CAST(mx * mx AS DECIMAL(38,4))) AS ss
        FROM blocks),
      m2 AS (SELECT n_blocks,
          round(CAST(s AS DOUBLE) / n_blocks, 6) AS mean_max,
          round(sqrt(CAST(ss AS DOUBLE) / n_blocks
            - round(CAST(s AS DOUBLE) / n_blocks, 6)
              * round(CAST(s AS DOUBLE) / n_blocks, 6)), 6) AS sd_max
        FROM mom),
      m3 AS (SELECT *,
          round(sd_max * sqrt(6.0) / pi(), 6) AS beta
        FROM m2),
      fit AS (SELECT *,
          round(mean_max - $EulerGamma * beta, 6) AS mu
        FROM m3),
      rls AS (SELECT *,
          round(mu - beta * ln(-ln(1.0 - 1.0 / 12)), 6) AS rl_12,
          round(mu - beta * ln(-ln(1.0 - 1.0 / 60)), 6) AS rl_60,
          round(mu - beta * ln(-ln(1.0 - 1.0 / 120)), 6) AS rl_120
        FROM fit)
      SELECT r.n_blocks, r.mean_max, r.sd_max, r.mu, r.beta,
        r.rl_12, r.rl_60, r.rl_120,
        CAST(SUM(CASE WHEN CAST(b.mx AS DOUBLE) > r.rl_12 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_exceed_rl12
      FROM blocks b, rls r
      GROUP BY 1, 2, 3, 4, 5, 6, 7, 8"""))

  val all: Seq[QueryDef] = Seq(q423GumbelReturnLevels)
}
