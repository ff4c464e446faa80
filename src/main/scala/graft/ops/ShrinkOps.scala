package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Empirical-Bayes wave: beta-binomial shrinkage of per-brand return
  * rates — the proportions twin of q375's James–Stein (which shrinks
  * Gaussian means): fit a Beta(α,β) prior to the observed rate spread
  * by method of moments, then report each brand's posterior mean
  * (x+α)/(n+α+β) and how far it was pulled. Brands with few
  * observations shrink hard toward the pool; big brands keep their
  * own rate — the estimator a 100 TB pipeline wants for thousands of
  * small-source quality rates.
  *
  * Determinism: x and n are exact counts; rates are identical x/n
  * doubles; the across-brand moment sums go through scaled-long
  * accumulators (round(p·1e9) — the q413 idiom), so m and v are
  * identical doubles in both engines. The MoM prior saturates
  * (documented, q424's contract) when v ≤ m(1−m)/(1+mean n) — flagged,
  * not papered over.
  *
  * Scale shape: one lineitem→brand aggregation, one k-row moment pass,
  * one broadcast of the 1-row prior back onto the k-row frame.
  */
object ShrinkOps {

  /** Beta-binomial shrinkage of per-brand 'R'-return rates: MoM prior
    * (α,β), per-brand raw vs posterior rate, shrink weight, and the
    * rank flips the pooling causes. */
  val q431BetaBinomialShrink: QueryDef = QueryDef(
    "q431_beta_binomial_shrink",
    (s, dir) => {
      val t = Tables(s, dir)
      val g = t.lineitem
        .join(broadcast(t.part.select(col("p_partkey").as("l_partkey"),
          col("p_brand").as("brand"))), Seq("l_partkey"))
        .groupBy(col("brand"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_returnflag") === "R", lit(1)).otherwise(lit(0)))
            .cast("long").as("x"))
        .withColumn("p_raw", col("x").cast("double") / col("n"))
      val mom = g.agg(
        count(lit(1)).as("k"),
        sum(round(col("p_raw") * 1e9).cast("long")).as("sp"),
        sum(round(col("p_raw") * col("p_raw") * 1e9).cast("long")).as("spp"))
        .withColumn("m", col("sp").cast("double") / 1e9 / col("k"))
        .withColumn("v",
          (col("spp").cast("double") / 1e9
            - col("sp").cast("double") / 1e9 * col("sp") / 1e9 / col("k"))
            / (col("k") - 1))
        .withColumn("phi", col("m") * (lit(1) - col("m")) / col("v") - 1)
        .withColumn("saturated", col("v") <= 0 || col("phi") <= 0)
        .withColumn("alpha",
          when(col("saturated"), lit(null)).otherwise(
            round(col("m") * col("phi"), 6)))
        .withColumn("beta",
          when(col("saturated"), lit(null)).otherwise(
            round((lit(1) - col("m")) * col("phi"), 6)))
      val wRaw = Window.orderBy(col("p_raw").desc, col("brand"))
      val wPost = Window.orderBy(col("p_post").desc, col("brand"))
      g.crossJoin(broadcast(mom.select(col("m"), col("alpha"), col("beta"),
        col("saturated"))))
        .withColumn("p_post", when(col("saturated"), col("p_raw")).otherwise(
          round((col("x") + col("alpha"))
            / (col("n") + col("alpha") + col("beta")), 9)))
        .withColumn("shrink_w", when(col("saturated"), lit(0.0)).otherwise(
          round((col("alpha") + col("beta"))
            / (col("n") + col("alpha") + col("beta")), 9)))
        .withColumn("rank_raw", row_number().over(wRaw).cast("long"))
        .withColumn("rank_post", row_number().over(wPost).cast("long"))
        .select(col("brand"), col("n"), col("x"),
          round(col("p_raw"), 9).as("p_raw"), col("p_post"), col("shrink_w"),
          col("rank_raw"), col("rank_post"),
          round(col("m"), 9).as("pool_m"), col("alpha"), col("beta"),
          col("saturated"))
        .orderBy(col("brand"))
    },
    Some("""WITH g AS (SELECT p.p_brand AS brand,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END)
            AS BIGINT) AS x
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1),
      gr AS (SELECT *, CAST(x AS DOUBLE) / n AS p_raw FROM g),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
          CAST(SUM(CAST(round(p_raw * 1e9) AS BIGINT)) AS BIGINT) AS sp,
          CAST(SUM(CAST(round(p_raw * p_raw * 1e9) AS BIGINT)) AS BIGINT)
            AS spp
        FROM gr),
      prior AS (SELECT *,
          CAST(sp AS DOUBLE) / 1e9 / k AS m,
          (CAST(spp AS DOUBLE) / 1e9
            - CAST(sp AS DOUBLE) / 1e9 * sp / 1e9 / k) / (k - 1) AS v
        FROM mom),
      prior2 AS (SELECT *, m * (1 - m) / v - 1 AS phi,
          (v <= 0 OR m * (1 - m) / v - 1 <= 0) AS saturated
        FROM prior),
      prior3 AS (SELECT *,
          CASE WHEN saturated THEN NULL ELSE round(m * phi, 6) END AS alpha,
          CASE WHEN saturated THEN NULL ELSE round((1 - m) * phi, 6) END
            AS beta
        FROM prior2),
      joined AS (SELECT gr.*, p.m, p.alpha, p.beta, p.saturated,
          CASE WHEN p.saturated THEN gr.p_raw
            ELSE round((gr.x + p.alpha)
              / (gr.n + p.alpha + p.beta), 9) END AS p_post,
          CASE WHEN p.saturated THEN 0.0
            ELSE round((p.alpha + p.beta) / (gr.n + p.alpha + p.beta), 9) END
            AS shrink_w
        FROM gr, prior3 p)
      SELECT brand, n, x, round(p_raw, 9) AS p_raw, p_post, shrink_w,
        CAST(ROW_NUMBER() OVER (ORDER BY p_raw DESC, brand) AS BIGINT)
          AS rank_raw,
        CAST(ROW_NUMBER() OVER (ORDER BY p_post DESC, brand) AS BIGINT)
          AS rank_post,
        round(m, 9) AS pool_m, alpha, beta, saturated
      FROM joined ORDER BY brand"""))

  val all: Seq[QueryDef] = Seq(q431BetaBinomialShrink)
}
