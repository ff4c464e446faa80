package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Overdispersion wave: Poisson vs negative-binomial model choice for
  * per-customer order counts — the step AFTER q201's Poisson
  * goodness-of-fit rejects: quantify the overdispersion (index D and
  * its normal-approximation z), fit NB by method of moments
  * (k̂ = m²/(v−m)), and produce the observed / Poisson-expected /
  * NB-expected census per count so the fix is auditable bin by bin.
  *
  * Determinism: counts are integers, so m and v come from exact integer
  * DECIMAL sums; the pmfs run once per BIN (≤ 11 rows) in log-space
  * (lgamma, the q322 idiom) from parameters rounded at 9.
  *
  * Scale shape: one per-customer count aggregation, one ≤11-row census,
  * closed-form everything else.
  */
object DispersionOps {

  /** Per-customer order-count dispersion: m, v, D, z, NB k̂/p̂, and the
    * per-bin observed vs Poisson vs NB expected counts (bins 0–9 plus
    * the 10+ tail). */
  val q424NbOverdispersion: QueryDef = QueryDef(
    "q424_nb_overdispersion",
    (s, dir) => {
      val t = Tables(s, dir)
      // left join so never-ordering customers count as x = 0
      val counts = t.customer.select(col("c_custkey").as("ck"))
        .join(t.orders.groupBy(col("o_custkey").as("ck"))
          .agg(count(lit(1)).as("x")), Seq("ck"), "left")
        .na.fill(0L, Seq("x"))
        .localCheckpoint() // moment pass + census pass
      val dec = DecimalType(38, 0)
      val mom = counts.agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"),
        sum((col("x") * col("x")).cast(dec)).as("sxx"))
        .withColumn("m", round(col("sx").cast("double") / col("n"), 9))
        .withColumn("v", round(col("sxx").cast("double") / col("n") -
          col("m") * col("m"), 9))
        .withColumn("disp_d", round(col("v") / col("m"), 6))
        .withColumn("z_over", round((col("v") / col("m") - 1) /
          sqrt(lit(2.0) / (col("n") - 1)), 4))
        // equi/under-dispersed data (v <= m) sends the MoM k to ∞ — the
        // NB→Poisson limit; saturate at 1e6 so the pmf stays finite and
        // the division never sees zero (sf0.001 IS exactly equidispersed)
        .withColumn("k_hat", round(least(col("m") * col("m") /
          greatest(col("v") - col("m"), lit(1e-6)), lit(1e6)), 9))
        .withColumn("p_hat", round(col("k_hat") /
          (col("k_hat") + col("m")), 9))
        .localCheckpoint()
      val census = counts
        .withColumn("bin", least(col("x"), lit(10L)))
        .groupBy(col("bin")).agg(count(lit(1)).as("n_obs"))
      // Spark has no lgamma: ln(bin!) and the Pochhammer term
      // lnΓ(bin+k)−lnΓ(k) are ≤9-term log sums over the BIN index —
      // written identically in both engines (the q322 log-space idiom)
      val lnFact = when(col("bin") <= 1, lit(0.0)).otherwise(
        expr("aggregate(sequence(2L, bin), 0D, (a, j) -> a + ln(double(j)))"))
      val lnPoch = when(col("bin") === 0, lit(0.0)).otherwise(
        expr("aggregate(sequence(0L, bin - 1L), 0D, (a, j) -> a + ln(k_hat + double(j)))"))
      census.crossJoin(broadcast(mom))
        .withColumn("exp_poisson", when(col("bin") < 10,
          round(col("n") * exp(-col("m") + col("bin") * log(col("m")) -
            lnFact), 4))
          .otherwise(lit(null).cast("double")))
        .withColumn("exp_nb", when(col("bin") < 10,
          round(col("n") * exp(
            lnPoch - lnFact + col("k_hat") * log(col("p_hat")) +
              col("bin") * log(lit(1.0) - col("p_hat"))), 4))
          .otherwise(lit(null).cast("double")))
        .select(col("bin"), col("n_obs"), col("exp_poisson"), col("exp_nb"),
          col("m"), round(col("v"), 6).as("v"), col("disp_d"), col("z_over"),
          round(col("k_hat"), 6).as("k_hat"))
        .orderBy(col("bin"))
    },
    Some("""WITH counts AS (SELECT c.c_custkey,
          COALESCE(o.x, 0) AS x
        FROM customer c LEFT JOIN (SELECT o_custkey,
            CAST(COUNT(*) AS BIGINT) AS x
          FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey),
      mom0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(x AS DECIMAL(38,0))) AS sx,
          SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx
        FROM counts),
      mom1 AS (SELECT n,
          round(CAST(sx AS DOUBLE) / n, 9) AS m,
          round(CAST(sxx AS DOUBLE) / n
            - round(CAST(sx AS DOUBLE) / n, 9)
              * round(CAST(sx AS DOUBLE) / n, 9), 9) AS v
        FROM mom0),
      mom2 AS (SELECT *, round(v / m, 6) AS disp_d,
          round((v / m - 1) / sqrt(2.0 / (n - 1)), 4) AS z_over,
          round(least(m * m / greatest(v - m, 0.000001), 1000000.0), 9)
            AS k_hat
        FROM mom1),
      mom AS (SELECT *, round(k_hat / (k_hat + m), 9) AS p_hat FROM mom2),
      census AS (SELECT LEAST(x, 10) AS bin,
          CAST(COUNT(*) AS BIGINT) AS n_obs
        FROM counts GROUP BY 1),
      lsums AS (SELECT c.bin, c.n_obs, mm.*,
          CASE WHEN c.bin <= 1 THEN 0.0 ELSE COALESCE(list_sum(
            list_transform(range(2, c.bin + 1),
              j -> ln(CAST(j AS DOUBLE)))), 0.0) END AS lnfact,
          CASE WHEN c.bin = 0 THEN 0.0 ELSE COALESCE(list_sum(
            list_transform(range(0, c.bin),
              j -> ln(mm.k_hat + CAST(j AS DOUBLE)))), 0.0) END AS lnpoch
        FROM census c, mom mm)
      SELECT bin, n_obs,
        CASE WHEN bin < 10 THEN round(n * exp(-m
          + bin * ln(m) - lnfact), 4) END AS exp_poisson,
        CASE WHEN bin < 10 THEN round(n * exp(
          lnpoch - lnfact
          + k_hat * ln(p_hat)
          + bin * ln(1.0 - p_hat)), 4) END AS exp_nb,
        m, round(v, 6) AS v, disp_d, z_over,
        round(k_hat, 6) AS k_hat
      FROM lsums ORDER BY bin"""))

  val all: Seq[QueryDef] = Seq(q424NbOverdispersion)
}
