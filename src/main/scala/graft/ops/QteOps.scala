package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Quantile-treatment-effect wave: the DISTRIBUTIONAL read of an A/B
  * comparison — q215/q383 answer "did the mean move"; QTE (Doksum 1974;
  * Firpo 2007) answers "did the cheap orders move differently from the
  * expensive ones" by differencing the two arms' quantile functions at
  * each decile. An experiment that lifts the median while cratering the
  * p90 looks flat in the mean and screams here.
  *
  * Scale shape: one ranking window per arm (partitioned, not global),
  * then a 9-row decile join — order statistics are exact ceiling-rank
  * picks, integer-deterministic in both engines.
  */
object QteOps {

  /** Per-decile QTE of o_totalprice between customer-parity arms:
    * q_treat(τ) − q_ctrl(τ) for τ = 0.1 … 0.9, with the relative
    * effect and a flag for deciles where the effect sign differs from
    * the median's — the "distribution moved non-uniformly" signal. */
  val q406QuantileEffects: QueryDef = QueryDef(
    "q406_quantile_effects",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .withColumn("arm", pmod(col("o_custkey"), lit(2L)))
        .select(col("arm"), col("o_orderkey").as("ok"),
          col("o_totalprice").as("v"))
      val wArm = Window.partitionBy(col("arm"))
        .orderBy(col("v"), col("ok"))
      val ranked = o
        .withColumn("rk", row_number().over(wArm).cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("arm"))))
      val taus = o.sparkSession.createDataFrame(
        (1 to 9).map(k => Tuple1(k / 10.0))).toDF("tau")
      val qs = ranked.crossJoin(broadcast(taus))
        .where(col("rk") === ceil(col("tau") * col("n")).cast("long"))
        .select(col("arm"), col("tau"), col("v"))
      val wide = qs.groupBy(col("tau"))
        .agg(sum(when(col("arm") === 0, col("v"))).as("q_ctrl"),
          sum(when(col("arm") === 1, col("v"))).as("q_treat"))
        .withColumn("qte", round(col("q_treat") - col("q_ctrl"), 4))
        .withColumn("qte_rel",
          round((col("q_treat") - col("q_ctrl")) / col("q_ctrl"), 6))
      val medianSign = wide.where(col("tau") === 0.5)
        .select(signum(col("qte")).as("med_sign"))
      wide.crossJoin(broadcast(medianSign))
        .withColumn("sign_flip",
          signum(col("qte")) =!= col("med_sign"))
        .select(col("tau"), round(col("q_ctrl"), 2).as("q_ctrl"),
          round(col("q_treat"), 2).as("q_treat"), col("qte"),
          col("qte_rel"), col("sign_flip"))
        .orderBy(col("tau"))
    },
    Some("""WITH o AS (SELECT o_custkey % 2 AS arm, o_orderkey AS ok,
          o_totalprice AS v
        FROM orders),
      ranked AS (SELECT *,
          CAST(ROW_NUMBER() OVER (PARTITION BY arm ORDER BY v, ok) AS BIGINT)
            AS rk,
          COUNT(*) OVER (PARTITION BY arm) AS n
        FROM o),
      taus AS (SELECT UNNEST([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
        0.9]::DOUBLE[]) AS tau),
      qs AS (SELECT r.arm, t.tau, r.v
        FROM ranked r CROSS JOIN taus t
        WHERE r.rk = CAST(ceil(t.tau * r.n) AS BIGINT)),
      wide AS (SELECT tau,
          SUM(CASE WHEN arm = 0 THEN v END) AS q_ctrl,
          SUM(CASE WHEN arm = 1 THEN v END) AS q_treat
        FROM qs GROUP BY 1),
      eff AS (SELECT tau, q_ctrl, q_treat,
          round(q_treat - q_ctrl, 4) AS qte,
          round((q_treat - q_ctrl) / q_ctrl, 6) AS qte_rel
        FROM wide),
      med AS (SELECT sign(qte) AS med_sign FROM eff WHERE tau = 0.5)
      SELECT tau, round(q_ctrl, 2) AS q_ctrl, round(q_treat, 2) AS q_treat,
        qte, qte_rel, sign(qte) <> (SELECT med_sign FROM med) AS sign_flip
      FROM eff ORDER BY tau"""))

  val all: Seq[QueryDef] = Seq(q406QuantileEffects)
}
