package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Quantile-regression wave: τ-quantile price-per-unit curves fit as a
  * single-regressor quantile regression through the origin. For
  * y ≈ b·x the pinball-loss minimizer has a closed form — b*_τ is the
  * x-weighted τ-quantile of the unit ratios y/x (set the subgradient
  * Σ x·(τ − 1{y<bx}) to zero) — so the "fit" is one weighted order
  * statistic, not an iterative solver: the same
  * grid-free exactness q374 gets for isotonic via PAV. The optimality
  * certificate (pinball at b* vs at b*·(1∓1%)) is carried in the
  * output, q366-style.
  *
  * Scale shape: one sort per τ (melted into a single 3×|lineitem|
  * window pass) for the weighted quantile, one melted 9-combo
  * aggregation for the certificate — everything else is 3-row frames.
  */
object QuantRegOps {

  private val Taus = Seq(0.5, 0.9, 0.95)

  /** b*_τ for τ ∈ {0.5, 0.9, 0.95} on y = l_extendedprice, x =
    * l_quantity, with pinball losses at b* and at ±1% establishing
    * per-τ optimality. Ratio order ties break on (orderkey,
    * linenumber); quantity weights accumulate as exact longs. */
  val q399QuantileRegression: QueryDef = QueryDef(
    "q399_quantile_regression",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          col("l_quantity").cast("long").as("x"),
          col("l_extendedprice").cast(DecimalType(18, 2)).as("y"))
      val wTot = li.agg(sum(col("x"))).head().getLong(0)
      val taus = Taus.toDF("tau")
      // ONE global sort serves every tau: cumw is tau-independent, so the
      // melted 3× sort (first cut: 22.7 s at sf1) collapses to a single
      // cumulative pass + a broadcast tau fan-out picking min qualifying
      // cumw per tau (cumw strictly increases along the ratio order, so
      // min cumw ≡ the rank-1 row of the window form). Measured 22.7 → 7.6 s.
      // size-adaptive cumulative weights (r15): window while lineitem
      // fits one task, range-partitioned spine above; the probe is a
      // free parquet metadata count (|frame| ≡ |lineitem|)
      val ranked = Spine.adaptiveRank(
          li.withColumn("r", col("y").cast("double") / col("x").cast("double")),
          Seq(col("r"), col("ok"), col("ln")), Seq("x"),
          knownCount = Tables(s, dir).lineitem.count())
        .withColumnRenamed("cum_x", "cumw")
        .select(col("r"), col("cumw"))
        .localCheckpoint()
      val bstar = ranked.crossJoin(broadcast(taus))
        .where(col("cumw") >= col("tau") * lit(wTot.toDouble))
        .groupBy(col("tau"))
        .agg(min(struct(col("cumw"), col("r"))).as("m"))
        .select(col("tau"), col("m.r").as("b_star"))
      val mults = Seq(("at", 1.0), ("lo", 0.99), ("hi", 1.01))
        .toDF("which", "mult")
      val losses = li
        .crossJoin(broadcast(bstar.crossJoin(mults)))
        .withColumn("u", col("y").cast("double") -
          col("b_star") * col("mult") * col("x").cast("double"))
        .withColumn("term", round(col("u") *
          (col("tau") - when(col("u") < 0, 1.0).otherwise(0.0)), 6))
        .groupBy(col("tau"), col("which"))
        .agg(sum(col("term").cast(DecimalType(28, 6))).as("loss"))
        .groupBy(col("tau"))
        .agg(
          sum(when(col("which") === "at", col("loss"))).as("loss_at"),
          sum(when(col("which") === "lo", col("loss"))).as("loss_lo"),
          sum(when(col("which") === "hi", col("loss"))).as("loss_hi"))
      bstar.join(losses, Seq("tau"))
        .withColumn("is_optimal", col("loss_at") <= col("loss_lo") &&
          col("loss_at") <= col("loss_hi"))
        .select(col("tau"), round(col("b_star"), 6).as("b_star"),
          round(col("loss_at").cast("double"), 4).as("loss_at"),
          round(col("loss_lo").cast("double"), 4).as("loss_lo"),
          round(col("loss_hi").cast("double"), 4).as("loss_hi"),
          col("is_optimal"))
        .orderBy(col("tau"))
    },
    Some("""WITH li AS (SELECT l_orderkey AS ok, l_linenumber AS ln,
          CAST(l_quantity AS BIGINT) AS x,
          CAST(l_extendedprice AS DECIMAL(18,2)) AS y
        FROM lineitem),
      wt AS (SELECT CAST(SUM(x) AS BIGINT) AS w_tot FROM li),
      taus AS (SELECT UNNEST([0.5, 0.9, 0.95]::DOUBLE[]) AS tau),
      ratios AS (SELECT li.*, t.tau, CAST(y AS DOUBLE) / x AS r
        FROM li CROSS JOIN taus t),
      cum AS (SELECT *, SUM(x) OVER (PARTITION BY tau ORDER BY r, ok, ln
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
        FROM ratios),
      qual AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY tau
            ORDER BY r, ok, ln) AS rn
        FROM cum WHERE cumw >= tau * (SELECT w_tot FROM wt)),
      bstar AS (SELECT tau, r AS b_star FROM qual WHERE rn = 1),
      mults AS (SELECT * FROM (VALUES ('at', 1.0), ('lo', 0.99),
        ('hi', 1.01)) m(which, mult)),
      terms AS (SELECT b.tau, m.which,
          CAST(round((CAST(li.y AS DOUBLE) - b.b_star * m.mult * li.x)
            * (b.tau - CASE WHEN CAST(li.y AS DOUBLE)
                - b.b_star * m.mult * li.x < 0 THEN 1.0 ELSE 0.0 END), 6)
            AS DECIMAL(28,6)) AS term
        FROM li CROSS JOIN bstar b CROSS JOIN mults m),
      losses AS (SELECT tau,
          SUM(CASE WHEN which = 'at' THEN term END) AS loss_at,
          SUM(CASE WHEN which = 'lo' THEN term END) AS loss_lo,
          SUM(CASE WHEN which = 'hi' THEN term END) AS loss_hi
        FROM terms GROUP BY 1)
      SELECT b.tau, round(b.b_star, 6) AS b_star,
        round(CAST(l.loss_at AS DOUBLE), 4) AS loss_at,
        round(CAST(l.loss_lo AS DOUBLE), 4) AS loss_lo,
        round(CAST(l.loss_hi AS DOUBLE), 4) AS loss_hi,
        l.loss_at <= l.loss_lo AND l.loss_at <= l.loss_hi AS is_optimal
      FROM bstar b JOIN losses l USING (tau)
      ORDER BY tau"""))

  val all: Seq[QueryDef] = Seq(q399QuantileRegression)
}
