package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Matching wave: nearest-neighbor covariate matching with replacement —
  * the third observational-causal estimator alongside IPS weighting
  * (q242) and stratification (q383): each treated unit is paired with
  * the control whose covariate is closest, and the ATT is the mean
  * paired difference. The matching itself is the scale-relevant part:
  * ONE interleaved sort + two IGNORE-NULLS window passes find every
  * treated unit's nearest control below and above — the as-of-join
  * shape (q118), never a treated×control pair join.
  *
  * Determinism: covariate and outcome are exact 2-dp values; distances
  * are exact double differences; the below/above choice ties toward the
  * lower covariate, then lower custkey.
  */
object MatchingOps {

  /** Match BUILDING-segment customers (treated) to nearest non-BUILDING
    * control on account balance; report ATT on total order revenue,
    * match-distance diagnostics, and control-reuse. */
  val q427NnMatching: QueryDef = QueryDef(
    "q427_nn_matching",
    (s, dir) => {
      val t = Tables(s, dir)
      val units = t.customer
        .select(col("c_custkey").as("ck"), col("c_acctbal").as("x"),
          (col("c_mktsegment") === "BUILDING").cast("int").as("z"))
        .join(t.orders.groupBy(col("o_custkey").as("ck"))
          .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("yd")),
          Seq("ck"), "left")
        .withColumn("y", coalesce(col("yd").cast("double"), lit(0.0)))
        .localCheckpoint() // sort pass + report pass
      val ctl = when(col("z") === 0,
        struct(col("x").as("cx"), col("ck").as("cck"), col("y").as("cy")))
      // nearest-control carries, size-adaptive (r15): running
      // last(ignoreNulls) windows at bench scale, the two-pass
      // range-partitioned carry above; probe scans the checkpoint once
      val nU = units.count()
      val paired = Spine.adaptiveCarry(
          Spine.adaptiveCarry(units.withColumn("__ctl", ctl),
            Seq(col("x"), col("ck")), "__ctl", "below", knownCount = nU),
          Seq(col("x").desc, col("ck").desc), "__ctl", "above",
          knownCount = nU)
        .drop("__ctl")
        .where(col("z") === 1)
        .withColumn("d_below", abs(col("x") - col("below.cx")))
        .withColumn("d_above", abs(col("x") - col("above.cx")))
        .withColumn("pick",
          when(col("below").isNotNull &&
            (col("above").isNull || col("d_below") <= col("d_above")),
            col("below")).otherwise(col("above")))
        .select(col("ck"), col("x"), col("y"),
          col("pick.cck").as("match_ck"), col("pick.cx").as("match_x"),
          col("pick.cy").as("match_y"))
        .withColumn("dist", abs(col("x") - col("match_x")))
        .localCheckpoint()
      val nCtl = units.where(col("z") === 0).count()
      val decD = DecimalType(28, 2)
      val ranked = paired
        .withColumn("rn", row_number().over(Window.orderBy(col("dist"), col("ck"))))
      val nT = paired.count()
      val quant = ranked
        .where(col("rn") === (nT + 1) / 2 || col("rn") === (nT * 9 + 9) / 10)
        .agg(min(col("dist")).as("p50_dist"), max(col("dist")).as("p90_dist"))
      paired.agg(
        count(lit(1)).as("n_treated"),
        sum((col("y") - col("match_y")).cast(decD)).as("sdiff"),
        sum(col("dist").cast(decD)).as("sdist"),
        countDistinct(col("match_ck")).as("n_controls_used"))
        .withColumn("att", round(col("sdiff").cast("double") / col("n_treated"), 4))
        .withColumn("mean_match_dist",
          round(col("sdist").cast("double") / col("n_treated"), 4))
        .withColumn("n_control", lit(nCtl))
        .crossJoin(broadcast(quant))
        .select(col("n_treated"), col("n_control"), col("att"),
          col("mean_match_dist"), col("p50_dist"), col("p90_dist"),
          col("n_controls_used"))
    },
    Some("""WITH units AS (SELECT c.c_custkey AS ck, c.c_acctbal AS x,
          CAST(c.c_mktsegment = 'BUILDING' AS INT) AS z,
          COALESCE(CAST(o.yd AS DOUBLE), 0.0) AS y
        FROM customer c LEFT JOIN (SELECT o_custkey,
            SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS yd
          FROM orders GROUP BY 1) o ON o.o_custkey = c.c_custkey),
      marked AS (SELECT *,
          CASE WHEN z = 0 THEN struct_pack(cx := x, cck := ck, cy := y) END
            AS ctl
        FROM units),
      win AS (SELECT *,
          LAST_VALUE(ctl IGNORE NULLS) OVER (ORDER BY x, ck
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS below,
          LAST_VALUE(ctl IGNORE NULLS) OVER (ORDER BY x DESC, ck DESC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS above
        FROM marked),
      paired AS (SELECT ck, x, y,
          CASE WHEN below IS NOT NULL AND (above IS NULL
              OR abs(x - below.cx) <= abs(x - above.cx))
            THEN below ELSE above END AS pick
        FROM win WHERE z = 1),
      p2 AS (SELECT ck, x, y, pick.cck AS match_ck, pick.cx AS match_x,
          pick.cy AS match_y, abs(x - pick.cx) AS dist
        FROM paired),
      nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_treated FROM p2),
      ranked AS (SELECT dist,
          ROW_NUMBER() OVER (ORDER BY dist, ck) AS rn FROM p2),
      quant AS (SELECT MIN(dist) AS p50_dist, MAX(dist) AS p90_dist
        FROM ranked, nt
        WHERE rn = (nt.n_treated + 1) // 2
          OR rn = (nt.n_treated * 9 + 9) // 10),
      rep AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_treated,
          SUM(CAST(y - match_y AS DECIMAL(28,2))) AS sdiff,
          SUM(CAST(dist AS DECIMAL(28,2))) AS sdist,
          CAST(COUNT(DISTINCT match_ck) AS BIGINT) AS n_controls_used
        FROM p2),
      nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_control FROM units
        WHERE z = 0)
      SELECT r.n_treated, nc.n_control,
        round(CAST(r.sdiff AS DOUBLE) / r.n_treated, 4) AS att,
        round(CAST(r.sdist AS DOUBLE) / r.n_treated, 4) AS mean_match_dist,
        q.p50_dist, q.p90_dist, r.n_controls_used
      FROM rep r, nc, quant q"""))

  val all: Seq[QueryDef] = Seq(q427NnMatching)
}
