package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Nonparametric-changepoint wave: the Pettitt test on daily revenue —
  * "WHERE did the distribution shift, and is the shift significant?"
  * answered on ranks. CUSUM (q130) needs a known baseline mean and
  * catches mean shifts; q408's breakpoint fits a parametric trend;
  * Pettitt is the assumption-free member: U_t is a running Mann–Whitney
  * of {1..t} vs {t+1..T}, the changepoint is argmax|U_t|, and the
  * significance is the closed-form p ≈ 2·exp(−6K²/(T³+T²)).
  *
  * Determinism: with 2·mid-ranks (the q412 idiom),
  * U_t = Σ_{i≤t} r2_i − t(T+1) is an exact integer for every prefix —
  * one rank window + one prefix-sum window, zero floating point until
  * the final p.
  *
  * Scale shape: the corpus collapses to the calendar-bounded spine; both
  * windows run on ~2 400 rows at any scale factor.
  */
object PettittOps {

  /** Pettitt changepoint on daily order revenue: the split day, K
    * statistic, approximate p, shift direction, and the pre/post mean
    * revenue levels. */
  val q422PettittChangepoint: QueryDef = QueryDef(
    "q422_pettitt_changepoint",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("yd"))
        .localCheckpoint() // rank pass + means pass
      val wAll = Window.partitionBy()
      val ranked = daily
        .withColumn("r2",
          (rank().over(Window.orderBy(col("yd"))) * 2 +
            count(lit(1)).over(Window.partitionBy(col("yd"))) - 1).cast("long"))
        .withColumn("tt", count(lit(1)).over(wAll))
        .withColumn("idx", row_number().over(Window.orderBy(col("t"))).cast("long"))
        .withColumn("u",
          sum(col("r2")).over(Window.orderBy(col("t"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)) -
            col("idx") * (col("tt") + 1))
      val best = ranked
        .where(col("idx") < col("tt")) // U_T = 0 by construction; exclude
        .withColumn("rn", row_number().over(
          Window.orderBy(abs(col("u")).desc, col("t"))))
        .where(col("rn") === 1)
        .select(col("t").as("t_star"), abs(col("u")).as("k_stat"),
          signum(col("u").cast("double")).cast("long").as("direction"),
          col("tt").as("n_days"))
        .localCheckpoint()
      val means = daily.crossJoin(broadcast(best.select(col("t_star"))))
        .groupBy()
        .agg(
          sum(when(col("t") <= col("t_star"), col("yd"))).as("s_pre"),
          sum(when(col("t") <= col("t_star"), 1L).otherwise(0L)).as("n_pre"),
          sum(when(col("t") > col("t_star"), col("yd"))).as("s_post"),
          sum(when(col("t") > col("t_star"), 1L).otherwise(0L)).as("n_post"))
      best.crossJoin(broadcast(means))
        .withColumn("p_approx", round(
          lit(2.0) * exp(lit(-6.0) * col("k_stat") * col("k_stat") /
            (col("n_days").cast("double") * col("n_days") * col("n_days") +
              col("n_days").cast("double") * col("n_days"))), 9))
        .withColumn("mean_pre",
          round(col("s_pre").cast("double") / col("n_pre"), 2))
        .withColumn("mean_post",
          round(col("s_post").cast("double") / col("n_post"), 2))
        .select(col("t_star"), col("k_stat"), col("direction"),
          col("n_days"), col("p_approx"), col("mean_pre"), col("mean_post"))
    },
    Some("""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS yd
        FROM orders GROUP BY 1),
      ranked AS (SELECT t, yd,
          CAST(RANK() OVER (ORDER BY yd) * 2
            + COUNT(*) OVER (PARTITION BY yd) - 1 AS BIGINT) AS r2,
          CAST(COUNT(*) OVER () AS BIGINT) AS tt,
          CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS idx
        FROM daily),
      pref AS (SELECT *,
          SUM(r2) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - idx * (tt + 1) AS u
        FROM ranked),
      best AS (SELECT t AS t_star, abs(u) AS k_stat,
          CAST(CASE WHEN u > 0 THEN 1 WHEN u < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS direction,
          tt AS n_days
        FROM pref WHERE idx < tt
        ORDER BY abs(u) DESC, t LIMIT 1),
      means AS (SELECT
          SUM(CASE WHEN d.t <= b.t_star THEN d.yd END) AS s_pre,
          CAST(SUM(CASE WHEN d.t <= b.t_star THEN 1 ELSE 0 END) AS BIGINT)
            AS n_pre,
          SUM(CASE WHEN d.t > b.t_star THEN d.yd END) AS s_post,
          CAST(SUM(CASE WHEN d.t > b.t_star THEN 1 ELSE 0 END) AS BIGINT)
            AS n_post
        FROM daily d, best b)
      SELECT b.t_star, CAST(b.k_stat AS BIGINT) AS k_stat, b.direction,
        b.n_days,
        round(2.0 * exp(-6.0 * b.k_stat * b.k_stat
          / (CAST(b.n_days AS DOUBLE) * b.n_days * b.n_days
            + CAST(b.n_days AS DOUBLE) * b.n_days)), 9) AS p_approx,
        round(CAST(m.s_pre AS DOUBLE) / m.n_pre, 2) AS mean_pre,
        round(CAST(m.s_post AS DOUBLE) / m.n_post, 2) AS mean_post
      FROM best b, means m"""))

  val all: Seq[QueryDef] = Seq(q422PettittChangepoint)
}
