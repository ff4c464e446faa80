package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Allocation wave: Neyman-optimal stratified sample allocation
  * (Neyman 1934) — given a fixed label/annotation budget, allocate it
  * across strata ∝ N_h·σ_h rather than ∝ N_h: heterogeneous strata get
  * more, homogeneous strata get less, and the stratified-mean variance
  * provably drops. The integerization uses the largest-remainder
  * method, deterministically tie-broken, so both engines allocate the
  * identical counts. Completes the sampling family: q77/q139 stratified
  * quotas, q407 PPS draws — this one chooses the quotas optimally.
  *
  * Scale shape: one scan to per-stratum (N, Σy, Σy²); everything else
  * is the |strata|-row frame.
  */
object NeymanOps {

  private val Budget = 1000L

  /** Per-priority allocation of a 1000-row budget: proportional vs
    * Neyman counts, the variance of the stratified mean under each,
    * and the variance reduction. σ_h is the population sd from exact
    * DECIMAL moments. */
  val q410NeymanAllocation: QueryDef = QueryDef(
    "q410_neyman_allocation",
    (s, dir) => {
      val st = Tables(s, dir).orders
        .groupBy(col("o_orderpriority").as("stratum"))
        .agg(count(lit(1)).cast("long").as("nh"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).as("sy"),
          sum((col("o_totalprice").cast(DecimalType(18, 2)) *
            col("o_totalprice").cast(DecimalType(18, 2)))
            .cast(DecimalType(38, 4))).as("syy"))
        .withColumn("sigma", sqrt(
          (col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double") / col("nh"))
            / col("nh")))
      val w = Window.partitionBy()
      val weights = st
        .withColumn("n_tot", sum(col("nh")).over(w))
        .withColumn("ns_tot", sum(round(col("nh") * col("sigma"), 6)
          .cast(DecimalType(28, 6))).over(w).cast("double"))
        .withColumn("w_prop", col("nh").cast("double") / col("n_tot"))
        .withColumn("w_ney",
          round(col("nh") * col("sigma"), 6) / col("ns_tot"))
      // largest-remainder integerization of Budget × weight
      def allocate(df: org.apache.spark.sql.DataFrame, wCol: String,
          outCol: String) = {
        val withBase = df.withColumn(s"${outCol}_base", floor(col(wCol) * Budget).cast("long"))
          .withColumn(s"${outCol}_frac", col(wCol) * Budget - floor(col(wCol) * Budget))
        val rem = withBase
          .withColumn("rem_tot", lit(Budget) - sum(col(s"${outCol}_base")).over(w))
          .withColumn("frac_rank", row_number().over(
            Window.orderBy(col(s"${outCol}_frac").desc, col("stratum"))).cast("long"))
        rem.withColumn(outCol,
          col(s"${outCol}_base") +
            when(col("frac_rank") <= col("rem_tot"), 1L).otherwise(0L))
          .drop(s"${outCol}_base", s"${outCol}_frac", "rem_tot", "frac_rank")
      }
      val alloc = allocate(allocate(weights, "w_prop", "n_prop"),
        "w_ney", "n_ney")
      alloc
        .withColumn("var_prop", round(sum(
          round(col("w_prop") * col("w_prop") * col("sigma") * col("sigma")
            / col("n_prop"), 6).cast(DecimalType(28, 6))).over(w)
          .cast("double"), 4))
        .withColumn("var_ney", round(sum(
          round(col("w_prop") * col("w_prop") * col("sigma") * col("sigma")
            / col("n_ney"), 6).cast(DecimalType(28, 6))).over(w)
          .cast("double"), 4))
        .withColumn("var_reduction",
          round(lit(1.0) - col("var_ney") / col("var_prop"), 6))
        .select(col("stratum"), col("nh"), round(col("sigma"), 4).as("sigma"),
          col("n_prop"), col("n_ney"), col("var_prop"), col("var_ney"),
          col("var_reduction"))
        .orderBy(col("stratum"))
    },
    Some(s"""WITH st AS (SELECT o_orderpriority AS stratum,
          CAST(COUNT(*) AS BIGINT) AS nh,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sy,
          SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2))
            * CAST(o_totalprice AS DECIMAL(18,2)) AS DECIMAL(38,4))) AS syy
        FROM orders GROUP BY 1),
      sig AS (SELECT stratum, nh,
          sqrt((CAST(syy AS DOUBLE)
            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / nh) / nh) AS sigma
        FROM st),
      wts AS (SELECT *,
          SUM(nh) OVER () AS n_tot,
          CAST(SUM(CAST(round(nh * sigma, 6) AS DECIMAL(28,6))) OVER ()
            AS DOUBLE) AS ns_tot
        FROM sig),
      ww AS (SELECT *, CAST(nh AS DOUBLE) / n_tot AS w_prop,
          round(nh * sigma, 6) / ns_tot AS w_ney
        FROM wts),
      ap AS (SELECT *,
          CAST(floor(w_prop * $Budget) AS BIGINT) AS pb,
          w_prop * $Budget - floor(w_prop * $Budget) AS pf,
          CAST(floor(w_ney * $Budget) AS BIGINT) AS yb,
          w_ney * $Budget - floor(w_ney * $Budget) AS yf
        FROM ww),
      ar AS (SELECT *,
          $Budget - SUM(pb) OVER () AS prem,
          ROW_NUMBER() OVER (ORDER BY pf DESC, stratum) AS prk,
          $Budget - SUM(yb) OVER () AS yrem,
          ROW_NUMBER() OVER (ORDER BY yf DESC, stratum) AS yrk
        FROM ap),
      al AS (SELECT *,
          pb + CASE WHEN prk <= prem THEN 1 ELSE 0 END AS n_prop,
          yb + CASE WHEN yrk <= yrem THEN 1 ELSE 0 END AS n_ney
        FROM ar)
      SELECT stratum, nh, round(sigma, 4) AS sigma,
        CAST(n_prop AS BIGINT) AS n_prop, CAST(n_ney AS BIGINT) AS n_ney,
        round(CAST(SUM(CAST(round(w_prop * w_prop * sigma * sigma / n_prop, 6)
          AS DECIMAL(28,6))) OVER () AS DOUBLE), 4) AS var_prop,
        round(CAST(SUM(CAST(round(w_prop * w_prop * sigma * sigma / n_ney, 6)
          AS DECIMAL(28,6))) OVER () AS DOUBLE), 4) AS var_ney,
        round(1.0 - round(CAST(SUM(CAST(round(w_prop * w_prop * sigma * sigma
            / n_ney, 6) AS DECIMAL(28,6))) OVER () AS DOUBLE), 4)
          / round(CAST(SUM(CAST(round(w_prop * w_prop * sigma * sigma
            / n_prop, 6) AS DECIMAL(28,6))) OVER () AS DOUBLE), 4), 6)
          AS var_reduction
      FROM al ORDER BY stratum"""))

  val all: Seq[QueryDef] = Seq(q410NeymanAllocation)
}
