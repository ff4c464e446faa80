package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multiple-testing wave: Benjamini–Hochberg FDR control across a
  * family of per-brand hypothesis tests — the correction layer any
  * metrics platform needs once it runs one test per segment per day.
  *
  * Scale shape: the corpus-sized work is a single lineitem⋈part scan
  * collapsed to one row per brand; the BH step-up walk runs on that
  * model-sized (≈25-row) frame with rank windows.
  */
object MultiTestOps {

  /** One-sample proportion z-test per brand (is this brand's
    * return-flag share different from the catalog-wide share?), then
    * the BH(α=0.10) step-up: sort the m p-values ascending, find the
    * largest k with p(k) ≤ k·α/m, reject hypotheses 1..k, and publish
    * the monotone adjusted p-values padj(k) = min_{j≥k} m·p(j)/j.
    * Φ(|z|) uses the Abramowitz–Stegun 26.2.17 polynomial on both
    * sides, so the two dialects compute bit-identical p-values up to
    * the shared round(…, 6). */
  val q390BhFdr: QueryDef = QueryDef(
    "q390_bh_fdr",
    (s, dir) => {
      val t = Tables(s, dir)
      val li = t.lineitem.join(
        t.part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      val per = li.groupBy(col("p_brand").as("brand"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("x"))
      val w = Window.partitionBy()
      val zed = per
        .withColumn("p0", sum(col("x")).over(w).cast("double") /
          sum(col("n")).over(w).cast("double"))
        .withColumn("m", count(lit(1)).over(w))
        .withColumn("phat", col("x").cast("double") / col("n"))
        .withColumn("z", (col("phat") - col("p0")) /
          sqrt(col("p0") * (lit(1.0) - col("p0")) / col("n")))
      // two-sided p via A&S 26.2.17: p = 2·φ(|z|)·Σ b_i t^i, t = 1/(1+0.2316419|z|)
      val az = abs(col("z"))
      val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
      val poly = tt * (lit(0.319381530) + tt * (lit(-0.356563782) +
        tt * (lit(1.781477937) + tt * (lit(-1.821255978) +
          tt * lit(1.330274429)))))
      val pv = zed.withColumn("pval",
        round(least(lit(1.0), lit(2.0) *
          exp(lit(-0.5) * az * az) / sqrt(lit(2.0) * lit(math.Pi)) * poly),
          6))
      val wRank = Window.orderBy(col("pval"), col("brand"))
      val wSuffix = Window.orderBy(col("rank").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      pv
        .withColumn("rank", row_number().over(wRank).cast("long"))
        .withColumn("bh_threshold",
          round(col("rank").cast("double") * lit(0.10) / col("m"), 6))
        .withColumn("k_max", coalesce(
          max(when(col("pval") <= col("bh_threshold"), col("rank")))
            .over(Window.partitionBy()), lit(0L)))
        .withColumn("p_adj", round(least(lit(1.0),
          min(col("pval") * col("m").cast("double") / col("rank"))
            .over(wSuffix)), 6))
        .withColumn("rejected", col("rank") <= col("k_max"))
        .select(col("brand"), col("n"), col("x"),
          round(col("phat"), 6).as("phat"), round(col("z"), 6).as("z"),
          col("pval"), col("rank"), col("bh_threshold"), col("p_adj"),
          col("rejected"))
        .orderBy(col("rank"))
    },
    Some("""WITH per AS (SELECT p_brand AS brand,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1),
      zed AS (SELECT *,
          CAST(SUM(x) OVER () AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE) AS p0,
          COUNT(*) OVER () AS m,
          CAST(x AS DOUBLE) / n AS phat
        FROM per),
      zz AS (SELECT *, (phat - p0) / sqrt(p0 * (1.0 - p0) / n) AS z
        FROM zed),
      pv AS (SELECT *, round(least(1.0,
          2.0 * exp(-0.5 * abs(z) * abs(z)) / sqrt(2.0 * pi())
          * ((1.0 / (1.0 + 0.2316419 * abs(z))) * (0.319381530
            + (1.0 / (1.0 + 0.2316419 * abs(z))) * (-0.356563782
            + (1.0 / (1.0 + 0.2316419 * abs(z))) * (1.781477937
            + (1.0 / (1.0 + 0.2316419 * abs(z))) * (-1.821255978
            + (1.0 / (1.0 + 0.2316419 * abs(z))) * 1.330274429)))))), 6)
          AS pval
        FROM zz),
      rk AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY pval, brand) AS BIGINT)
          AS rank
        FROM pv),
      th AS (SELECT *, round(CAST(rank AS DOUBLE) * 0.10 / m, 6)
          AS bh_threshold FROM rk),
      km AS (SELECT *, COALESCE(MAX(CASE WHEN pval <= bh_threshold
            THEN rank END) OVER (), 0) AS k_max,
          round(least(1.0, MIN(pval * CAST(m AS DOUBLE) / rank)
            OVER (ORDER BY rank DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS p_adj
        FROM th)
      SELECT brand, n, x, round(phat, 6) AS phat, round(z, 6) AS z,
        pval, rank, bh_threshold, p_adj, rank <= k_max AS rejected
      FROM km ORDER BY rank"""))

  val all: Seq[QueryDef] = Seq(q390BhFdr)
}
