package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Paired-rank wave: Wilcoxon signed-rank test — the paired member of
  * the rank-test family (q362 Mann–Whitney is the unpaired 2-group,
  * q421 Kruskal–Wallis the k-group): "did per-customer spend shift
  * between eras?" on within-customer differences, free of the
  * normality assumption a paired t needs. Zero differences are dropped
  * (Wilcoxon's convention), ties get the exact Σ(t³−t) variance
  * deduction, and z carries the 0.5 continuity correction toward the
  * mean.
  *
  * Determinism: pre/post spends and their difference are exact DECIMAL
  * sums; mid-ranks are 2·rank integers (the q412 idiom) so W⁺ is exact
  * at half-unit resolution; all z algebra runs in double on identical
  * integer moments.
  *
  * Scale shape: one per-customer two-era aggregation, one global rank
  * window over |d|, one tie census — the report is 1 row.
  */
object WilcoxonOps {

  private val Split = "1998-04-01"

  /** Wilcoxon signed-rank on per-customer order spend, pre vs post
    * mid-1998 (the fixture midpoint): pair counts, W⁺/W⁻, exact tie-corrected z, 5% verdict. */
  val q430WilcoxonSignedRank: QueryDef = QueryDef(
    "q430_wilcoxon_signed_rank",
    (s, dir) => {
      val dec = DecimalType(18, 2)
      val pairs = Tables(s, dir).orders
        .groupBy(col("o_custkey").as("ck"))
        .agg(
          sum(when(col("o_orderdate") < lit(Split),
            col("o_totalprice").cast(dec))).as("pre"),
          sum(when(col("o_orderdate") >= lit(Split),
            col("o_totalprice").cast(dec))).as("post"))
        .where(col("pre").isNotNull && col("post").isNotNull)
        .withColumn("d", (col("post") - col("pre")).cast(DecimalType(19, 2)))
        .localCheckpoint() // rank pass + tie pass + report pass
      val nz = pairs.where(col("d") =!= 0)
        .withColumn("absd", abs(col("d")))
      val ranked = nz.withColumn("r2",
        (rank().over(Window.orderBy(col("absd"))) * 2 +
          count(lit(1)).over(Window.partitionBy(col("absd"))) - 1).cast("long"))
      val d38 = DecimalType(38, 0)
      val moments = ranked.agg(
        count(lit(1)).as("n_used"),
        sum(when(col("d") > 0, lit(1)).otherwise(lit(0))).as("n_pos"),
        sum(when(col("d") < 0, lit(1)).otherwise(lit(0))).as("n_neg"),
        sum(when(col("d") > 0, col("r2")).otherwise(lit(0)).cast(d38))
          .as("w2_pos"))
      val ties = nz.groupBy(col("absd")).agg(count(lit(1)).as("t"))
        .agg(sum((col("t") * col("t") * col("t") - col("t")).cast(d38))
          .as("tie3"))
      val zeroes = pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("d") === 0, lit(1)).otherwise(lit(0))).as("n_zero"))
      moments.crossJoin(broadcast(ties)).crossJoin(broadcast(zeroes))
        .withColumn("nn", col("n_used").cast("double"))
        .withColumn("w_plus", col("w2_pos").cast("double") / 2)
        .withColumn("w_neg",
          col("nn") * (col("nn") + 1) / 2 - col("w_plus"))
        .withColumn("mu", col("nn") * (col("nn") + 1) / 4)
        .withColumn("sigma", sqrt(
          col("nn") * (col("nn") + 1) * (col("nn") * 2 + 1) / 24
            - col("tie3").cast("double") / 48))
        .withColumn("z", round(
          (col("w_plus") - col("mu")
            - when(col("w_plus") > col("mu"), 0.5)
              .when(col("w_plus") < col("mu"), -0.5).otherwise(0.0))
            / col("sigma"), 6))
        .select(col("n_pairs"), col("n_zero").cast("long").as("n_zero"),
          col("n_used"), col("n_pos").cast("long").as("n_pos"),
          col("n_neg").cast("long").as("n_neg"),
          col("w_plus"), col("w_neg"), round(col("mu"), 2).as("mu"),
          round(col("sigma"), 6).as("sigma"), col("z"),
          (abs(col("z")) > 1.959963984540054).as("reject_5pct"))
    },
    Some(s"""WITH pairs AS (SELECT o_custkey AS ck,
          SUM(CASE WHEN o_orderdate < DATE '$Split'
            THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS pre,
          SUM(CASE WHEN o_orderdate >= DATE '$Split'
            THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS post
        FROM orders GROUP BY 1),
      d AS (SELECT ck, CAST(post - pre AS DECIMAL(19,2)) AS d
        FROM pairs WHERE pre IS NOT NULL AND post IS NOT NULL),
      nz AS (SELECT ck, d, abs(d) AS absd FROM d WHERE d <> 0),
      ranked AS (SELECT d,
          CAST(RANK() OVER (ORDER BY absd) * 2
            + COUNT(*) OVER (PARTITION BY absd) - 1 AS BIGINT) AS r2
        FROM nz),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_used,
          CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
          CAST(SUM(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg,
          SUM(CAST(CASE WHEN d > 0 THEN r2 ELSE 0 END AS DECIMAL(38,0)))
            AS w2_pos
        FROM ranked),
      ties AS (SELECT SUM(CAST(t * t * t - t AS DECIMAL(38,0))) AS tie3
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM nz GROUP BY absd)),
      zeroes AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
        FROM d),
      alg AS (SELECT *,
          CAST(n_used AS DOUBLE) AS nn,
          CAST(w2_pos AS DOUBLE) / 2 AS w_plus
        FROM m, ties, zeroes),
      alg2 AS (SELECT *,
          nn * (nn + 1) / 2 - w_plus AS w_neg,
          nn * (nn + 1) / 4 AS mu,
          sqrt(nn * (nn + 1) * (2 * nn + 1) / 24
            - CAST(tie3 AS DOUBLE) / 48) AS sigma
        FROM alg),
      alg3 AS (SELECT *,
          round((w_plus - mu - CASE WHEN w_plus > mu THEN 0.5
            WHEN w_plus < mu THEN -0.5 ELSE 0.0 END) / sigma, 6) AS z
        FROM alg2)
      SELECT n_pairs, n_zero, n_used, n_pos, n_neg, w_plus, w_neg,
        round(mu, 2) AS mu, round(sigma, 6) AS sigma, z,
        (abs(z) > 1.959963984540054) AS reject_5pct
      FROM alg3"""))

  val all: Seq[QueryDef] = Seq(q430WilcoxonSignedRank)
}
