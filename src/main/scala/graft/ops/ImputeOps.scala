package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** k-NN imputation audit — hold out a deterministic ~2% of lineitem
  * quantities, impute each from its k nearest DONOR neighbors, and
  * report per-year MAE/bias: the standing data-quality experiment a
  * feature-store team runs before trusting an imputation rule
  * (reference: overseer's quality/repair family,
  * doc/guide/Introduction.md:3). "Nearest" is 1-D: within the
  * same ship DATE, the ≤8 rows on each side by extended price — the
  * sort-window kNN that needs NO pairwise distance join. The holdout
  * coin is the house md5 convention, so both engines hold out the
  * identical rows.
  *
  * Scale shape: ONE shuffle (by ship date — ~2,500 blocks, each
  * independently sorted) and one window pass; the classic trap here is
  * the O(n²) per-block distance join, which this plan replaces with
  * sort + frame. Donor sums/counts are conditional window aggregates
  * inside the same frame, so holdout rows never contaminate each other.
  * Per-year rollup is a 7-row hash agg.
  *
  * Exactness: quantities are milli-units (BIGINT); the imputed value is
  * BIGINT floor-division (donor_sum*1000 DIV donor_cnt — both engines
  * floor on positives), so per-row errors are exact integers and the
  * year MAE is one BIGINT sum divided once at the surface. No float
  * accumulation anywhere.
  */
object ImputeOps {

  private val K = 8 // neighbors per side
  private val MaxHash = 1152921504606846976.0 // 2^60

  val q497KnnImpute: QueryDef = QueryDef(
    "q497_knn_impute",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_orderkey"), col("l_linenumber"), col("l_shipdate"),
          floor(col("l_extendedprice") * 100 + lit(0.5)).cast("long")
            .as("price_c"),
          floor(col("l_quantity") * 1000 + lit(0.5)).cast("long")
            .as("qty_m"))
        .withColumn("u",
          (conv(substring(md5(concat(col("l_orderkey").cast("string"),
            lit("_"), col("l_linenumber").cast("string"))), 1, 15), 16, 10)
            .cast("double") + 1.0) / MaxHash)
        .withColumn("holdout", col("u") < lit(0.02))
      val w = Window.partitionBy(to_date(col("l_shipdate")))
        .orderBy(col("price_c"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-K, K)
      val imputed = li
        .withColumn("donor_sum",
          sum(when(!col("holdout"), col("qty_m")).otherwise(lit(0L))).over(w))
        .withColumn("donor_cnt",
          sum(when(!col("holdout"), lit(1L)).otherwise(lit(0L))).over(w))
        .where(col("holdout") && col("donor_cnt") > 0)
        .select(year(col("l_shipdate")).cast("long").as("ship_year"),
          expr("donor_sum * 1000 DIV donor_cnt").as("imp_milli_k"),
          (col("qty_m") * 1000).as("true_milli_k"))
      imputed
        .groupBy(col("ship_year"))
        .agg(count(lit(1)).as("n_imputed"),
          sum(abs(col("imp_milli_k") - col("true_milli_k"))).as("abs_err"),
          sum(col("imp_milli_k") - col("true_milli_k")).as("sgn_err"))
        .select(col("ship_year"), col("n_imputed"),
          round(col("abs_err").cast("double") /
            (col("n_imputed").cast("double") * 1e6), 4).as("mae_units"),
          round(col("sgn_err").cast("double") /
            (col("n_imputed").cast("double") * 1e6), 4).as("bias_units"))
        .orderBy(col("ship_year"))
    },
    Some(s"""WITH li AS (
        SELECT l_orderkey, l_linenumber, l_shipdate,
          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
          CAST(floor(l_quantity * 1000 + 0.5) AS BIGINT) AS qty_m,
          (('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
            CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT + 1.0) /
            $MaxHash < 0.02 AS holdout
        FROM lineitem),
      framed AS (
        SELECT l_shipdate, qty_m, holdout,
          SUM(CASE WHEN NOT holdout THEN qty_m ELSE 0 END) OVER w
            AS donor_sum,
          SUM(CASE WHEN NOT holdout THEN 1 ELSE 0 END) OVER w AS donor_cnt
        FROM li
        WINDOW w AS (PARTITION BY CAST(l_shipdate AS DATE)
          ORDER BY price_c, l_orderkey, l_linenumber
          ROWS BETWEEN $K PRECEDING AND $K FOLLOWING)),
      errs AS (
        SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
          donor_sum * 1000 // donor_cnt AS imp_milli_k,
          qty_m * 1000 AS true_milli_k
        FROM framed WHERE holdout AND donor_cnt > 0)
      SELECT ship_year, CAST(COUNT(*) AS BIGINT) AS n_imputed,
        round(CAST(SUM(abs(imp_milli_k - true_milli_k)) AS DOUBLE) /
          (CAST(COUNT(*) AS DOUBLE) * 1e6), 4) AS mae_units,
        round(CAST(SUM(imp_milli_k - true_milli_k) AS DOUBLE) /
          (CAST(COUNT(*) AS DOUBLE) * 1e6), 4) AS bias_units
      FROM errs GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(q497KnnImpute)
}
