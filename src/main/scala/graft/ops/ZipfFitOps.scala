package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** Zipf rank-frequency slope fit: OLS of ln(count) on ln(rank) over the
  * top-100 vocabulary ranks — the standard corpus-health diagnostic (a
  * natural corpus sits near slope −1; the synthetic word soup here is
  * much flatter, which is exactly what the fit should report).
  * Complements q563's Heaps fit: Zipf is the frequency view, Heaps the
  * growth view of the same corpus law pair (reference: overseer's
  * aggregate report family, doc/guide/Introduction.md:3).
  *
  * Scale shape: one token census; the global rank is a TakeOrdered
  * top-100 (never a full sort of the vocabulary); the OLS runs on 100
  * rows. At 100 TB the census is the only corpus-sized pass.
  *
  * Exactness: ln terms quantized round(·,12) and summed as
  * DECIMAL(28,12) (order-free); ranks are deterministic via the
  * (count DESC, token ASC) tiebreak; surfaced stats round 6.
  */
object ZipfFitOps {

  val q571ZipfSlope: QueryDef = QueryDef(
    "q571_zipf_slope",
    (s, dir) => {
      val census = Tables(s, dir).documents
        .select(explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      // bounded: top-100 ranks only — TakeOrdered, then a 100-row window
      val top = census.orderBy(col("c").desc, col("tok")).limit(100)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("c").desc, col("tok"))))
      val pts = top.select(
        round(log(col("rank").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("x"),
        round(log(col("c").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("y"),
        round(log(col("rank").cast("double"))
          * log(col("rank").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("xx"),
        round(log(col("rank").cast("double"))
          * log(col("c").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("xy"),
        round(log(col("c").cast("double"))
          * log(col("c").cast("double")), 12)
          .cast(DecimalType(28, 12)).as("yy"))
      pts.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("xx")).as("sxx"), sum(col("xy")).as("sxy"),
          sum(col("yy")).as("syy"))
        .select(col("n"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6)
            .as("slope"),
          round((col("sy").cast("double")
            - (col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
              / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * col("sx").cast("double")) / col("n").cast("double"), 6)
            .as("intercept"),
          round(pow((col("n") * col("sxy") - col("sx") * col("sy")).cast("double"), 2)
            / ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")
              * (col("n") * col("syy") - col("sy") * col("sy")).cast("double")), 6)
            .as("r2"))
    },
    Some("""WITH census AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS tok
              FROM documents) GROUP BY 1),
      top AS (
        SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank
        FROM census ORDER BY c DESC, tok LIMIT 100),
      pts AS (
        SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 12) AS DECIMAL(28,12)) AS x,
          CAST(round(ln(CAST(c AS DOUBLE)), 12) AS DECIMAL(28,12)) AS y,
          CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(rank AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS xx,
          CAST(round(ln(CAST(rank AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS xy,
          CAST(round(ln(CAST(c AS DOUBLE)) * ln(CAST(c AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS yy
        FROM top),
      agg AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
          SUM(xx) AS sxx, SUM(xy) AS sxy, SUM(yy) AS syy
        FROM pts)
      SELECT n,
        round(CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
        round((CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
          / CAST(n AS DOUBLE), 6) AS intercept,
        round(pow(CAST(n * sxy - sx * sy AS DOUBLE), 2)
          / (CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS r2
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(q571ZipfSlope)
}
