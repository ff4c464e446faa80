package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Series-catalog wave: per-nation seasonal-strength index (q468) and
  * the law-of-one-price dispersion audit (q469) — both CATALOG-shaped
  * operators: instead of one global answer they grade every entity's
  * series/market, the shape a 100 TB metrics warehouse actually needs
  * (q335's STL decomposes ONE series; q468 scores thousands; q143
  * audits join keys; q469 audits price integrity per product).
  *
  * Determinism: monthly revenues are exact DECIMAL sums; the seasonal
  * variance split is assembled from exact integer/decimal moments with
  * 9-dp rounding only at ratios; per-part unit prices round at 6 and
  * their moments ride scaled-long sums.
  *
  * Scale shape: everything stays keyed (nation / part) through
  * group-bys and keyed windows; the only global window is the final
  * decile ranking of the bounded report frames.
  */
object SeasonalCatalogOps {

  /** Per-nation seasonal strength: share of monthly-revenue variance
    * explained by the month-of-year means (1 − SS_resid/SS_total),
    * with each nation's peak month and its lift over the mean. */
  val q468SeasonalStrength: QueryDef = QueryDef(
    "q468_seasonal_strength",
    (s, dir) => {
      val t = Tables(s, dir)
      val monthly = t.orders
        .join(t.customer.select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("nk")), Seq("o_custkey"))
        .groupBy(col("nk"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("m"),
          month(col("o_orderdate")).cast("long").as("moy"))
        .agg((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast(DecimalType(18, 0)).cast("long").as("y"))
        .localCheckpoint() // totals pass + seasonal pass
      val d38 = DecimalType(38, 0)
      val tot = monthly.groupBy(col("nk"))
        .agg(count(lit(1)).as("n"),
          sum(col("y").cast(d38)).as("sy"),
          sum((col("y").cast(DecimalType(19, 0)) *
            col("y").cast(DecimalType(19, 0))).cast(d38)).as("syy"))
      // month-of-year cells: within-cell sums give the seasonal SS split
      val cells = monthly.groupBy(col("nk"), col("moy"))
        .agg(count(lit(1)).as("nc"), sum(col("y").cast(d38)).as("syc"))
        .withColumn("cellterm", round(
          col("syc").cast("double") * col("syc").cast("double") / col("nc"),
          2))
        .groupBy(col("nk"))
        .agg(sum(col("cellterm").cast(DecimalType(38, 2))).as("ssb_raw"),
          max(struct(round(col("syc").cast("double") / col("nc"), 4)
            .as("cellmean"), col("moy"))).as("peak"))
      tot.join(cells, Seq("nk"))
        // SS_between/SS_total on the centered series
        .withColumn("mu", col("sy").cast("double") / col("n"))
        .withColumn("sst",
          col("syy").cast("double") - col("n") * col("mu") * col("mu"))
        .withColumn("ssb",
          col("ssb_raw").cast("double") - col("n") * col("mu") * col("mu"))
        .withColumn("strength", round(col("ssb") / col("sst"), 6))
        .select(col("nk").cast("long").as("nation"), col("n").as("n_months"),
          col("strength"),
          col("peak.moy").as("peak_month"),
          round(col("peak.cellmean") / (col("mu") / 10000.0) / 10000.0, 4)
            .as("peak_lift"),
          (col("strength") > 0.5).as("strongly_seasonal"))
        .orderBy(col("nation"))
    },
    Some("""WITH monthly AS MATERIALIZED (SELECT cu.c_nationkey AS nk,
          CAST(EXTRACT(year FROM o.o_orderdate) * 12
            + EXTRACT(month FROM o.o_orderdate) - 1 AS BIGINT) AS m,
          CAST(EXTRACT(month FROM o.o_orderdate) AS BIGINT) AS moy,
          CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) * 100
            AS DECIMAL(18,0)) AS BIGINT) AS y
        FROM orders o JOIN customer cu ON cu.c_custkey = o.o_custkey
        GROUP BY 1, 2, 3),
      tot AS (SELECT nk, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(y AS DECIMAL(38,0))) AS sy,
          SUM(CAST(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))
            AS DECIMAL(38,0))) AS syy
        FROM monthly GROUP BY 1),
      cells0 AS (SELECT nk, moy, CAST(COUNT(*) AS BIGINT) AS nc,
          SUM(CAST(y AS DECIMAL(38,0))) AS syc
        FROM monthly GROUP BY 1, 2),
      cells AS (SELECT nk,
          SUM(CAST(round(CAST(syc AS DOUBLE) * CAST(syc AS DOUBLE) / nc, 2)
            AS DECIMAL(38,2))) AS ssb_raw,
          MAX({'cellmean': round(CAST(syc AS DOUBLE) / nc, 4), 'moy': moy})
            AS peak
        FROM cells0 GROUP BY 1),
      alg AS (SELECT t.nk, t.n, c.peak,
          CAST(t.sy AS DOUBLE) / t.n AS mu,
          CAST(t.syy AS DOUBLE)
            - t.n * (CAST(t.sy AS DOUBLE) / t.n)
              * (CAST(t.sy AS DOUBLE) / t.n) AS sst,
          CAST(c.ssb_raw AS DOUBLE)
            - t.n * (CAST(t.sy AS DOUBLE) / t.n)
              * (CAST(t.sy AS DOUBLE) / t.n) AS ssb
        FROM tot t JOIN cells c ON c.nk = t.nk)
      SELECT CAST(nk AS BIGINT) AS nation, n AS n_months,
        round(ssb / sst, 6) AS strength,
        peak['moy'] AS peak_month,
        round(peak['cellmean'] / (mu / 10000.0) / 10000.0, 4) AS peak_lift,
        (round(ssb / sst, 6) > 0.5) AS strongly_seasonal
      FROM alg ORDER BY nation"""))

  /** Law-of-one-price audit: per-part unit-price dispersion across its
    * line items, rolled into a decile report of the CV distribution
    * with the worst decile's census. */
  val q469PriceDispersion: QueryDef = QueryDef(
    "q469_price_dispersion",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_partkey").as("pk"),
          round(col("l_extendedprice") / col("l_quantity"), 6).as("unit"))
        .withColumn("u6", round(col("unit") * 1000000).cast("long"))
      val d38 = DecimalType(38, 0)
      val perPart = li.groupBy(col("pk"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("u6").cast(d38)).as("su"),
          sum((col("u6").cast(DecimalType(19, 0)) *
            col("u6").cast(DecimalType(19, 0))).cast(d38)).as("suu"))
        .where(col("n_lines") >= 2)
        .withColumn("mu", col("su").cast("double") / col("n_lines"))
        .withColumn("sd", sqrt(greatest(lit(0.0),
          col("suu").cast("double") / col("n_lines")
            - col("mu") * col("mu"))))
        .withColumn("cv", round(col("sd") / col("mu"), 9))
        .localCheckpoint() // decile window + report
      // size-adaptive deciles (r15): single-task sort while the part
      // census fits one task, range-partitioned spine past ~8M parts
      val dec = Spine.adaptiveNtile(perPart, Seq(col("cv"), col("pk")),
        10, "decile")
      dec.groupBy(col("decile"))
        .agg(count(lit(1)).as("n_parts"),
          round(min(col("cv")), 6).as("cv_min"),
          round(max(col("cv")), 6).as("cv_max"),
          round(avg(col("n_lines")), 2).as("avg_lines"))
        .orderBy(col("decile"))
    },
    Some("""WITH li AS (SELECT l_partkey AS pk,
          CAST(round(round(l_extendedprice / l_quantity, 6) * 1000000)
            AS BIGINT) AS u6
        FROM lineitem),
      perpart AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_lines,
          SUM(CAST(u6 AS DECIMAL(38,0))) AS su,
          SUM(CAST(CAST(u6 AS DECIMAL(19,0)) * CAST(u6 AS DECIMAL(19,0))
            AS DECIMAL(38,0))) AS suu
        FROM li GROUP BY 1 HAVING COUNT(*) >= 2),
      cvf AS (SELECT pk, n_lines,
          round(sqrt(GREATEST(0.0, CAST(suu AS DOUBLE) / n_lines
            - (CAST(su AS DOUBLE) / n_lines) * (CAST(su AS DOUBLE) / n_lines)))
            / (CAST(su AS DOUBLE) / n_lines), 9) AS cv
        FROM perpart),
      dec AS (SELECT *, CAST(NTILE(10) OVER (ORDER BY cv, pk) AS BIGINT)
          AS decile FROM cvf)
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_parts,
        round(MIN(cv), 6) AS cv_min, round(MAX(cv), 6) AS cv_max,
        round(AVG(n_lines), 2) AS avg_lines
      FROM dec GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(q468SeasonalStrength, q469PriceDispersion)
}
