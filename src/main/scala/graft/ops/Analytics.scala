package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Second analytics batch: SQL-surface grouping sets, exact percentiles,
  * and the full analytic-window function family. */
object Analytics {

  private val M = DecimalType(18, 4)

  /** GROUPING SETS through the SQL surface (spark.sql over temp views) —
    * sets not expressible as rollup/cube alone. */
  val q36GroupingSets: QueryDef = QueryDef(
    "q36_grouping_sets",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n
        FROM lineitem_v GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))""")
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n
      FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""))

  /** Exact interpolated percentiles (type-7, same as DuckDB quantile_cont). */
  val q37Percentiles: QueryDef = QueryDef(
    "q37_percentiles",
    (s, dir) => Tables(s, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("percentile(o_totalprice, 0.25)").as("p25"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("percentile(o_totalprice, 0.75)").as("p75"),
        count(lit(1)).as("n")),
    Some("""SELECT o_orderpriority,
      quantile_cont(o_totalprice, 0.25) AS p25,
      quantile_cont(o_totalprice, 0.5) AS p50,
      quantile_cont(o_totalprice, 0.75) AS p75,
      COUNT(*) AS n
      FROM orders GROUP BY 1"""))

  /** Analytic window family: ntile, percent_rank, cume_dist, first_value,
    * lead — over a deterministic total order per partition. */
  val q38AnalyticWindows: QueryDef = QueryDef(
    "q38_analytic_windows",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      Tables(s, dir).orders.select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"),
        first(col("o_orderkey")).over(w).as("first_ok"),
        lead(col("o_orderkey"), 1).over(w).as("next_ok"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice,
      CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
      PERCENT_RANK() OVER w AS prank,
      CUME_DIST() OVER w AS cdist,
      FIRST_VALUE(o_orderkey) OVER w AS first_ok,
      LEAD(o_orderkey, 1) OVER w AS next_ok
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)"""))

  /** Moment statistics computed from DECIMAL-exact power sums: stddev and
    * correlation are order-dependent when accumulated in floating point
    * (Welford/naive both), so the engine-portable form is exact Σx, Σx²,
    * Σxy folded once, then the closed-form moments in double — identical
    * bits on any partitioning and any engine. */
  val q54MomentStats: QueryDef = QueryDef(
    "q54_moment_stats",
    (s, dir) => {
      val sq  = sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double")
      val sqq = sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(22, 8))).cast("double")
      val sp  = sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double")
      val spp = sum((col("l_extendedprice") * col("l_extendedprice")).cast(DecimalType(30, 8))).cast("double")
      val sqp = sum((col("l_quantity") * col("l_extendedprice")).cast(DecimalType(30, 8))).cast("double")
      val n   = count(lit(1)).cast("double")
      Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          (sq / n).as("mean_qty"),
          sqrt((sqq - sq * sq / n) / (n - lit(1.0))).as("std_qty"),
          // the power sums reach ~1e13 where DuckDB's decimal→double path
          // can differ from the JVM's by 1 ulp — round the final statistic
          round((n * sqp - sq * sp) /
            (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 9).as("corr_qty_price"))
    },
    Some("""SELECT l_returnflag, COUNT(*) AS n,
      (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) AS mean_qty,
      sqrt((CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(22,8))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
              * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE) - 1.0)) AS std_qty,
      round(
        (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity*l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)
         - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
           * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE))
        / (sqrt(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_quantity*l_quantity AS DECIMAL(22,8))) AS DOUBLE)
                - CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  * CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE))
           * sqrt(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(l_extendedprice*l_extendedprice AS DECIMAL(30,8))) AS DOUBLE)
                  - CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                    * CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE))),
        9) AS corr_qty_price
      FROM lineitem GROUP BY 1"""))

  /** Catalog statistics collection (the ANALYZE TABLE pass): per column —
    * row count, exact NDV, null count, numeric min/max. These are the
    * numbers a cost-based optimizer joins/reorders by and a 100 TB
    * deployment refreshes after every load; each table contributes ONE
    * single-pass aggregate (all of its columns' stats computed together,
    * then unpivoted via stack), so the whole query reads each table once.
    */
  val q116TableStats: QueryDef = QueryDef(
    "q116_table_stats",
    (s, dir) => {
      val t = Tables(s, dir)
      def stats(df: org.apache.spark.sql.DataFrame, table: String,
                cols: Seq[String]): org.apache.spark.sql.DataFrame = {
        val aggs = cols.flatMap { c =>
          Seq(count(col(c)).as(s"${c}__cnt"),
              countDistinct(col(c)).as(s"${c}__ndv"),
              sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
              min(col(c)).cast("double").as(s"${c}__min"),
              max(col(c)).cast("double").as(s"${c}__max"))
        }
        val stacked = cols.map(c =>
          s"'$table', '$c', ${c}__cnt, ${c}__ndv, ${c}__nulls, ${c}__min, ${c}__max")
          .mkString(", ")
        df.agg(aggs.head, aggs.tail: _*)
          .selectExpr(s"""stack(${cols.size}, $stacked)
            AS (table_name, column_name, n_values, ndv, n_nulls, min_d, max_d)""")
      }
      stats(t.orders, "orders", Seq("o_orderkey", "o_custkey", "o_totalprice"))
        .unionByName(stats(t.lineitem, "lineitem",
          Seq("l_quantity", "l_extendedprice", "l_partkey")))
        .unionByName(stats(t.documents, "documents", Seq("doc_id", "n_chars")))
        .unionByName(stats(EventOps.events(s, dir), "events",
          Seq("user_id", "value")))
    },
    Some("""SELECT 'orders' AS table_name, col AS column_name, n_values, ndv, n_nulls, min_d, max_d
      FROM (
        SELECT unnest(['o_orderkey','o_custkey','o_totalprice']) AS col,
          unnest([COUNT(o_orderkey), COUNT(o_custkey), COUNT(o_totalprice)]) AS n_values,
          unnest([COUNT(DISTINCT o_orderkey), COUNT(DISTINCT o_custkey), COUNT(DISTINCT o_totalprice)]) AS ndv,
          unnest([COUNT(*) - COUNT(o_orderkey), COUNT(*) - COUNT(o_custkey), COUNT(*) - COUNT(o_totalprice)]) AS n_nulls,
          unnest([CAST(MIN(o_orderkey) AS DOUBLE), CAST(MIN(o_custkey) AS DOUBLE), CAST(MIN(o_totalprice) AS DOUBLE)]) AS min_d,
          unnest([CAST(MAX(o_orderkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)]) AS max_d
        FROM orders)
      UNION ALL
      SELECT 'lineitem', col, n_values, ndv, n_nulls, min_d, max_d FROM (
        SELECT unnest(['l_quantity','l_extendedprice','l_partkey']) AS col,
          unnest([COUNT(l_quantity), COUNT(l_extendedprice), COUNT(l_partkey)]) AS n_values,
          unnest([COUNT(DISTINCT l_quantity), COUNT(DISTINCT l_extendedprice), COUNT(DISTINCT l_partkey)]) AS ndv,
          unnest([COUNT(*) - COUNT(l_quantity), COUNT(*) - COUNT(l_extendedprice), COUNT(*) - COUNT(l_partkey)]) AS n_nulls,
          unnest([CAST(MIN(l_quantity) AS DOUBLE), CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MIN(l_partkey) AS DOUBLE)]) AS min_d,
          unnest([CAST(MAX(l_quantity) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE), CAST(MAX(l_partkey) AS DOUBLE)]) AS max_d
        FROM lineitem)
      UNION ALL
      SELECT 'documents', col, n_values, ndv, n_nulls, min_d, max_d FROM (
        SELECT unnest(['doc_id','n_chars']) AS col,
          unnest([COUNT(doc_id), COUNT(n_chars)]) AS n_values,
          unnest([COUNT(DISTINCT doc_id), COUNT(DISTINCT n_chars)]) AS ndv,
          unnest([COUNT(*) - COUNT(doc_id), COUNT(*) - COUNT(n_chars)]) AS n_nulls,
          unnest([CAST(MIN(doc_id) AS DOUBLE), CAST(MIN(n_chars) AS DOUBLE)]) AS min_d,
          unnest([CAST(MAX(doc_id) AS DOUBLE), CAST(MAX(n_chars) AS DOUBLE)]) AS max_d
        FROM documents)
      UNION ALL
      SELECT 'events', col, n_values, ndv, n_nulls, min_d, max_d FROM (
        SELECT unnest(['user_id','value']) AS col,
          unnest([COUNT(user_id), COUNT(value)]) AS n_values,
          unnest([COUNT(DISTINCT user_id), COUNT(DISTINCT value)]) AS ndv,
          unnest([COUNT(*) - COUNT(user_id), COUNT(*) - COUNT(value)]) AS n_nulls,
          unnest([CAST(MIN(user_id) AS DOUBLE), CAST(MIN(value) AS DOUBLE)]) AS min_d,
          unnest([CAST(MAX(user_id) AS DOUBLE), CAST(MAX(value) AS DOUBLE)]) AS max_d
        FROM events)"""))

  /** Robust outlier gate via MAD (median absolute deviation): per event
    * type, the median value, the MAD, and how many events sit more than
    * 5 MADs from the median. Unlike a z-score (q99's shape), median/MAD
    * are robust to the very outliers being hunted. Two exact-percentile
    * aggregations with a broadcast join back between them — at scale the
    * per-group medians are exact single-pass sorts within hash groups,
    * and the deviation pass is a projection. Exact interpolated
    * percentile ≡ DuckDB quantile_cont (q37's proven parity).
    */
  val q124MadOutliers: QueryDef = QueryDef(
    "q124_mad_outliers",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("event_type"), col("value"))
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = ev.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy(col("event_type"))
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(first(col("med")).as("med_v"),
             first(col("mad")).as("mad_v"),
             sum(when(col("adev") > col("mad") * 5.0, 1L).otherwise(0L))
               .cast("long").as("n_outliers"))
        .select(col("event_type"), round(col("med_v"), 6).as("med"),
                round(col("mad_v"), 6).as("mad"), col("n_outliers"))
    },
    Some("""WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY 1),
      dev AS (
        SELECT e.event_type, e.value, med.med,
          abs(e.value - med.med) AS adev
        FROM events e JOIN med ON e.event_type = med.event_type),
      mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY 1)
      SELECT dev.event_type, round(MIN(dev.med), 6) AS med,
        round(MIN(mad.mad), 6) AS mad,
        CAST(COUNT(*) FILTER (WHERE dev.adev > mad.mad * 5.0) AS BIGINT) AS n_outliers
      FROM dev JOIN mad ON dev.event_type = mad.event_type
      GROUP BY 1"""))

  /** Group-wise OLS trend fit: per nation, regress monthly revenue on the
    * month index (slope = revenue growth per month, via the normal
    * equations). The regression sums Σt, Σtt, Σy, Σty accumulate in exact
    * integer/DECIMAL just like q54's moments — partitioning-independent
    * and engine-identical — and only the final slope/intercept divisions
    * run in (mirrored) double. Shapes: two hash-aggs (monthly grain, then
    * per-nation fold) after broadcast dimension joins; the monthly frame
    * is |nations|×|months| rows at any fact scale.
    */
  val q125OlsTrend: QueryDef = QueryDef(
    "q125_ols_trend",
    (s, dir) => {
      val t = Tables(s, dir)
      val monthly = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .withColumn("tm",
          ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
            .cast("long"))
        .groupBy(col("n_name"), col("tm"))
        .agg(sum(col("o_totalprice").cast(M)).as("y"))
      monthly.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_months"),
             sum(col("tm")).as("st"),
             sum(col("tm") * col("tm")).as("stt"),
             sum(col("y")).cast("double").as("sy"),
             sum(col("tm") * col("y")).cast("double").as("sty"))
        .withColumn("slope", round(
          (col("n_months").cast("double") * col("sty") -
            col("st").cast("double") * col("sy")) /
          (col("n_months").cast("double") * col("stt").cast("double") -
            col("st").cast("double") * col("st").cast("double")), 6))
        .withColumn("intercept", round(
          (col("sy") - (col("n_months").cast("double") * col("sty") -
              col("st").cast("double") * col("sy")) /
            (col("n_months").cast("double") * col("stt").cast("double") -
              col("st").cast("double") * col("st").cast("double")) *
            col("st").cast("double")) / col("n_months").cast("double"), 6))
        .select(col("n_name"), col("n_months"), col("slope"), col("intercept"))
    },
    Some("""WITH monthly AS (
        SELECT n_name,
          CAST((EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
               + EXTRACT(MONTH FROM o_orderdate) - 1 AS BIGINT) AS tm,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS y
        FROM orders JOIN customer ON o_custkey = c_custkey
                    JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2),
      sums AS (
        SELECT n_name, COUNT(*) AS n_months,
          SUM(tm) AS st, SUM(tm * tm) AS stt,
          CAST(SUM(y) AS DOUBLE) AS sy,
          CAST(SUM(tm * y) AS DOUBLE) AS sty
        FROM monthly GROUP BY 1)
      SELECT n_name, n_months,
        round((CAST(n_months AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy) /
              (CAST(n_months AS DOUBLE) * CAST(stt AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 6) AS slope,
        round((sy - (CAST(n_months AS DOUBLE) * sty - CAST(st AS DOUBLE) * sy) /
              (CAST(n_months AS DOUBLE) * CAST(stt AS DOUBLE)
               - CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
              * CAST(st AS DOUBLE)) / CAST(n_months AS DOUBLE), 6) AS intercept
      FROM sums"""))

  /** Approximate quantiles (Greenwald-Khanna via `approx_percentile`)
    * validated against exact percentiles in the q35 idiom: the GK rank
    * guarantee (|rank(est) − ⌈p·n⌉| ≤ n/accuracy) is emitted as a boolean
    * by bracketing each estimate between the exact quantiles at p±10ε,
    * and the oracle pins the boolean to TRUE. At 100 TB the approx path
    * is the only viable one — GK summaries merge map-side in fixed space
    * while exact `percentile` buffers every value per group — so this
    * query IS the scale recipe, with the exact columns as its sf-small
    * certificate.
    */
  val q132ApproxQuantiles: QueryDef = QueryDef(
    "q132_approx_quantiles",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.99)").as("p99"),
        count(lit(1)).as("n"),
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("a50"),
        expr("approx_percentile(l_extendedprice, 0.99, 1000)").as("a99"),
        expr("percentile(l_extendedprice, 0.49)").as("lo50"),
        expr("percentile(l_extendedprice, 0.51)").as("hi50"),
        expr("percentile(l_extendedprice, 0.98)").as("lo99"),
        expr("percentile(l_extendedprice, 1.0)").as("hi99"))
      .select(col("l_returnflag"), col("p50"), col("p99"), col("n"),
        (col("a50") >= col("lo50") && col("a50") <= col("hi50"))
          .as("a50_in_bounds"),
        (col("a99") >= col("lo99") && col("a99") <= col("hi99"))
          .as("a99_in_bounds")),
    Some("""SELECT l_returnflag,
        quantile_cont(l_extendedprice, 0.5) AS p50,
        quantile_cont(l_extendedprice, 0.99) AS p99,
        COUNT(*) AS n,
        TRUE AS a50_in_bounds, TRUE AS a99_in_bounds
      FROM lineitem GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q36GroupingSets, q37Percentiles, q38AnalyticWindows, q54MomentStats,
    q116TableStats, q124MadOutliers, q125OlsTrend, q132ApproxQuantiles)
}
