package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val all: Seq[QueryDef] = Seq(q36GroupingSets, q37Percentiles, q38AnalyticWindows)
}
