package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Subquery patterns (scalar/correlated) through the SQL surface, plus the
  * generator (UDTF) wordcount — rounding out Catalyst's decorrelation and
  * explode paths. */
object Subqueries {

  private def viewName(dir: String, t: String) =
    t + "_sq_" + math.abs(dir.hashCode).toString

  /** Correlated scalar subquery (TPC-H Q17 shape): lineitems whose quantity
    * is below 20% of their part's average order quantity. Catalyst
    * decorrelates this into an aggregate + join — same plan a hand-written
    * join would give, but exercising the subquery path. */
  val q50CorrelatedSubquery: QueryDef = QueryDef(
    "q50_correlated_subquery",
    (s, dir) => {
      Tables(s, dir).lineitem.createOrReplaceTempView("li_sq")
      s.sql("""
        SELECT l_partkey,
          COUNT(*) AS n_small,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_revenue
        FROM li_sq outer_li
        WHERE l_quantity < (
          SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
          FROM li_sq inner_li WHERE inner_li.l_partkey = outer_li.l_partkey)
        GROUP BY l_partkey""")
    },
    Some("""SELECT l_partkey,
        COUNT(*) AS n_small,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS small_revenue
      FROM lineitem outer_li
      WHERE l_quantity < (
        SELECT 0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*))
        FROM lineitem inner_li WHERE inner_li.l_partkey = outer_li.l_partkey)
      GROUP BY l_partkey"""))

  /** Nested aggregation: each nation's best revenue month (aggregate of an
    * aggregate, with a window argmax over the inner result). */
  val q51BestMonthPerNation: QueryDef = QueryDef(
    "q51_best_month_per_nation",
    (s, dir) => {
      val t = Tables(s, dir)
      // pre-aggregate lineitem per orderkey before the fact-fact join:
      // the shuffle carries one decimal partial sum per order, not every
      // line item (decimal partials re-sum exactly — parity-safe)
      val perOrder = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(22, 8))).as("rev_dec"))
      val monthly = perOrder
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .agg(sum(col("rev_dec")).cast("double").as("revenue"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("n_name"))
        .orderBy(col("revenue").desc, col("month_start").asc)
      monthly.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("n_name"), col("month_start"), col("revenue"))
    },
    Some("""WITH monthly AS (
        SELECT n_name, CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
          CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(22,8))) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1, 2)
      SELECT n_name, month_start, revenue FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
          ORDER BY revenue DESC, month_start ASC) AS rn
        FROM monthly) WHERE rn = 1"""))

  /** Generator / UDTF path: explode document tokens to rows (wordcount),
    * top tokens by (count desc, token asc). */
  val q52Wordcount: QueryDef = QueryDef(
    "q52_wordcount",
    (s, dir) => Tables(s, dir).documents
      .select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(20),
    Some("""SELECT token, COUNT(*) AS n
      FROM (SELECT UNNEST(regexp_extract_all(lower(text), '\w+')) AS token FROM documents)
      GROUP BY 1 ORDER BY n DESC, token LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(q50CorrelatedSubquery, q51BestMonthPerNation, q52Wordcount)
}
