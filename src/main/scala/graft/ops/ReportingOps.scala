package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Reporting-surface completions: ordered string aggregation, unpivot
  * (wide→long), and gaps-and-islands over event days. */
object ReportingOps {

  /** Ordered string aggregation (LISTAGG): nations per region, sorted and
    * comma-joined. Spark has no ordered string_agg — the deterministic
    * equivalent is array_sort(collect_list(...)) then join, which keeps
    * the result independent of partitioning. */
  val q64StringAgg: QueryDef = QueryDef(
    "q64_string_agg",
    (s, dir) => {
      val t = Tables(s, dir)
      t.nation.join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name")))).as("nations"),
             count(lit(1)).as("n_nations"))
    },
    Some("""SELECT r_name,
        string_agg(n_name, ',' ORDER BY n_name) AS nations,
        COUNT(*) AS n_nations
      FROM nation JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1"""))

  /** Unpivot (wide → long): per-returnflag aggregates as (flag, metric,
    * value) rows via `stack` — the inverse of q43's pivot. Measures go
    * through DECIMAL before the unpivot so both engines emit identical
    * doubles. */
  val q65Unpivot: QueryDef = QueryDef(
    "q65_unpivot",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).cast("double").as("sum_qty"),
           sum(col("l_extendedprice").cast(DecimalType(18, 4))).cast("double").as("sum_price"))
      .selectExpr("l_returnflag",
        "stack(2, 'qty', sum_qty, 'price', sum_price) AS (metric, value)"),
    Some("""WITH w AS (SELECT l_returnflag,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY 1)
      SELECT l_returnflag, 'qty' AS metric, sum_qty AS value FROM w
      UNION ALL
      SELECT l_returnflag, 'price' AS metric, sum_price AS value FROM w"""))

  /** Gaps and islands: maximal runs of consecutive active days per user
    * (the row_number anchor-date trick — day minus rank is constant within
    * an island). One shuffle for the distinct days, one window, one
    * aggregate. */
  val q66ActivityIslands: QueryDef = QueryDef(
    "q66_activity_islands",
    (s, dir) => {
      val days = EventOps.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
      days.withColumn("rn", row_number().over(w))
        .withColumn("anchor", date_sub(col("day"), col("rn")))
        .groupBy(col("user_id"), col("anchor"))
        .agg(min(col("day")).as("island_start"),
             max(col("day")).as("island_end"),
             count(lit(1)).as("n_days"))
        .select(col("user_id"), col("island_start"), col("island_end"), col("n_days"))
    },
    Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      anchored AS (SELECT user_id, day,
          day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER) AS anchor
        FROM days)
      SELECT user_id, MIN(day) AS island_start, MAX(day) AS island_end,
        COUNT(*) AS n_days
      FROM anchored GROUP BY user_id, anchor"""))

  val all: Seq[QueryDef] = Seq(q64StringAgg, q65Unpivot, q66ActivityIslands)
}
