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

  /** Time-based window frame: 7-day rolling order revenue via RANGE
    * BETWEEN on a day number — the frame is defined by VALUE distance
    * (days), not row count, so gaps in the calendar shrink the window
    * rather than reaching further back.
    *
    * Scale note: the window is global (one ordered partition), fine here
    * because it runs over the DAILY aggregate — one row per calendar day,
    * thousands of rows regardless of fact-table size. Never put an
    * unpartitioned window over raw facts; aggregate to the window's time
    * grain first (as here) or partition by a coarser period and stitch
    * the 6-day boundary overlap. */
  val q67RollingRevenue: QueryDef = QueryDef(
    "q67_rolling_revenue",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("day_num"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev_dec"))
      val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
      daily
        .withColumn("rolling_7d", sum(col("rev_dec")).over(w).cast("double"))
        .select(col("day_num").cast("long").as("day_num"),
                col("rev_dec").cast("double").as("revenue"), col("rolling_7d"))
    },
    Some("""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev_dec
        FROM orders GROUP BY 1)
      SELECT day_num, CAST(rev_dec AS DOUBLE) AS revenue,
        CAST(SUM(rev_dec) OVER (ORDER BY day_num
          RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_7d
      FROM daily"""))

  /** Conditional aggregation (FILTER clause shape): one pass computing
    * differently-filtered aggregates side by side — the idiom that
    * replaces N self-joins in reporting queries. */
  val q68ConditionalAgg: QueryDef = QueryDef(
    "q68_conditional_agg",
    (s, dir) => Tables(s, dir).orders
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_total"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        count(when(col("o_totalprice") > 200000, 1)).as("n_large"),
        sum(when(col("o_orderstatus") === "F",
          col("o_totalprice").cast(DecimalType(18, 4))).otherwise(lit(0).cast(DecimalType(18, 4))))
          .cast("double").as("finished_value")),
    Some("""SELECT o_orderpriority,
        COUNT(*) AS n_total,
        COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
        COUNT(*) FILTER (WHERE o_totalprice > 200000) AS n_large,
        CAST(SUM(CASE WHEN o_orderstatus = 'F'
          THEN CAST(o_totalprice AS DECIMAL(18,4))
          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS finished_value
      FROM orders GROUP BY 1"""))

  /** The full ranking family in one window: rank (gapped), dense_rank
    * (gapless), ntile quartile — over supplier balances per nation. */
  val q69RankFamily: QueryDef = QueryDef(
    "q69_rank_family",
    (s, dir) => {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey").asc)
      Tables(s, dir).supplier
        .select(col("s_nationkey").as("nationkey"), col("s_suppkey").as("suppkey"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          ntile(4).over(w).cast("long").as("quartile"))
    },
    Some("""SELECT s_nationkey AS nationkey, s_suppkey AS suppkey,
        CAST(RANK() OVER w AS BIGINT) AS rnk,
        CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
        CAST(NTILE(4) OVER w AS BIGINT) AS quartile
      FROM supplier
      WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey)"""))

  /** Multiset (bag) set operations — INTERSECT ALL / EXCEPT ALL keep
    * duplicate cardinality, unlike their distinct counterparts in
    * q10_set_ops. Over per-order priority rows so duplicates are real. */
  val q70MultisetOps: QueryDef = QueryDef(
    "q70_multiset_ops",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val a = o.filter(col("o_totalprice") > 150000).select(col("o_orderpriority").as("prio"))
      val b = o.filter(col("o_orderstatus") === "F").select(col("o_orderpriority").as("prio"))
      a.intersectAll(b).groupBy(col("prio")).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("intersect_all"))
        .union(a.exceptAll(b).groupBy(col("prio")).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all")))
        .select(col("op"), col("prio"), col("n"))
    },
    Some("""WITH a AS (SELECT o_orderpriority AS prio FROM orders WHERE o_totalprice > 150000),
      b AS (SELECT o_orderpriority AS prio FROM orders WHERE o_orderstatus = 'F'),
      ia AS (SELECT prio FROM a INTERSECT ALL SELECT prio FROM b),
      ea AS (SELECT prio FROM a EXCEPT ALL SELECT prio FROM b)
      SELECT 'intersect_all' AS op, prio, COUNT(*) AS n FROM ia GROUP BY 2
      UNION ALL
      SELECT 'except_all' AS op, prio, COUNT(*) AS n FROM ea GROUP BY 2"""))

  /** Global multi-key sort with EXPLICIT null ordering. Spark defaults to
    * NULLS FIRST ascending, DuckDB to NULLS LAST — cross-engine-correct
    * SQL must always spell null placement out, which this query
    * demonstrates (nulls come from the left join's misses). */
  val q71SortedNulls: QueryDef = QueryDef(
    "q71_sorted_nulls",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.orders.filter(col("o_totalprice") > 450000)
        .groupBy(col("o_custkey")).agg(max(col("o_totalprice")).as("best_order"))
      t.customer.filter(col("c_custkey") < 200)
        .select(col("c_custkey"), col("c_nationkey").as("nationkey"))
        .join(big, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("nationkey"), col("best_order"))
        .orderBy(col("best_order").desc_nulls_last, col("c_custkey").asc)
        .limit(100)
    },
    Some("""SELECT c_custkey, c_nationkey AS nationkey, best_order
      FROM (SELECT c_custkey, c_nationkey FROM customer WHERE c_custkey < 200) c
      LEFT JOIN (SELECT o_custkey, MAX(o_totalprice) AS best_order
                 FROM orders WHERE o_totalprice > 450000 GROUP BY 1) o
        ON c_custkey = o_custkey
      ORDER BY best_order DESC NULLS LAST, c_custkey ASC
      LIMIT 100"""))

  /** Schema-evolution union: two sources with different column subsets
    * unioned BY NAME with missing columns null-filled — the data-lake
    * append pattern when a feed gains a column (positional UNION would
    * silently misalign). */
  val q72UnionByName: QueryDef = QueryDef(
    "q72_union_by_name",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val v1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val v2 = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
             count(col("o_totalprice")).as("n_with_price"),
             sum(coalesce(col("o_totalprice"), lit(0.0)).cast(DecimalType(18, 4)))
               .cast("double").as("total"))
    },
    Some("""WITH u AS (
        SELECT o_orderkey, o_orderpriority, NULL::DOUBLE AS o_totalprice
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, o_orderpriority, o_totalprice
        FROM orders WHERE o_orderkey % 2 = 1)
      SELECT o_orderpriority, COUNT(*) AS n,
        COUNT(o_totalprice) AS n_with_price,
        CAST(SUM(CAST(COALESCE(o_totalprice, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM u GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q64StringAgg, q65Unpivot, q66ActivityIslands,
    q67RollingRevenue, q68ConditionalAgg, q69RankFamily, q70MultisetOps,
    q71SortedNulls, q72UnionByName)
}
