package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Core relational operator inventory (SURVEY.md §2E: scan, project/filter,
  * the full join family, aggregation incl. rollup/cube, windows, sort/top-k,
  * set ops, scalar functions). Each query is the canonical Spark-first form:
  * declarative DataFrame plans that Catalyst turns into pushed-down scans,
  * broadcast/shuffle joins and partial aggregation.
  */
object Relational {

  private val M = DecimalType(18, 4)  // measures stored with ≤2 decimals
  private val P = DecimalType(22, 8)  // products of measures

  /** TPC-H Q1 shape — the partial-agg workhorse (SURVEY.md §7 phase 1).
    * At scale: map-side combine reduces each partition to ≤|groups| rows
    * before the 32-partition shuffle; no sort needed. */
  val q01PricingSummary: QueryDef = QueryDef(
    "q01_pricing_summary",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      li.filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity").cast(M)).cast("double").as("sum_qty"),
          sum(col("l_extendedprice").cast(M)).cast("double").as("sum_base_price"),
          // the 8-scale decimal sums cross 2^53 × 1e-8 around 1e8, where
          // DuckDB's int128→double and the JVM's BigDecimal→double round
          // differently by 1 ulp. Reduce to scale 4 via FLOOR in exact
          // decimal space — floor is tie-free (cast-to-decimal rounding
          // breaks .xxxx5000 ties differently across engines) — then the
          // scaled integer stays < 2^53 (exact double conversion both
          // sides) up to ~9e11, sf ≈ 30.
          (floor(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(P)) * 10000)
            .cast("double") / 1e4).as("sum_disc_price"),
          (floor(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).cast(P)) * 10000)
            .cast("double") / 1e4).as("sum_charge"),
          (sum(col("l_quantity").cast(M)).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(col("l_extendedprice").cast(M)).cast("double") / count(lit(1))).as("avg_price"),
          (sum(col("l_discount").cast(M)).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      CAST(FLOOR(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(22,8)))*10000) AS DOUBLE)/10000 AS sum_disc_price,
      CAST(FLOOR(SUM(CAST(l_extendedprice*(1.0-l_discount)*(1.0+l_tax) AS DECIMAL(22,8)))*10000) AS DOUBLE)/10000 AS sum_charge,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_price,
      CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)/COUNT(*) AS avg_disc,
      COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus"""))

  /** Global top-k: orderBy + limit plans as TakeOrderedAndProject — each
    * partition keeps only k rows, then the driver merges; no full sort. */
  val q02TopOrders: QueryDef = QueryDef(
    "q02_top_orders",
    (s, dir) => Tables(s, dir).orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""))

  /** Multi-way join: fact-fact shuffle join (orders⋈lineitem on orderkey)
    * plus broadcast of the small dims (customer→nation). Lineitem is
    * pre-aggregated per orderkey BEFORE the join — the shuffle then moves
    * one decimal partial sum per order instead of every line item, the
    * shape that survives a 100× fact table (decimal partial sums re-sum
    * exactly, so oracle parity is unaffected). */
  val q03RevenueByNation: QueryDef = QueryDef(
    "q03_revenue_by_nation",
    (s, dir) => {
      val t = Tables(s, dir)
      val perOrder = t.lineitem
        .groupBy(col("l_orderkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast(P))
               .as("rev_dec"),
             count(lit(1)).as("items"))
      perOrder
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev_dec")).cast("double").as("revenue"),
             sum(col("items")).as("n_items"))
    },
    Some("""SELECT n_name,
      CAST(SUM(CAST(l_extendedprice*(1.0-l_discount) AS DECIMAL(22,8))) AS DOUBLE) AS revenue,
      COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name"""))

  /** Left-semi join — EXISTS (§2D row 3's shape over analytic tables). */
  val q04SemiJoin: QueryDef = QueryDef(
    "q04_semi_join",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(
          t.orders.filter(col("o_totalprice") > lit(50000.0)).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    },
    Some("""SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 50000.0)"""))

  /** Left-anti join — NOT EXISTS, the scheduler's core primitive
    * (§2D row 4, jdbc.clj:230-242): customers with no high-value order. */
  val q05AntiJoin: QueryDef = QueryDef(
    "q05_anti_join",
    (s, dir) => {
      val t = Tables(s, dir)
      t.customer.join(
          t.orders.filter(col("o_totalprice") > lit(400000.0)).select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"))
    },
    Some("""SELECT c_custkey, c_name, c_nationkey FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)"""))

  /** Broadcast dimension join: region/nation are tiny at every scale —
    * explicitly broadcast so the supplier side never shuffles. */
  val q06RegionSupplierStats: QueryDef = QueryDef(
    "q06_region_supplier_stats",
    (s, dir) => {
      val t = Tables(s, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
             sum(col("s_acctbal").cast(M)).cast("double").as("total_acctbal"))
    },
    Some("""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
      CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name"""))

  /** Theta join: equi-key plus inequality — Catalyst plans the equality as
    * the join key and evaluates the range predicate as a post-join filter,
    * so this stays a hash/merge join, not a cartesian product. */
  val q07ThetaJoin: QueryDef = QueryDef(
    "q07_theta_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val sup = t.supplier.select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
      val cus = t.customer.select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      sup.join(cus, col("s_nationkey") === col("c_nationkey") && col("s_acctbal") < col("c_acctbal"))
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_pairs"))
    },
    Some("""SELECT s_nationkey AS nationkey, COUNT(*) AS n_pairs
      FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
      GROUP BY s_nationkey"""))

  /** Ranking window: top-3 orders per customer with a deterministic
    * tie-break (totalprice desc, orderkey asc). */
  val q08WindowRank: QueryDef = QueryDef(
    "q08_window_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      Tables(s, dir).orders
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    },
    Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
        CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders) WHERE rn <= 3"""))

  /** Analytic window frame: running sum + lag over a total order per
    * partition. DECIMAL accumulator so DuckDB's segment-tree evaluation and
    * Spark's streaming frame agree bit-for-bit after the final cast. */
  val q09RunningSum: QueryDef = QueryDef(
    "q09_running_sum",
    (s, dir) => {
      val order = Seq(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      val w = Window.partitionBy(col("l_suppkey")).orderBy(order: _*)
      Tables(s, dir).lineitem
        .withColumn("running_qty",
          sum(col("l_quantity").cast(M))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
                col("running_qty"), col("prev_qty"))
    },
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) OVER w AS DOUBLE) AS running_qty,
      LAG(l_quantity, 1) OVER w AS prev_qty
      FROM lineitem
      WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"""))

  /** Set operations: EXCEPT / INTERSECT / UNION-distinct, tagged into one
    * result set. */
  val q10SetOps: QueryDef = QueryDef(
    "q10_set_ops",
    (s, dir) => {
      val t = Tables(s, dir)
      // except/intersect/union below each consume both inputs — localCheckpoint
      // materializes the two tiny distinct sets once instead of re-running
      // the scan+shuffle three times apiece
      val a = t.customer.filter(col("c_acctbal") < 0).select(col("c_nationkey").as("nationkey")).distinct().localCheckpoint()
      val b = t.supplier.filter(col("s_acctbal") < 0).select(col("s_nationkey").as("nationkey")).distinct().localCheckpoint()
      a.except(b).withColumn("op", lit("except"))
        .union(a.intersect(b).withColumn("op", lit("intersect")))
        .union(a.union(b).distinct().withColumn("op", lit("union")))
        .select(col("op"), col("nationkey"))
    },
    Some("""WITH a AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 0),
           b AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier WHERE s_acctbal < 0)
      SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM a EXCEPT SELECT nationkey FROM b)
      UNION ALL
      SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM a INTERSECT SELECT nationkey FROM b)
      UNION ALL
      SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM a UNION SELECT nationkey FROM b)"""))

  /** Distinct projection (§2D row 3's DISTINCT). */
  val q11Distinct: QueryDef = QueryDef(
    "q11_distinct_flags",
    (s, dir) => Tables(s, dir).lineitem
      .select(col("l_returnflag"), col("l_linestatus")).distinct(),
    Some("SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"))

  /** ROLLUP — hierarchical grouping sets (region → nation → grand total). */
  val q12Rollup: QueryDef = QueryDef(
    "q12_rollup_suppliers",
    (s, dir) => {
      val t = Tables(s, dir)
      t.supplier
        .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_suppliers"),
             sum(col("s_acctbal").cast(M)).cast("double").as("total_acctbal"))
    },
    Some("""SELECT r_name, n_name, COUNT(*) AS n_suppliers,
      CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY ROLLUP (r_name, n_name)"""))

  /** CUBE — all grouping-set combinations. */
  val q13Cube: QueryDef = QueryDef(
    "q13_cube_lineitem",
    (s, dir) => Tables(s, dir).lineitem
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast(M)).cast("double").as("sum_qty"),
           count(lit(1)).as("n_rows")),
    Some("""SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      COUNT(*) AS n_rows
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"""))

  /** CASE expression + min/max aggregation (exact double passthrough). */
  val q14CaseBuckets: QueryDef = QueryDef(
    "q14_case_buckets",
    (s, dir) => Tables(s, dir).customer
      .withColumn("bucket",
        when(col("c_acctbal") < 0, lit("negative"))
          .when(col("c_acctbal") < 5000, lit("low"))
          .otherwise(lit("high")))
      .groupBy(col("c_mktsegment"), col("bucket"))
      .agg(count(lit(1)).as("n_customers"),
           min(col("c_acctbal")).as("min_bal"),
           max(col("c_acctbal")).as("max_bal")),
    Some("""SELECT c_mktsegment,
      CASE WHEN c_acctbal < 0 THEN 'negative'
           WHEN c_acctbal < 5000 THEN 'low'
           ELSE 'high' END AS bucket,
      COUNT(*) AS n_customers, MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal
      FROM customer GROUP BY 1, 2"""))

  /** Scalar string functions — all codegen'd builtins, no UDFs. */
  val q15StringFuncs: QueryDef = QueryDef(
    "q15_string_funcs",
    (s, dir) => Tables(s, dir).part
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("up_name"),
        lower(col("p_brand")).as("low_brand"),
        substring(col("p_type"), 1, 5).as("type_prefix"),
        length(col("p_name")).as("name_len"),
        concat(col("p_brand"), lit("::"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled")),
    Some("""SELECT p_partkey, upper(p_name) AS up_name, lower(p_brand) AS low_brand,
      substr(p_type, 1, 5) AS type_prefix, CAST(length(p_name) AS INTEGER) AS name_len,
      p_brand || '::' || p_type AS brand_type,
      regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
      FROM part"""))

  /** Date/time functions: truncation + extraction. */
  val q16MonthlyOrders: QueryDef = QueryDef(
    "q16_monthly_orders",
    (s, dir) => Tables(s, dir).orders
      .groupBy(
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(M)).cast("double").as("total")),
    Some("""SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
      CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS yr,
      COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM orders GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02TopOrders, q03RevenueByNation, q04SemiJoin,
    q05AntiJoin, q06RegionSupplierStats, q07ThetaJoin, q08WindowRank,
    q09RunningSum, q10SetOps, q11Distinct, q12Rollup, q13Cube,
    q14CaseBuckets, q15StringFuncs, q16MonthlyOrders)
}
