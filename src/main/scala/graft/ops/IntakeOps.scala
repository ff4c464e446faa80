package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Intake-quality operators: out-of-order arrival audit, per-market
  * freshness, Simpson's-paradox detection, and NDV-sketch accuracy —
  * the checks on the PIPES (ordering, latency, aggregation validity,
  * statistics) rather than the values.
  */
object IntakeOps {

  /** Out-of-order arrival audit: within each user's stream (arrival
    * order = event_id), how often does event time step BACKWARDS — the
    * number that sizes a stream processor's watermark delay and
    * out-of-orderness buffer before anyone deploys it. One lag window
    * per user; inversions roll up by event type with their worst
    * backward jump.
    */
  val q218OutOfOrderAudit: QueryDef = QueryDef(
    "q218_out_of_order_audit",
    (s, dir) => {
      val wArr = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      EventOps.events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"))
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(wArr))
        .filter(col("prev_ts").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_arrivals"),
          sum(when(col("ts_us") < col("prev_ts"), 1L).otherwise(0L))
            .as("n_inversions"),
          round(sum(when(col("ts_us") < col("prev_ts"), 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6)
            .as("inversion_rate"),
          coalesce(max(when(col("ts_us") < col("prev_ts"),
            col("prev_ts") - col("ts_us"))), lit(0L)).as("max_backstep_us"))
    },
    Some("""WITH a AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
          LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY event_id)
            AS prev_ts
        FROM events)
      SELECT event_type, COUNT(*) AS n_arrivals,
        CAST(SUM(CASE WHEN ts_us < prev_ts THEN 1 ELSE 0 END) AS BIGINT)
          AS n_inversions,
        round(CAST(SUM(CASE WHEN ts_us < prev_ts THEN 1 ELSE 0 END) AS DOUBLE) /
          CAST(COUNT(*) AS DOUBLE), 6) AS inversion_rate,
        CAST(COALESCE(MAX(CASE WHEN ts_us < prev_ts THEN prev_ts - ts_us END), 0)
          AS BIGINT) AS max_backstep_us
      FROM a WHERE prev_ts IS NOT NULL GROUP BY 1"""))

  /** Per-market freshness audit: each nation's latest order date
    * against the global horizon — which market's feed is stale, by how
    * many days, and is it beyond the 30-day contract? The horizon is
    * an in-plan 1-row broadcast (never a driver action); the report is
    * one keyed agg over the model-sized nation frame.
    */
  val q219FreshnessAudit: QueryDef = QueryDef(
    "q219_freshness_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      val perNation = t.orders
        .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"),
          max(to_date(col("o_orderdate"))).as("latest"))
      val horizon = t.orders.agg(max(to_date(col("o_orderdate"))).as("h"))
      perNation.crossJoin(broadcast(horizon))
        .select(col("n_name"), col("n_orders"), col("latest"),
          datediff(col("h"), col("latest")).cast("long").as("lag_days"),
          (datediff(col("h"), col("latest")) > 30).as("stale_flag"))
    },
    Some("""WITH pn AS (SELECT n.n_name, COUNT(*) AS n_orders,
          MAX(CAST(o.o_orderdate AS DATE)) AS latest
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1),
      h AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS h FROM orders)
      SELECT n_name, n_orders, latest,
        CAST(h.h - latest AS BIGINT) AS lag_days,
        h.h - latest > 30 AS stale_flag
      FROM pn CROSS JOIN h"""))

  /** Simpson's-paradox detector on the discount→quantity relationship:
    * the pooled OLS slope versus every brand's within-stratum slope —
    * if most strata disagree with the pooled sign, the aggregate
    * number is a composition artifact and must not ship. Power sums
    * stay exact DECIMAL (the q125 idiom) for pooled AND per-brand
    * slopes in one scan each; the verdict is one row.
    */
  val q220SimpsonDetector: QueryDef = QueryDef(
    "q220_simpson_detector",
    (s, dir) => {
      val t = Tables(s, dir)
      def slopeAgg = {
        val n  = count(lit(1)).cast("double")
        val sx = sum(col("x").cast(DecimalType(18, 6))).cast("double")
        val sy = sum(col("y").cast(DecimalType(18, 6))).cast("double")
        val sxy = sum((col("x") * col("y")).cast(DecimalType(28, 8))).cast("double")
        val sxx = sum((col("x") * col("x")).cast(DecimalType(28, 8))).cast("double")
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).as("slope")
      }
      val base = t.lineitem
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("l_discount").as("x"),
          col("l_quantity").as("y"))
        // NOT checkpointed: two 3-column pushdown scans beat materializing
        // the full joined frame (measured 9.4→? s at sf1)
      val pooled = base.agg(slopeAgg).select(col("slope").as("pooled_slope"))
      val strata = base.groupBy(col("p_brand")).agg(slopeAgg)
      strata.crossJoin(broadcast(pooled))
        .groupBy(col("pooled_slope"))
        .agg(count(lit(1)).as("n_strata"),
          sum(when(col("slope") * col("pooled_slope") < 0, 1L).otherwise(0L))
            .as("n_opposite"))
        .select(round(col("pooled_slope"), 9).as("pooled_slope"),
          col("n_strata"), col("n_opposite"),
          (col("n_opposite") * 2 > col("n_strata")).as("paradox_flag"))
    },
    Some("""WITH base AS (SELECT p.p_brand, l.l_discount AS x, l.l_quantity AS y
          FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
      pooled AS (SELECT
          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(x*y AS DECIMAL(28,8))) AS DOUBLE)
            - CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE)) /
          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(x*x AS DECIMAL(28,8))) AS DOUBLE)
            - CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)) AS pooled_slope
        FROM base),
      strata AS (SELECT p_brand,
          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(x*y AS DECIMAL(28,8))) AS DOUBLE)
            - CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(y AS DECIMAL(18,6))) AS DOUBLE)) /
          (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(CAST(x*x AS DECIMAL(28,8))) AS DOUBLE)
            - CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)
              * CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE)) AS slope
        FROM base GROUP BY 1)
      SELECT round(p.pooled_slope, 9) AS pooled_slope,
        COUNT(*) AS n_strata,
        CAST(SUM(CASE WHEN s.slope * p.pooled_slope < 0 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_opposite,
        SUM(CASE WHEN s.slope * p.pooled_slope < 0 THEN 1 ELSE 0 END) * 2
          > COUNT(*) AS paradox_flag
      FROM strata s CROSS JOIN pooled p
      GROUP BY 1"""))

  /** NDV-sketch accuracy audit across the schema's key columns: exact
    * distinct counts next to an HLL++ estimate (rsd = 0.01) with a ±5 %
    * certification — the q35 idiom widened to the columns the
    * optimizer's statistics actually feed on. The oracle pins the
    * exact counts and the bound booleans; the sketch itself stays
    * engine-local, as a sketch should.
    */
  val q221NdvAudit: QueryDef = QueryDef(
    "q221_ndv_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      def audit(df: org.apache.spark.sql.DataFrame, table: String,
                c: String): org.apache.spark.sql.DataFrame =
        df.agg(countDistinct(col(c)).as("exact_ndv"),
            approx_count_distinct(col(c), 0.01).as("approx"))
          .select(lit(s"$table.$c").as("column_id"), col("exact_ndv"),
            (abs(col("approx") - col("exact_ndv")) <=
              col("exact_ndv") * 0.05).as("within_5pct"))
      audit(t.orders, "orders", "o_custkey")
        .unionByName(audit(t.lineitem, "lineitem", "l_partkey"))
        .unionByName(audit(t.lineitem, "lineitem", "l_suppkey"))
        .unionByName(audit(EventOps.events(s, dir), "events", "user_id"))
        .unionByName(audit(t.documents, "documents", "lang"))
    },
    Some("""SELECT 'orders.o_custkey' AS column_id,
        COUNT(DISTINCT o_custkey) AS exact_ndv, TRUE AS within_5pct FROM orders
      UNION ALL SELECT 'lineitem.l_partkey',
        COUNT(DISTINCT l_partkey), TRUE FROM lineitem
      UNION ALL SELECT 'lineitem.l_suppkey',
        COUNT(DISTINCT l_suppkey), TRUE FROM lineitem
      UNION ALL SELECT 'events.user_id',
        COUNT(DISTINCT user_id), TRUE FROM events
      UNION ALL SELECT 'documents.lang',
        COUNT(DISTINCT lang), TRUE FROM documents"""))

  val all: Seq[QueryDef] = Seq(q218OutOfOrderAudit, q219FreshnessAudit,
    q220SimpsonDetector, q221NdvAudit)
}
