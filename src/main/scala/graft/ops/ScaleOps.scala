package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Scale-pattern operators: the shapes a 100 TB pipeline reaches for when
  * vanilla groupBy/join starts to hurt — explicit skew salting, snapshot
  * diffing, single-pass data-quality expectations, and SCD2 validity
  * intervals. Each is oracle-checked against the equivalent direct SQL, so
  * the scale-shaped plan is proven result-identical to the naive one.
  */
object ScaleOps {

  private val M = DecimalType(18, 4)

  /** Two-stage salted aggregation. `events` has only 5 event_type keys —
    * at 100 TB a plain groupBy(event_type) funnels ~20 TB into each of 5
    * reducers and dies. Salting splits every hot key across 32 partial
    * groups (map-side combine still applies within each), then the second
    * stage folds 5×32 tiny partials. The oracle is the PLAIN aggregate:
    * the salted plan must be bit-identical because partial sums stay in
    * exact DECIMAL until the final cast.
    */
  val q105SaltedSkewAgg: QueryDef = QueryDef(
    "q105_salted_skew_agg",
    (s, dir) => {
      val partial = EventOps.events(s, dir)
        .withColumn("salt", pmod(col("event_id"), lit(32)))
        .groupBy(col("event_type"), col("salt"))
        .agg(count(lit(1)).as("pn"),
             sum(col("value").cast(M)).as("pv"))
      partial
        .groupBy(col("event_type"))
        .agg(sum(col("pn")).as("n"),
             sum(col("pv")).cast("double").as("total_value"))
    },
    Some("""SELECT event_type, COUNT(*) AS n,
      CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1"""))

  /** Snapshot diff (the table-versioning primitive): classify every key as
    * added / changed / unchanged between the state as-of 2024-01-05 and
    * the final state. "State" is the latest event per (user, event_type)
    * key (q45's shape); the diff itself is a full outer join on the key
    * with value comparison — one co-partitioned shuffle at any scale, and
    * the per-side "latest" is a max-of-struct hash-agg, not a window sort.
    * Row-level output: the downstream incremental job consumes exactly
    * the added/changed keys.
    */
  val q106SnapshotDiff: QueryDef = QueryDef(
    "q106_snapshot_diff",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      def latest(df: DataFrame): DataFrame = df
        .groupBy(col("user_id"), col("event_type"))
        .agg(max(struct(unix_micros(col("ts")).as("ts_us"),
                        col("event_id"))).as("m"))
        .select(col("user_id"), col("event_type"),
                col("m.event_id").as("event_id"))
      val old = latest(ev.filter(col("ts") < lit("2024-01-05").cast("timestamp")))
        .withColumnRenamed("event_id", "old_event_id")
      val neu = latest(ev)
      neu.join(old, Seq("user_id", "event_type"), "full_outer")
        .withColumn("change_type",
          when(col("old_event_id").isNull, lit("added"))
            .when(col("event_id") =!= col("old_event_id"), lit("changed"))
            .otherwise(lit("unchanged")))
        .select(col("user_id"), col("event_type"), col("change_type"),
                col("event_id"), col("old_event_id"))
    },
    Some("""WITH old AS (
        SELECT user_id, event_type, event_id AS old_event_id FROM (
          SELECT user_id, event_type, event_id, ROW_NUMBER() OVER
            (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
          FROM events WHERE ts < TIMESTAMP '2024-01-05') WHERE rn = 1),
      neu AS (
        SELECT user_id, event_type, event_id FROM (
          SELECT user_id, event_type, event_id, ROW_NUMBER() OVER
            (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1)
      SELECT user_id, event_type,
             CASE WHEN old.old_event_id IS NULL THEN 'added'
                  WHEN neu.event_id <> old.old_event_id THEN 'changed'
                  ELSE 'unchanged' END AS change_type,
             neu.event_id, old.old_event_id
      FROM neu FULL OUTER JOIN old USING (user_id, event_type)"""))

  /** Data-quality expectations: the validation pass a pipeline runs before
    * promoting a snapshot. One aggregate per table (both lineitem checks
    * share a single scan via conditional aggregation + stack), plus one
    * referential-integrity anti-join; at 100 TB each check is a single
    * map-side-combined pass over its table.
    */
  val q107Expectations: QueryDef = QueryDef(
    "q107_expectations",
    (s, dir) => {
      val t = Tables(s, dir)
      val li = t.lineitem.agg(
          sum(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1L)
            .otherwise(0L)).as("qty_bad"),
          (count(lit(1)) -
            countDistinct(col("l_orderkey") * 8 + col("l_linenumber"))).as("pk_dupes"))
        .selectExpr(
          """stack(2, 'lineitem_qty_range', qty_bad,
                      'lineitem_pk_dupes', pk_dupes)
             AS (check_name, violations)""")
      val orphans = t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("orders_orphan_cust").as("check_name"), col("violations"))
      val docs = t.documents.agg(
          sum(when(col("text").isNull || length(col("text")) === 0, 1L)
            .otherwise(0L)).cast("long").as("violations"))
        .select(lit("documents_empty_text").as("check_name"), col("violations"))
      // a NULL event_type is a violation: isin() alone is NULL for null
      // input and when().otherwise(0) would silently count it as CLEAN,
      // diverging from the oracle's explicit OR IS NULL arm
      val ev = EventOps.events(s, dir).agg(
          sum(when(col("event_type").isNull ||
                   !col("event_type").isin("click", "view", "purchase",
                                           "signup", "error"), 1L)
            .otherwise(0L)).cast("long").as("violations"))
        .select(lit("events_bad_type").as("check_name"), col("violations"))
      li.unionByName(orphans).unionByName(docs).unionByName(ev)
    },
    Some("""SELECT 'lineitem_qty_range' AS check_name,
        CAST(COUNT(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT) AS violations
      FROM lineitem
      UNION ALL
      SELECT 'lineitem_pk_dupes',
        CAST(COUNT(*) - COUNT(DISTINCT l_orderkey * 8 + l_linenumber) AS BIGINT)
      FROM lineitem
      UNION ALL
      SELECT 'orders_orphan_cust', CAST(COUNT(*) AS BIGINT)
      FROM orders WHERE NOT EXISTS
        (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      UNION ALL
      SELECT 'documents_empty_text', CAST(COUNT(*) AS BIGINT)
      FROM documents WHERE text IS NULL OR length(text) = 0
      UNION ALL
      SELECT 'events_bad_type', CAST(COUNT(*) AS BIGINT)
      FROM events
      WHERE event_type NOT IN ('click','view','purchase','signup','error')
         OR event_type IS NULL"""))

  /** SCD Type-2: turn the purchase-event change feed into validity
    * intervals — each row's valid_to is the next change's valid_from,
    * open-ended (NULL) for the current row. One window per user key; ties
    * broken by event_id so the interval chain is deterministic. This is
    * the standard dimension-history build, and it sub-shards cleanly: the
    * window partitions by user_id, so 1000 executors each chain their own
    * users.
    */
  val q108Scd2Intervals: QueryDef = QueryDef(
    "q108_scd2_intervals",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
      EventOps.events(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("valid_from_us", unix_micros(col("ts")))
        .withColumn("valid_to_us", lead(unix_micros(col("ts")), 1).over(w))
        .withColumn("is_current",
          when(col("valid_to_us").isNull, 1L).otherwise(0L))
        .select(col("user_id"), col("event_id"), col("value"),
                col("valid_from_us"), col("valid_to_us"), col("is_current"))
    },
    Some("""SELECT user_id, event_id, value,
        epoch_us(ts) AS valid_from_us,
        LEAD(epoch_us(ts)) OVER w AS valid_to_us,
        CASE WHEN LEAD(epoch_us(ts)) OVER w IS NULL THEN CAST(1 AS BIGINT)
             ELSE CAST(0 AS BIGINT) END AS is_current
      FROM events WHERE event_type = 'purchase'
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST,
                   event_id ASC NULLS FIRST)"""))

  /** Z-order clustering layout (the Delta/Iceberg Z-ORDER primitive):
    * assign every lineitem the Morton code of (l_partkey, l_suppkey) via
    * the codegen'd [[graft.functions.ZInterleave]] expression, bucket by
    * the code's high bits (= the file a Z-sorted writer would place the
    * row in), and report each bucket's row count and 2D bounding
    * rectangle. The rectangles ARE the layout's value: min/max column
    * stats per file stay tight on BOTH dimensions at once, so a
    * `part BETWEEN … AND supp BETWEEN …` scan prunes most buckets —
    * which a 1D sort can only do for its leading column. The oracle
    * rebuilds the identical bit-interleave as shift/mask SQL.
    */
  val q110ZorderLayout: QueryDef = QueryDef(
    "q110_zorder_layout",
    (s, dir) => {
      val zed = Tables(s, dir).lineitem
        .select(col("l_partkey"), col("l_suppkey"),
          graft.functions.LayoutFunctions
            .z_interleave(col("l_partkey"), col("l_suppkey")).as("z"))
      // 256 equal z-ranges ≈ 256 files of a Z-sorted writer. The max-z
      // read is a single-value action (the "plan the layout" step), the
      // same pattern as the closure queries' driver-bound reads.
      val zMax = zed.agg(max(col("z"))).head().getLong(0)
      zed
        .groupBy(expr(s"CAST(z * 256 DIV ${zMax + 1} AS BIGINT)").as("z_bucket"))
        .agg(count(lit(1)).as("n_rows"),
             min(col("l_partkey")).as("pk_min"), max(col("l_partkey")).as("pk_max"),
             min(col("l_suppkey")).as("sk_min"), max(col("l_suppkey")).as("sk_max"))
    },
    Some(s"""WITH z AS (SELECT l_partkey, l_suppkey,
        ${graft.functions.LayoutFunctions.zInterleaveSql("l_partkey", "l_suppkey")} AS z
      FROM lineitem)
      SELECT CAST(z * 256 // ((SELECT MAX(z) FROM z) + 1) AS BIGINT) AS z_bucket,
        COUNT(*) AS n_rows,
        MIN(l_partkey) AS pk_min, MAX(l_partkey) AS pk_max,
        MIN(l_suppkey) AS sk_min, MAX(l_suppkey) AS sk_max
      FROM z GROUP BY 1"""))

  /** Hilbert-vs-Z-order layout shoot-out on the same (l_partkey,
    * l_suppkey) grid as q110: each curve's values are cut into 256 equal
    * ranges (≈ files of a curve-sorted writer) and the per-file bounding
    * boxes measured — avg/max box area is exactly what min/max file
    * statistics prune against, so a smaller average box = fewer files
    * touched by a 2D range predicate. The Hilbert index is the
    * [[graft.functions.HilbertIndex]] codegen expression (no diagonal
    * jumps → tighter boxes than Morton; the spec asserts the win, the
    * BASELINE rows quantify it); the oracle replays the identical
    * quadrant walk as 16 chained CTEs. Per layout: one scan + one
    * 256-group aggregate; box-area sums are exact integers, the final
    * average is one division. At 100 TB this query IS the layout
    * decision — run it on a sample, pick the curve, sort-write once. */
  val q363HilbertLayout: QueryDef = QueryDef(
    "q363_hilbert_layout",
    (s, dir) => {
      val keyed = Tables(s, dir).lineitem
        .select(col("l_partkey"), col("l_suppkey"),
          graft.functions.LayoutFunctions
            .z_interleave(col("l_partkey"), col("l_suppkey")).as("zc"),
          graft.functions.LayoutFunctions
            .hilbert_index(col("l_partkey"), col("l_suppkey")).as("hc"))
        .localCheckpoint() // two curve audits share one scan
      def audit(curve: String, label: String): DataFrame = {
        val cMax = keyed.agg(max(col(curve))).head().getLong(0)
        keyed
          .groupBy(expr(s"CAST($curve * 256 DIV ${cMax + 1} AS BIGINT)").as("bkt"))
          .agg(count(lit(1)).as("n_rows"),
            (max(col("l_partkey")) - min(col("l_partkey")) + 1L)
              .as("pk_span"),
            (max(col("l_suppkey")) - min(col("l_suppkey")) + 1L)
              .as("sk_span"))
          .agg(count(lit(1)).as("n_files"), sum(col("n_rows")).as("n_rows"),
            sum(col("pk_span") * col("sk_span")).as("area_sum"),
            max(col("pk_span") * col("sk_span")).as("area_max"))
          .select(lit(label).as("layout"), col("n_files"), col("n_rows"),
            round(col("area_sum").cast("double") / col("n_files"), 4)
              .as("avg_box_area"),
            col("area_max").as("max_box_area"))
      }
      audit("hc", "hilbert").unionByName(audit("zc", "zorder"))
        .orderBy(col("layout"))
    },
    Some(s"""WITH base AS (SELECT l_partkey, l_suppkey,
        ${graft.functions.LayoutFunctions.zInterleaveSql("l_partkey", "l_suppkey")} AS zc,
        (l_partkey & 65535) AS x, (l_suppkey & 65535) AS y, 0::BIGINT AS d
      FROM lineitem),
      ${graft.functions.LayoutFunctions.hilbertSqlCtes("h",
        "base", Seq("l_partkey", "l_suppkey", "zc"))},
      keyed AS (SELECT l_partkey, l_suppkey, zc, d AS hc FROM h16),
      hb AS (SELECT CAST(hc * 256 // ((SELECT MAX(hc) FROM keyed) + 1) AS BIGINT) AS bkt,
          COUNT(*) AS n_rows,
          MAX(l_partkey) - MIN(l_partkey) + 1 AS pk_span,
          MAX(l_suppkey) - MIN(l_suppkey) + 1 AS sk_span
        FROM keyed GROUP BY 1),
      zb AS (SELECT CAST(zc * 256 // ((SELECT MAX(zc) FROM keyed) + 1) AS BIGINT) AS bkt,
          COUNT(*) AS n_rows,
          MAX(l_partkey) - MIN(l_partkey) + 1 AS pk_span,
          MAX(l_suppkey) - MIN(l_suppkey) + 1 AS sk_span
        FROM keyed GROUP BY 1)
      SELECT 'hilbert' AS layout, CAST(COUNT(*) AS BIGINT) AS n_files,
        CAST(SUM(n_rows) AS BIGINT) AS n_rows,
        round(CAST(SUM(pk_span * sk_span) AS DOUBLE) / COUNT(*), 4) AS avg_box_area,
        CAST(MAX(pk_span * sk_span) AS BIGINT) AS max_box_area
      FROM hb
      UNION ALL
      SELECT 'zorder', CAST(COUNT(*) AS BIGINT), CAST(SUM(n_rows) AS BIGINT),
        round(CAST(SUM(pk_span * sk_span) AS DOUBLE) / COUNT(*), 4),
        CAST(MAX(pk_span * sk_span) AS BIGINT)
      FROM zb
      ORDER BY layout"""))

  /** Incremental aggregate maintenance (materialized-view refresh): the
    * stored view holds per-priority totals for history (< 1999-01-01);
    * the refresh aggregates ONLY the delta partition and folds it into
    * the stored partials — sums of decimal sums and sums of counts, so
    * the merge is exact and associative. The oracle is the full
    * recompute over all of history: incremental ≡ full is the entire
    * point. At 100 TB the delta is a day's partition and the view is a
    * few rows per key — refresh cost is O(delta), not O(history).
    */
  val q113IncrementalAgg: QueryDef = QueryDef(
    "q113_incremental_agg",
    (s, dir) => {
      val o = Tables(s, dir).orders
      def partials(df: DataFrame): DataFrame = df
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("pn"),
             sum(col("o_totalprice").cast(M)).as("pv"))
      val view  = partials(o.filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp")))
      val delta = partials(o.filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp")))
      view.unionByName(delta)
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("pn")).as("n_orders"),
             sum(col("pv")).cast("double").as("revenue"))
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n_orders,
      CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM orders GROUP BY 1"""))

  /** Compliance delete audit (right-to-be-forgotten): a deterministic
    * forget-set of customers (md5 gate, ~1/16) cascades through the FK
    * chain customer → orders → lineitem; the audit reports per table how
    * many rows the purge removes and keeps. The cascade is two
    * semi-joins down the chain (orderkeys broadcast once); at 100 TB
    * this is the dry-run every deletion pipeline executes before
    * rewriting files. The purge is also the q26-style idempotent shape:
    * re-running it deletes nothing new.
    */
  val q123ComplianceDelete: QueryDef = QueryDef(
    "q123_compliance_delete",
    (s, dir) => {
      val t = Tables(s, dir)
      val gate = substring(md5(col("c_custkey").cast("string")), 1, 1) === "7"
      val forget = t.customer.filter(gate).select(col("c_custkey"))
      // ONE declarative plan, one action: each table's purge/keep split is
      // a flag join + conditional aggregate, unioned — no driver-side
      // counting loop, so the audit is a single job at any scale
      val custAudit = t.customer.agg(
          sum(when(gate, 1L).otherwise(0L)).as("n_purged"),
          sum(when(gate, 0L).otherwise(1L)).as("n_kept"))
        .select(lit("customer").as("table_name"), col("n_purged"), col("n_kept"))
      val flaggedOrders = t.orders
        .join(forget, col("o_custkey") === col("c_custkey"), "left_outer")
      val orderAudit = flaggedOrders.agg(
          sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L)).as("n_purged"),
          sum(when(col("c_custkey").isNotNull, 0L).otherwise(1L)).as("n_kept"))
        .select(lit("orders").as("table_name"), col("n_purged"), col("n_kept"))
      val purgedKeys = flaggedOrders.filter(col("c_custkey").isNotNull)
        .select(col("o_orderkey"))
      val lineAudit = t.lineitem
        .join(purgedKeys, col("l_orderkey") === col("o_orderkey"), "left_outer")
        .agg(
          sum(when(col("o_orderkey").isNotNull, 1L).otherwise(0L)).as("n_purged"),
          sum(when(col("o_orderkey").isNotNull, 0L).otherwise(1L)).as("n_kept"))
        .select(lit("lineitem").as("table_name"), col("n_purged"), col("n_kept"))
      custAudit.unionByName(orderAudit).unionByName(lineAudit)
    },
    Some("""WITH forget AS (
        SELECT c_custkey FROM customer
        WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 1) = '7'),
      po AS (SELECT o_orderkey FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM forget)),
      pl AS (SELECT 1 AS x FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM po))
      SELECT 'customer' AS table_name,
        (SELECT COUNT(*) FROM forget) AS n_purged,
        (SELECT COUNT(*) FROM customer) - (SELECT COUNT(*) FROM forget) AS n_kept
      UNION ALL
      SELECT 'orders', (SELECT COUNT(*) FROM po),
        (SELECT COUNT(*) FROM orders) - (SELECT COUNT(*) FROM po)
      UNION ALL
      SELECT 'lineitem', (SELECT COUNT(*) FROM pl),
        (SELECT COUNT(*) FROM lineitem) - (SELECT COUNT(*) FROM pl)"""))

  val all: Seq[QueryDef] =
    Seq(q105SaltedSkewAgg, q106SnapshotDiff, q107Expectations, q108Scd2Intervals,
        q110ZorderLayout, q363HilbertLayout, q113IncrementalAgg, q123ComplianceDelete)
}
