package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Product-analytics operators: sequential path mining, retention
  * cohorts, and market-basket association rules — the query family a
  * behavioral warehouse runs daily at 100 TB. All three are pure
  * window/hash-agg/equi-join shapes.
  */
object ProductAnalytics {

  private val M = DecimalType(18, 4)

  /** Sequential pattern counts: every 3-step event-type path users take
    * (two LEADs over the per-user time order, then one hash-agg). The
    * per-user window sub-shards across executors; the path dictionary is
    * ≤ |event types|³ rows at any scale. Ties are broken by event_id so
    * paths are deterministic across engines and partitionings.
    */
  val q120EventPaths: QueryDef = QueryDef(
    "q120_event_paths",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
      EventOps.events(s, dir)
        .withColumn("e2", lead(col("event_type"), 1).over(w))
        .withColumn("e3", lead(col("event_type"), 2).over(w))
        .filter(col("e2").isNotNull && col("e3").isNotNull)
        // concat, not concat_ws: the oracle's || is null-propagating, and
        // concat_ws would silently SKIP a null event_type ("e2>e3") where
        // the oracle yields a NULL path — same null-divergence class as
        // q107's isin
        .withColumn("path", concat(col("event_type"), lit(">"), col("e2"),
          lit(">"), col("e3")))
        .groupBy(col("path"))
        .agg(count(lit(1)).as("n_occurrences"),
             countDistinct(col("user_id")).as("n_users"))
    },
    Some("""WITH seq AS (
        SELECT user_id, event_type,
          LEAD(event_type, 1) OVER w AS e2,
          LEAD(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC NULLS FIRST,
                     event_id ASC NULLS FIRST))
      SELECT event_type || '>' || e2 || '>' || e3 AS path,
        COUNT(*) AS n_occurrences,
        COUNT(DISTINCT user_id) AS n_users
      FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
      GROUP BY 1"""))

  /** Retention cohorts: users grouped by first-seen day, retention
    * measured as distinct active users at each day offset. Two hash-aggs
    * (first-seen, distinct activity) joined on user_id, then one agg on
    * (cohort, offset) — no self-join of the activity table, no per-user
    * state. Ratios are exact integer divisions surfaced as rounded
    * doubles.
    */
  val q121RetentionCohorts: QueryDef = QueryDef(
    "q121_retention_cohorts",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
      val firstSeen = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
      val active = ev.distinct()
      val activity = active.join(firstSeen, "user_id")
        .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
        .groupBy(col("cohort_day"), col("day_offset"))
        .agg(countDistinct(col("user_id")).as("n_active"))
      val sizes = firstSeen.groupBy(col("cohort_day"))
        .agg(countDistinct(col("user_id")).as("cohort_size"))
      activity.join(sizes, "cohort_day")
        .withColumn("retention",
          round(col("n_active").cast("double") / col("cohort_size").cast("double"), 6))
        .select(col("cohort_day"), col("day_offset"), col("n_active"),
                col("cohort_size"), col("retention"))
    },
    Some("""WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      first_seen AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY 1),
      activity AS (
        SELECT cohort_day, day - cohort_day AS day_offset,
          COUNT(DISTINCT ev.user_id) AS n_active
        FROM ev JOIN first_seen ON ev.user_id = first_seen.user_id
        GROUP BY 1, 2),
      sizes AS (SELECT cohort_day, COUNT(DISTINCT user_id) AS cohort_size
        FROM first_seen GROUP BY 1)
      SELECT activity.cohort_day, day_offset, n_active, cohort_size,
        round(CAST(n_active AS DOUBLE) / CAST(cohort_size AS DOUBLE), 6) AS retention
      FROM activity JOIN sizes ON activity.cohort_day = sizes.cohort_day"""))

  /** Market-basket association rules over co-purchased parts: for every
    * unordered pair appearing in ≥ 2 orders, support, confidence in both
    * directions, and lift. Pairs come from the orderkey equi-join (never
    * all parts × all parts); marginal counts broadcast back onto the
    * pair frame; the corpus-wide order count is an in-plan broadcast
    * 1-row aggregate so the whole query is ONE action. Lift's
    * cross-products are computed in double (identical expression tree in
    * the oracle → bit parity): int64 products of counts overflow 2^63 at
    * the 100 TB scale this targets, where Spark wraps and DuckDB errors.
    */
  val q122AssociationRules: QueryDef = QueryDef(
    "q122_association_rules",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      val orders = li.select(col("l_orderkey").as("ok"), col("l_partkey").as("part"))
        .distinct()
      // the corpus-wide order count rides the plan as a broadcast 1-row
      // aggregate (the q56/q91 scalar idiom) — one action, no extra
      // driver-side scan of lineitem before the main plan runs
      val nOrders = orders.agg(countDistinct(col("ok")).as("n_orders"))
      val pairs = orders.as("a")
        .join(orders.as("b"),
          col("a.ok") === col("b.ok") && col("a.part") < col("b.part"))
        .groupBy(col("a.part").as("x"), col("b.part").as("y"))
        .agg(count(lit(1)).as("s_xy"))
        .filter(col("s_xy") >= 2)
      val marg = orders.groupBy(col("part")).agg(countDistinct(col("ok")).as("s"))
      pairs
        .join(marg.select(col("part").as("x"), col("s").as("s_x")), "x")
        .join(marg.select(col("part").as("y"), col("s").as("s_y")), "y")
        .crossJoin(broadcast(nOrders))
        // cross-products in DOUBLE, not int64: counts at 100 TB make
        // s_xy*n_orders exceed 2^63, where Spark (non-ANSI) wraps silently
        // and DuckDB errors — doubles degrade to rounding instead, and the
        // identical expression tree on both sides keeps bit parity
        .select(col("x"), col("y"), col("s_xy"), col("s_x"), col("s_y"),
          round(col("s_xy").cast("double") / col("s_x").cast("double"), 6).as("conf_xy"),
          round(col("s_xy").cast("double") / col("s_y").cast("double"), 6).as("conf_yx"),
          round(col("s_xy").cast("double") * col("n_orders").cast("double") /
            (col("s_x").cast("double") * col("s_y").cast("double")), 6).as("lift"))
    },
    Some("""WITH o AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part FROM lineitem),
      n AS (SELECT COUNT(DISTINCT ok) AS n_orders FROM o),
      pairs AS (
        SELECT a.part AS x, b.part AS y, COUNT(*) AS s_xy
        FROM o a JOIN o b ON a.ok = b.ok AND a.part < b.part
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      marg AS (SELECT part, COUNT(DISTINCT ok) AS s FROM o GROUP BY 1)
      SELECT x, y, s_xy, mx.s AS s_x, my.s AS s_y,
        round(CAST(s_xy AS DOUBLE) / CAST(mx.s AS DOUBLE), 6) AS conf_xy,
        round(CAST(s_xy AS DOUBLE) / CAST(my.s AS DOUBLE), 6) AS conf_yx,
        round(CAST(s_xy AS DOUBLE) * CAST(n_orders AS DOUBLE) /
          (CAST(mx.s AS DOUBLE) * CAST(my.s AS DOUBLE)), 6) AS lift
      FROM pairs JOIN marg mx ON pairs.x = mx.part
                 JOIN marg my ON pairs.y = my.part
                 CROSS JOIN n"""))

  /** First-order Markov transition estimation over the event stream:
    * per-user LEAD gives the (from, to) bigram, one hash-agg counts it,
    * and a window over the from-state normalizes to probabilities. The
    * transition matrix is ≤ |event types|² rows at any corpus size; the
    * heavy step is the per-user window, which sub-shards by user exactly
    * like q120's path mining. Probabilities are a single int64→double
    * division (deterministic bit-for-bit both engines).
    */
  val q137MarkovTransitions: QueryDef = QueryDef(
    "q137_markov_transitions",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc_nulls_first, col("event_id").asc_nulls_first)
      val counts = EventOps.events(s, dir)
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n"))
      counts
        .withColumn("n_from",
          sum(col("n")).over(Window.partitionBy(col("from_type"))))
        .select(col("from_type"), col("to_type"), col("n"),
          (col("n").cast("double") / col("n_from")).as("p"))
    },
    Some("""WITH seq AS (SELECT user_id, event_type,
          LEAD(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST) AS to_type
        FROM events),
      c AS (SELECT event_type AS from_type, to_type, COUNT(*) AS n
        FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2)
      SELECT from_type, to_type, n,
        CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
      FROM c"""))

  /** Sequence-pattern matching over per-user event strings (the
    * CEP / MATCH_RECOGNIZE family): each user's time-ordered history
    * compresses to a letter string (c/v/p/s/e), and behavioral patterns
    * become regexes over it — browse-then-buy `v.*p`, ends-in-error
    * `e[^p]*$`, signup-first `^s`. One hash-agg builds the strings
    * (array_sort of (ts,id,letter) structs makes them
    * partition-order-independent); per-user state is bounded by that
    * user's event count, and the pattern pass is a projection.
    */
  val q154SequencePatterns: QueryDef = QueryDef(
    "q154_sequence_patterns",
    (s, dir) => {
      val paths = EventOps.events(s, dir)
        .withColumn("letter", substring(col("event_type"), 1, 1))
        .groupBy(col("user_id"))
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(ts, event_id, letter))), x -> x.letter)"),
          "").as("path"))
      paths.agg(
        count(lit(1)).as("n_users"),
        sum(when(col("path").rlike("v.*p"), 1L).otherwise(0L)).as("n_browse_buy"),
        sum(when(col("path").rlike("e[^p]*$"), 1L).otherwise(0L)).as("n_end_in_error"),
        sum(when(col("path").rlike("^s"), 1L).otherwise(0L)).as("n_signup_first"))
    },
    Some("""WITH p AS (SELECT user_id,
          string_agg(substr(event_type, 1, 1), ''
            ORDER BY ts, event_id) AS path
        FROM events GROUP BY 1)
      SELECT COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN regexp_matches(path, 'v.*p') THEN 1 ELSE 0 END)
          AS BIGINT) AS n_browse_buy,
        CAST(SUM(CASE WHEN regexp_matches(path, 'e[^p]*$') THEN 1 ELSE 0 END)
          AS BIGINT) AS n_end_in_error,
        CAST(SUM(CASE WHEN regexp_matches(path, '^s') THEN 1 ELSE 0 END)
          AS BIGINT) AS n_signup_first
      FROM p"""))

  val all: Seq[QueryDef] =
    Seq(q120EventPaths, q121RetentionCohorts, q122AssociationRules,
        q137MarkovTransitions, q154SequencePatterns)
}
