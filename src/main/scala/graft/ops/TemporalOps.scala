package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal-correctness operators: point-in-time dimension joins,
  * sliding-window rate-limit audits, rolling active-user windows, and
  * Wilson confidence bounds — the as-was / as-of layer that keeps a
  * feature pipeline from leaking the future into training rows.
  */
object TemporalOps {

  /** Point-in-time (as-was) dimension join: each lineitem is enriched
    * with the customer's order-priority version that was VALID on its
    * ship date — the SCD2 lookup that stops feature pipelines training
    * on attributes from the future. Versions come from one window pass
    * over orders (valid_from = order date, valid_to = next version's
    * date, same-day conflicts resolved by highest orderkey); the lookup
    * rides the custkey equi-join with the interval as a residual
    * predicate — fan-out bounded by versions-per-customer, never a
    * cross product. Rolled up by priority-at-ship for a compact result.
    */
  val q186PointInTime: QueryDef = QueryDef(
    "q186_point_in_time",
    (s, dir) => {
      val t = Tables(s, dir)
      val wVer = Window.partitionBy(col("o_custkey"))
        .orderBy(col("vf"), col("o_orderkey"))
      val wDay = Window.partitionBy(col("o_custkey"), col("vf"))
        .orderBy(col("o_orderkey").desc)
      val versions = t.orders
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderpriority"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("vf"))
        .withColumn("rn", row_number().over(wDay))
        .filter(col("rn") === 1) // same-day rewrites: last orderkey wins
        .withColumn("vt", lead(col("vf"), 1).over(wVer))
        .select(col("o_custkey").as("v_custkey"), col("o_orderpriority"),
          col("vf"), col("vt"))
      val facts = t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("ship_us"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(DecimalType(18, 4)).as("rev"))
      facts.join(versions,
          col("o_custkey") === col("v_custkey") &&
          col("vf") <= col("ship_us") &&
          (col("vt").isNull || col("vt") > col("ship_us")))
        .groupBy(col("o_orderpriority").as("priority_at_ship"))
        .agg(count(lit(1)).as("n_lineitems"),
          sum(col("rev")).cast("double").as("revenue"))
    },
    Some("""WITH dedup AS (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
          FROM orders),
      versions AS (SELECT o_custkey AS v_custkey, o_orderpriority,
          epoch_us(o_orderdate) AS vf,
          LEAD(epoch_us(o_orderdate), 1) OVER (PARTITION BY o_custkey
            ORDER BY epoch_us(o_orderdate), o_orderkey) AS vt
        FROM dedup WHERE rn = 1),
      facts AS (SELECT o.o_custkey, epoch_us(l.l_shipdate) AS ship_us,
          CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)) AS rev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      SELECT v.o_orderpriority AS priority_at_ship,
        COUNT(*) AS n_lineitems,
        CAST(SUM(f.rev) AS DOUBLE) AS revenue
      FROM facts f JOIN versions v ON f.o_custkey = v.v_custkey
        AND v.vf <= f.ship_us AND (v.vt IS NULL OR v.vt > f.ship_us)
      GROUP BY 1"""))

  /** Sliding-window rate-limit audit: for every event, the count of
    * that user's events in the preceding hour (RANGE frame over
    * epoch-µs — the true sliding window, not tumbling buckets); users
    * are rolled up to their peak in-window rate and flagged against a
    * 20-events/hour cap. The abuse/throttling detector, one sort per
    * user partition, state bounded by the window span.
    */
  val q187RateLimitAudit: QueryDef = QueryDef(
    "q187_rate_limit_audit",
    (s, dir) => {
      val wHr = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rangeBetween(-3600000000L, 0L)
      EventOps.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
        .withColumn("in_hour", count(lit(1)).over(wHr))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(col("in_hour")).as("peak_hourly"),
          max(when(col("in_hour") > 20, 1L).otherwise(0L)).as("over_cap"))
        .filter(col("peak_hourly") >= 3)
    },
    Some("""WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us,
          COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS in_hour
        FROM events)
      SELECT user_id, COUNT(*) AS n_events,
        CAST(MAX(in_hour) AS BIGINT) AS peak_hourly,
        CAST(MAX(CASE WHEN in_hour > 20 THEN 1 ELSE 0 END) AS BIGINT) AS over_cap
      FROM r GROUP BY 1
      HAVING MAX(in_hour) >= 3"""))

  /** Rolling 7-day active users and stickiness (DAU/WAU) per day — the
    * engagement ratio every product dashboard leads with. Each active
    * (user, day) projects onto the 7 cover days it keeps the user
    * "weekly-active" for (a bounded ×7 generator, distinct-reduced), so
    * WAU needs no windowed COUNT DISTINCT and no 7-way self-join; DAU
    * joins back on the day spine. Reported over days the fixture
    * actually observed.
    */
  val q188RollingWau: QueryDef = QueryDef(
    "q188_rolling_wau",
    (s, dir) => {
      val act = EventOps.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .localCheckpoint() // feeds DAU, the cover expansion, and the spine
      val dau = act.groupBy(col("day")).agg(count(lit(1)).as("dau"))
      val wau = act
        .select(col("user_id"),
          explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
        .distinct()
        .groupBy(col("day")).agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .select(col("day"), col("dau"), col("wau"),
          round(col("dau").cast("double") / col("wau").cast("double"), 6)
            .as("stickiness"))
    },
    Some("""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
          FROM events),
      dau AS (SELECT day, COUNT(*) AS dau FROM act GROUP BY 1),
      cover AS (SELECT DISTINCT user_id, day + CAST(x.o AS INTEGER) AS day
        FROM act CROSS JOIN (SELECT UNNEST(range(0, 7)) AS o) x),
      wau AS (SELECT day, COUNT(*) AS wau FROM cover GROUP BY 1)
      SELECT d.day, d.dau, w.wau,
        round(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
      FROM dau d JOIN wau w USING (day)"""))

  /** Wilson 95 % confidence interval for each weekday's visitor→buyer
    * conversion rate — the bound that stays honest at small n where the
    * normal approximation lies. Numerator/denominator are exact ints
    * from one distinct (user, weekday, converted) reduction; the Wilson
    * algebra is closed-form arithmetic on those exact counts, z = 1.96.
    */
  val q189WilsonCi: QueryDef = QueryDef(
    "q189_wilson_ci",
    (s, dir) => {
      val z  = lit(1.96)
      val z2 = lit(1.96) * lit(1.96) // IEEE product, mirrored in the SQL
      val conv = EventOps.events(s, dir)
        .select(dayofweek(col("ts")).as("weekday").cast("long"), col("user_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("p"))
        .groupBy(col("weekday"), col("user_id"))
        .agg(max(col("p")).as("converted"))
        .groupBy(col("weekday"))
        .agg(count(lit(1)).as("n_users"), sum(col("converted")).as("n_conv"))
      val n  = col("n_users").cast("double")
      val ph = col("n_conv").cast("double") / n
      val ctr = (ph + z2 / (lit(2.0) * n)) / (lit(1.0) + z2 / n)
      val hw  = (z / (lit(1.0) + z2 / n)) *
        sqrt(ph * (lit(1.0) - ph) / n + z2 / (lit(4.0) * n * n))
      conv.select(col("weekday"), col("n_users"), col("n_conv"),
        round(ph, 6).as("rate"),
        round(ctr - hw, 6).as("ci_lo"),
        round(ctr + hw, 6).as("ci_hi"))
    },
    Some("""WITH uc AS (SELECT CAST(dayofweek(ts) + 1 AS BIGINT) AS weekday, user_id,
          MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
        FROM events GROUP BY 1, 2),
      agg AS (SELECT weekday, COUNT(*) AS n_users,
          CAST(SUM(converted) AS BIGINT) AS n_conv
        FROM uc GROUP BY 1),
      w AS (SELECT *,
          CAST(n_users AS DOUBLE) AS n,
          CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS ph,
          CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2
        FROM agg)
      SELECT weekday, n_users, n_conv,
        round(ph, 6) AS rate,
        round((ph + z2 / (2.0 * n)) / (1.0 + z2 / n)
          - (CAST(1.96 AS DOUBLE) / (1.0 + z2 / n)) *
            sqrt(ph * (1.0 - ph) / n + z2 / (4.0 * n * n)), 6) AS ci_lo,
        round((ph + z2 / (2.0 * n)) / (1.0 + z2 / n)
          + (CAST(1.96 AS DOUBLE) / (1.0 + z2 / n)) *
            sqrt(ph * (1.0 - ph) / n + z2 / (4.0 * n * n)), 6) AS ci_hi
      FROM w"""))

  val all: Seq[QueryDef] = Seq(q186PointInTime, q187RateLimitAudit,
    q188RollingWau, q189WilsonCi)
}
