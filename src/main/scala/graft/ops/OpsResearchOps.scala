package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Operations-research wave: Erlang-C staffing from measured arrival
  * rates, the newsvendor critical-fractile stock level with exact
  * empirical costs, z-service-level safety stock, and Croston's
  * intermittent-demand forecast — the capacity/inventory planning layer
  * over the same event and order ledgers.
  *
  * Scale shapes: each operator reduces the ledger to a per-group
  * statistics frame (hourly arrivals, daily demand histograms,
  * last-8-demand windows) and runs the OR closed forms there. The
  * Erlang sweep is a constant (c × k ≤ 18²) triangle; Croston's
  * windows partition by part.
  */
object OpsResearchOps {

  /** Erlang-C staffing: measured peak-hour arrival rate λ (events/hour
    * at the busiest hour-of-day, averaged across days), fixed 3-minute
    * service time ⇒ offered load a = λ/20 erlangs; for each server
    * count c the Erlang-C waiting probability
    * P_wait = (aᶜ/c!)/( (1−ρ)·Σ_{k<c} aᵏ/k! + aᶜ/c! ) and the average
    * speed of answer; the staffing answer is the smallest c meeting
    * P_wait < 0.2. The factorial triangle is (c,k ≤ c) — constant-sized;
    * λ comes from one hourly aggregation. */
  val q322ErlangStaffing: QueryDef = QueryDef(
    "q322_erlang_staffing",
    (s, dir) => {
      val hourly = EventOps.events(s, dir)
        .groupBy(floor(col("ts").cast("long") / 3600.0).cast("long").as("h"))
        .agg(count(lit(1)).as("n"))
        .withColumn("hod", pmod(col("h"), lit(24L)))
      val lam = broadcast(hourly.groupBy(col("hod"))
        .agg((sum(col("n")).cast("double") / count(lit(1))).as("rate"))
        .agg(max(col("rate")).as("lambda"))
        .withColumn("a", col("lambda") / 20.0))
      val cs = Tables(s, dir).region.limit(1)
        .crossJoin(lam)
        .select(col("lambda"), col("a"),
          explode(sequence(ceil(col("a")).cast("long") + 1,
            ceil(col("a")).cast("long") + 8)).as("c"))
      // a^k/k! as exp(k ln a - ln k!) with ln k! from a running window
      // sum of ln j — Spark's factorial() is NULL past k = 20, so any
      // fixture whose peak arrival rate exceeds ~240/hour would silently
      // diverge under the factorial form. The log-space form is exact to
      // the shared round(..., 9) and has no domain cliff.
      val wk = Window.partitionBy(col("c")).orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val terms = cs
        .withColumn("k", explode(sequence(lit(0L), col("c"))))
        .withColumn("lnfact", sum(when(col("k") > 0,
          log(col("k").cast("double"))).otherwise(lit(0.0))).over(wk))
        .withColumn("t", round(exp(col("k").cast("double") * log(col("a")) -
          col("lnfact")), 9).cast(DecimalType(28, 9)))
      terms
        .groupBy(col("lambda"), col("a"), col("c"))
        .agg(sum(when(col("k") < col("c"), col("t")).otherwise(
            lit(0).cast(DecimalType(28, 9)))).cast("double").as("s_below"),
          max(when(col("k") === col("c"), col("t"))).cast("double").as("top"))
        .withColumn("rho", col("a") / col("c"))
        .withColumn("p_wait", col("top") /
          ((lit(1.0) - col("rho")) * col("s_below") + col("top")))
        .withColumn("asa_s", col("p_wait") /
          (col("c") * lit(20.0) - col("lambda")) * 3600.0)
        .select(col("c"), round(col("a"), 6).as("offered_load"),
          round(col("rho"), 6).as("rho"), round(col("p_wait"), 6).as("p_wait"),
          round(col("asa_s"), 6).as("asa_s"),
          (col("p_wait") < 0.2).as("meets_sla"))
        .orderBy(col("c"))
    },
    Some("""WITH hourly AS (SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
          CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1),
      byhod AS (SELECT h % 24 AS hod, CAST(SUM(n) AS DOUBLE) / COUNT(*) AS rate
        FROM hourly GROUP BY 1),
      lam AS (SELECT MAX(rate) AS lambda, MAX(rate) / 20.0 AS a FROM byhod),
      cs AS (SELECT lam.lambda, lam.a, c.c
        FROM lam, LATERAL (SELECT UNNEST(range(CAST(ceil(lam.a) AS BIGINT) + 1,
          CAST(ceil(lam.a) AS BIGINT) + 9)) AS c) c),
      kr AS (SELECT cs.lambda, cs.a, cs.c, k.k
        FROM cs, LATERAL (SELECT UNNEST(range(0, cs.c + 1)) AS k) k),
      terms AS (SELECT lambda, a, c, k,
          CAST(round(exp(k * ln(a) -
            SUM(CASE WHEN k > 0 THEN ln(k) ELSE 0.0 END)
              OVER (PARTITION BY c ORDER BY k
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 9)
            AS DECIMAL(28,9)) AS t
        FROM kr),
      agg AS (SELECT lambda, a, c,
          CAST(SUM(CASE WHEN k < c THEN t ELSE CAST(0 AS DECIMAL(28,9)) END)
            AS DOUBLE) AS s_below,
          CAST(MAX(CASE WHEN k = c THEN t END) AS DOUBLE) AS top
        FROM terms GROUP BY 1, 2, 3),
      fin AS (SELECT c, a, a / c AS rho,
          top / ((1.0 - a / c) * s_below + top) AS p_wait, lambda
        FROM agg)
      SELECT CAST(c AS BIGINT) AS c, round(a, 6) AS offered_load,
        round(rho, 6) AS rho, round(p_wait, 6) AS p_wait,
        round(p_wait / (c * 20.0 - lambda) * 3600.0, 6) AS asa_s,
        (p_wait < 0.2) AS meets_sla
      FROM fin ORDER BY c"""))

  /** Newsvendor stocking: with underage cost 4 and overage cost 1 the
    * critical fractile is 0.8 — the optimal stock is the exact 80th
    * percentile of the per-nation daily order-count distribution
    * (ceil-rank order statistic). Reports the exact empirical cost at
    * that stock vs stocking the rounded mean, and the saving — the
    * canonical proof that quantiles, not means, size inventory. All
    * integer/exact arithmetic on the daily-demand frame. */
  val q323Newsvendor: QueryDef = QueryDef(
    "q323_newsvendor",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("d"))
        .localCheckpoint() // feeds the quantile, the mean, and both costs
      val wN = Window.partitionBy(col("n_name"))
      val stocks = daily
        .withColumn("rk", row_number().over(wN.orderBy(col("d").asc,
          col("day").asc)).cast("long"))
        .withColumn("n_days", count(lit(1)).over(wN))
        .filter(col("rk") === ceil(col("n_days") * 0.8).cast("long"))
        .select(col("n_name"), col("d").as("s_opt"), col("n_days"))
      val means = daily.groupBy(col("n_name"))
        .agg(round(sum(col("d")).cast("double") / count(lit(1))).cast("long")
          .as("s_mean"))
      daily.join(broadcast(stocks), Seq("n_name"))
        .join(broadcast(means), Seq("n_name"))
        .groupBy(col("n_name"), col("n_days"), col("s_opt"), col("s_mean"))
        .agg(
          sum(greatest(col("d") - col("s_opt"), lit(0L)) * 4 +
            greatest(col("s_opt") - col("d"), lit(0L))).as("cost_opt"),
          sum(greatest(col("d") - col("s_mean"), lit(0L)) * 4 +
            greatest(col("s_mean") - col("d"), lit(0L))).as("cost_mean"))
        .select(col("n_name"), col("n_days"), col("s_opt"), col("s_mean"),
          col("cost_opt"), col("cost_mean"),
          (col("cost_mean") - col("cost_opt")).as("saving"))
        .orderBy(col("n_name"))
    },
    Some("""WITH daily AS (SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS d
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      stocks AS (SELECT n_name, d AS s_opt, n_days FROM (
          SELECT n_name, d,
            CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY d, day)
              AS BIGINT) AS rk,
            CAST(COUNT(*) OVER (PARTITION BY n_name) AS BIGINT) AS n_days
          FROM daily)
        WHERE rk = CAST(ceil(n_days * 0.8) AS BIGINT)),
      means AS (SELECT n_name,
          CAST(round(CAST(SUM(d) AS DOUBLE) / COUNT(*)) AS BIGINT) AS s_mean
        FROM daily GROUP BY 1)
      SELECT d.n_name, s.n_days, s.s_opt, m.s_mean,
        CAST(SUM(greatest(d.d - s.s_opt, 0) * 4
          + greatest(s.s_opt - d.d, 0)) AS BIGINT) AS cost_opt,
        CAST(SUM(greatest(d.d - m.s_mean, 0) * 4
          + greatest(m.s_mean - d.d, 0)) AS BIGINT) AS cost_mean,
        CAST(SUM(greatest(d.d - m.s_mean, 0) * 4 + greatest(m.s_mean - d.d, 0))
          - SUM(greatest(d.d - s.s_opt, 0) * 4 + greatest(s.s_opt - d.d, 0))
          AS BIGINT) AS saving
      FROM daily d JOIN stocks s USING (n_name) JOIN means m USING (n_name)
      GROUP BY 1, 2, 3, 4 ORDER BY 1"""))

  /** Safety stock by service level: per brand, daily demand moments
    * (exact power sums) give σ_d; with a 7-day lead time the safety
    * stock is z·σ_d·√7 and the reorder point μ_d·7 + ss, at the three
    * canonical service levels (z literals, identical in both engines).
    * One aggregation + a 3-row fan-out. */
  val q324SafetyStock: QueryDef = QueryDef(
    "q324_safety_stock",
    (s, dir) => {
      val t = Tables(s, dir)
      val daily = t.lineitem
        .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand").as("brand"), to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("d"))
      val moments = daily.groupBy(col("brand"))
        .agg(count(lit(1)).as("n"), sum(col("d")).as("s1"),
          sum(col("d") * col("d")).as("s2"))
        .withColumn("mu", col("s1").cast("double") / col("n"))
        .withColumn("sigma", sqrt(col("s2").cast("double") / col("n") -
          (col("s1").cast("double") / col("n")) *
            (col("s1").cast("double") / col("n"))))
      val levels = broadcast(Tables(s, dir).region.limit(1)
        .select(explode(array(
          struct(lit(0.90).as("service_level"), lit(1.2815515655).as("z")),
          struct(lit(0.95).as("service_level"), lit(1.6448536270).as("z")),
          struct(lit(0.99).as("service_level"), lit(2.3263478740).as("z"))))
          .as("l"))
        .select(col("l.service_level"), col("l.z")))
      moments.crossJoin(levels)
        .select(col("brand"), col("service_level"),
          round(col("mu"), 4).as("mu_daily"),
          round(col("sigma"), 4).as("sigma_daily"),
          round(col("z") * col("sigma") * sqrt(lit(7.0)), 4).as("safety_stock"),
          round(col("mu") * 7.0 + col("z") * col("sigma") * sqrt(lit(7.0)), 4)
            .as("reorder_point"))
        .orderBy(col("brand"), col("service_level"))
    },
    Some("""WITH daily AS (SELECT p.p_brand AS brand,
          CAST(l_shipdate AS DATE) AS day,
          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS d
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
      moments AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(d) AS s1, SUM(d * d) AS s2 FROM daily GROUP BY 1),
      m2 AS (SELECT brand, CAST(s1 AS DOUBLE) / n AS mu,
          sqrt(CAST(s2 AS DOUBLE) / n
            - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sigma
        FROM moments),
      levels AS (SELECT CAST(service_level AS DOUBLE) AS service_level,
          CAST(z AS DOUBLE) AS z
        FROM (VALUES (0.90, 1.2815515655),
          (0.95, 1.6448536270), (0.99, 2.3263478740)) l(service_level, z))
      SELECT brand, service_level, round(mu, 4) AS mu_daily,
        round(sigma, 4) AS sigma_daily,
        round(z * sigma * sqrt(7.0), 4) AS safety_stock,
        round(mu * 7.0 + z * sigma * sqrt(7.0), 4) AS reorder_point
      FROM m2, levels ORDER BY brand, service_level"""))

  /** Croston's intermittent-demand forecast: for each SPARSE part
    * (≤ 60 demand days), exponentially smooth the last 8 nonzero demand
    * sizes and the last 8 inter-demand gaps with power-of-two weights
    * (α = 1/2 — exact integer weights, the q294 trick), and forecast
    * demand-per-day as ẑ/p̂. The smoothing windows partition by part —
    * embarrassingly parallel — and only the nonzero-demand subsequence
    * is ever materialized. */
  val q325CrostonForecast: QueryDef = QueryDef(
    "q325_croston_forecast",
    (s, dir) => {
      val daily = Tables(s, dir).lineitem
        .groupBy(col("l_partkey").as("part"), to_date(col("l_shipdate")).as("day"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).as("z"))
      val wPart = Window.partitionBy(col("part")).orderBy(col("day").asc)
      val gaps = daily
        .withColumn("gap",
          datediff(col("day"), lag(col("day"), 1).over(wPart)).cast("long"))
        .withColumn("rn_desc", row_number().over(
          Window.partitionBy(col("part")).orderBy(col("day").desc)).cast("long"))
        .filter(col("rn_desc") <= 8)
        .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), CAST(8 - rn_desc AS INT))"))
      gaps.groupBy(col("part"))
        .agg(sum(col("w") * col("z")).as("wz"),
          sum(col("w")).as("wsum"),
          sum(when(col("gap").isNotNull, col("w") * col("gap"))).as("wg"),
          sum(when(col("gap").isNotNull, col("w"))).as("wgsum"))
        .join(daily.groupBy(col("part")).agg(count(lit(1)).as("n_demand_days")),
          Seq("part"))
        .filter(col("n_demand_days") <= 60 && col("wgsum").isNotNull)
        .withColumn("z_hat", col("wz").cast("double") / col("wsum"))
        .withColumn("p_hat", col("wg").cast("double") / col("wgsum"))
        .select(col("part"), col("n_demand_days"),
          round(col("z_hat"), 6).as("z_hat"), round(col("p_hat"), 6).as("p_hat"),
          round(col("z_hat") / col("p_hat"), 6).as("demand_per_day"))
        .orderBy(col("part"))
    },
    Some("""WITH daily AS (SELECT l_partkey AS part, CAST(l_shipdate AS DATE) AS day,
          SUM(CAST(l_quantity AS DECIMAL(18,2))) AS z
        FROM lineitem GROUP BY 1, 2),
      gaps AS (SELECT part, day, z,
          CAST(datediff('day', lag(day) OVER (PARTITION BY part ORDER BY day), day)
            AS BIGINT) AS gap,
          CAST(ROW_NUMBER() OVER (PARTITION BY part ORDER BY day DESC) AS BIGINT)
            AS rn_desc
        FROM daily),
      recent AS (SELECT *, (1::BIGINT << CAST(8 - rn_desc AS INT)) AS w
        FROM gaps WHERE rn_desc <= 8),
      agg AS (SELECT part,
          SUM(w * z) AS wz, CAST(SUM(w) AS BIGINT) AS wsum,
          SUM(CASE WHEN gap IS NOT NULL THEN w * gap END) AS wg,
          SUM(CASE WHEN gap IS NOT NULL THEN w END) AS wgsum
        FROM recent GROUP BY 1),
      nd AS (SELECT part, CAST(COUNT(*) AS BIGINT) AS n_demand_days
        FROM daily GROUP BY 1)
      SELECT a.part, nd.n_demand_days,
        round(CAST(a.wz AS DOUBLE) / a.wsum, 6) AS z_hat,
        round(CAST(a.wg AS DOUBLE) / a.wgsum, 6) AS p_hat,
        round((CAST(a.wz AS DOUBLE) / a.wsum) / (CAST(a.wg AS DOUBLE) / a.wgsum), 6)
          AS demand_per_day
      FROM agg a JOIN nd USING (part)
      WHERE nd.n_demand_days <= 60 AND a.wgsum IS NOT NULL
      ORDER BY a.part"""))

  val all: Seq[QueryDef] = Seq(q322ErlangStaffing, q323Newsvendor,
    q324SafetyStock, q325CrostonForecast)
}
