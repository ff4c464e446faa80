package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Concentration, capacity, and distribution-fit operators: weighted
  * Jaccard overlap, entropy-effective catalog size, sweep-line peak
  * concurrency, and a Poisson goodness-of-fit — the capacity-planning
  * and assortment questions asked of the same keyed shapes.
  */
object DiversityOps {

  /** Weighted Jaccard (Ruzicka) similarity of event-type audiences,
    * where a user counts by engagement volume, not membership — the
    * overlap that doesn't let one-hit drive-bys dominate (q180 is the
    * set-Jaccard twin). Only the pairwise Σmin rides the user
    * equi-join; Σmax falls out of the per-type totals via
    * Σmax = T_a + T_b − Σmin, so single-type users never join.
    */
  val q198WeightedJaccard: QueryDef = QueryDef(
    "q198_weighted_jaccard",
    (s, dir) => {
      val ut = EventOps.events(s, dir)
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("w"))
        .localCheckpoint() // feeds totals and both pair sides
      val totals = ut.groupBy(col("event_type"))
        .agg(sum(col("w")).as("t"))
      val pairMin = ut.join(
          ut.select(col("user_id"), col("event_type").as("type_b"),
            col("w").as("w_b")), Seq("user_id"))
        .filter(col("event_type") < col("type_b"))
        .groupBy(col("event_type").as("type_a"), col("type_b"))
        .agg(sum(least(col("w"), col("w_b"))).as("sum_min"))
      pairMin
        .join(broadcast(totals.select(col("event_type").as("type_a"),
          col("t").as("t_a"))), Seq("type_a"))
        .join(broadcast(totals.select(col("event_type").as("type_b"),
          col("t").as("t_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("sum_min"),
          (col("t_a") + col("t_b") - col("sum_min")).as("sum_max"),
          round(col("sum_min").cast("double") /
            (col("t_a") + col("t_b") - col("sum_min")).cast("double"), 6)
            .as("weighted_jaccard"))
    },
    Some("""WITH ut AS (SELECT user_id, event_type, COUNT(*) AS w
          FROM events GROUP BY 1, 2),
      totals AS (SELECT event_type, CAST(SUM(w) AS BIGINT) AS t
        FROM ut GROUP BY 1),
      pm AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          CAST(SUM(least(a.w, b.w)) AS BIGINT) AS sum_min
        FROM ut a JOIN ut b ON a.user_id = b.user_id
          AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, sum_min,
        ta.t + tb.t - sum_min AS sum_max,
        round(CAST(sum_min AS DOUBLE) / CAST(ta.t + tb.t - sum_min AS DOUBLE), 6)
          AS weighted_jaccard
      FROM pm
      JOIN totals ta ON ta.event_type = type_a
      JOIN totals tb ON tb.event_type = type_b"""))

  /** Entropy-effective catalog size per brand: exp(H) of the
    * within-brand revenue shares — "this brand sells 40 parts but
    * effectively 7" — the assortment-concentration metric that q140's
    * Gini ranks but can't size. Per-part DECIMAL revenue rollup, brand
    * totals as windows over the part frame, one agg per brand.
    */
  val q199EffectiveCatalog: QueryDef = QueryDef(
    "q199_effective_catalog",
    (s, dir) => {
      val t = Tables(s, dir)
      val wBrand = Window.partitionBy(col("p_brand"))
      t.lineitem
        .join(t.part.select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("rev"))
        .withColumn("share",
          col("rev").cast("double") / sum(col("rev")).over(wBrand).cast("double"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_parts"),
          sum(col("rev")).cast("double").as("brand_rev"),
          round(exp(-sum(col("share") * log(col("share")))), 6)
            .as("effective_n_parts"))
    },
    Some("""WITH pr AS (SELECT p.p_brand, l.l_partkey,
          SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)))
            AS rev
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2),
      sh AS (SELECT *,
          CAST(rev AS DOUBLE) /
            CAST(SUM(rev) OVER (PARTITION BY p_brand) AS DOUBLE) AS share
        FROM pr)
      SELECT p_brand, COUNT(*) AS n_parts,
        CAST(SUM(rev) AS DOUBLE) AS brand_rev,
        round(exp(-SUM(share * ln(share))), 6) AS effective_n_parts
      FROM sh GROUP BY 1"""))

  /** Peak concurrency per day by sweep-line: each event opens a 30-min
    * interval, every boundary is a ±1 delta, and the day's peak is the
    * running-sum max (ends sort before starts at the same µs — the
    * half-open convention). The capacity question — "how many sessions
    * were open at once" — answered with one sort per day partition, no
    * self-join, no minute-grid materialization.
    */
  val q200PeakConcurrency: QueryDef = QueryDef(
    "q200_peak_concurrency",
    (s, dir) => {
      val pad = 1800000000L
      val ev = EventOps.events(s, dir)
        .select(unix_micros(col("ts")).as("ts_us"))
      val deltas = ev.select(col("ts_us"), lit(1L).as("delta"))
        .unionAll(ev.select((col("ts_us") + lit(pad)).as("ts_us"),
          lit(-1L).as("delta")))
        .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
      val wSweep = Window.partitionBy(col("day"))
        .orderBy(col("ts_us"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      deltas
        .withColumn("open", sum(col("delta")).over(wSweep))
        .groupBy(col("day"))
        .agg(sum(when(col("delta") === 1L, 1L).otherwise(0L)).as("n_opened"),
          max(col("open")).as("peak_concurrency"))
    },
    Some("""WITH ev AS (SELECT epoch_us(ts) AS ts_us FROM events),
      deltas AS (
        SELECT ts_us, 1 AS delta FROM ev
        UNION ALL
        SELECT ts_us + 1800000000 AS ts_us, -1 AS delta FROM ev),
      sweep AS (SELECT CAST(make_timestamp(ts_us) AS DATE) AS day, delta,
          SUM(delta) OVER (PARTITION BY CAST(make_timestamp(ts_us) AS DATE)
            ORDER BY ts_us, delta
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS open
        FROM deltas)
      SELECT day,
        CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
        CAST(MAX(open) AS BIGINT) AS peak_concurrency
      FROM sweep GROUP BY 1"""))

  /** Poisson goodness-of-fit for basket sizes: do lineitems-per-order
    * arrivals look Poisson, or is there real structure? λ is the exact
    * mean from one rollup; expected counts for k = 0…8 (9 = tail, by
    * complement) come from a 10-row fan-out of the 1-row stats
    * broadcast; χ² contributions land per bucket so the analyst sees
    * WHERE the fit breaks. The q56/q91 scalar idiom end to end — no
    * driver-side actions.
    */
  val q201PoissonFit: QueryDef = QueryDef(
    "q201_poisson_fit",
    (s, dir) => {
      val t = Tables(s, dir)
      val baskets = t.lineitem.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("k"))
        .localCheckpoint() // feeds the stats scalar AND the histogram
      val stats = baskets.agg(count(lit(1)).as("n_orders"),
        (sum(col("k")).cast("double") / count(lit(1)).cast("double"))
          .as("lambda"))
      val hist = baskets.groupBy(least(col("k"), lit(9L)).as("k"))
        .agg(count(lit(1)).as("obs"))
      val wCum = Window.partitionBy().orderBy(col("k"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val frame = stats
        .select(explode(sequence(lit(0L), lit(9L))).as("k"),
          col("n_orders"), col("lambda"))
        .withColumn("pmf",
          exp(-col("lambda")) * pow(col("lambda"), col("k").cast("double")) /
            factorial(col("k").cast("int")).cast("double"))
        .withColumn("p",
          when(col("k") < 9, col("pmf"))
            .otherwise(lit(1.0) - sum(col("pmf")).over(wCum)))
        .withColumn("expected", col("p") * col("n_orders").cast("double"))
      frame.join(hist, Seq("k"), "left")
        .withColumn("obs", coalesce(col("obs"), lit(0L)))
        .select(col("k"), col("obs"), round(col("expected"), 6).as("expected"),
          round((col("obs").cast("double") - col("expected")) *
                (col("obs").cast("double") - col("expected")) /
                col("expected"), 6).as("chi2_contrib"))
    },
    Some("""WITH baskets AS (SELECT l_orderkey, COUNT(*) AS k
          FROM lineitem GROUP BY 1),
      stats AS (SELECT COUNT(*) AS n_orders,
          CAST(SUM(k) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lambda
        FROM baskets),
      hist AS (SELECT CAST(least(k, 9) AS BIGINT) AS k, COUNT(*) AS obs
        FROM baskets GROUP BY 1),
      fan AS (SELECT CAST(t.i AS BIGINT) AS k, s.n_orders, s.lambda,
          exp(-s.lambda) * pow(s.lambda, CAST(t.i AS DOUBLE)) /
            CAST(factorial(CAST(t.i AS INTEGER)) AS DOUBLE) AS pmf
        FROM stats s CROSS JOIN (SELECT UNNEST(range(0, 10)) AS i) t),
      pr AS (SELECT *,
          CASE WHEN k < 9 THEN pmf
            ELSE 1.0 - SUM(pmf) OVER (ORDER BY k
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) END AS p
        FROM fan),
      ex AS (SELECT k, p * CAST(n_orders AS DOUBLE) AS expected FROM pr)
      SELECT e.k, CAST(COALESCE(h.obs, 0) AS BIGINT) AS obs,
        round(e.expected, 6) AS expected,
        round((CAST(COALESCE(h.obs, 0) AS DOUBLE) - e.expected) *
              (CAST(COALESCE(h.obs, 0) AS DOUBLE) - e.expected) / e.expected, 6)
          AS chi2_contrib
      FROM ex e LEFT JOIN hist h ON e.k = h.k"""))

  val all: Seq[QueryDef] = Seq(q198WeightedJaccard, q199EffectiveCatalog,
    q200PeakConcurrency, q201PoissonFit)
}
