package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Statistical process control & linkage wave: an EWMA control chart over
  * the daily revenue spine, lagged cross-correlation between order volume
  * and revenue, Fellegi–Sunter probabilistic record-linkage scoring, and
  * the Nelson–Aalen cumulative-hazard estimator (the counting-process
  * complement to q161's Kaplan–Meier).
  *
  * Scale shape shared by the wave: every operator reduces to the daily /
  * histogram / block spine first (calendar- or key-bounded at ANY data
  * scale), so the quadratic or windowed stage never touches row-scale
  * frames. Exactness: EWMA weights are integer powers of two (λ = 1/2),
  * so the smoothing is exact DECIMAL arithmetic end to end — no float
  * `pow` whose last-ulp behavior could differ between engines.
  */
object ControlOps {

  private val M4 = DecimalType(18, 4)

  /** Shared daily-revenue spine: day index + exact DECIMAL revenue from
    * the orders ledger (one aggregation; ~2,400 rows at any SF). */
  private def daily(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).orders
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1992-01-01"))
        .cast("long").as("d"))
      .agg(count(lit(1)).as("n_orders"),
           sum(col("o_totalprice").cast(M4)).as("rev"))

  private val dailySql =
    """daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
          CAST(COUNT(*) AS BIGINT) AS n_orders,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY 1)"""

  /** EWMA control chart (λ = 1/2, 14-day truncated window) on daily
    * revenue. The geometric weights are 2^(13−j) for lag j — integers —
    * so numerator and denominator are exact (DECIMAL × BIGINT) sums and
    * the chart value is one exact division; the center line and the
    * ±3σ·sqrt(λ/(2−λ)) limits come from exact power sums over the same
    * spine. The window stage self-joins the ~2,400-day spine against a
    * 14-day band (34k pairs, calendar-bounded at any SF). */
  val q294EwmaControl: QueryDef = QueryDef(
    "q294_ewma_control",
    (s, dir) => {
      val spine = daily(s, dir).localCheckpoint() // feeds window + moments
      val stats = spine.agg(
        count(lit(1)).as("n_days"),
        sum(col("rev")).as("s1"),
        sum(col("rev") * col("rev")).as("s2"))
        .withColumn("center", col("s1").cast("double") / col("n_days"))
        .withColumn("sigma", sqrt(col("s2").cast("double") / col("n_days") -
          col("center") * col("center")))
        .withColumn("limit", lit(3.0) * col("sigma") * sqrt(lit(1.0) / 3.0))
        .select(col("center"), col("limit"))
      // the 14-day band rides an explicit lag equi-join (d − j = ds), not
      // a bare range predicate — a range-only join plans as a nested-loop
      // shape, while this is a plain hash join at any scale
      val cur = spine.select(col("d"), col("rev").as("rev_d"))
        .withColumn("j", explode(sequence(lit(0L), lit(13L))))
      val src = spine.select(col("d").as("ds"), col("rev").as("rev_s"))
      cur.join(src, col("ds") === col("d") - col("j"))
        .withColumn("w", expr("shiftleft(CAST(1 AS BIGINT), CAST(13 - j AS INT))"))
        .groupBy(col("d"), col("rev_d"))
        .agg(sum(col("w") * col("rev_s")).as("num"), sum(col("w")).as("den"))
        .crossJoin(broadcast(stats))
        .select(col("d"),
          round(col("rev_d").cast("double"), 4).as("rev"),
          round(col("num").cast("double") / col("den"), 6).as("ewma"),
          round(col("center"), 6).as("center"),
          round(col("limit"), 6).as("limit"),
          (abs(col("num").cast("double") / col("den") - col("center")) >
            col("limit")).as("breach"))
    },
    Some(s"""WITH $dailySql,
      stats AS (SELECT COUNT(*) AS n_days, SUM(rev) AS s1, SUM(rev * rev) AS s2
        FROM daily),
      lim AS (SELECT CAST(s1 AS DOUBLE) / n_days AS center,
          3.0 * sqrt(CAST(s2 AS DOUBLE) / n_days
            - (CAST(s1 AS DOUBLE) / n_days) * (CAST(s1 AS DOUBLE) / n_days))
            * sqrt(1.0 / 3.0) AS lim
        FROM stats),
      win AS (SELECT cur.d, cur.rev AS rev_d,
          SUM((1::BIGINT << CAST(13 - j.j AS INT)) * src.rev) AS num,
          SUM(1::BIGINT << CAST(13 - j.j AS INT)) AS den
        FROM daily cur
        CROSS JOIN (SELECT UNNEST(range(0, 14)) AS j) j
        JOIN daily src ON src.d = cur.d - j.j
        GROUP BY 1, 2)
      SELECT d, round(CAST(rev_d AS DOUBLE), 4) AS rev,
        round(CAST(num AS DOUBLE) / den, 6) AS ewma,
        round(center, 6) AS center, round(lim, 6) AS "limit",
        (abs(CAST(num AS DOUBLE) / den - center) > lim) AS breach
      FROM win, lim"""))

  /** Lagged cross-correlation: Pearson r between daily revenue and the
    * order count k days earlier, k = 0…7 — the lead/lag screen that says
    * whether volume is a leading indicator of revenue. Exact DECIMAL /
    * BIGINT power sums per lag (the closed form divides doubles only at
    * the end); the lag join pairs spine days, never orders. */
  val q295LagXcorr: QueryDef = QueryDef(
    "q295_lag_xcorr",
    (s, dir) => {
      val spine = daily(s, dir).localCheckpoint()
      val cur = spine.select(col("d"), col("rev"))
        .withColumn("lag", explode(sequence(lit(0L), lit(7L))))
      val src = spine.select(col("d").as("ds"), col("n_orders").as("y"))
      cur.join(src, col("ds") === col("d") - col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("n_days"),
          sum(col("rev")).as("sx"),
          sum(col("y")).as("sy"),
          sum(col("rev") * col("rev")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("y") * col("rev")).as("sxy"))
        .select(col("lag"), col("n_days"),
          round((col("n_days").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            sqrt((col("n_days").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
              (col("n_days").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6).as("r"))
        .orderBy(col("lag"))
    },
    Some(s"""WITH $dailySql,
      pairs AS (SELECT l.lag, cur.rev, src.n_orders AS y
        FROM daily cur
        CROSS JOIN (SELECT UNNEST(range(0, 8)) AS lag) l
        JOIN daily src ON src.d = cur.d - l.lag),
      sums AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
          SUM(rev) AS sx, SUM(y) AS sy, SUM(rev * rev) AS sxx,
          SUM(y * y) AS syy, SUM(y * rev) AS sxy
        FROM pairs GROUP BY 1)
      SELECT CAST(lag AS BIGINT) AS lag, n_days,
        round((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
          sqrt((CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
            (CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r
      FROM sums ORDER BY lag"""))

  /** Fellegi–Sunter probabilistic record linkage over customers:
    * blocked candidate pairs (nation × 1000-wide balance band — block
    * sizes are key-bounded, never table-quadratic), compared on market
    * segment and 100-wide balance band. u-probabilities are the honest
    * random-pair agreement rates computed from the field marginals
    * (Σ (n_v/N)²); m-probabilities are the standard fixed priors. Each
    * agreement pattern gets the log2 match weight Σ w_field and a
    * match/non-match call at weight > 2. */
  val q296FellegiSunter: QueryDef = QueryDef(
    "q296_fellegi_sunter",
    (s, dir) => {
      val c = Tables(s, dir).customer
        .select(col("c_custkey").as("k"), col("c_nationkey").as("nat"),
          col("c_mktsegment").as("seg"),
          floor(col("c_acctbal") / 1000.0).cast("long").as("blk_band"),
          floor(col("c_acctbal") / 100.0).cast("long").as("band100"))
        .localCheckpoint() // feeds both pair sides + both marginals
      val n = c.count() // model-sized: one scalar for the u closed forms
      def u(field: String) = c.groupBy(col(field)).agg(count(lit(1)).as("nv"))
        .agg(sum(col("nv") * col("nv")).cast("double").as("ss"))
        .select((col("ss") / (n.toDouble * n.toDouble)).as(s"u_$field"))
      val us = u("seg").crossJoin(u("band100"))
      val a = c.select(col("k").as("ka"), col("nat"), col("blk_band"),
        col("seg").as("seg_a"), col("band100").as("b_a"))
      val b = c.select(col("k").as("kb"), col("nat"), col("blk_band"),
        col("seg").as("seg_b"), col("band100").as("b_b"))
      val mSeg = 0.95; val mBal = 0.85
      a.join(b, Seq("nat", "blk_band")).filter(col("ka") < col("kb"))
        .select((col("seg_a") === col("seg_b")).as("seg_agree"),
                (col("b_a") === col("b_b")).as("bal_agree"))
        .groupBy(col("seg_agree"), col("bal_agree"))
        .agg(count(lit(1)).as("n_pairs"))
        .crossJoin(broadcast(us))
        .withColumn("weight",
          when(col("seg_agree"), log2(lit(mSeg) / col("u_seg")))
            .otherwise(log2(lit(1 - mSeg) / (lit(1.0) - col("u_seg")))) +
          when(col("bal_agree"), log2(lit(mBal) / col("u_band100")))
            .otherwise(log2(lit(1 - mBal) / (lit(1.0) - col("u_band100")))))
        .select(col("seg_agree"), col("bal_agree"), col("n_pairs"),
          round(col("weight"), 6).as("weight"),
          (col("weight") > 2.0).as("is_match"))
    },
    Some("""WITH c AS (SELECT c_custkey AS k, c_nationkey AS nat,
          c_mktsegment AS seg,
          CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS blk_band,
          CAST(floor(c_acctbal / 100.0) AS BIGINT) AS band100
        FROM customer),
      nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM c),
      useg AS (SELECT CAST(SUM(nv * nv) AS DOUBLE) / (SELECT n * n FROM nn) AS u_seg
        FROM (SELECT seg, COUNT(*) AS nv FROM c GROUP BY 1)),
      uband AS (SELECT CAST(SUM(nv * nv) AS DOUBLE) / (SELECT n * n FROM nn) AS u_band
        FROM (SELECT band100, COUNT(*) AS nv FROM c GROUP BY 1)),
      pat AS (SELECT a.seg = b.seg AS seg_agree, a.band100 = b.band100 AS bal_agree,
          CAST(COUNT(*) AS BIGINT) AS n_pairs
        FROM c a JOIN c b ON a.nat = b.nat AND a.blk_band = b.blk_band
          AND a.k < b.k
        GROUP BY 1, 2),
      w AS (SELECT seg_agree, bal_agree, n_pairs,
          (CASE WHEN seg_agree THEN log2(0.95 / u_seg)
                ELSE log2(0.05 / (1.0 - u_seg)) END +
           CASE WHEN bal_agree THEN log2(0.85 / u_band)
                ELSE log2(0.15 / (1.0 - u_band)) END) AS weight
        FROM pat, useg, uband)
      SELECT seg_agree, bal_agree, n_pairs, round(weight, 6) AS weight,
        (weight > 2.0) AS is_match
      FROM w"""))

  /** Nelson–Aalen cumulative hazard of the repeat-purchase lifecycle:
    * duration = days from a customer's first order to their second
    * (censored at the global horizon when no repeat exists). H(t) =
    * Σ_{s≤t} d_s/n_s over the duration histogram — the counting-process
    * estimator whose −ln(KM) companion (same q161 guard for an emptied
    * risk set) is emitted alongside, the classic H ≤ −ln(S) sandwich.
    * Everything after the per-customer min2 aggregation is histogram-
    * sized (≤ calendar days). */
  val q297NelsonAalen: QueryDef = QueryDef(
    "q297_nelson_aalen",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_custkey").as("k"), to_date(col("o_orderdate")).as("day"))
      val horizon = o.agg(max(col("day")).as("h"))
      val firsts = o.groupBy(col("k")).agg(min(col("day")).as("t1"))
      val second = o.join(firsts, Seq("k")).filter(col("day") > col("t1"))
        .groupBy(col("k")).agg(min(col("day")).as("t2"))
      val durs = firsts.join(second, Seq("k"), "left")
        .crossJoin(broadcast(horizon))
        .withColumn("observed", col("t2").isNotNull.cast("long"))
        .withColumn("t_days",
          datediff(coalesce(col("t2"), col("h")), col("t1")).cast("long"))
      val grp = durs.groupBy(col("t_days"))
        .agg(sum(col("observed")).as("d_events"),
             sum(lit(1L) - col("observed")).as("c_censored"))
      val ord = Window.orderBy(col("t_days"))
      val suffix = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val prefix = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grp
        .withColumn("n_risk", sum(col("d_events") + col("c_censored")).over(suffix))
        .withColumn("haz", col("d_events").cast("double") / col("n_risk"))
        .withColumn("term", log(
          when(col("d_events") < col("n_risk"),
            lit(1.0) - col("d_events").cast("double") / col("n_risk"))
            .otherwise(lit(1.0))))
        .withColumn("dead",
          max((col("d_events") === col("n_risk")).cast("long")).over(prefix))
        .withColumn("hsum", sum(col("haz")).over(prefix))
        .withColumn("logsum", sum(col("term")).over(prefix))
        .filter(col("d_events") > 0)
        .select(col("t_days"), col("n_risk"), col("d_events"), col("c_censored"),
          round(col("hsum"), 6).as("cum_hazard"),
          round(when(col("dead") === 1L, lit(null).cast("double"))
            .otherwise(-col("logsum")), 6).as("neg_log_km"))
    },
    Some("""WITH o AS (SELECT o_custkey AS k, CAST(o_orderdate AS DATE) AS day
          FROM orders),
      h AS (SELECT MAX(day) AS h FROM o),
      firsts AS (SELECT k, MIN(day) AS t1 FROM o GROUP BY 1),
      second AS (SELECT o.k, MIN(o.day) AS t2
        FROM o JOIN firsts USING (k) WHERE o.day > firsts.t1 GROUP BY 1),
      durs AS (SELECT firsts.k,
          CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS observed,
          CAST(datediff('day', t1, COALESCE(t2, h.h)) AS BIGINT) AS t_days
        FROM firsts LEFT JOIN second USING (k), h),
      grp AS (SELECT t_days, CAST(SUM(observed) AS BIGINT) AS d_events,
          CAST(SUM(1 - observed) AS BIGINT) AS c_censored
        FROM durs GROUP BY 1),
      nr AS (SELECT *, CAST(SUM(d_events + c_censored) OVER (ORDER BY t_days
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
        FROM grp),
      tm AS (SELECT *, CAST(d_events AS DOUBLE) / n_risk AS haz,
          ln(CASE WHEN d_events < n_risk
             THEN 1.0 - CAST(d_events AS DOUBLE) / n_risk ELSE 1.0 END) AS term,
          MAX(CASE WHEN d_events = n_risk THEN 1 ELSE 0 END) OVER (ORDER BY t_days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
        FROM nr),
      cm AS (SELECT *, SUM(haz) OVER (ORDER BY t_days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hsum,
          SUM(term) OVER (ORDER BY t_days
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS logsum
        FROM tm)
      SELECT t_days, n_risk, d_events, c_censored,
        round(hsum, 6) AS cum_hazard,
        round(CASE WHEN dead = 1 THEN NULL ELSE -logsum END, 6) AS neg_log_km
      FROM cm WHERE d_events > 0"""))

  val all: Seq[QueryDef] =
    Seq(q294EwmaControl, q295LagXcorr, q296FellegiSunter, q297NelsonAalen)
}
