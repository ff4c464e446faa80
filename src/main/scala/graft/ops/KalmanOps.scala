package graft.ops

import org.apache.spark.sql.functions._

/** Local-level Kalman filter (Harvey 1989's structural time-series
  * workhorse) over each order-priority class's daily revenue series —
  * the online denoiser every monitoring stack runs before alerting:
  * level_t = level_{t−1} + K_t·(z_t − level_{t−1}), with the gain K_t
  * converging to the steady-state signal-to-noise fixpoint. Reports,
  * per class, the final filtered level, the converged gain, and the
  * innovation variance proxy (reference: overseer's monitoring/series
  * family — arbitrary handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: ONE corpus scan aggregates to the calendar-bounded
  * (≤2,400-day) per-class series; the ENTIRE filter recursion then
  * folds inside a single codegen'd `aggregate` higher-order function
  * per class — the q485 wavefront discipline: no driver loop, no
  * per-step shuffle, 5 parallel folds of a constant-length array.
  *
  * Exactness: observations are exact kilodollar BIGINTs (q484
  * discipline); the recursion is pure double arithmetic executed in
  * the SAME sequential order by both engines (a fold has no
  * reassociation freedom — unlike a SUM, it cannot be perturbed by
  * partitioning), so results match bit-for-bit; outputs are rounded
  * for display only.
  */
object KalmanOps {

  private val Q  = 0.1  // process noise variance (level drift per day)
  private val Rn = 10.0 // observation noise variance

  val q514KalmanFilter: QueryDef = QueryDef(
    "q514_kalman_filter",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(col("o_orderpriority").as("cls"),
          to_date(col("o_orderdate")).as("day"))
        .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
          "DIV 100000").as("z"))
      // per-class ordered series, then ONE sequential fold per class:
      // acc = (level, p, k, started)
      daily.groupBy(col("cls"))
        .agg(sort_array(collect_list(struct(col("day"), col("z")))).as("ser"))
        .select(col("cls"), size(col("ser")).cast("long").as("n_days"),
          expr(s"""aggregate(
            ser,
            named_struct('lvl', CAST(0.0 AS DOUBLE), 'p', CAST(0.0 AS DOUBLE),
                         'k', CAST(0.0 AS DOUBLE), 'started', false),
            (acc, x) -> CASE WHEN NOT acc.started THEN
                named_struct('lvl', CAST(x.z AS DOUBLE), 'p', CAST($Rn AS DOUBLE),
                             'k', CAST(0.0 AS DOUBLE), 'started', true)
              ELSE
                named_struct(
                  'lvl', acc.lvl + ((acc.p + $Q) / (acc.p + $Q + $Rn))
                           * (CAST(x.z AS DOUBLE) - acc.lvl),
                  'p', (1.0 - (acc.p + $Q) / (acc.p + $Q + $Rn)) * (acc.p + $Q),
                  'k', (acc.p + $Q) / (acc.p + $Q + $Rn),
                  'started', true)
              END) AS st"""))
        .select(col("cls"), col("n_days"),
          round(col("st.lvl"), 6).as("filtered_level"),
          round(col("st.k"), 9).as("steady_gain"),
          round(col("st.p"), 9).as("posterior_var"))
    },
    Some(s"""WITH RECURSIVE daily AS (
        SELECT o_orderpriority AS cls, CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // 100000 AS BIGINT) AS z
        FROM orders GROUP BY 1, 2),
      ser AS (
        SELECT cls, z,
          row_number() OVER (PARTITION BY cls ORDER BY day) AS pos,
          COUNT(*) OVER (PARTITION BY cls) AS n_days
        FROM daily),
      f AS (
        SELECT cls, n_days, pos, CAST(z AS DOUBLE) AS lvl,
          CAST($Rn AS DOUBLE) AS p, CAST(0.0 AS DOUBLE) AS k
        FROM ser WHERE pos = 1
        UNION ALL
        SELECT s.cls, s.n_days, s.pos,
          f.lvl + ((f.p + $Q) / (f.p + $Q + $Rn))
            * (CAST(s.z AS DOUBLE) - f.lvl),
          (1.0 - (f.p + $Q) / (f.p + $Q + $Rn)) * (f.p + $Q),
          (f.p + $Q) / (f.p + $Q + $Rn)
        FROM f JOIN ser s ON s.cls = f.cls AND s.pos = f.pos + 1)
      SELECT cls, CAST(n_days AS BIGINT) AS n_days,
        round(lvl, 6) AS filtered_level,
        round(k, 9) AS steady_gain,
        round(p, 9) AS posterior_var
      FROM f WHERE pos = n_days"""))

  val all: Seq[QueryDef] = Seq(q514KalmanFilter)
}
