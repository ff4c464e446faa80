package graft.ops

import org.apache.spark.sql.functions._

/** Viterbi MAP decoding of a 2-state HMM over per-user event streams —
  * the maximum-a-posteriori PATH beside q517's forward-backward
  * POSTERIOR decode (Rabiner 1989 §III problem 2 vs problem 3; the two
  * are the canonical HMM readouts and disagree on real data). States:
  * `calm` emits event types at their corpus ML frequencies, `burst`
  * emits uniformly; sticky literal transitions (0.9/0.1, 0.2/0.8).
  * Instead of materializing the path, the fold carries the path's
  * burst-step count through the argmax — the Viterbi backpointer
  * statistic, computed forward (ties break toward calm, so the
  * recurrence is deterministic).
  *
  * Scale shape: one global event-type census (broadcast — |types|
  * rows); per-user streams fold inside one codegen `aggregate` each,
  * users partition the work (the q485/q547 wavefront discipline). The
  * report is md5-gate-bounded to ~1/8 of users so the recursive-CTE
  * oracle stays tractable; the Spark side would run the full corpus
  * unchanged.
  *
  * Exactness: emission ln-probs from exact BIGINT censuses, quantized
  * round(·,12); every δ step quantizes round(·,9) (the Elo/GARCH
  * discipline); surfaced log-prob round 6; counts exact BIGINT.
  */
object ViterbiOps {

  val q565ViterbiDecode: QueryDef = QueryDef(
    "q565_viterbi_decode",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("event_type"))
        .localCheckpoint() // census and streams both read it
      val census = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("c"))
      val totals = census.agg(sum(col("c")).as("n"),
        count(lit(1)).as("k"))
      val lnb = census.crossJoin(broadcast(totals))
        .select(col("event_type"),
          round(log(col("c").cast("double") / col("n").cast("double")), 12)
            .as("lnb_calm"),
          round(log(lit(1.0) / col("k").cast("double")), 12).as("lnb_burst"))
      val streams = ev
        .filter(substring(md5(col("user_id").cast("string")), 1, 1)
          .isin("0", "1"))
        .join(broadcast(lnb), Seq("event_type"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"),
          col("lnb_calm").as("bc"), col("lnb_burst").as("bb")))).as("obs"))
      streams
        .select(col("user_id"), size(col("obs")).cast("long").as("n_events"),
          expr("""aggregate(
            obs,
            named_struct('dc', CAST(0.0 AS DOUBLE), 'db', CAST(0.0 AS DOUBLE),
                         'bc', CAST(0 AS BIGINT), 'bb', CAST(0 AS BIGINT),
                         'started', false),
            (acc, o) -> CASE WHEN NOT acc.started THEN named_struct(
                'dc', round(round(ln(0.5), 12) + o.bc, 9),
                'db', round(round(ln(0.5), 12) + o.bb, 9),
                'bc', CAST(0 AS BIGINT), 'bb', CAST(1 AS BIGINT),
                'started', true)
              ELSE named_struct(
                'dc', round(greatest(acc.dc + round(ln(0.9), 12),
                        acc.db + round(ln(0.2), 12)) + o.bc, 9),
                'db', round(greatest(acc.dc + round(ln(0.1), 12),
                        acc.db + round(ln(0.8), 12)) + o.bb, 9),
                'bc', IF(acc.dc + round(ln(0.9), 12)
                       >= acc.db + round(ln(0.2), 12), acc.bc, acc.bb),
                'bb', IF(acc.dc + round(ln(0.1), 12)
                       >= acc.db + round(ln(0.8), 12), acc.bc, acc.bb) + 1L,
                'started', true)
              END) AS st"""))
        .select(col("user_id"), col("n_events"),
          when(col("st.dc") >= col("st.db"), lit("calm"))
            .otherwise(lit("burst")).as("map_state"),
          round(greatest(col("st.dc"), col("st.db")), 6).as("log_prob"),
          when(col("st.dc") >= col("st.db"), col("st.bc"))
            .otherwise(col("st.bb")).as("n_burst_steps"))
        .orderBy(col("user_id"))
    },
    Some("""WITH RECURSIVE census AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS c FROM events
        GROUP BY 1),
      totals AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS k
        FROM census),
      lnb AS (
        SELECT event_type,
          round(ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12) AS bc,
          round(ln(1.0 / CAST(k AS DOUBLE)), 12) AS bb
        FROM census CROSS JOIN totals),
      obs AS (
        SELECT e.user_id, l.bc, l.bb,
          row_number() OVER (PARTITION BY e.user_id
            ORDER BY epoch_us(e.ts), e.event_id) AS pos,
          COUNT(*) OVER (PARTITION BY e.user_id) AS n_events
        FROM events e
        JOIN lnb l ON l.event_type = e.event_type
        WHERE substr(md5(CAST(e.user_id AS VARCHAR)), 1, 1) IN ('0', '1')),
      v(user_id, pos, n_events, dc, db, bc2, bb2) AS (
        SELECT user_id, pos, n_events,
          round(round(ln(0.5), 12) + bc, 9),
          round(round(ln(0.5), 12) + bb, 9),
          CAST(0 AS BIGINT), CAST(1 AS BIGINT)
        FROM obs WHERE pos = 1
        UNION ALL
        SELECT o.user_id, o.pos, o.n_events,
          round(greatest(v.dc + round(ln(0.9), 12),
            v.db + round(ln(0.2), 12)) + o.bc, 9),
          round(greatest(v.dc + round(ln(0.1), 12),
            v.db + round(ln(0.8), 12)) + o.bb, 9),
          CASE WHEN v.dc + round(ln(0.9), 12)
            >= v.db + round(ln(0.2), 12) THEN v.bc2 ELSE v.bb2 END,
          CASE WHEN v.dc + round(ln(0.1), 12)
            >= v.db + round(ln(0.8), 12) THEN v.bc2 ELSE v.bb2 END + 1
        FROM v JOIN obs o ON o.user_id = v.user_id AND o.pos = v.pos + 1),
      last AS (
        SELECT user_id, n_events, dc, db, bc2, bb2,
          row_number() OVER (PARTITION BY user_id ORDER BY pos DESC) AS rn
        FROM v)
      SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
        CASE WHEN dc >= db THEN 'calm' ELSE 'burst' END AS map_state,
        round(greatest(dc, db), 6) AS log_prob,
        CAST(CASE WHEN dc >= db THEN bc2 ELSE bb2 END AS BIGINT)
          AS n_burst_steps
      FROM last WHERE rn = 1
      ORDER BY user_id"""))

  val all: Seq[QueryDef] = Seq(q565ViterbiDecode)
}
