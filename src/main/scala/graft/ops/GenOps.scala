package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Generation & diagnostics wave: sampling-temperature entropy curves on
  * the corpus LM, tandem-repeat profiling, position-bias estimation from
  * the event log, and importance-weight diagnostics for the DSIR
  * reweighting stack.
  */
object GenOps {

  /** Sampling-temperature audit: the five heaviest bigram contexts'
    * continuation distributions reshaped at T = 0.5/1/2 (p_T ∝ p^{1/T}),
    * each scored by its Shannon entropy — the flatness-vs-peakedness
    * curve a sampling config buys. Count frames are vocab-bounded; the
    * per-context reduces are order-exact DECIMAL sums of rounded terms.
    * T = 0.5 must sharpen (lower entropy) and T = 2 must flatten — the
    * spec asserts the ordering. */
  val q286TemperatureEntropy: QueryDef = QueryDef(
    "q286_temperature_entropy",
    (s, dir) => {
      val decS = DecimalType(28, 14)
      val bg = Tables(s, dir).documents
        .select(TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .localCheckpoint() // feeds context ranking + the entropy terms
      val wTop = Window.partitionBy().orderBy(col("c1").desc, col("w1").asc)
      val top5 = c12.groupBy(col("w1")).agg(sum(col("c12")).as("c1"))
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 5)
        .select(col("w1"), col("c1"))
      val temps = Seq(0.5, 1.0, 2.0)
      val parts = temps.map { t =>
        val wCtx = Window.partitionBy(col("w1"))
        c12.join(broadcast(top5), Seq("w1"))
          .withColumn("pw", round(pow(col("c12").cast("double") / col("c1"), 1.0 / t), 12))
          .withColumn("z", sum(round(col("pw"), 12).cast(decS)).over(wCtx).cast("double"))
          .withColumn("pt", col("pw") / col("z"))
          .groupBy(col("w1"))
          .agg(count(lit(1)).as("n_continuations"),
            round(-sum(round(col("pt") * log(col("pt")), 12).cast(decS)).cast("double"), 6)
              .as("entropy"))
          .select(col("w1"), lit(t).as("temperature"), col("n_continuations"), col("entropy"))
      }
      parts.reduce(_ union _)
    },
    Some("""WITH t AS (SELECT regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      bg AS (SELECT u.u.w1 AS w1, u.u.w2 AS w2
        FROM (SELECT toks FROM t WHERE len(toks) >= 2),
          UNNEST(list_transform(range(0, len(toks)-1),
            i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS u(u)),
      c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
      top5 AS (SELECT w1, c1 FROM (
          SELECT w1, SUM(c12) AS c1,
            ROW_NUMBER() OVER (ORDER BY SUM(c12) DESC, w1) AS rk
          FROM c12 GROUP BY 1) WHERE rk <= 5),
      temps AS (SELECT UNNEST([0.5::DOUBLE, 1.0::DOUBLE, 2.0::DOUBLE]) AS temperature),
      pw AS (SELECT tm.temperature, c.w1, c.w2,
          round(pow(CAST(c.c12 AS DOUBLE) / t5.c1, 1.0 / tm.temperature), 12) AS pw
        FROM c12 c JOIN top5 t5 USING (w1) CROSS JOIN temps tm),
      zz AS (SELECT temperature, w1, w2, pw,
          CAST(SUM(CAST(round(pw, 12) AS DECIMAL(28,14)))
            OVER (PARTITION BY temperature, w1) AS DOUBLE) AS z
        FROM pw)
      SELECT w1, temperature, CAST(COUNT(*) AS BIGINT) AS n_continuations,
        round(-CAST(SUM(CAST(round((pw / z) * ln(pw / z), 12) AS DECIMAL(28,14))) AS DOUBLE), 6) AS entropy
      FROM zz GROUP BY 1, 2"""))

  /** Tandem-repeat profiling: runs of the SAME token (lag-equality
    * islands) per document — longest run, repeated-token mass, and the
    * repeat rate. The "aaaa…" / boilerplate-stutter signal that q76's
    * n-gram ratios miss when the repetition is a single token; one
    * explode + per-doc windows, no joins. */
  val q287TandemRepeats: QueryDef = QueryDef(
    "q287_tandem_repeats",
    (s, dir) => {
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("p").asc)
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("p"), col("col").as("t"))
        .withColumn("new_run",
          when(lag(col("t"), 1).over(wDoc).isNull ||
               lag(col("t"), 1).over(wDoc) =!= col("t"), 1L).otherwise(0L))
        .withColumn("run_id", sum(col("new_run")).over(wDoc))
      toks.groupBy(col("doc_id"), col("run_id"))
        .agg(count(lit(1)).as("run_len"))
        .groupBy(col("doc_id"))
        .agg(sum(col("run_len")).as("n_tokens"),
          max(col("run_len")).as("max_run"),
          sum(col("run_len") - 1).as("n_repeats"))
        .withColumn("repeat_rate",
          round(col("n_repeats").cast("double") / col("n_tokens"), 6))
    },
    Some("""WITH toks AS (SELECT doc_id, t.p AS p, toks[t.p] AS t FROM (
          SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
          FROM documents),
          UNNEST(generate_series(1, len(toks))) AS t(p)),
      runs AS (SELECT doc_id, p, t,
          CASE WHEN LAG(t) OVER (PARTITION BY doc_id ORDER BY p) IS NULL
            OR LAG(t) OVER (PARTITION BY doc_id ORDER BY p) <> t
            THEN 1 ELSE 0 END AS new_run
        FROM toks),
      rid AS (SELECT doc_id, t,
          SUM(new_run) OVER (PARTITION BY doc_id ORDER BY p
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        FROM runs),
      rl AS (SELECT doc_id, run_id, COUNT(*) AS run_len FROM rid GROUP BY 1, 2)
      SELECT doc_id, CAST(SUM(run_len) AS BIGINT) AS n_tokens,
        CAST(MAX(run_len) AS BIGINT) AS max_run,
        CAST(SUM(run_len - 1) AS BIGINT) AS n_repeats,
        round(CAST(SUM(run_len - 1) AS DOUBLE) / SUM(run_len), 6) AS repeat_rate
      FROM rl GROUP BY 1"""))

  /** Position-bias estimation: events sessionized at 30-minute gaps
    * (q19's rule), each event's in-session position, and the click share
    * per position 1..10 normalized to position 1 — the raw curve a
    * click-model (COEC/PBM) calibrates against. Session assembly is the
    * per-user ordered window; the position frame is 10 rows. */
  val q288PositionBias: QueryDef = QueryDef(
    "q288_position_bias",
    (s, dir) => {
      val wUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      val wAll = Window.partitionBy()
      val ev = EventOps.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
        .withColumn("gap_s",
          col("ts").cast("long") - lag(col("ts").cast("long"), 1).over(wUser))
        .withColumn("new_sess",
          when(col("gap_s").isNull || col("gap_s") > 1800, 1L).otherwise(0L))
        .withColumn("sess", sum(col("new_sess")).over(wUser))
      val wSess = Window.partitionBy(col("user_id"), col("sess"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val pos = ev.withColumn("position", row_number().over(wSess).cast("long"))
        .filter(col("position") <= 10)
        .groupBy(col("position"))
        .agg(count(lit(1)).as("n_events"),
          sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("n_clicks"))
        .withColumn("ctr", round(col("n_clicks").cast("double") / col("n_events"), 9))
      pos
        .withColumn("ctr_pos1",
          max(when(col("position") === 1, col("ctr"))).over(wAll))
        .select(col("position"), col("n_events"), col("n_clicks"),
          round(col("ctr"), 6).as("ctr"),
          round(col("ctr") / col("ctr_pos1"), 6).as("bias_vs_pos1"))
    },
    Some("""WITH ev AS (SELECT user_id, event_id, ts, event_type,
          CAST(floor(epoch(ts)) AS BIGINT) - LAG(CAST(floor(epoch(ts)) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_s
        FROM events),
      sess AS (SELECT user_id, event_id, ts, event_type,
          SUM(CASE WHEN gap_s IS NULL OR gap_s > 1800 THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        FROM ev),
      pos AS (SELECT CAST(ROW_NUMBER() OVER (PARTITION BY user_id, sess
            ORDER BY ts, event_id) AS BIGINT) AS position, event_type
        FROM sess),
      aggd AS (SELECT position, COUNT(*) AS n_events,
          SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_clicks
        FROM pos WHERE position <= 10 GROUP BY 1),
      c AS (SELECT position, n_events, n_clicks,
          round(CAST(n_clicks AS DOUBLE) / n_events, 9) AS ctr
        FROM aggd)
      SELECT position, CAST(n_events AS BIGINT) AS n_events,
        CAST(n_clicks AS BIGINT) AS n_clicks, round(ctr, 6) AS ctr,
        round(ctr / MAX(CASE WHEN position = 1 THEN ctr END) OVER (), 6) AS bias_vs_pos1
      FROM c"""))

  /** Importance-weight diagnostics for the DSIR reweighting (q232):
    * w = exp(avg_llr) per document, the effective sample size
    * (Σw)²/Σw², the exact rank-based p99 weight, and the same
    * diagnostics after clipping at p99 — the check run before TRUSTING
    * a reweighted mixture (a tiny ESS means a few documents ARE the
    * dataset). One global order for the exact percentile (the q231
    * honest cost); everything else is one moments pass. */
  val q289WeightDiagnostics: QueryDef = QueryDef(
    "q289_weight_diagnostics",
    (s, dir) => {
      val decS = DecimalType(28, 12)
      val w = RerankOps.q232DsirWeights.fn(s, dir)
        .select(col("doc_id"), round(exp(col("avg_llr")), 9).as("w"))
        .localCheckpoint() // feeds the percentile and both moment passes
      val wOrd = Window.partitionBy().orderBy(col("w").asc, col("doc_id").asc)
      val p99 = w.withColumn("rn", row_number().over(wOrd).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .filter(col("rn") === floor((col("n") * 99 + 99) / 100.0).cast("long"))
        .select(col("w").as("w99"))
      w.crossJoin(broadcast(p99))
        .withColumn("wc", least(col("w"), col("w99")))
        .agg(count(lit(1)).as("n_docs"),
          sum(round(col("w"), 9).cast(decS)).as("sw"),
          sum(round(col("w") * col("w"), 6).cast(decS)).as("sw2"),
          sum(round(col("wc"), 9).cast(decS)).as("swc"),
          sum(round(col("wc") * col("wc"), 6).cast(decS)).as("swc2"),
          round(min(col("w99")), 6).as("p99_w"))
        .select(col("n_docs"), col("p99_w"),
          round(pow(col("sw").cast("double"), 2) / col("sw2").cast("double"), 6).as("ess"),
          round(pow(col("sw").cast("double"), 2) / col("sw2").cast("double") /
            col("n_docs"), 6).as("ess_share"),
          round(pow(col("swc").cast("double"), 2) / col("swc2").cast("double"), 6)
            .as("ess_clipped"),
          round((col("sw").cast("double") - col("swc").cast("double")) /
            col("sw").cast("double"), 6).as("clipped_mass_share"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, lang, UNNEST(regexp_extract_all(lower(text), '\w+')) AS t
        FROM documents),
      tf AS (SELECT doc_id, lang, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3),
      counts AS (SELECT t, SUM(tf) AS cc,
          SUM(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS ct
        FROM tf GROUP BY 1),
      totals AS (SELECT CAST(SUM(cc) AS BIGINT) AS nc,
          CAST(COUNT(*) AS BIGINT) AS v,
          CAST(SUM(ct) AS BIGINT) AS nt FROM counts),
      sc AS (SELECT tf.doc_id, tf.tf,
          ln((CAST(counts.ct AS DOUBLE) + 1.0) / (CAST(tt.nt AS DOUBLE) + tt.v))
          - ln((CAST(counts.cc AS DOUBLE) + 1.0) / (CAST(tt.nc AS DOUBLE) + tt.v)) AS llr
        FROM tf JOIN counts USING (t) CROSS JOIN totals tt),
      wts AS (SELECT doc_id, round(exp(round(SUM(tf * llr) / SUM(tf), 6)), 9) AS w
        FROM sc GROUP BY 1),
      p99 AS (SELECT w AS w99 FROM (
          SELECT w, ROW_NUMBER() OVER (ORDER BY w, doc_id) AS rn,
            COUNT(*) OVER () AS n
          FROM wts) WHERE rn = (n * 99 + 99) // 100),
      cl AS (SELECT wts.doc_id, wts.w, LEAST(wts.w, p.w99) AS wc, p.w99
        FROM wts CROSS JOIN p99 p)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, round(MIN(w99), 6) AS p99_w,
        round(pow(CAST(SUM(CAST(round(w, 9) AS DECIMAL(28,12))) AS DOUBLE), 2)
          / CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(28,12))) AS DOUBLE), 6) AS ess,
        round(pow(CAST(SUM(CAST(round(w, 9) AS DECIMAL(28,12))) AS DOUBLE), 2)
          / CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS ess_share,
        round(pow(CAST(SUM(CAST(round(wc, 9) AS DECIMAL(28,12))) AS DOUBLE), 2)
          / CAST(SUM(CAST(round(wc * wc, 6) AS DECIMAL(28,12))) AS DOUBLE), 6) AS ess_clipped,
        round((CAST(SUM(CAST(round(w, 9) AS DECIMAL(28,12))) AS DOUBLE)
          - CAST(SUM(CAST(round(wc, 9) AS DECIMAL(28,12))) AS DOUBLE))
          / CAST(SUM(CAST(round(w, 9) AS DECIMAL(28,12))) AS DOUBLE), 6) AS clipped_mass_share
      FROM cl"""))

  val all: Seq[QueryDef] =
    Seq(q286TemperatureEntropy, q287TandemRepeats, q288PositionBias,
        q289WeightDiagnostics)
}
