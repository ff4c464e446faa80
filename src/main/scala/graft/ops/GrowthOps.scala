package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Growth-accounting and co-occurrence operators: DAU lifecycle ledger,
  * U-shaped multi-touch attribution, audience-overlap matrix, and token
  * PMI — the product-analytics closers over the same keyed window and
  * bounded-pair shapes.
  */
object GrowthOps {

  /** Daily growth accounting: every active (user, day) is NEW (first
    * day ever), RETAINED (also active yesterday) or RESURRECTED (seen
    * before, but not yesterday); a user churns after a day whose next
    * activity is not the following day. The whole ledger — the
    * new/retained/resurrected/churned decomposition every growth team
    * reports — is ONE distinct (user, day) reduction of events, two
    * per-user lag/lead windows over that model-bounded frame, and one
    * hash agg by day. No self-joins, no calendar spine.
    */
  val q178GrowthAccounting: QueryDef = QueryDef(
    "q178_growth_accounting",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      EventOps.events(s, dir)
        .select(col("user_id"), to_date(col("ts")).as("day"))
        .distinct()
        .withColumn("prev", lag(col("day"), 1).over(w))
        .withColumn("next", lead(col("day"), 1).over(w))
        .groupBy(col("day"))
        .agg(
          sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
          sum(when(datediff(col("day"), col("prev")) === 1, 1L).otherwise(0L))
            .as("n_retained"),
          sum(when(col("prev").isNotNull && datediff(col("day"), col("prev")) > 1, 1L)
            .otherwise(0L)).as("n_resurrected"),
          sum(when(col("next").isNull || datediff(col("next"), col("day")) > 1, 1L)
            .otherwise(0L)).as("n_churned_after"))
    },
    Some("""WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      seq AS (SELECT *,
          LAG(day, 1) OVER (PARTITION BY user_id ORDER BY day) AS prev,
          LEAD(day, 1) OVER (PARTITION BY user_id ORDER BY day) AS next
        FROM act)
      SELECT day,
        CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
        CAST(SUM(CASE WHEN day - prev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
        CAST(SUM(CASE WHEN prev IS NOT NULL AND day - prev > 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_resurrected,
        CAST(SUM(CASE WHEN next IS NULL OR next - day > 1 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_churned_after
      FROM seq GROUP BY 1"""))

  /** U-shaped (position-based) multi-touch attribution: each purchase
    * splits its value 40/20/40 across first / middle / last touches in
    * the prior 24 h (solo touch takes 100 %, a pair splits 50/50) —
    * completing the first-touch (q138) / linear (q148) family with the
    * scheme most marketing stacks default to. Same bounded interval-join
    * candidate set; position and touch count come from ONE ranking
    * window; credit is exact-DECIMAL value × a small-rational weight,
    * rounded once at the end.
    */
  val q179PositionAttribution: QueryDef = QueryDef(
    "q179_position_attribution",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
                unix_micros(col("ts")).as("p_us"), col("value"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("channel"),
                unix_micros(col("ts")).as("t_us"),
                col("event_id").as("touch_id"))
      val cand = purchases.join(touches, Seq("user_id"))
        .filter(col("t_us") < col("p_us") &&
                col("t_us") >= col("p_us") - lit(86400000000L))
      val w = Window.partitionBy(col("purchase_id"))
        .orderBy(col("t_us").asc, col("touch_id").asc)
      cand
        .withColumn("pos", row_number().over(w))
        .withColumn("n_t", count(lit(1)).over(
          Window.partitionBy(col("purchase_id"))))
        .withColumn("weight",
          when(col("n_t") === 1, lit(1.0))
            .when(col("n_t") === 2, lit(0.5))
            .when(col("pos") === 1 || col("pos") === col("n_t"), lit(0.4))
            .otherwise(lit(0.2) / (col("n_t").cast("double") - lit(2.0))))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          round(sum(col("value").cast(DecimalType(18, 4)).cast("double") *
                    col("weight")), 4).as("credited_revenue"))
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id,
            epoch_us(ts) AS p_us, value
          FROM events WHERE event_type = 'purchase'),
        t AS (SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us,
            event_id AS touch_id
          FROM events WHERE event_type IN ('click', 'view')),
        cand AS (SELECT p.purchase_id, p.value, t.channel, t.t_us, t.touch_id
          FROM p JOIN t USING (user_id)
          WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 86400000000),
        pos AS (SELECT *,
            ROW_NUMBER() OVER (PARTITION BY purchase_id
              ORDER BY t_us ASC, touch_id ASC) AS pos,
            COUNT(*) OVER (PARTITION BY purchase_id) AS n_t
          FROM cand),
        cr AS (SELECT channel,
            CAST(CAST(value AS DECIMAL(18,4)) AS DOUBLE) *
              (CASE WHEN n_t = 1 THEN 1.0
                    WHEN n_t = 2 THEN 0.5
                    WHEN pos = 1 OR pos = n_t THEN 0.4
                    ELSE 0.2 / (CAST(n_t AS DOUBLE) - 2.0) END) AS credit
          FROM pos)
      SELECT channel, COUNT(*) AS n_touches,
        round(SUM(credit), 4) AS credited_revenue
      FROM cr GROUP BY 1"""))

  /** Audience-overlap matrix: Jaccard similarity of the user bases of
    * every event-type pair — "do purchasers also share?" — the audience
    * planner's canonical matrix. Distinct (user, type) reduces events
    * once; pairs ride the user equi-join (≤ |types|² per user, bounded
    * by a constant), and per-type audience sizes join back onto the
    * |types|²-row pair table. Never types × types over users.
    */
  val q180AudienceOverlap: QueryDef = QueryDef(
    "q180_audience_overlap",
    (s, dir) => {
      val ut = EventOps.events(s, dir)
        .select(col("user_id"), col("event_type")).distinct()
        .localCheckpoint() // feeds sizes and both pair sides
      val sizes = ut.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"))
      val pairs = ut.join(
          ut.select(col("user_id"), col("event_type").as("type_b")),
          Seq("user_id"))
        .filter(col("event_type") < col("type_b"))
        .groupBy(col("event_type").as("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
          col("n_users").as("n_a"))), Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
          col("n_users").as("n_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
          round(col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6)
            .as("jaccard"))
    },
    Some("""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
      sizes AS (SELECT event_type, COUNT(*) AS n_users FROM ut GROUP BY 1),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          COUNT(*) AS n_both
        FROM ut a JOIN ut b ON a.user_id = b.user_id
          AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT type_a, type_b, sa.n_users AS n_a, sb.n_users AS n_b, n_both,
        round(CAST(n_both AS DOUBLE) /
          CAST(sa.n_users + sb.n_users - n_both AS DOUBLE), 6) AS jaccard
      FROM pairs
      JOIN sizes sa ON sa.event_type = type_a
      JOIN sizes sb ON sb.event_type = type_b"""))

  /** Pointwise mutual information of top-vocabulary token pairs
    * co-occurring in documents — the collocation detector feeding
    * phrase mining and tokenizer-merge decisions. The vocabulary is the
    * top-40 tokens by document frequency (model-sized, broadcast); each
    * doc contributes its DISTINCT vocab tokens, so the pair stage is an
    * equi-join on doc_id bounded by 40² per doc worst-case; marginal
    * doc frequencies and N join back onto the pair table. PMI > 0 means
    * the pair co-occurs more than independence predicts.
    */
  val q181TokenPmi: QueryDef = QueryDef(
    "q181_token_pmi",
    (s, dir) => {
      val docTok = Tables(s, dir).documents
        .select(col("doc_id"), explode(array_distinct(TextOps.tokens(col("text"))))
          .as("tok"))
        .localCheckpoint() // one tokenize pass feeds vocab, marginals, pairs
      val vocab = docTok.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"))
        .orderBy(col("df").desc, col("tok").asc)
        .limit(40)
        .localCheckpoint() // 40 rows: broadcast filter + marginal source
      val vt = docTok.join(broadcast(vocab.select(col("tok"))), Seq("tok"))
      // in-plan scalar (the q56/q91 idiom) — never a driver-side count()
      val nDocs = Tables(s, dir).documents
        .agg(count(lit(1)).cast("double").as("n_docs"))
      val pairs = vt.join(
          vt.select(col("doc_id"), col("tok").as("tok_b")), Seq("doc_id"))
        .filter(col("tok") < col("tok_b"))
        .groupBy(col("tok").as("tok_a"), col("tok_b"))
        .agg(count(lit(1)).as("n_both"))
      pairs
        .join(broadcast(vocab.select(col("tok").as("tok_a"), col("df").as("df_a"))),
          Seq("tok_a"))
        .join(broadcast(vocab.select(col("tok").as("tok_b"), col("df").as("df_b"))),
          Seq("tok_b"))
        .filter(col("n_both") >= 5)
        .crossJoin(broadcast(nDocs))
        .select(col("tok_a"), col("tok_b"), col("df_a"), col("df_b"), col("n_both"),
          round(log(col("n_both").cast("double") * col("n_docs") /
            (col("df_a").cast("double") * col("df_b").cast("double"))), 6)
            .as("pmi"))
    },
    Some("""WITH dt AS (SELECT doc_id,
          UNNEST(list_distinct(regexp_extract_all(lower(text), '\w+'))) AS tok
        FROM documents),
      vocab AS (SELECT tok, COUNT(*) AS df FROM dt GROUP BY 1
        ORDER BY df DESC, tok ASC LIMIT 40),
      n AS (SELECT COUNT(*) AS n_docs FROM documents),
      vt AS (SELECT dt.doc_id, dt.tok FROM dt JOIN vocab USING (tok)),
      pairs AS (SELECT a.tok AS tok_a, b.tok AS tok_b, COUNT(*) AS n_both
        FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
        GROUP BY 1, 2)
      SELECT tok_a, tok_b, va.df AS df_a, vb.df AS df_b, n_both,
        round(ln(CAST(n_both AS DOUBLE) * CAST(n.n_docs AS DOUBLE) /
          (CAST(va.df AS DOUBLE) * CAST(vb.df AS DOUBLE))), 6) AS pmi
      FROM pairs
      JOIN vocab va ON va.tok = tok_a
      JOIN vocab vb ON vb.tok = tok_b
      CROSS JOIN n
      WHERE n_both >= 5"""))

  val all: Seq[QueryDef] = Seq(q178GrowthAccounting, q179PositionAttribution,
    q180AudienceOverlap, q181TokenPmi)
}
