package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Recommender-system operators: item-item collaborative filtering,
  * multi-touch attribution, and time-decayed popularity — the ranking
  * signals a product pipeline derives from the same co-occurrence and
  * event machinery as q122/q138.
  */
object RecsysOps {

  /** Item-item cosine similarity over binary co-purchase vectors
    * (collaborative filtering's memory-based form): an item is the set
    * of orders containing it, cos(x,y) = |x∩y| / √(|x|·|y|). Pair
    * intersections come from the orderkey EQUI-join (basket-bounded,
    * never item×item) and the norms are the broadcast marginals — the
    * q122 plan deriving a different statistic. Top-5 neighbors per item
    * via one ranking window.
    */
  val q147ItemItemCosine: QueryDef = QueryDef(
    "q147_item_item_cosine",
    // r16: the top-5 frame is the shared GraphBase.itemItemTop5 base —
    // q155 (NDCG) and q552 (MRR) compose this query verbatim, so the
    // basket self-join + ranking used to run three times per JVM
    (s, dir) => GraphBase.itemItemTop5(s, dir),
    Some("""WITH o AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part
          FROM lineitem),
        p AS (SELECT a.part AS x, b.part AS y, COUNT(*) AS c_xy
          FROM o a JOIN o b ON a.ok = b.ok AND a.part < b.part
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        m AS (SELECT part, COUNT(*) AS c FROM o GROUP BY 1),
        sc AS (SELECT p.x, p.y, p.c_xy,
            round(CAST(p.c_xy AS DOUBLE) /
              sqrt(CAST(mx.c AS DOUBLE) * CAST(my.c AS DOUBLE)), 6) AS cos
          FROM p JOIN m mx ON p.x = mx.part JOIN m my ON p.y = my.part),
        r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY x
            ORDER BY cos DESC, y ASC) AS BIGINT) AS rk FROM sc)
      SELECT x, y, c_xy, cos, rk FROM r WHERE rk <= 5"""))

  /** Linear (equal-credit) multi-touch attribution: q138's first-touch
    * sibling — every click/view in the 24 h window shares the purchase's
    * value equally. Per-touch credit is value/n quantized to
    * DECIMAL(18,6) at the row, so the per-channel totals are exact sums
    * of identical quanta on both engines (summing raw value/n doubles
    * would be partition-order-dependent).
    */
  val q148LinearAttribution: QueryDef = QueryDef(
    "q148_linear_attribution",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
                unix_micros(col("ts")).as("p_us"), col("value"))
      val touches = ev.filter(col("event_type").isin("click", "view"))
        .select(col("user_id"), col("event_type").as("channel"),
                unix_micros(col("ts")).as("t_us"))
      val cand = purchases.join(touches, Seq("user_id"))
        .filter(col("t_us") < col("p_us") &&
                col("t_us") >= col("p_us") - lit(86400000000L))
      val w = Window.partitionBy(col("purchase_id"))
      cand.withColumn("n_touches", count(lit(1)).over(w))
        .withColumn("credit",
          (col("value") / col("n_touches")).cast(DecimalType(18, 6)))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touchpoints"),
             countDistinct(col("purchase_id")).as("n_conversions"),
             sum(col("credit")).cast("double").as("attributed_revenue"))
    },
    Some("""WITH p AS (SELECT user_id, event_id AS purchase_id,
            epoch_us(ts) AS p_us, value
          FROM events WHERE event_type = 'purchase'),
        t AS (SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us
          FROM events WHERE event_type IN ('click', 'view')),
        cand AS (SELECT p.purchase_id, t.channel, p.value
          FROM p JOIN t USING (user_id)
          WHERE t.t_us < p.p_us AND t.t_us >= p.p_us - 86400000000),
        cr AS (SELECT purchase_id, channel,
            CAST(value / (COUNT(*) OVER (PARTITION BY purchase_id))
                 AS DECIMAL(18,6)) AS credit
          FROM cand)
      SELECT channel, COUNT(*) AS n_touchpoints,
        COUNT(DISTINCT purchase_id) AS n_conversions,
        CAST(SUM(credit) AS DOUBLE) AS attributed_revenue
      FROM cr GROUP BY 1"""))

  /** Time-decayed popularity: every event contributes exp(−age/τ) with
    * τ = 7 days against the corpus's max timestamp (an in-plan 1-row
    * broadcast — no wall clock, so the score is reproducible). Each
    * per-row decay is quantized to DECIMAL(18,12) before summing: the
    * aggregate is an exact sum of identical quanta under any
    * partitioning, sidestepping double-sum order dependence entirely.
    */
  val q149DecayedPopularity: QueryDef = QueryDef(
    "q149_decayed_popularity",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"))
      val horizon = ev.agg(max(col("us")).as("max_us"))
      ev.crossJoin(broadcast(horizon))
        .withColumn("decay",
          exp((col("us") - col("max_us")).cast("double") / lit(6.048e11))
            .cast(DecimalType(18, 12)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
             sum(col("decay")).cast("double").as("decayed_score"))
    },
    Some("""WITH h AS (SELECT MAX(epoch_us(ts)) AS max_us FROM events),
        d AS (SELECT event_type,
            CAST(exp(CAST(epoch_us(ts) - h.max_us AS DOUBLE) / 6.048e11)
                 AS DECIMAL(18,12)) AS decay
          FROM events CROSS JOIN h)
      SELECT event_type, COUNT(*) AS n_events,
        CAST(SUM(decay) AS DOUBLE) AS decayed_score
      FROM d GROUP BY 1"""))

  /** Offline ranking evaluation: NDCG@5 of q147's cosine ranking against
    * co-purchase count as graded relevance. DCG sums rel/log2(pos+1)
    * over the system order; IDCG over the relevance-ideal order (ties by
    * neighbor id, both engines); per-item NDCG = DCG/IDCG. The metric
    * every recsys pipeline reports, computed entirely in-plan: the q147
    * frame plus one ideal-order ranking window — no collect, no
    * driver-side scoring. round(6) absorbs 5-term double-sum ordering
    * (q94's discipline).
    */
  val q155NdcgEval: QueryDef = QueryDef(
    "q155_ndcg_eval",
    (s, dir) => {
      val ranked = q147ItemItemCosine.fn(s, dir)
      val ideal = Window.partitionBy(col("x"))
        .orderBy(col("c_xy").desc, col("y").asc)
      ranked
        .withColumn("ideal_rk", row_number().over(ideal))
        .withColumn("dcg_term",
          col("c_xy").cast("double") / (log(col("rk") + 1.0) / log(lit(2.0))))
        .withColumn("idcg_term",
          col("c_xy").cast("double") /
            (log(col("ideal_rk") + 1.0) / log(lit(2.0))))
        .groupBy(col("x"))
        .agg(count(lit(1)).as("k"),
             round(sum(col("dcg_term")), 6).as("dcg"),
             round(sum(col("idcg_term")), 6).as("idcg"),
             round(sum(col("dcg_term")) / sum(col("idcg_term")), 6).as("ndcg"))
    },
    Some("""WITH o AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part
          FROM lineitem),
        p AS (SELECT a.part AS x, b.part AS y, COUNT(*) AS c_xy
          FROM o a JOIN o b ON a.ok = b.ok AND a.part < b.part
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        m AS (SELECT part, COUNT(*) AS c FROM o GROUP BY 1),
        sc AS (SELECT p.x, p.y, p.c_xy,
            round(CAST(p.c_xy AS DOUBLE) /
              sqrt(CAST(mx.c AS DOUBLE) * CAST(my.c AS DOUBLE)), 6) AS cos
          FROM p JOIN m mx ON p.x = mx.part JOIN m my ON p.y = my.part),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x
            ORDER BY cos DESC, y ASC) AS rk FROM sc),
        top AS (SELECT * FROM r WHERE rk <= 5),
        t2 AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x
            ORDER BY c_xy DESC, y ASC) AS ideal_rk FROM top),
        terms AS (SELECT x,
            CAST(c_xy AS DOUBLE) / (ln(rk + 1.0) / ln(2.0)) AS dcg_term,
            CAST(c_xy AS DOUBLE) / (ln(ideal_rk + 1.0) / ln(2.0)) AS idcg_term
          FROM t2)
      SELECT x, COUNT(*) AS k,
        round(SUM(dcg_term), 6) AS dcg,
        round(SUM(idcg_term), 6) AS idcg,
        round(SUM(dcg_term) / SUM(idcg_term), 6) AS ndcg
      FROM terms GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q147ItemItemCosine, q148LinearAttribution, q149DecayedPopularity,
        q155NdcgEval)
}
