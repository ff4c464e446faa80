package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sequential pattern mining over the event log — the frequent
  * CONSECUTIVE trigram table a product/behavior pipeline keeps as its
  * "common journeys" summary (reference: overseer's funnel/journey query
  * family, doc/guide/Introduction.md:3). For every user the
  * event stream is ordered by (ts, event_id) and every window of three
  * consecutive events contributes one occurrence of the trigram
  * (t0,t1,t2); the report is the top-20 trigrams with occurrence count,
  * distinct-user support, share of all trigram windows, and LIFT against
  * the order-free baseline p(t0)·p(t1)·p(t2) — the PrefixSpan-style
  * contiguous-pattern special case that needs no candidate explosion.
  *
  * Scale shape: ONE shuffle by user_id for the lead() window (an
  * events pipeline is usually already user-partitioned, making that a
  * no-op upstream), then a map-side-combinable trigram hash agg whose
  * key space is |types|³ (125 here) — the reduce side is model-sized at
  * any corpus scale. Unigram shares and the two grand totals are 5-row/
  * 1-row broadcasts. No self-joins, no candidate generation: the k=3
  * contiguous pattern is a pure window, which is exactly why this shape
  * survives 100 TB while general PrefixSpan does not.
  *
  * Exactness: counts BIGINT both sides; share/lift are single
  * BIGINT→DOUBLE division chains rounded at 6/4; top-20 tie-broken on
  * the full trigram key.
  */
object SeqPatOps {

  val q494SeqpatMining: QueryDef = QueryDef(
    "q494_seqpat_mining",
    (s, dir) => {
      val ev = EventOps.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val tri = ev
        .withColumn("t1", lead(col("event_type"), 1).over(w))
        .withColumn("t2", lead(col("event_type"), 2).over(w))
        .where(col("t1").isNotNull && col("t2").isNotNull)
        .select(col("user_id"), col("event_type").as("g0"),
          col("t1").as("g1"), col("t2").as("g2"))
      val counts = tri.groupBy(col("g0"), col("g1"), col("g2"))
        .agg(count(lit(1)).as("n_occ"),
          countDistinct(col("user_id")).as("n_users"))
      // 5-row unigram frame + 1-row totals: broadcast lift inputs
      val uni = ev.groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      val nEv = ev.agg(count(lit(1)).as("n_events"))
      val nTri = counts.agg(sum(col("n_occ")).as("n_tri"))
      counts
        .join(broadcast(uni.select(col("event_type").as("g0"),
          col("cnt").as("c0"))), Seq("g0"))
        .join(broadcast(uni.select(col("event_type").as("g1"),
          col("cnt").as("c1"))), Seq("g1"))
        .join(broadcast(uni.select(col("event_type").as("g2"),
          col("cnt").as("c2"))), Seq("g2"))
        .crossJoin(broadcast(nEv))
        .crossJoin(broadcast(nTri))
        .select(col("g0"), col("g1"), col("g2"), col("n_occ"), col("n_users"),
          round(col("n_occ").cast("double") / col("n_tri").cast("double"), 6)
            .as("support"),
          round(col("n_occ").cast("double") / (col("n_tri").cast("double") *
            (col("c0").cast("double") / col("n_events").cast("double")) *
            (col("c1").cast("double") / col("n_events").cast("double")) *
            (col("c2").cast("double") / col("n_events").cast("double"))), 4)
            .as("lift"))
        .orderBy(col("n_occ").desc, col("g0"), col("g1"), col("g2"))
        .limit(20)
    },
    Some("""WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        FROM events),
      tri AS (
        SELECT user_id, event_type AS g0,
          LEAD(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id) AS g1,
          LEAD(event_type, 2) OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id) AS g2
        FROM ev),
      counts AS (
        SELECT g0, g1, g2, CAST(COUNT(*) AS BIGINT) AS n_occ,
          CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM tri WHERE g1 IS NOT NULL AND g2 IS NOT NULL
        GROUP BY 1, 2, 3),
      uni AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM ev GROUP BY 1),
      ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_events FROM ev),
      nt AS (SELECT CAST(SUM(n_occ) AS BIGINT) AS n_tri FROM counts)
      SELECT c.g0, c.g1, c.g2, c.n_occ, c.n_users,
        round(CAST(c.n_occ AS DOUBLE) / CAST(nt.n_tri AS DOUBLE), 6)
          AS support,
        round(CAST(c.n_occ AS DOUBLE) / (CAST(nt.n_tri AS DOUBLE) *
          (CAST(u0.cnt AS DOUBLE) / CAST(ne.n_events AS DOUBLE)) *
          (CAST(u1.cnt AS DOUBLE) / CAST(ne.n_events AS DOUBLE)) *
          (CAST(u2.cnt AS DOUBLE) / CAST(ne.n_events AS DOUBLE))), 4)
          AS lift
      FROM counts c
      JOIN uni u0 ON u0.event_type = c.g0
      JOIN uni u1 ON u1.event_type = c.g1
      JOIN uni u2 ON u2.event_type = c.g2
      CROSS JOIN ne CROSS JOIN nt
      ORDER BY c.n_occ DESC, c.g0, c.g1, c.g2
      LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(q494SeqpatMining)
}
