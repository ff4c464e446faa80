package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Stationary distribution of the user-behavior Markov chain — "where
  * does a session settle?" (reference: overseer's journey/transition
  * analytics, doc/guide/Introduction.md:3; q315 uses the same
  * chain for removal attribution, this query computes its long-run
  * fixed point). The chain's states are event types; P(i,j) is the
  * maximum-likelihood transition probability from consecutive per-user
  * event pairs; π is advanced K=10 steps of power iteration from the
  * uniform start (π' = πP), exactly unrolled in the oracle — the q101
  * PageRank discipline. Beside π the report carries the EMPIRICAL
  * source-state share, so the gap column shows how far the chain is
  * from its own long-run mix (a drift detector for behavioral data).
  *
  * Scale shape: the ONLY corpus-sized work is the lead() window (one
  * shuffle by user_id) and the (i,j) hash agg — map-side combinable
  * into ≤|types|² rows. Power iteration then runs on a |types|²-row
  * frame: each step is a broadcast join + |types|-row agg, the
  * model-sized iteration a 1000-executor cluster wouldn't even notice.
  * Every step localCheckpoints (the driver-loop fixpoint rule: without
  * it Catalyst analysis of the growing plan goes exponential).
  *
  * Exactness: transition counts BIGINT; P and π are double chains with
  * identical association both engines (SUM over ≤5 terms through the
  * same GROUP BY — q101's precedent); surfaced columns round at 6.
  */
object MarkovChainOps {

  private val K = 10

  val q496MarkovStationary: QueryDef = QueryDef(
    "q496_markov_stationary",
    (s, dir) => {
      // r16: the transition census is the shared
      // GraphBase.userTransitionCensus base (q558 composes this query,
      // so the corpus lead-window used to run twice per q558); the
      // model-sized iteration frames checkpoint LAZILY — lineage still
      // truncates per step, but the ≤|types|-row frames materialize
      // inside the final action instead of one eager driver job each
      val trans = GraphBase.userTransitionCensus(s, dir)
      val rowTot = trans.groupBy(col("cur")).agg(sum(col("cnt")).as("tot"))
      val p = trans.join(broadcast(rowTot), Seq("cur"))
        .select(col("cur"), col("nxt"),
          (col("cnt").cast("double") / col("tot").cast("double")).as("p"))
        .localCheckpoint(false)
      val states = p.select(col("cur").as("state")).distinct().localCheckpoint(false)
      val t = states.count()
      var pi = states.withColumn("pi", lit(1.0 / t))
      for (_ <- 1 to K) {
        pi = states.join(
            p.join(pi.withColumnRenamed("state", "cur"), Seq("cur"))
              .groupBy(col("nxt").as("state"))
              .agg(sum(col("pi") * col("p")).as("inflow")),
            Seq("state"), "left")
          .select(col("state"), coalesce(col("inflow"), lit(0.0)).as("pi"))
          .localCheckpoint(false)
      }
      val share = trans.groupBy(col("cur").as("state"))
        .agg(sum(col("cnt")).as("n_src"))
        .crossJoin(broadcast(trans.agg(sum(col("cnt")).as("n_all"))))
        .select(col("state"), col("n_src"),
          (col("n_src").cast("double") / col("n_all").cast("double"))
            .as("emp_share"))
      pi.join(share, Seq("state"))
        .select(col("state"), col("n_src"),
          round(col("pi"), 6).as("stationary_p"),
          round(col("emp_share"), 6).as("emp_share"),
          round(abs(col("pi") - col("emp_share")), 6).as("gap"))
        .orderBy(col("state"))
    },
    Some {
      val steps = (1 to K).map { k =>
        s"""c$k AS (SELECT p.nxt AS state, SUM(pi.pi * p.p) AS inflow
             FROM p JOIN pi${k - 1} pi ON pi.state = p.cur GROUP BY 1),
           pi$k AS (SELECT s.state, COALESCE(c.inflow, 0.0) AS pi
             FROM states s LEFT JOIN c$k c ON c.state = s.state)"""
      }.mkString(",\n      ")
      s"""WITH ev AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        FROM events),
      pairs AS (
        SELECT event_type AS cur,
          LEAD(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id) AS nxt
        FROM ev),
      trans AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs WHERE nxt IS NOT NULL GROUP BY 1, 2),
      rowtot AS (SELECT cur, CAST(SUM(cnt) AS BIGINT) AS tot
        FROM trans GROUP BY 1),
      p AS (SELECT t.cur, t.nxt,
          CAST(t.cnt AS DOUBLE) / CAST(r.tot AS DOUBLE) AS p
        FROM trans t JOIN rowtot r ON r.cur = t.cur),
      states AS (SELECT DISTINCT cur AS state FROM p),
      tn AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM states),
      pi0 AS (SELECT state, CAST(1.0 AS DOUBLE) / CAST(tn.t AS DOUBLE) AS pi
        FROM states CROSS JOIN tn),
      $steps,
      share AS (
        SELECT cur AS state, CAST(SUM(cnt) AS BIGINT) AS n_src
        FROM trans GROUP BY 1),
      alltot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_all FROM trans)
      SELECT s.state, s.n_src,
        round(pi.pi, 6) AS stationary_p,
        round(CAST(s.n_src AS DOUBLE) / CAST(a.n_all AS DOUBLE), 6)
          AS emp_share,
        round(abs(pi.pi - CAST(s.n_src AS DOUBLE) / CAST(a.n_all AS DOUBLE)),
          6) AS gap
      FROM share s JOIN pi$K pi ON pi.state = s.state CROSS JOIN alltot a
      ORDER BY s.state"""
    })

  /** Entropy rate of the user-behavior chain: H = −Σᵢ πᵢ Σⱼ pᵢⱼ ln pᵢⱼ
    * with π from q496's 10-step power iteration — the bits-per-step
    * compressibility of user journeys (a chain drifting toward
    * determinism is a product-health signal; a chain at maximum entropy
    * has no structure to recommend against). Rides q496's registered
    * frame (the q157-reuses-q79 composition idiom): the transition
    * census is the only corpus-sized work; everything after is
    * |types|²-row algebra.
    *
    * Exactness: per-(i,j) terms −pᵢⱼ ln pᵢⱼ quantized round(·,12) and
    * summed as DECIMAL (order-free), surfaced round 6. */
  val q558MarkovEntropyRate: QueryDef = QueryDef(
    "q558_markov_entropy_rate",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      // r16: shared census base — see q496; the composed q496 call below
      // reads the same materialized frame, so the events window runs
      // once per JVM instead of twice per run of this query
      val trans = GraphBase.userTransitionCensus(s, dir)
      val rowTot = trans.groupBy(col("cur")).agg(sum(col("cnt")).as("tot"))
      // per-state conditional entropy from quantized terms
      val hState = trans.join(broadcast(rowTot), Seq("cur"))
        .select(col("cur"),
          round(-(col("cnt").cast("double") / col("tot").cast("double")) *
            log(col("cnt").cast("double") / col("tot").cast("double")), 12)
            .cast(DecimalType(28, 12)).as("term"))
        .groupBy(col("cur").as("state"))
        .agg(sum(col("term")).cast("double").as("h_state"))
      // π via q496's registered stationary column (round-6, both engines)
      val pi = q496MarkovStationary.fn(s, dir)
        .select(col("state"), col("stationary_p"))
      hState.join(pi, Seq("state"))
        .select(col("state"), round(col("h_state"), 6).as("h_state"),
          col("stationary_p"),
          round(col("stationary_p") * col("h_state"), 6).as("contribution"))
        .orderBy(col("state"))
    },
    Some {
      val q496Sql = q496MarkovStationary.oracle.get
      s"""WITH q496 AS ($q496Sql),
      ev2 AS (
        SELECT user_id, epoch_us(ts) AS ts_us, event_id, event_type
        FROM events),
      pairs2 AS (
        SELECT event_type AS cur,
          LEAD(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts_us, event_id) AS nxt
        FROM ev2),
      trans2 AS (
        SELECT cur, nxt, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM pairs2 WHERE nxt IS NOT NULL GROUP BY 1, 2),
      rowtot2 AS (SELECT cur, CAST(SUM(cnt) AS BIGINT) AS tot
        FROM trans2 GROUP BY 1),
      hstate AS (
        SELECT t.cur AS state,
          CAST(SUM(CAST(round(-(CAST(t.cnt AS DOUBLE) / r.tot)
            * ln(CAST(t.cnt AS DOUBLE) / r.tot), 12)
            AS DECIMAL(28,12))) AS DOUBLE) AS h_state
        FROM trans2 t JOIN rowtot2 r ON r.cur = t.cur
        GROUP BY 1)
      SELECT h.state, round(h.h_state, 6) AS h_state,
        q.stationary_p,
        round(q.stationary_p * h.h_state, 6) AS contribution
      FROM hstate h JOIN q496 q ON q.state = h.state
      ORDER BY h.state"""
    })

  val all: Seq[QueryDef] = Seq(q496MarkovStationary, q558MarkovEntropyRate)
}
