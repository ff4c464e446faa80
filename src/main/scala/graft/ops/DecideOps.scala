package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Decision & decoding wave: Fagin's Threshold Algorithm early-stop
  * audit (the top-k index-merge planning question: how deep must two
  * sorted score lists be scanned before the combined top-k is
  * CERTIFIED), greedy bigram-LM decoding (the sanity generation every
  * corpus LM gets probed with), and the Hill tail-index estimator (the
  * order-statistics answer to "how heavy is this distribution's tail",
  * complementing q95's Zipf regression).
  *
  * Scale shapes: the TA audit ranks each score list once and fans a
  * 5-row depth sweep over the depth-bounded candidate set; the decode
  * walks 5 argmax joins against a 1-row broadcast state on the
  * vocab-sized bigram frame; Hill is top-(k+1) per sweep arm — ordered
  * limits, never a global sort of everything.
  */
object DecideOps {

  /** Threshold-Algorithm early-stop audit (Fagin et al. 2001): rank
    * documents independently by two scores — s1 = log-scaled token count,
    * s2 = type-token ratio (both exact-arithmetic) — and for each probe
    * depth d ∈ {10, 20, 50, 100, 200} report TA's state: the threshold
    * τ(d) = s1@d + s2@d (best combined score any UNSEEN doc could still
    * have), how many docs the two lists have surfaced (min(rk1,rk2) ≤ d),
    * the k-th best (k = 10) combined score among them, and whether TA may
    * STOP (kth_seen ≥ τ). The audit certifies, per depth, whether the
    * top-10 join could have terminated — the planning number behind
    * sorted-index merges. Candidates are depth-bounded (min rank ≤ 200),
    * so the sweep fan-out never touches the corpus tail. */
  val q348ThresholdAudit: QueryDef = QueryDef(
    "q348_threshold_audit",
    (s, dir) => {
      val k = 10
      val scored = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"),
          round(log(lit(1.0) + size(col("toks")).cast("double")), 9).as("s1"),
          round(size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")), 9).as("s2"))
        .localCheckpoint() // both rankings + the combined score read it
      // both full TA rankings size-adaptive (r15): window at bench
      // scale, spine above; probe counts scan the checkpointed frame
      val nDocs = scored.count()
      val ranked = Spine.adaptiveRank(
          Spine.adaptiveRank(scored, Seq(col("s1").desc, col("doc_id").asc),
            rankCol = "rk1", knownCount = nDocs),
          Seq(col("s2").desc, col("doc_id").asc),
          rankCol = "rk2", knownCount = nDocs)
        .withColumn("combined", round(col("s1") + col("s2"), 9))
        .withColumn("first_seen", least(col("rk1"), col("rk2")))
        .localCheckpoint()
      val depths = s.range(5).select(
        expr("element_at(array(10L, 20L, 50L, 100L, 200L), int(id) + 1)").as("d"))
      val cands = ranked.filter(col("first_seen") <= 200)
      val atDepth = broadcast(ranked.filter(col("rk1") <= 200)
        .select(col("rk1").as("d"), col("s1").as("s1_at"))
        .join(ranked.filter(col("rk2") <= 200)
          .select(col("rk2").as("d"), col("s2").as("s2_at")), Seq("d")))
      val perDepth = cands.crossJoin(broadcast(depths))
        .filter(col("first_seen") <= col("d"))
        .withColumn("seen_rk", row_number().over(
          Window.partitionBy(col("d"))
            .orderBy(col("combined").desc, col("doc_id").asc)))
        .groupBy(col("d"))
        .agg(count(lit(1)).as("n_seen"),
          max(when(col("seen_rk") === k, col("combined"))).as("kth_seen"))
      perDepth.join(atDepth, Seq("d"))
        .withColumn("threshold", round(col("s1_at") + col("s2_at"), 9))
        .withColumn("can_stop",
          col("kth_seen").isNotNull && col("kth_seen") >= col("threshold"))
        .select(col("d"), col("n_seen"), round(col("kth_seen"), 9).as("kth_seen"),
          col("threshold"), col("can_stop"))
        .orderBy(col("d"))
    },
    Some("""WITH scored AS (SELECT doc_id,
          round(ln(1.0 + CAST(len(tk) AS DOUBLE)), 9) AS s1,
          round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 9) AS s2
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS tk
              FROM documents)
        WHERE len(tk) > 0),
      ranked AS (SELECT doc_id, s1, s2,
          CAST(ROW_NUMBER() OVER (ORDER BY s1 DESC, doc_id) AS BIGINT) AS rk1,
          CAST(ROW_NUMBER() OVER (ORDER BY s2 DESC, doc_id) AS BIGINT) AS rk2,
          round(s1 + s2, 9) AS combined
        FROM scored),
      r2 AS (SELECT *, LEAST(rk1, rk2) AS first_seen FROM ranked),
      depths AS (SELECT UNNEST([10, 20, 50, 100, 200]) AS d),
      seen AS (SELECT dd.d, r.doc_id, r.combined,
          ROW_NUMBER() OVER (PARTITION BY dd.d
            ORDER BY r.combined DESC, r.doc_id) AS seen_rk
        FROM r2 r CROSS JOIN depths dd
        WHERE r.first_seen <= dd.d),
      pd AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS n_seen,
          MAX(CASE WHEN seen_rk = 10 THEN combined END) AS kth_seen
        FROM seen GROUP BY 1),
      at1 AS (SELECT rk1 AS d, s1 AS s1_at FROM r2 WHERE rk1 <= 200),
      at2 AS (SELECT rk2 AS d, s2 AS s2_at FROM r2 WHERE rk2 <= 200)
      SELECT CAST(p.d AS BIGINT) AS d, p.n_seen,
        round(p.kth_seen, 9) AS kth_seen,
        round(a1.s1_at + a2.s2_at, 9) AS threshold,
        p.kth_seen IS NOT NULL AND p.kth_seen >= round(a1.s1_at + a2.s2_at, 9)
          AS can_stop
      FROM pd p JOIN at1 a1 USING (d) JOIN at2 a2 USING (d)
      ORDER BY d"""))

  /** Greedy bigram-LM decode: from the corpus's most frequent token,
    * walk 5 argmax transitions (most frequent continuation, ties to the
    * lexicographically smaller token) and report each step with its
    * transition probability and the running log-probability — the
    * sanity generation that catches a broken LM count pipeline in one
    * glance. The corpus is reduced ONCE to the vocab-sized bigram/
    * unigram count frames; each decode step is an argmax against a
    * 1-row broadcast state (the q340 weight-frame discipline). */
  val q349GreedyDecode: QueryDef = QueryDef(
    "q349_greedy_decode",
    (s, dir) => {
      val decP = DecimalType(24, 12)
      val toks = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .localCheckpoint() // ONE tokenize pass feeds the bigram AND the
                           // unigram census (uncheckpointed, each re-ran
                           // scan + text shuffle + regex)
      val bigrams = toks.select(explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
        .groupBy(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // 5 argmax probes read this frame
      // argmax count with ties to the LEX-SMALLER token: min over the
      // (-count, token) struct — strings can't be negated, counts can
      var state: DataFrame = toks
        .select(explode(col("toks")).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c"))
        .select(min(struct((-col("c")).as("nc"), col("w"))).as("m"))
        .select(col("m.w").as("cur"), lit(0L).as("step"),
          (-col("m.nc")).as("c"),
          lit(null).cast("double").as("p"),
          lit(0.0).cast(decP).as("cum_lp"))
        .localCheckpoint()
      val steps = scala.collection.mutable.ListBuffer[DataFrame](state)
      for (i <- 1 to 5) {
        // the 1-row state BROADCASTS onto the bigram frame (a plain join
        // shuffled the vocab-sized frame every step — measured 17 s at
        // sf1, 3.6 s with the broadcast + fused total), and the
        // transition total is the SUM over the surviving continuations —
        // no separate totals frame, one map-side pass per step
        val next = bigrams
          .join(broadcast(state.select(col("cur"), col("cum_lp"))),
            col("w1") === col("cur"))
          .groupBy(col("cum_lp"))
          .agg(min(struct((-col("c")).as("nc"), col("w2"))).as("m"),
            sum(col("c")).as("tot"))
          .select(col("m.w2").as("cur"), lit(i.toLong).as("step"),
            (-col("m.nc")).as("c"),
            round((-col("m.nc")).cast("double") / col("tot"), 9).as("p"),
            (col("cum_lp") + round(log((-col("m.nc")).cast("double") / col("tot")), 12)
              .cast(decP)).as("cum_lp"))
        // lazy checkpoint: lineage truncates at plan-build time (the q21
        // Catalyst-analysis discipline holds) but the 1-row state frame
        // materializes inside the FINAL action instead of costing one
        // eager driver job per decode step (r15 verdict item 5)
        state = next.localCheckpoint(false)
        steps += state
      }
      steps.reduce(_.unionByName(_))
        .select(col("step"), col("cur").as("token"), col("c").as("bigram_count"),
          col("p").as("trans_p"),
          round(col("cum_lp").cast("double"), 6).as("cum_logprob"))
        .orderBy(col("step"))
    },
    Some("""WITH t AS (SELECT regexp_extract_all(lower(text), '\w+') AS tk
          FROM documents WHERE len(regexp_extract_all(lower(text), '\w+')) >= 2),
      uni AS (SELECT u.w, CAST(COUNT(*) AS BIGINT) AS c
        FROM t, UNNEST(tk) AS u(w) GROUP BY 1),
      seed AS (SELECT w AS cur, c FROM (
          SELECT w, c, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk FROM uni)
        WHERE rk = 1),
      bg AS (SELECT tk[i] AS w1, tk[i+1] AS w2, CAST(COUNT(*) AS BIGINT) AS c
        FROM t, UNNEST(range(1, len(tk))) AS r(i) GROUP BY 1, 2),
      tot AS (SELECT w1, CAST(SUM(c) AS BIGINT) AS tot FROM bg GROUP BY 1),
      s1 AS (SELECT w2 AS cur, c, p, CAST(round(ln(p0), 12) AS DECIMAL(24,12)) AS cum_lp
        FROM (SELECT b.w2, b.c, round(CAST(b.c AS DOUBLE) / tt.tot, 9) AS p,
            CAST(b.c AS DOUBLE) / tt.tot AS p0,
            ROW_NUMBER() OVER (ORDER BY b.c DESC, b.w2) AS rk
          FROM seed s JOIN bg b ON b.w1 = s.cur JOIN tot tt ON tt.w1 = s.cur)
        WHERE rk = 1),
      s2 AS (SELECT w2 AS cur, c, p,
          CAST(prev_lp + CAST(round(ln(p0), 12) AS DECIMAL(24,12)) AS DECIMAL(24,12)) AS cum_lp
        FROM (SELECT b.w2, b.c, round(CAST(b.c AS DOUBLE) / tt.tot, 9) AS p,
            CAST(b.c AS DOUBLE) / tt.tot AS p0, s.cum_lp AS prev_lp,
            ROW_NUMBER() OVER (ORDER BY b.c DESC, b.w2) AS rk
          FROM s1 s JOIN bg b ON b.w1 = s.cur JOIN tot tt ON tt.w1 = s.cur)
        WHERE rk = 1),
      s3 AS (SELECT w2 AS cur, c, p,
          CAST(prev_lp + CAST(round(ln(p0), 12) AS DECIMAL(24,12)) AS DECIMAL(24,12)) AS cum_lp
        FROM (SELECT b.w2, b.c, round(CAST(b.c AS DOUBLE) / tt.tot, 9) AS p,
            CAST(b.c AS DOUBLE) / tt.tot AS p0, s.cum_lp AS prev_lp,
            ROW_NUMBER() OVER (ORDER BY b.c DESC, b.w2) AS rk
          FROM s2 s JOIN bg b ON b.w1 = s.cur JOIN tot tt ON tt.w1 = s.cur)
        WHERE rk = 1),
      s4 AS (SELECT w2 AS cur, c, p,
          CAST(prev_lp + CAST(round(ln(p0), 12) AS DECIMAL(24,12)) AS DECIMAL(24,12)) AS cum_lp
        FROM (SELECT b.w2, b.c, round(CAST(b.c AS DOUBLE) / tt.tot, 9) AS p,
            CAST(b.c AS DOUBLE) / tt.tot AS p0, s.cum_lp AS prev_lp,
            ROW_NUMBER() OVER (ORDER BY b.c DESC, b.w2) AS rk
          FROM s3 s JOIN bg b ON b.w1 = s.cur JOIN tot tt ON tt.w1 = s.cur)
        WHERE rk = 1),
      s5 AS (SELECT w2 AS cur, c, p,
          CAST(prev_lp + CAST(round(ln(p0), 12) AS DECIMAL(24,12)) AS DECIMAL(24,12)) AS cum_lp
        FROM (SELECT b.w2, b.c, round(CAST(b.c AS DOUBLE) / tt.tot, 9) AS p,
            CAST(b.c AS DOUBLE) / tt.tot AS p0, s.cum_lp AS prev_lp,
            ROW_NUMBER() OVER (ORDER BY b.c DESC, b.w2) AS rk
          FROM s4 s JOIN bg b ON b.w1 = s.cur JOIN tot tt ON tt.w1 = s.cur)
        WHERE rk = 1)
      SELECT CAST(step AS BIGINT) AS step, token, bigram_count, trans_p, cum_logprob
      FROM (
        SELECT 0 AS step, cur AS token, c AS bigram_count,
          CAST(NULL AS DOUBLE) AS trans_p, 0.0 AS cum_logprob FROM seed
        UNION ALL SELECT 1, cur, c, p, round(CAST(cum_lp AS DOUBLE), 6) FROM s1
        UNION ALL SELECT 2, cur, c, p, round(CAST(cum_lp AS DOUBLE), 6) FROM s2
        UNION ALL SELECT 3, cur, c, p, round(CAST(cum_lp AS DOUBLE), 6) FROM s3
        UNION ALL SELECT 4, cur, c, p, round(CAST(cum_lp AS DOUBLE), 6) FROM s4
        UNION ALL SELECT 5, cur, c, p, round(CAST(cum_lp AS DOUBLE), 6) FROM s5)
      ORDER BY step"""))

  /** Hill tail-index estimator sweep (Hill 1975): for the order-value
    * distribution, α̂(k) = k / Σ_{i≤k} ln(x_(i) / x_(k+1)) over the k
    * largest values, for k ∈ {50, 100, 200} — the order-statistics tail
    * measure (small α = heavy tail), stable across k when the tail is
    * genuinely power-law. Top-(k+1) comes from one ranking window over
    * the single ordered prefix (201 rows at any corpus size); ln terms
    * round at 12 dp into DECIMAL sums. */
  val q350HillTail: QueryDef = QueryDef(
    "q350_hill_tail",
    (s, dir) => {
      val decS = DecimalType(28, 14)
      val top = Tables(s, dir).orders
        .select(col("o_totalprice").cast("double").as("x"))
        .orderBy(col("x").desc).limit(201) // distributed TakeOrdered (r15)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("x").desc)).cast("long"))
        .localCheckpoint() // three sweep arms read the same prefix
      val ks = s.range(3).select(
        expr("element_at(array(50L, 100L, 200L), int(id) + 1)").as("k"))
      val ref = top.select(col("rk").as("kp1"), col("x").as("x_ref"))
      top.crossJoin(broadcast(ks))
        .filter(col("rk") <= col("k"))
        .join(broadcast(ref), col("kp1") === col("k") + 1)
        .withColumn("t", round(log(col("x") / col("x_ref")), 12).cast(decS))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_top"),
          round(col("k").cast("double") /
            sum(col("t")).cast("double"), 6).as("alpha_hat"),
          round(max(col("x")), 2).as("x_max"),
          round(max(col("x_ref")), 2).as("x_kp1"))
        .select(col("k"), col("n_top"), col("alpha_hat"), col("x_max"), col("x_kp1"))
        .orderBy(col("k"))
    },
    Some("""WITH top AS (SELECT x, rk FROM (
          SELECT CAST(o_totalprice AS DOUBLE) AS x,
            CAST(ROW_NUMBER() OVER (ORDER BY CAST(o_totalprice AS DOUBLE) DESC)
              AS BIGINT) AS rk
          FROM orders) WHERE rk <= 201),
      ks AS (SELECT UNNEST([50, 100, 200]) AS k),
      arms AS (SELECT ks.k, t.x, r.x AS x_ref
        FROM top t CROSS JOIN ks
        JOIN top r ON r.rk = ks.k + 1
        WHERE t.rk <= ks.k)
      SELECT CAST(k AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_top,
        round(k / CAST(SUM(CAST(round(ln(x / x_ref), 12) AS DECIMAL(28,14)))
          AS DOUBLE), 6) AS alpha_hat,
        round(MAX(x), 2) AS x_max, round(MAX(x_ref), 2) AS x_kp1
      FROM arms GROUP BY k ORDER BY k"""))

  val all: Seq[QueryDef] = Seq(q348ThresholdAudit, q349GreedyDecode,
    q350HillTail)
}
