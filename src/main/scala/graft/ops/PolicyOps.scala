package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Policy-evaluation & uncertainty wave: offline off-policy evaluation
  * (IPS/SNIPS) over the event log, split conformal prediction intervals,
  * Poisson-bootstrap standard errors (the distributed bootstrap), and an
  * interpolated Kneser-Ney bigram LM upgrade of q94's add-one smoother.
  *
  * Determinism defenses (the house rules from QueryDef's scaladoc):
  * propensities/means are rounded at 9 dp before use; double terms are
  * rounded then summed through DECIMAL so partition order can never
  * perturb a published 6 dp figure; md5 is the only randomness source,
  * identically derivable in both engines.
  */
object PolicyOps {

  /** Offline off-policy evaluation by inverse propensity scoring: the
    * logged behavior policy's propensity for an action is its global
    * share of the event log; the target policy recommends each user's
    * modal event type (ties lexicographic). IPS reweights matching
    * logged events by 1/p̂, SNIPS self-normalizes, and the effective
    * sample size (Σw)²/Σw² says how many logged events the estimate is
    * really standing on. One pass over events + a user-modal window + a
    * types-sized propensity broadcast — nothing quadratic, no per-user
    * state on the driver. */
  val q242IpsPolicyEval: QueryDef = QueryDef(
    "q242_ips_policy_eval",
    (s, dir) => {
      val ev = Tables(s, dir).events
        .select(col("user_id"), col("event_type"),
                coalesce(col("value"), lit(0.0)).as("r"))
        .localCheckpoint() // feeds propensity, policy, and scoring
      val prop = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("ca"))
        .withColumn("p",
          round(col("ca").cast("double") /
            sum(col("ca")).over(Window.partitionBy()), 9))
        .select(col("event_type"), col("p"))
      val wPick = Window.partitionBy(col("user_id"))
        .orderBy(col("cu").desc, col("event_type").asc)
      val policy = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cu"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("pi_a"))
      val dec = DecimalType(28, 10)
      ev.join(policy, Seq("user_id"))
        .join(broadcast(prop), Seq("event_type"))
        .withColumn("w",
          when(col("event_type") === col("pi_a"), lit(1.0) / col("p"))
            .otherwise(lit(0.0)))
        .groupBy(col("pi_a"))
        .agg(
          count(lit(1)).as("n_logged"),
          sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_matched"),
          sum(round(col("w") * col("r"), 6).cast(dec)).as("swr"),
          sum(round(col("w"), 6).cast(dec)).as("sw"),
          sum(round(col("w") * col("w"), 6).cast(dec)).as("sw2"))
        .select(col("pi_a"), col("n_logged"), col("n_matched"),
          round(col("swr").cast("double") / col("n_logged"), 6).as("ips"),
          round(col("swr").cast("double") / col("sw").cast("double"), 6).as("snips"),
          round(pow(col("sw").cast("double"), 2) / col("sw2").cast("double"), 6).as("ess"))
    },
    Some("""WITH ev AS (SELECT user_id, event_type, COALESCE(value, 0.0) AS r FROM events),
      tot AS (SELECT event_type, COUNT(*) AS ca FROM ev GROUP BY 1),
      prop AS (SELECT event_type, round(CAST(ca AS DOUBLE) / SUM(ca) OVER (), 9) AS p FROM tot),
      pol AS (SELECT user_id, event_type AS pi_a FROM (
          SELECT user_id, event_type,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM ev GROUP BY user_id, event_type) WHERE rn = 1),
      sc AS (SELECT e.user_id, e.event_type, e.r, pol.pi_a,
          CASE WHEN e.event_type = pol.pi_a THEN 1.0 / p.p ELSE 0.0 END AS w
        FROM ev e JOIN pol USING (user_id) JOIN prop p ON p.event_type = e.event_type)
      SELECT pi_a, CAST(COUNT(*) AS BIGINT) AS n_logged,
        CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        round(CAST(SUM(CAST(round(w * r, 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS ips,
        round(CAST(SUM(CAST(round(w * r, 6) AS DECIMAL(28,10))) AS DOUBLE)
            / CAST(SUM(CAST(round(w, 6) AS DECIMAL(28,10))) AS DOUBLE), 6) AS snips,
        round(pow(CAST(SUM(CAST(round(w, 6) AS DECIMAL(28,10))) AS DOUBLE), 2)
            / CAST(SUM(CAST(round(w * w, 6) AS DECIMAL(28,10))) AS DOUBLE), 6) AS ess
      FROM sc GROUP BY 1"""))

  /** Split conformal prediction interval for order totals: md5 splits
    * orders 8/4/4 (train/calibration/test) on the first hex digit, the
    * model is the train-side priority mean, the calibration residuals'
    * ceil(0.9(n+1))-th order statistic is the distribution-free radius
    * q̂, and test-side coverage per priority certifies the promised 90%.
    * k uses integer arithmetic (floor((9(n+1)+9)/10)) so both engines
    * pick the identical order statistic; the single global sort of the
    * calibration frame is the honest exact-quantile cost (the q231
    * precedent). */
  val q243ConformalInterval: QueryDef = QueryDef(
    "q243_conformal_interval",
    (s, dir) => {
      val dec = DecimalType(18, 4)
      val o = Tables(s, dir).orders
        .withColumn("g",
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 1), 16, 10).cast("int"))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"), col("g"))
        .localCheckpoint() // feeds all three splits
      val model = o.filter(col("g") < 8)
        .groupBy(col("o_orderpriority"))
        .agg(round(sum(col("o_totalprice").cast(dec)).cast("double") /
               count(lit(1)), 9).as("mu"))
      val cal = o.filter(col("g") >= 8 && col("g") < 12)
        .join(broadcast(model), Seq("o_orderpriority"))
        .select(col("o_orderkey"), abs(col("o_totalprice") - col("mu")).as("s"))
      val nCal = cal.agg(count(lit(1)).as("n_cal"))
      val wOrd = Window.partitionBy().orderBy(col("s").asc, col("o_orderkey").asc)
      val qhat = cal.withColumn("rn", row_number().over(wOrd).cast("long"))
        .crossJoin(broadcast(nCal))
        .filter(col("rn") ===
          floor((lit(9L) * (col("n_cal") + 1L) + 9L) / 10.0).cast("long"))
        .select(col("s").as("q_hat"))
      o.filter(col("g") >= 12)
        .join(broadcast(model), Seq("o_orderpriority"))
        .crossJoin(broadcast(qhat))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_test"),
          sum(when(abs(col("o_totalprice") - col("mu")) <= col("q_hat"), 1L)
            .otherwise(0L)).as("n_covered"),
          round(min(col("q_hat")), 6).as("q_hat"))
        .withColumn("coverage",
          round(col("n_covered").cast("double") / col("n_test"), 6))
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
          ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1))::INT AS g
        FROM orders),
      model AS (SELECT o_orderpriority,
          round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 9) AS mu
        FROM o WHERE g < 8 GROUP BY 1),
      cal AS (SELECT o.o_orderkey, abs(o.o_totalprice - m.mu) AS s
        FROM o JOIN model m USING (o_orderpriority) WHERE g >= 8 AND g < 12),
      n AS (SELECT COUNT(*) AS n_cal FROM cal),
      qhat AS (SELECT s AS q_hat FROM (
          SELECT s, ROW_NUMBER() OVER (ORDER BY s, o_orderkey) AS rn FROM cal) r, n
        WHERE r.rn = (9 * (n.n_cal + 1) + 9) // 10)
      SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_test,
        CAST(SUM(CASE WHEN abs(o.o_totalprice - m.mu) <= q.q_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
        round(MIN(q.q_hat), 6) AS q_hat,
        round(CAST(SUM(CASE WHEN abs(o.o_totalprice - m.mu) <= q.q_hat THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS coverage
      FROM o JOIN model m USING (o_orderpriority) CROSS JOIN qhat q
      WHERE o.g >= 12 GROUP BY 1"""))

  /** Poisson-bootstrap standard error of the mean order total per
    * priority: each (order, replicate) draws a Poisson(1) weight through
    * the md5-uniform inverse CDF (thresholds at 10 dp, identical in both
    * engines), B=32 replicate means come from exact DECIMAL weighted
    * sums, and the replicate spread is the SE. THE distributed bootstrap:
    * no resample materialization, one explode + one (priority, replicate)
    * aggregation with map-side combine, replicate count a constant —
    * the shape survives any scale-up as a ×B linear pass. */
  val q244PoissonBootstrap: QueryDef = QueryDef(
    "q244_poisson_bootstrap",
    (s, dir) => {
      val B = 32
      val dec = DecimalType(18, 4)
      val decM = DecimalType(28, 12)
      // Poisson(1) CDF thresholds, 10 dp: P(X<=k) for k = 0..5; u above
      // the last threshold draws 6 (P ~ 6e-5 — bias far below 9 dp).
      val cdf = Seq(0.3678794412, 0.7357588823, 0.9196986029,
                    0.9810118431, 0.9963401532, 0.9994058151)
      val draws = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
        .withColumn("b", explode(sequence(lit(0), lit(B - 1))))
        .withColumn("u",
          conv(substring(md5(concat_ws("|", col("o_orderkey"), col("b"))), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0))
        .withColumn("k",
          // reverse fold so the SMALLEST threshold lands outermost —
          // when-chains resolve outside-in
          cdf.zipWithIndex.reverse.foldLeft(lit(6)) { case (acc, (t, i)) =>
            when(col("u") < t, lit(i)).otherwise(acc)
          }.cast("long"))
      val reps = draws.groupBy(col("o_orderpriority"), col("b"))
        .agg(sum(col("k")).as("nk"),
             sum((col("k") * col("o_totalprice").cast(dec)).cast(decM)).as("skp"))
        .withColumn("m", round(col("skp").cast("double") / col("nk"), 9))
      reps.groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_reps"),
          sum(round(col("m"), 9).cast(decM)).as("sm"),
          sum(round(col("m") * col("m"), 6).cast(decM)).as("sm2"))
        .select(col("o_orderpriority"), col("n_reps"),
          round(col("sm").cast("double") / col("n_reps"), 6).as("boot_mean"),
          round(sqrt((col("sm2").cast("double") -
              pow(col("sm").cast("double"), 2) / col("n_reps")) /
            (col("n_reps") - 1)), 6).as("boot_se"))
    },
    Some("""WITH draws AS (SELECT o_orderpriority, o_totalprice, t.b,
          CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|' || CAST(t.b AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 AS u
        FROM orders, UNNEST(range(0, 32)) AS t(b)),
      k AS (SELECT o_orderpriority, o_totalprice, b,
          CASE WHEN u < 0.3678794412 THEN 0 WHEN u < 0.7357588823 THEN 1
               WHEN u < 0.9196986029 THEN 2 WHEN u < 0.9810118431 THEN 3
               WHEN u < 0.9963401532 THEN 4 WHEN u < 0.9994058151 THEN 5
               ELSE 6 END AS k
        FROM draws),
      reps AS (SELECT o_orderpriority, b, SUM(k) AS nk,
          round(CAST(SUM(CAST(k * CAST(o_totalprice AS DECIMAL(18,4)) AS DECIMAL(28,12))) AS DOUBLE)
            / SUM(k), 9) AS m
        FROM k GROUP BY 1, 2)
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_reps,
        round(CAST(SUM(CAST(round(m, 9) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS boot_mean,
        round(sqrt((CAST(SUM(CAST(round(m * m, 6) AS DECIMAL(28,12))) AS DOUBLE)
            - pow(CAST(SUM(CAST(round(m, 9) AS DECIMAL(28,12))) AS DOUBLE), 2) / COUNT(*))
          / (COUNT(*) - 1)), 6) AS boot_se
      FROM reps GROUP BY 1"""))

  /** Interpolated Kneser-Ney bigram scoring (absolute discount D = 0.75):
    * P(w2|w1) = (c12−D)/c1 + (D·N1+(w1,·)/c1)·(N1+(·,w2)/N1+(·,·)) — the
    * continuation-count smoother that replaced add-one (q94) in every
    * serious LM stack. Same frame shapes as q94 (bigram counts, left
    * counts, a 1-row bigram-type total broadcast) plus the two distinct-
    * continuation frames; per-doc NLL aggregates with map-side combine.
    * All bigrams score against counts from the same corpus, so c12 ≥ 1
    * and the discounted mass is always positive. */
  val q245KneserNey: QueryDef = QueryDef(
    "q245_kneser_ney",
    (s, dir) => {
      val base = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
      val bg = base
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint() // feeds c12/c1/continuations and the scoring join
      val c12 = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .localCheckpoint() // feeds both continuation frames and the total
      val c1 = bg.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val fwd = c12.groupBy(col("w1")).agg(count(lit(1)).as("n1p_fwd"))
      val rev = c12.groupBy(col("w2")).agg(count(lit(1)).as("n1p_rev"))
      val types = c12.agg(count(lit(1)).as("n_types"))
      val d = lit(0.75)
      // score each distinct bigram TYPE once (all four count frames are
      // vocab-bounded), then one corpus-sized join back to occurrences —
      // the q94 type-level rework (32 → single-digit s at sf1)
      val typeNll = c12.join(c1, Seq("w1"))
        .join(fwd, Seq("w1")).join(rev, Seq("w2"))
        .crossJoin(broadcast(types))
        .withColumn("p",
          (col("c12").cast("double") - d) / col("c1") +
            (d / col("c1")) * col("n1p_fwd") *
            (col("n1p_rev").cast("double") / col("n_types")))
        .select(col("w1"), col("w2"), (-log(col("p"))).as("nll"))
      bg.join(typeNll, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(sum(col("nll")) / count(lit(1)), 6).as("avg_nll"),
          round(exp(sum(col("nll")) / count(lit(1))), 6).as("ppl"))
    },
    Some("""WITH base AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
          FROM documents),
      b2 AS (SELECT doc_id, toks FROM base WHERE len(toks) >= 2),
      bg AS (SELECT doc_id, t.u.w1 AS w1, t.u.w2 AS w2 FROM b2,
          UNNEST(list_transform(range(0, len(toks)-1),
            i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS t(u)),
      c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
      fwd AS (SELECT w1, COUNT(*) AS n1p_fwd FROM c12 GROUP BY 1),
      rev AS (SELECT w2, COUNT(*) AS n1p_rev FROM c12 GROUP BY 1),
      types AS (SELECT COUNT(*) AS n_types FROM c12),
      sc AS (SELECT bg.doc_id,
          -ln((CAST(c12.c12 AS DOUBLE) - 0.75) / c1.c1
            + (0.75 / c1.c1) * fwd.n1p_fwd
              * (CAST(rev.n1p_rev AS DOUBLE) / types.n_types)) AS nll
        FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
          JOIN fwd USING (w1) JOIN rev USING (w2) CROSS JOIN types)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        round(SUM(nll) / COUNT(*), 6) AS avg_nll,
        round(exp(SUM(nll) / COUNT(*)), 6) AS ppl
      FROM sc GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q242IpsPolicyEval, q243ConformalInterval, q244PoissonBootstrap,
        q245KneserNey)
}
