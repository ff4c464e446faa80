package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Acquisition & audit wave: budgeted source selection as a greedy
  * knapsack with an LP optimality certificate, pinball-loss evaluation
  * of quantile forecasts, and the Anderson–Darling goodness-of-fit
  * audit for exponential inter-arrivals.
  *
  * Scale shapes: q366 reduces the corpus to a |sources|-row frame
  * before any ranking happens; q367 is a held-split quantile fit plus
  * one conditional aggregation per (priority, τ); q368 is one
  * lag-window pass and one ordered-statistics window per event type.
  */
object AcquireOps {

  /** Budgeted data acquisition as a knapsack: each source is an item
    * with value = its distinct-vocabulary mass and cost = its character
    * mass; the budget is half the corpus. Greedy-by-density is the
    * classic 1/2-approximation; the fractional-LP relaxation (Dantzig
    * 1957: fill by density, split the boundary item) upper-bounds the
    * true optimum, so gap = lp_bound − greedy_value CERTIFIES how far
    * greedy can possibly be from optimal — the audit every data-buying
    * decision should ship with. All masses are exact integers; density
    * and the fractional term are the only doubles. */
  val q366DataKnapsack: QueryDef = QueryDef(
    "q366_data_knapsack",
    (s, dir) => {
      val items = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("source"))
        .agg(countDistinct(col("w")).as("value"))
      val costs = Tables(s, dir).documents.groupBy(col("source"))
        .agg(sum(col("n_chars")).as("cost"))
      val ranked = items.join(costs, Seq("source"))
        .withColumn("density", round(col("value").cast("double") / col("cost"), 9))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("density").desc, col("source"))))
        .withColumn("cum_cost", sum(col("cost")).over(
          Window.orderBy(col("rk")).rowsBetween(Window.unboundedPreceding, 0)))
        .localCheckpoint() // feeds budget, report, and the row output
      val budget = ranked.agg((sum(col("cost")) / 2).cast("long").as("budget"))
      val flagged = ranked.crossJoin(budget)
        .withColumn("selected", col("cum_cost") <= col("budget"))
        .localCheckpoint()
      val greedy = flagged.agg(
        sum(when(col("selected"), col("value")).otherwise(0L)).as("greedy_value"),
        sum(when(col("selected"), col("cost")).otherwise(0L)).as("greedy_cost"),
        min(when(!col("selected"), col("rk"))).as("next_rk"))
      val next = flagged.select(col("rk").as("next_rk"),
        col("value").as("next_value"), col("cost").as("next_cost"))
      val report = greedy.join(next, Seq("next_rk"), "left")
        .crossJoin(budget)
        .select(col("greedy_value"),
          round(coalesce(
            col("greedy_value") +
              (col("budget") - col("greedy_cost")).cast("double") /
                col("next_cost") * col("next_value"),
            col("greedy_value").cast("double")), 6).as("lp_bound"))
      flagged.crossJoin(report)
        .select(col("source"), col("value"), col("cost"), col("density"),
          col("rk"), col("selected"), col("budget"), col("greedy_value"),
          col("lp_bound"),
          round(col("lp_bound") - col("greedy_value"), 6).as("optimality_gap"))
        .orderBy(col("rk"))
    },
    Some("""WITH v AS (SELECT source, CAST(COUNT(DISTINCT u.w) AS BIGINT) AS value
        FROM (SELECT source, regexp_extract_all(lower(text), '\w+') AS tk
              FROM documents), UNNEST(tk) AS u(w)
        GROUP BY 1),
      c AS (SELECT source, CAST(SUM(n_chars) AS BIGINT) AS cost FROM documents GROUP BY 1),
      ranked AS (SELECT v.source, v.value, c.cost,
          round(CAST(v.value AS DOUBLE) / c.cost, 9) AS density,
          ROW_NUMBER() OVER (ORDER BY round(CAST(v.value AS DOUBLE) / c.cost, 9) DESC,
            v.source) AS rk
        FROM v JOIN c USING (source)),
      cum AS (SELECT *, CAST(SUM(cost) OVER (ORDER BY rk) AS BIGINT) AS cum_cost
        FROM ranked),
      b AS (SELECT CAST(SUM(cost) // 2 AS BIGINT) AS budget FROM ranked),
      fl AS (SELECT cum.*, b.budget, cum.cum_cost <= b.budget AS selected
        FROM cum CROSS JOIN b),
      g AS (SELECT CAST(SUM(CASE WHEN selected THEN value ELSE 0 END) AS BIGINT) AS greedy_value,
          CAST(SUM(CASE WHEN selected THEN cost ELSE 0 END) AS BIGINT) AS greedy_cost,
          MIN(CASE WHEN NOT selected THEN rk END) AS next_rk
        FROM fl),
      rep AS (SELECT b.budget, g.greedy_value,
          round(COALESCE(g.greedy_value
            + CAST(b.budget - g.greedy_cost AS DOUBLE) / n.cost * n.value,
            CAST(g.greedy_value AS DOUBLE)), 6) AS lp_bound
        FROM g CROSS JOIN b LEFT JOIN fl n ON n.rk = g.next_rk)
      SELECT fl.source, fl.value, fl.cost, fl.density, fl.rk, fl.selected,
        rep.budget, rep.greedy_value, rep.lp_bound,
        round(rep.lp_bound - rep.greedy_value, 6) AS optimality_gap
      FROM fl CROSS JOIN rep
      ORDER BY fl.rk"""))

  /** Pinball (quantile) loss evaluation: the τ ∈ {0.1, 0.5, 0.9} price
    * quantiles per order priority are fit on the md5-model half (exact
    * ceil(τn)-th order statistics) and scored on the held eval half
    * with L_τ(y, q) = τ(y−q)⁺ + (1−τ)(q−y)⁺ — the scoring rule every
    * quantile forecaster (demand, latency, cost) is judged by, and the
    * one that makes the empirical quantile the in-sample optimum (the
    * spec perturbs q by ±1 rank to certify the minimum). Row terms
    * follow the round→DECIMAL discipline; the fit side is one ordered
    * window per priority, the scoring side one conditional agg. */
  val q367PinballEval: QueryDef = QueryDef(
    "q367_pinball_eval",
    (s, dir) => {
      val dec = DecimalType(28, 10)
      val o = Tables(s, dir).orders
        .select(col("o_orderpriority").as("prio"), col("o_totalprice").as("y"),
          when(substring(md5(col("o_orderkey").cast("string")), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), "model")
            .otherwise("eval").as("half"))
        .localCheckpoint()
      val taus = s.createDataFrame(Seq(Tuple1(0.1), Tuple1(0.5), Tuple1(0.9)))
        .toDF("tau")
      // rank on value alone: the ceil(τn)-th VALUE depends only on the
      // multiset, so ties need no break
      val modelRanked = o.filter(col("half") === "model")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("prio")).orderBy(col("y"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(col("prio"))))
      val qfit = modelRanked.crossJoin(broadcast(taus))
        .filter(col("rn") === ceil(col("tau") * col("n")).cast("int"))
        .select(col("prio"), col("tau"), col("y").as("q_tau"))
      o.filter(col("half") === "eval")
        .join(broadcast(qfit), Seq("prio"))
        .groupBy(col("prio"), col("tau"), col("q_tau"))
        .agg(count(lit(1)).as("n_eval"),
          sum(round(
            when(col("y") > col("q_tau"), col("tau") * (col("y") - col("q_tau")))
              .otherwise((lit(1.0) - col("tau")) * (col("q_tau") - col("y"))), 6)
            .cast(dec)).as("sl"))
        .select(col("prio"), col("tau"), round(col("q_tau"), 2).as("q_tau"),
          col("n_eval"),
          round(col("sl").cast("double") / col("n_eval"), 6).as("pinball_loss"))
        .orderBy(col("prio"), col("tau"))
    },
    Some("""WITH o AS (SELECT o_orderpriority AS prio, o_totalprice AS y,
          CASE WHEN substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) IN
            ('0','1','2','3','4','5','6','7') THEN 'model' ELSE 'eval' END AS half
        FROM orders),
      m AS (SELECT prio, y,
          ROW_NUMBER() OVER (PARTITION BY prio ORDER BY y) AS rn,
          COUNT(*) OVER (PARTITION BY prio) AS n
        FROM o WHERE half = 'model'),
      taus AS (SELECT UNNEST([0.1::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE]) AS tau),
      qfit AS (SELECT m.prio, t.tau, m.y AS q_tau
        FROM m CROSS JOIN taus t
        WHERE m.rn = CAST(ceil(t.tau * m.n) AS INT))
      SELECT e.prio, q.tau, round(q.q_tau, 2) AS q_tau,
        CAST(COUNT(*) AS BIGINT) AS n_eval,
        round(CAST(SUM(CAST(round(CASE WHEN e.y > q.q_tau
            THEN q.tau * (e.y - q.q_tau)
            ELSE (1.0 - q.tau) * (q.q_tau - e.y) END, 6) AS DECIMAL(28,10))) AS DOUBLE)
          / COUNT(*), 6) AS pinball_loss
      FROM (SELECT * FROM o WHERE half = 'eval') e
      JOIN qfit q ON q.prio = e.prio
      GROUP BY 1, 2, 3
      ORDER BY 1, 2"""))

  /** Anderson–Darling exponentiality audit of inter-arrival gaps per
    * event type — the tail-weighted goodness-of-fit statistic (more
    * sensitive than KS exactly where arrival modeling breaks: the
    * tails), as every queueing-theory result downstream (q293 Little,
    * q322 Erlang) silently assumes Poisson arrivals. λ̂ = n/Σgaps is
    * exact-rational until one division; the PIT u = 1 − e^(−λ̂x) and
    * the order-statistic sum A² = −n − (1/n)Σ[(2i−1)ln u_(i) +
    * (2n+1−2i)ln(1−u_(i))] follow q133's raw-double ln discipline
    * (terms rounded→DECIMAL). Zero gaps (same-µs events) are excluded
    * on both sides — ln 0 — and reported. One lag window + one ordered
    * window per type. */
  val q368AndersonDarling: QueryDef = QueryDef(
    "q368_anderson_darling",
    (s, dir) => {
      val dec = DecimalType(28, 10)
      val gaps = EventOps.events(s, dir)
        .select(col("event_type"), unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(
          Window.partitionBy(col("event_type")).orderBy(col("us"), col("event_id"))))
        .filter(col("gap") > 0)
        .localCheckpoint() // feeds the rate fit and the ordered pass
      val rate = gaps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("gap")).as("sg"))
        .withColumn("lambda", col("n").cast("double") / col("sg").cast("double"))
      gaps.join(broadcast(rate), Seq("event_type"))
        .withColumn("i", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("gap"), col("event_id"))))
        .withColumn("u", lit(1.0) - exp(-col("lambda") * col("gap")))
        .withColumn("term", round(
          (lit(2L) * col("i") - 1L).cast("double") * log(col("u")) +
            (lit(2L) * col("n") + 1L - lit(2L) * col("i")).cast("double") *
              log(lit(1.0) - col("u")), 6).cast(dec))
        .groupBy(col("event_type"), col("n"))
        .agg(sum(col("term")).as("st"))
        .select(col("event_type"), col("n"),
          round(-col("n").cast("double") -
            col("st").cast("double") / col("n"), 6).as("a2"),
          (-col("n").cast("double") -
            col("st").cast("double") / col("n") > 1.341).as("rejects_exponential"))
        .orderBy(col("event_type"))
    },
    Some("""WITH g AS (SELECT event_type,
          epoch_us(ts) - lag(epoch_us(ts)) OVER
            (PARTITION BY event_type ORDER BY epoch_us(ts), event_id) AS gap
        FROM events),
      gg AS (SELECT event_type, gap FROM g WHERE gap > 0),
      rate AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(*) AS DOUBLE) / CAST(SUM(gap) AS DOUBLE) AS lambda
        FROM gg GROUP BY 1),
      ord AS (SELECT gg.event_type, r.n, r.lambda, gg.gap,
          ROW_NUMBER() OVER (PARTITION BY gg.event_type ORDER BY gg.gap) AS i
        FROM gg JOIN rate r USING (event_type)),
      t AS (SELECT event_type, n,
          CAST(round(CAST(2 * i - 1 AS DOUBLE)
              * ln(1.0 - exp(-lambda * gap))
            + CAST(2 * n + 1 - 2 * i AS DOUBLE)
              * ln(1.0 - (1.0 - exp(-lambda * gap))), 6) AS DECIMAL(28,10)) AS term
        FROM ord)
      SELECT event_type, n,
        round(-CAST(n AS DOUBLE) - CAST(SUM(term) AS DOUBLE) / n, 6) AS a2,
        (-CAST(n AS DOUBLE) - CAST(SUM(term) AS DOUBLE) / n) > 1.341
          AS rejects_exponential
      FROM t GROUP BY 1, 2 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(q366DataKnapsack, q367PinballEval, q368AndersonDarling)
}
