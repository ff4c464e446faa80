package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Revenue-structure and sequence-structure operators: Lorenz deciles,
  * word burstiness, second-order Markov transitions, and the cohort
  * LTV triangle — who the revenue comes from, how words and actions
  * clump, and how value accrues over customer age.
  */
object RevenueOps {

  /** Lorenz-curve deciles of customer revenue: cut customers into
    * spend deciles by exact percentile cutoffs (broadcast — the q184
    * idiom, no global NTILE sort) and report each decile's share and
    * the cumulative share from the bottom — the table behind every
    * "top decile is 43 % of revenue" sentence, and the numbers q140's
    * Gini integrates. Revenue stays DECIMAL through the rollup.
    */
  val q202LorenzDeciles: QueryDef = QueryDef(
    "q202_lorenz_deciles",
    (s, dir) => {
      val cust = Tables(s, dir).orders
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"))
        .localCheckpoint() // feeds the cutoff scalar and the binning pass
      val bounds = cust.agg(expr(
        """percentile(CAST(rev AS DOUBLE),
          |  array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"""
          .stripMargin).as("bounds"))
      val wAll = Window.partitionBy()
      val wCum = Window.partitionBy().orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cust.crossJoin(broadcast(bounds))
        .withColumn("decile",
          expr("size(filter(bounds, b -> CAST(rev AS DOUBLE) > b))").cast("long"))
        .groupBy(col("decile"))
        .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("decile_rev"))
        .withColumn("share",
          round(col("decile_rev").cast("double") /
            sum(col("decile_rev")).over(wAll).cast("double"), 6))
        .withColumn("cum_share",
          round(sum(col("decile_rev")).over(wCum).cast("double") /
            sum(col("decile_rev")).over(wAll).cast("double"), 6))
        .select(col("decile"), col("n_customers"),
          col("decile_rev").cast("double").as("decile_rev"),
          col("share"), col("cum_share"))
    },
    Some("""WITH cust AS (SELECT o_custkey,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders GROUP BY 1),
      b AS (SELECT quantile_cont(CAST(rev AS DOUBLE),
          [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds FROM cust),
      binned AS (SELECT
          CAST(len(list_filter(b.bounds, y -> CAST(rev AS DOUBLE) > y)) AS BIGINT)
            AS decile, rev
        FROM cust CROSS JOIN b),
      agg AS (SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS decile_rev
        FROM binned GROUP BY 1)
      SELECT decile, n_customers,
        CAST(decile_rev AS DOUBLE) AS decile_rev,
        round(CAST(decile_rev AS DOUBLE) / CAST(SUM(decile_rev) OVER () AS DOUBLE), 6)
          AS share,
        round(CAST(SUM(decile_rev) OVER (ORDER BY decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
          CAST(SUM(decile_rev) OVER () AS DOUBLE), 6) AS cum_share
      FROM agg"""))

  /** Word burstiness (Church–Gale): variance-to-mean of each top-50
    * token's per-document count, zeros included via the totals
    * complement — content words clump (Fano ≫ 1), function words
    * spread evenly (≈ 1); the signal that separates topical vocabulary
    * from glue without any label. One tokenize pass; moments over
    * nonzero rows only, corrected to the full corpus by the in-plan
    * 1-row doc count.
    */
  val q203WordBurstiness: QueryDef = QueryDef(
    "q203_word_burstiness",
    (s, dir) => {
      val docTok = Tables(s, dir).documents
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .localCheckpoint() // one tokenize pass feeds vocab AND counts
      val vocab = docTok.groupBy(col("tok"))
        .agg(count(lit(1)).as("total"))
        .orderBy(col("total").desc, col("tok").asc)
        .limit(50)
        .select(col("tok"))
      val nDocs = Tables(s, dir).documents
        .agg(count(lit(1)).cast("double").as("n_docs"))
      val perDoc = docTok.join(broadcast(vocab), Seq("tok"))
        .groupBy(col("tok"), col("doc_id"))
        .agg(count(lit(1)).as("c"))
      perDoc.groupBy(col("tok"))
        .agg(count(lit(1)).as("df"),
          sum(col("c")).as("s1"),
          sum(col("c") * col("c")).as("s2"))
        .crossJoin(broadcast(nDocs))
        .select(col("tok"), col("df"),
          round(col("s1").cast("double") / col("n_docs"), 6).as("mean_count"),
          round(((col("s2").cast("double") -
                  col("s1").cast("double") * col("s1").cast("double") /
                    col("n_docs")) / (col("n_docs") - lit(1.0))) /
                (col("s1").cast("double") / col("n_docs")), 6).as("fano"))
    },
    Some("""WITH dt AS (SELECT doc_id,
          UNNEST(regexp_extract_all(lower(text), '\w+')) AS tok
        FROM documents),
      vocab AS (SELECT tok FROM (
          SELECT tok, COUNT(*) AS total FROM dt GROUP BY 1
          ORDER BY total DESC, tok ASC LIMIT 50)),
      n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
      pd AS (SELECT dt.tok, dt.doc_id, COUNT(*) AS c
        FROM dt JOIN vocab USING (tok) GROUP BY 1, 2),
      m AS (SELECT tok, COUNT(*) AS df,
          CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
        FROM pd GROUP BY 1)
      SELECT tok, df,
        round(CAST(s1 AS DOUBLE) / n.n_docs, 6) AS mean_count,
        round(((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
            / n.n_docs) / (n.n_docs - 1.0)) /
          (CAST(s1 AS DOUBLE) / n.n_docs), 6) AS fano
      FROM m CROSS JOIN n"""))

  /** Second-order Markov transitions of user event sequences: for each
    * (state₂, state₁) context, where does the user go next — one step
    * deeper than q137's first-order chain, which is exactly what
    * predictive prefetch needs when "view→click" means something
    * different after "purchase" than after "error". Two lag windows per
    * user, one hash agg; context totals as windows over the model-sized
    * transition frame; ≥5-support gate keeps estimates honest.
    */
  val q204MarkovSecondOrder: QueryDef = QueryDef(
    "q204_markov_second_order",
    (s, dir) => {
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val wCtx = Window.partitionBy(col("s2"), col("s1"))
      EventOps.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("event_type"))
        .withColumn("s1", lag(col("event_type"), 1).over(wSeq))
        .withColumn("s2", lag(col("event_type"), 2).over(wSeq))
        .filter(col("s2").isNotNull)
        .groupBy(col("s2"), col("s1"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
        .withColumn("ctx_total", sum(col("n")).over(wCtx))
        .filter(col("ctx_total") >= 5)
        .select(col("s2"), col("s1"), col("next"), col("n"),
          round(col("n").cast("double") / col("ctx_total").cast("double"), 6)
            .as("p"))
    },
    Some("""WITH seq AS (SELECT user_id, event_type,
          LAG(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS s1,
          LAG(event_type, 2) OVER (PARTITION BY user_id
            ORDER BY epoch_us(ts), event_id) AS s2
        FROM events),
      tr AS (SELECT s2, s1, event_type AS next, COUNT(*) AS n
        FROM seq WHERE s2 IS NOT NULL GROUP BY 1, 2, 3),
      ct AS (SELECT *, CAST(SUM(n) OVER (PARTITION BY s2, s1) AS BIGINT)
          AS ctx_total FROM tr)
      SELECT s2, s1, next, n,
        round(CAST(n AS DOUBLE) / CAST(ctx_total AS DOUBLE), 6) AS p
      FROM ct WHERE ctx_total >= 5"""))

  /** Cohort LTV triangle: customers cohort by first-order month, and
    * each cohort's revenue accrues by age-in-months — the
    * lifetime-value curve finance discounts and growth teams compare
    * across acquisition vintages (q121 is the count-retention twin).
    * First-order month is one min-agg; ages are exact int month
    * arithmetic (never months_between doubles); cumulative LTV is a
    * window per cohort over the model-sized triangle.
    */
  val q205LtvTriangle: QueryDef = QueryDef(
    "q205_ltv_triangle",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_custkey"),
          (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("m"),
          col("o_totalprice").cast(DecimalType(18, 4)).as("rev"))
        .localCheckpoint() // feeds cohort min-agg AND the fact side
      val cohort = o.groupBy(col("o_custkey"))
        .agg(min(col("m")).as("cohort_m"))
      val wCum = Window.partitionBy(col("cohort_month"))
        .orderBy(col("age_months"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      o.join(cohort, Seq("o_custkey"))
        .groupBy(col("cohort_m"), (col("m") - col("cohort_m")).as("age_months"))
        .agg(count(lit(1)).as("n_orders"), sum(col("rev")).as("rev"))
        .select(
          (floor(col("cohort_m") / 12) * 100 + (col("cohort_m") % 12) + 1)
            .cast("long").as("cohort_month"),
          col("age_months"), col("n_orders"), col("rev"))
        .withColumn("revenue", round(col("rev").cast("double"), 4))
        .withColumn("cum_ltv",
          round(sum(col("rev")).over(wCum).cast("double"), 4))
        .drop("rev")
        .filter(col("age_months") <= 12)
    },
    Some("""WITH o AS (SELECT o_custkey,
          CAST(EXTRACT(year FROM o_orderdate) * 12 +
               EXTRACT(month FROM o_orderdate) - 1 AS BIGINT) AS m,
          CAST(o_totalprice AS DECIMAL(18,4)) AS rev
        FROM orders),
      cohort AS (SELECT o_custkey, MIN(m) AS cohort_m FROM o GROUP BY 1),
      tri AS (SELECT c.cohort_m, o.m - c.cohort_m AS age_months,
          COUNT(*) AS n_orders, SUM(o.rev) AS rev
        FROM o JOIN cohort c USING (o_custkey)
        GROUP BY 1, 2)
      SELECT CAST(cohort_m // 12 * 100 + cohort_m % 12 + 1 AS BIGINT)
          AS cohort_month,
        age_months, n_orders,
        round(CAST(rev AS DOUBLE), 4) AS revenue,
        round(CAST(SUM(rev) OVER (PARTITION BY cohort_m ORDER BY age_months
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 4)
          AS cum_ltv
      FROM tri WHERE age_months <= 12"""))

  val all: Seq[QueryDef] = Seq(q202LorenzDeciles, q203WordBurstiness,
    q204MarkovSecondOrder, q205LtvTriangle)
}
