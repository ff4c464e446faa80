package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Paired-binary wave: McNemar's test and Cochran's Q — the binary
  * members of the paired/repeated-measures family (q430 Wilcoxon is
  * the paired continuous test, q434 Friedman the blocked rank test).
  * The question: did per-customer urgent-order behavior CHANGE between
  * eras, conditioning each customer on themselves so cross-customer
  * level differences cancel. McNemar handles two eras; Cochran's Q is
  * its k-era generalization (Q reduces to McNemar's uncorrected χ² at
  * k = 2 — the spec asserts the reduction on the fixture).
  *
  * Determinism: all cell counts are exact integers; the exact binomial
  * p-value runs in the q322/q424 log-space idiom — an ln-factorial
  * spine built as a running sum of per-term ROUNDED (9 dp) logs in
  * DECIMAL, so partition order cannot perturb it — with each
  * probability term rounded at 12 dp and summed as DECIMAL.
  *
  * Scale shape: one per-customer two-era aggregation (hash agg on the
  * customer key), a 1-row contingency report, and an n-row ln-factorial
  * spine (n = discordant pairs) that is one explode + one running
  * window — linear, never quadratic.
  */
object PairedBinaryOps {

  private val Split = "1998-04-01"
  private val Chi1_95 = 3.841458820694124 // χ²₁ 0.95 quantile

  /** McNemar's test on per-customer urgent-order incidence, pre vs post
    * mid-1998: the 2×2 concordance cells, continuity-corrected and
    * plain χ², and the exact binomial two-sided p over the discordant
    * pairs. */
  val q435McnemarTest: QueryDef = QueryDef(
    "q435_mcnemar_test",
    (s, dir) => {
      val flags = Tables(s, dir).orders
        .groupBy(col("o_custkey").as("ck"))
        .agg(
          max(when(col("o_orderdate") < lit(Split),
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)))
            .as("pre"),
          max(when(col("o_orderdate") >= lit(Split),
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)))
            .as("post"))
        .where(col("pre").isNotNull && col("post").isNotNull)
      val cells = flags.agg(
        count(lit(1)).as("n_pairs"),
        sum(when(col("pre") === 0 && col("post") === 0, 1).otherwise(0))
          .cast("long").as("n00"),
        sum(when(col("pre") === 0 && col("post") === 1, 1).otherwise(0))
          .cast("long").as("n01"),
        sum(when(col("pre") === 1 && col("post") === 0, 1).otherwise(0))
          .cast("long").as("n10"),
        sum(when(col("pre") === 1 && col("post") === 1, 1).otherwise(0))
          .cast("long").as("n11"))
        .withColumn("nd", col("n01") + col("n10")) // discordant pairs
        .withColumn("m", least(col("n01"), col("n10")))
        .localCheckpoint() // spine pass + k-sweep pass + report pass
      // ln-factorial spine over j = 1..nd: running DECIMAL sum of
      // round(ln j, 9) — order-proof by construction. r15: distributed
      // exact ladder (Spine.lnFactorialLadder) replaces the
      // single-partition window + single-task explode; length/nd probed
      // from the 1-row checkpointed cells frame.
      val cRow = cells
        .select(greatest(col("nd"), lit(1L)).as("len"), col("nd")).head()
      val spine = Spine.lnFactorialLadder(s, cRow.getLong(0))
      // exact binomial tail: P(X <= m), X ~ Bin(nd, 1/2)
      val ks = cells.select(col("nd"), col("m"),
        explode(sequence(lit(0L), col("m"))).as("k"))
      val lf0 = coalesce(col("lf"), lit(0.0))
      val tail = ks
        .join(spine.withColumnRenamed("j", "k"), Seq("k"), "left")
        .withColumnRenamed("lf", "lfk")
        .withColumn("jnk", col("nd") - col("k"))
        .join(spine.select(col("j").as("jnk"), col("lf").as("lfnk_")),
          Seq("jnk"), "left")
        // lf(nd) is ONE ladder row — broadcast just it, not the whole
        // (corpus-coupled) ladder, which the old shape shipped to every
        // executor
        .join(broadcast(spine.where(col("j") === cRow.getLong(1))
          .select(col("j").as("nd"), col("lf").as("lfn_"))),
          Seq("nd"), "left")
        .withColumn("term", round(exp(
          coalesce(col("lfn_"), lit(0.0))
            - coalesce(col("lfk"), lit(0.0))
            - coalesce(col("lfnk_"), lit(0.0))
            - col("nd") * log(lit(2.0))), 12))
        .agg(sum(col("term").cast(DecimalType(38, 12))).as("p_half"))
      cells.crossJoin(broadcast(tail))
        .withColumn("chi2", when(col("nd") > 0, round(
          (col("n01") - col("n10")) * (col("n01") - col("n10"))
            / col("nd").cast("double"), 6)))
        .withColumn("chi2_cc", when(col("nd") > 0, round(
          (abs(col("n01") - col("n10")) - 1)
            * (abs(col("n01") - col("n10")) - 1)
            / col("nd").cast("double"), 6)))
        .withColumn("p_exact",
          round(least(lit(1.0), col("p_half").cast("double") * 2), 6))
        .select(col("n_pairs"), col("n00"), col("n01"), col("n10"),
          col("n11"), col("chi2"), col("chi2_cc"), col("p_exact"),
          (col("chi2_cc") > Chi1_95).as("reject_5pct"),
          (col("p_exact") < 0.05).as("reject_exact"))
    },
    Some(s"""WITH flags AS (SELECT o_custkey AS ck,
          MAX(CASE WHEN o_orderdate < DATE '$Split' THEN
            CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
            END) AS pre,
          MAX(CASE WHEN o_orderdate >= DATE '$Split' THEN
            CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
            END) AS post
        FROM orders GROUP BY 1),
      cells0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
          CAST(SUM(CASE WHEN pre = 0 AND post = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n00,
          CAST(SUM(CASE WHEN pre = 0 AND post = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n01,
          CAST(SUM(CASE WHEN pre = 1 AND post = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n10,
          CAST(SUM(CASE WHEN pre = 1 AND post = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n11
        FROM flags WHERE pre IS NOT NULL AND post IS NOT NULL),
      cells AS (SELECT *, n01 + n10 AS nd, LEAST(n01, n10) AS m
        FROM cells0),
      spine AS (SELECT j, CAST(SUM(CAST(round(ln(CAST(j AS DOUBLE)), 9)
            AS DECIMAL(38,9))) OVER (ORDER BY j) AS DOUBLE) AS lf
        FROM (SELECT UNNEST(range(1, GREATEST(nd, 1) + 1)) AS j
          FROM cells)),
      ks AS (SELECT c.nd, c.m, UNNEST(range(0, c.m + 1)) AS k FROM cells c),
      tail AS (SELECT SUM(CAST(round(exp(
            COALESCE(sn.lf, 0.0) - COALESCE(sk.lf, 0.0)
              - COALESCE(snk.lf, 0.0)
              - ks.nd * ln(2.0)), 12) AS DECIMAL(38,12))) AS p_half
        FROM ks
        LEFT JOIN spine sk ON sk.j = ks.k
        LEFT JOIN spine snk ON snk.j = ks.nd - ks.k
        LEFT JOIN spine sn ON sn.j = ks.nd)
      SELECT c.n_pairs, c.n00, c.n01, c.n10, c.n11,
        CASE WHEN c.nd > 0 THEN round((c.n01 - c.n10) * (c.n01 - c.n10)
          / CAST(c.nd AS DOUBLE), 6) END AS chi2,
        CASE WHEN c.nd > 0 THEN round((abs(c.n01 - c.n10) - 1)
          * (abs(c.n01 - c.n10) - 1) / CAST(c.nd AS DOUBLE), 6)
          END AS chi2_cc,
        round(LEAST(1.0, CAST(t.p_half AS DOUBLE) * 2), 6) AS p_exact,
        (CASE WHEN c.nd > 0 THEN round((abs(c.n01 - c.n10) - 1)
          * (abs(c.n01 - c.n10) - 1) / CAST(c.nd AS DOUBLE), 6)
          END > $Chi1_95) AS reject_5pct,
        (round(LEAST(1.0, CAST(t.p_half AS DOUBLE) * 2), 6) < 0.05)
          AS reject_exact
      FROM cells c, tail t"""))

  private val Era1 = "1997-01-01"
  private val Era2 = "1999-01-01"

  /** Cochran's Q over three eras (1995–96, 1997–98, 1999–2001): did the
    * per-customer urgent-order incidence shift across eras? Complete
    * blocks only; per-era success totals, the exact-integer Q, df = 2
    * and its closed-form p = exp(−Q/2). */
  val q436CochranQ: QueryDef = QueryDef(
    "q436_cochran_q",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .withColumn("era",
          when(col("o_orderdate") < lit(Era1), 0L)
            .when(col("o_orderdate") < lit(Era2), 1L).otherwise(2L))
      val cell = o.groupBy(col("o_custkey").as("ck"), col("era"))
        .agg(max(when(col("o_orderpriority") === "1-URGENT", 1L)
          .otherwise(0L)).as("x"))
      // complete blocks: the customer ordered in all three eras
      val complete = cell
        .withColumn("ne", count(lit(1)).over(Window.partitionBy(col("ck"))))
        .where(col("ne") === 3)
        .localCheckpoint() // row-total pass + column-total pass
      val rows = complete.groupBy(col("ck"))
        .agg(sum(col("x")).as("r"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("r")).as("t"),
          sum(col("r") * col("r")).as("sr2"))
      val cols = complete.groupBy(col("era"))
        .agg(sum(col("x")).as("c_success"))
      val k = lit(3L)
      cols.crossJoin(broadcast(rows))
        // Q = (k−1)·Σ_j(k·C_j − T)² / (k·(k·T − ΣR²)): integer-exact
        .withColumn("dev2",
          (k * col("c_success") - col("t")) * (k * col("c_success") - col("t")))
        .withColumn("sdev2", sum(col("dev2")).over(Window.partitionBy()))
        .withColumn("q_stat", round(
          (k - 1) * col("sdev2")
            / (k * (k * col("t") - col("sr2"))).cast("double"), 6))
        .withColumn("p_value", round(exp(-col("q_stat") / 2), 6))
        .select(col("era"), col("n_blocks"), col("c_success"),
          round(col("c_success") / col("n_blocks").cast("double"), 6)
            .as("prevalence"),
          col("q_stat"), lit(2L).as("df"), col("p_value"),
          (col("q_stat") > 5.991464547107979).as("reject_5pct"))
        .orderBy(col("era"))
    },
    Some(s"""WITH cell AS (SELECT o_custkey AS ck,
          CASE WHEN o_orderdate < DATE '$Era1' THEN 0
            WHEN o_orderdate < DATE '$Era2' THEN 1 ELSE 2 END AS era,
          CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0
            END) AS BIGINT) AS x
        FROM orders GROUP BY 1, 2),
      complete AS (SELECT * FROM cell
        QUALIFY COUNT(*) OVER (PARTITION BY ck) = 3),
      rows_ AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
          CAST(SUM(r) AS BIGINT) AS t, CAST(SUM(r * r) AS BIGINT) AS sr2
        FROM (SELECT ck, SUM(x) AS r FROM complete GROUP BY 1)),
      cols_ AS (SELECT CAST(era AS BIGINT) AS era,
          CAST(SUM(x) AS BIGINT) AS c_success
        FROM complete GROUP BY 1),
      alg AS (SELECT c.era, r.n_blocks, c.c_success, r.t, r.sr2,
          (3 * c.c_success - r.t) * (3 * c.c_success - r.t) AS dev2
        FROM cols_ c, rows_ r),
      q AS (SELECT round(2 * SUM(dev2)
          / CAST(3 * (3 * ANY_VALUE(t) - ANY_VALUE(sr2)) AS DOUBLE), 6)
          AS q_stat FROM alg)
      SELECT a.era, a.n_blocks, a.c_success,
        round(a.c_success / CAST(a.n_blocks AS DOUBLE), 6) AS prevalence,
        q.q_stat, CAST(2 AS BIGINT) AS df,
        round(exp(-q.q_stat / 2), 6) AS p_value,
        (q.q_stat > 5.991464547107979) AS reject_5pct
      FROM alg a, q ORDER BY a.era"""))

  val all: Seq[QueryDef] = Seq(q435McnemarTest, q436CochranQ)
}
