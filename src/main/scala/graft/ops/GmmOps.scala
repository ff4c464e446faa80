package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mixture-model wave: two-component Gaussian-mixture EM over
  * ln(order value) — soft clustering where Lloyd's k-means (q80) is
  * hard, and continuous where Dawid–Skene's EM (q273) is categorical.
  * Two unrolled EM rounds; init is moment-based (μ = m ∓ s), fully
  * deterministic.
  *
  * Determinism is the q340 trajectory discipline with a cheaper
  * accumulator: per-row E-step terms are scaled to integers
  * (CAST(round(term·10^k) AS BIGINT)) and summed as plain longs —
  * exact, order-free, and whole-stage-codegen primitive, where the
  * earlier round→DECIMAL fold was measured 6× dearer (10.0 s vs 1.6 s
  * for the same sf1 scan). Scales chosen so |Σ| stays under 2^63 past
  * sf10 (rr ≤ 1 at 1e10, rr·x ≤ 14 at 1e9, rr·x² ≤ 180 at 1e8,
  * ll-term at 1e9). Parameter updates rounded at 9 dp, so both engines
  * walk the identical trajectory through the exp/ln calls.
  *
  * Scale shape: each EM round is ONE linear corpus scan against a 1-row
  * broadcast parameter frame (E-step fused into the M-step aggregation);
  * the corpus never re-shuffles, the model is the only cross-round
  * state.
  */
object GmmOps {

  private val LnSqrt2Pi = "0.9189385332046727"

  /** One oracle EM round: reads corpus CTE `xs` and params CTE `it$p`,
    * emits CTEs for round k. Integer-scaled long sums (see object doc). */
  private def oracleRound(k: Int, p: Int): String =
    s"""e$k AS (SELECT x,
          pi1 * exp(-0.5 * ((x - mu1) / sg1) * ((x - mu1) / sg1)) / sg1 AS g1,
          pi2 * exp(-0.5 * ((x - mu2) / sg2) * ((x - mu2) / sg2)) / sg2 AS g2
        FROM xs CROSS JOIN it$p),
      r$k AS (SELECT x, g1 / (g1 + g2) AS rr,
          ln(g1 + g2) - $LnSqrt2Pi AS llt
        FROM e$k),
      a$k AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(rr * 10000000000) AS BIGINT)) AS BIGINT) AS n1,
          CAST(SUM(CAST(round(rr * x * 1000000000) AS BIGINT)) AS BIGINT) AS s1x,
          CAST(SUM(CAST(round(rr * x * x * 100000000) AS BIGINT)) AS BIGINT) AS s1xx,
          CAST(SUM(CAST(round(x * 1000000000) AS BIGINT)) AS BIGINT) AS sx,
          CAST(SUM(CAST(round(x * x * 100000000) AS BIGINT)) AS BIGINT) AS sxx,
          CAST(SUM(CAST(round(llt * 1000000000) AS BIGINT)) AS BIGINT) AS sll
        FROM r$k),
      u$k AS (SELECT n,
          CAST(n1 AS DOUBLE) / 10000000000 AS d1,
          CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE) / 10000000000 AS d2,
          CAST(s1x AS DOUBLE) / 1000000000 AS w1x,
          CAST(sx - s1x AS DOUBLE) / 1000000000 AS w2x,
          CAST(s1xx AS DOUBLE) / 100000000 AS w1xx,
          CAST(sxx - s1xx AS DOUBLE) / 100000000 AS w2xx,
          CAST(sll AS DOUBLE) / 1000000000 AS slld
        FROM a$k),
      v$k AS (SELECT n, d1, d2, slld,
          round(d1 / n, 9) AS pi1, round(d2 / n, 9) AS pi2,
          round(w1x / d1, 9) AS mu1, round(w2x / d2, 9) AS mu2,
          w1xx, w2xx
        FROM u$k),
      it$k AS (SELECT pi1, mu1,
          round(sqrt(greatest(w1xx / d1 - mu1 * mu1, 0.000000000001)), 9)
            AS sg1,
          pi2, mu2,
          round(sqrt(greatest(w2xx / d2 - mu2 * mu2, 0.000000000001)), 9)
            AS sg2,
          round(slld / n, 6) AS ll
        FROM v$k)"""

  /** Two EM rounds on ln(o_totalprice); per round × component: the
    * updated (π, μ, σ) and the avg log-likelihood the round started
    * from. Component-2 moments come from the closure s2 = s_tot − s1
    * (one fewer per-row term, identical in both engines). */
  val q413GmmEm: QueryDef = QueryDef(
    "q413_gmm_em",
    (s, dir) => {
      val xs = Tables(s, dir).orders
        .select(log(col("o_totalprice")).as("x"))
        .localCheckpoint() // two EM scans, one build
      val mom = xs.agg(count(lit(1)).as("n"),
        sum(round(col("x") * 1e9).cast("long")).as("sx"),
        sum(round(col("x") * col("x") * 1e8).cast("long")).as("sxx"))
      val p0 = mom
        .withColumn("m", round(col("sx").cast("double") / 1e9 / col("n"), 6))
        .withColumn("sd", round(sqrt(col("sxx").cast("double") / 1e8 / col("n") -
          col("m") * col("m")), 6))
        .select(lit(0.5).as("pi1"), round(col("m") - col("sd"), 6).as("mu1"),
          col("sd").as("sg1"), lit(0.5).as("pi2"),
          round(col("m") + col("sd"), 6).as("mu2"), col("sd").as("sg2"))

      def emRound(params: DataFrame): DataFrame = {
        def gauss(mu: Column, sg: Column, pi: Column) =
          pi * exp(lit(-0.5) * ((col("x") - mu) / sg) * ((col("x") - mu) / sg)) / sg
        val e = xs.crossJoin(broadcast(params))
          .withColumn("g1", gauss(col("mu1"), col("sg1"), col("pi1")))
          .withColumn("g2", gauss(col("mu2"), col("sg2"), col("pi2")))
          .withColumn("rr", col("g1") / (col("g1") + col("g2")))
          .withColumn("llt", log(col("g1") + col("g2")) -
            lit(LnSqrt2Pi.toDouble))
        val a = e.agg(count(lit(1)).as("n"),
          sum(round(col("rr") * 1e10).cast("long")).as("n1"),
          sum(round(col("rr") * col("x") * 1e9).cast("long")).as("s1x"),
          sum(round(col("rr") * col("x") * col("x") * 1e8).cast("long")).as("s1xx"),
          sum(round(col("x") * 1e9).cast("long")).as("sx"),
          sum(round(col("x") * col("x") * 1e8).cast("long")).as("sxx"),
          sum(round(col("llt") * 1e9).cast("long")).as("sll"))
        a.withColumn("d1", col("n1").cast("double") / 1e10)
          .withColumn("d2", col("n").cast("double") - col("n1").cast("double") / 1e10)
          .withColumn("w1x", col("s1x").cast("double") / 1e9)
          .withColumn("w2x", (col("sx") - col("s1x")).cast("double") / 1e9)
          .withColumn("w1xx", col("s1xx").cast("double") / 1e8)
          .withColumn("w2xx", (col("sxx") - col("s1xx")).cast("double") / 1e8)
          .withColumn("pi1", round(col("d1") / col("n"), 9))
          .withColumn("pi2", round(col("d2") / col("n"), 9))
          .withColumn("mu1", round(col("w1x") / col("d1"), 9))
          .withColumn("mu2", round(col("w2x") / col("d2"), 9))
          .withColumn("sg1", round(sqrt(greatest(
            col("w1xx") / col("d1") - col("mu1") * col("mu1"), lit(1e-12))), 9))
          .withColumn("sg2", round(sqrt(greatest(
            col("w2xx") / col("d2") - col("mu2") * col("mu2"), lit(1e-12))), 9))
          .withColumn("ll", round(col("sll").cast("double") / 1e9 / col("n"), 6))
          .select(col("pi1"), col("mu1"), col("sg1"),
            col("pi2"), col("mu2"), col("sg2"), col("ll"))
          .localCheckpoint() // pins the round; the next scan reads it
      }

      val it1 = emRound(p0)
      val it2 = emRound(it1.drop("ll"))
      def rows(it: DataFrame, k: Int) = it.select(explode(array(
        struct(lit(k.toLong).as("iter"), lit("c1").as("component"),
          col("pi1").as("pi"), col("mu1").as("mu"), col("sg1").as("sigma"),
          col("ll").as("avg_ll")),
        struct(lit(k.toLong).as("iter"), lit("c2").as("component"),
          col("pi2").as("pi"), col("mu2").as("mu"), col("sg2").as("sigma"),
          col("ll").as("avg_ll")))).as("r"))
        .select(col("r.*"))
      rows(it1, 1).unionByName(rows(it2, 2))
        .orderBy(col("iter"), col("component"))
    },
    Some(s"""WITH xs AS (SELECT ln(o_totalprice) AS x FROM orders),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(x * 1000000000) AS BIGINT)) AS BIGINT) AS sx,
          CAST(SUM(CAST(round(x * x * 100000000) AS BIGINT)) AS BIGINT) AS sxx
        FROM xs),
      p0 AS (SELECT round(CAST(sx AS DOUBLE) / 1000000000 / n, 6) AS m,
          round(sqrt(CAST(sxx AS DOUBLE) / 100000000 / n
            - round(CAST(sx AS DOUBLE) / 1000000000 / n, 6)
              * round(CAST(sx AS DOUBLE) / 1000000000 / n, 6)), 6) AS sd
        FROM mom),
      it0 AS (SELECT 0.5 AS pi1, round(m - sd, 6) AS mu1, sd AS sg1,
          0.5 AS pi2, round(m + sd, 6) AS mu2, sd AS sg2
        FROM p0),
      ${oracleRound(1, 0)},
      ${oracleRound(2, 1)}
      SELECT * FROM (
        SELECT CAST(1 AS BIGINT) AS iter, 'c1' AS component,
          pi1 AS pi, mu1 AS mu, sg1 AS sigma, ll AS avg_ll FROM it1
        UNION ALL
        SELECT CAST(1 AS BIGINT), 'c2', pi2, mu2, sg2, ll FROM it1
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'c1', pi1, mu1, sg1, ll FROM it2
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'c2', pi2, mu2, sg2, ll FROM it2)
      ORDER BY iter, component"""))

  val all: Seq[QueryDef] = Seq(q413GmmEm)
}
