package graft.ops

import org.apache.spark.sql.functions._

/** Reliability wave: Cronbach's α over the document quality indicators —
  * "do these k signals measure ONE construct?", the internal-consistency
  * question behind any composite quality score (q141 blends ranks, q340
  * trains on them; neither asks whether the items cohere). Raw α from
  * the variance identity, standardized α from the mean inter-item
  * correlation, and per-item item–total correlations (the "drop this
  * item?" diagnostic).
  *
  * Determinism: every moment is a scaled-long sum (items are bounded
  * ratios in [0,1], scale 1e10 keeps |Σ| < 2^63 beyond sf10); the
  * closed forms run on the 1-row moment frame.
  *
  * Scale shape: ONE corpus scan computes all k item moments + all
  * C(k,2) cross-moments as parallel aggregate columns.
  */
object ReliabilityOps {

  /** Cronbach's α over x1 (bounded length), x2 (TTR), x3 (bounded mean
    * word length): per-item variance and item–total correlation, plus
    * the raw and standardized α constants. */
  val q420CronbachAlpha: QueryDef = QueryDef(
    "q420_cronbach_alpha",
    (s, dir) => {
      val feats = Tables(s, dir).documents
        .select(TextOps.tokens(col("text")).as("toks"))
        .where(size(col("toks")) > 0)
        .select(
          (least(size(col("toks")), lit(200)).cast("double") / 200.0).as("x1"),
          (size(array_distinct(col("toks"))).cast("double") /
            size(col("toks"))).as("x2"),
          (least(expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
            .cast("double") / size(col("toks")), lit(8.0)) / 8.0).as("x3"))
      def sl(c: org.apache.spark.sql.Column, scale: Double) =
        sum(round(c * scale).cast("long"))
      val xs = Seq("x1", "x2", "x3")
      val moments =
        xs.map(x => sl(col(x), 1e10).as(s"s_$x")) ++
        xs.map(x => sl(col(x) * col(x), 1e10).as(s"ss_$x")) ++
        Seq(("x1", "x2"), ("x1", "x3"), ("x2", "x3")).map { case (a, b) =>
          sl(col(a) * col(b), 1e10).as(s"sp_${a}_$b") }
      val agg = feats.agg(count(lit(1)).as("n"), moments: _*)
      // everything below is driver-free column algebra on the 1-row frame
      def m(c: String) = col(c).cast("double") / 1e10
      def vr(x: String) = m(s"ss_$x") / col("n") -
        (m(s"s_$x") / col("n")) * (m(s"s_$x") / col("n"))
      def cv(a: String, b: String) = m(s"sp_${a}_$b") / col("n") -
        (m(s"s_$a") / col("n")) * (m(s"s_$b") / col("n"))
      val vT = vr("x1") + vr("x2") + vr("x3") +
        lit(2.0) * (cv("x1", "x2") + cv("x1", "x3") + cv("x2", "x3"))
      def corr(a: String, b: String) = cv(a, b) / sqrt(vr(a) * vr(b))
      val rbar = (corr("x1", "x2") + corr("x1", "x3") + corr("x2", "x3")) / 3.0
      def itemTotal(x: String) = {
        val cov = Seq("x1", "x2", "x3").map(o =>
          if (o == x) vr(x) else if (o < x) cv(o, x) else cv(x, o))
          .reduce(_ + _)
        cov / sqrt(vr(x) * vT)
      }
      val base = agg
        .withColumn("alpha", round(lit(1.5) * (lit(1.0) -
          (vr("x1") + vr("x2") + vr("x3")) / vT), 6))
        .withColumn("alpha_std",
          round(lit(3.0) * rbar / (lit(1.0) + lit(2.0) * rbar), 6))
      base.select(explode(array(
        struct(lit("x1").as("item"), round(vr("x1"), 8).as("var_item"),
          round(itemTotal("x1"), 6).as("item_total_corr"),
          col("alpha"), col("alpha_std"), col("n")),
        struct(lit("x2").as("item"), round(vr("x2"), 8).as("var_item"),
          round(itemTotal("x2"), 6).as("item_total_corr"),
          col("alpha"), col("alpha_std"), col("n")),
        struct(lit("x3").as("item"), round(vr("x3"), 8).as("var_item"),
          round(itemTotal("x3"), 6).as("item_total_corr"),
          col("alpha"), col("alpha_std"), col("n")))).as("r"))
        .select(col("r.*"))
        .orderBy(col("item"))
    },
    Some("""WITH feats AS (SELECT
          CAST(LEAST(len(tk), 200) AS DOUBLE) / 200.0 AS x1,
          CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS x2,
          LEAST(CAST(list_sum(list_transform(tk, t -> strlen(t))) AS DOUBLE)
            / len(tk), 8.0) / 8.0 AS x3
        FROM (SELECT regexp_extract_all(lower(text), '\w+') AS tk
          FROM documents)
        WHERE len(tk) > 0),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(x1 * 10000000000) AS BIGINT)) AS BIGINT) AS s_x1,
          CAST(SUM(CAST(round(x2 * 10000000000) AS BIGINT)) AS BIGINT) AS s_x2,
          CAST(SUM(CAST(round(x3 * 10000000000) AS BIGINT)) AS BIGINT) AS s_x3,
          CAST(SUM(CAST(round(x1 * x1 * 10000000000) AS BIGINT)) AS BIGINT) AS ss_x1,
          CAST(SUM(CAST(round(x2 * x2 * 10000000000) AS BIGINT)) AS BIGINT) AS ss_x2,
          CAST(SUM(CAST(round(x3 * x3 * 10000000000) AS BIGINT)) AS BIGINT) AS ss_x3,
          CAST(SUM(CAST(round(x1 * x2 * 10000000000) AS BIGINT)) AS BIGINT) AS sp_x1_x2,
          CAST(SUM(CAST(round(x1 * x3 * 10000000000) AS BIGINT)) AS BIGINT) AS sp_x1_x3,
          CAST(SUM(CAST(round(x2 * x3 * 10000000000) AS BIGINT)) AS BIGINT) AS sp_x2_x3
        FROM feats),
      alg AS (SELECT n,
          CAST(ss_x1 AS DOUBLE) / 10000000000 / n
            - (CAST(s_x1 AS DOUBLE) / 10000000000 / n)
              * (CAST(s_x1 AS DOUBLE) / 10000000000 / n) AS v1,
          CAST(ss_x2 AS DOUBLE) / 10000000000 / n
            - (CAST(s_x2 AS DOUBLE) / 10000000000 / n)
              * (CAST(s_x2 AS DOUBLE) / 10000000000 / n) AS v2,
          CAST(ss_x3 AS DOUBLE) / 10000000000 / n
            - (CAST(s_x3 AS DOUBLE) / 10000000000 / n)
              * (CAST(s_x3 AS DOUBLE) / 10000000000 / n) AS v3,
          CAST(sp_x1_x2 AS DOUBLE) / 10000000000 / n
            - (CAST(s_x1 AS DOUBLE) / 10000000000 / n)
              * (CAST(s_x2 AS DOUBLE) / 10000000000 / n) AS c12,
          CAST(sp_x1_x3 AS DOUBLE) / 10000000000 / n
            - (CAST(s_x1 AS DOUBLE) / 10000000000 / n)
              * (CAST(s_x3 AS DOUBLE) / 10000000000 / n) AS c13,
          CAST(sp_x2_x3 AS DOUBLE) / 10000000000 / n
            - (CAST(s_x2 AS DOUBLE) / 10000000000 / n)
              * (CAST(s_x3 AS DOUBLE) / 10000000000 / n) AS c23
        FROM agg),
      alg2 AS (SELECT *,
          v1 + v2 + v3 + 2.0 * (c12 + c13 + c23) AS vt,
          (c12 / sqrt(v1 * v2) + c13 / sqrt(v1 * v3)
            + c23 / sqrt(v2 * v3)) / 3.0 AS rbar
        FROM alg),
      consts AS (SELECT n,
          round(1.5 * (1.0 - (v1 + v2 + v3) / vt), 6) AS alpha,
          round(3.0 * rbar / (1.0 + 2.0 * rbar), 6) AS alpha_std,
          v1, v2, v3, c12, c13, c23, vt
        FROM alg2)
      SELECT item, var_item, item_total_corr, alpha, alpha_std, n FROM (
        SELECT 'x1' AS item, round(v1, 8) AS var_item,
          round((v1 + c12 + c13) / sqrt(v1 * vt), 6) AS item_total_corr,
          alpha, alpha_std, n FROM consts
        UNION ALL
        SELECT 'x2', round(v2, 8),
          round((c12 + v2 + c23) / sqrt(v2 * vt), 6), alpha, alpha_std, n
          FROM consts
        UNION ALL
        SELECT 'x3', round(v3, 8),
          round((c13 + c23 + v3) / sqrt(v3 * vt), 6), alpha, alpha_std, n
          FROM consts)
      ORDER BY item"""))

  val all: Seq[QueryDef] = Seq(q420CronbachAlpha)
}
