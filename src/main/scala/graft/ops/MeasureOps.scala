package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Estimation & measurement wave: a KMV (k-minimum-values) distinct
  * sketch audited against the exact count, Yule's K lexical-richness
  * statistic, and the Murphy decomposition of the Brier score.
  *
  * Scale shapes: q358 is the canonical "replace COUNT(DISTINCT) at
  * 100 TB" story — the sketch is a k-row-per-group state mergeable
  * across executors, and the audit quantifies the error you buy;
  * q359 is a token-spectrum aggregation (two shuffles, both partial-
  * agg friendly); q360 reduces a full scan to a 10-row bin frame
  * before any double arithmetic happens.
  */
object MeasureOps {

  /** KMV distinct-count sketch vs exact NDV, per event type. Each
    * distinct user hashes to u = first 15 hex digits of md5 read as an
    * integer in [0, 2^60); the k-th smallest hash u_k estimates
    * NDV ≈ (k−1)·2^60/u_k (Bar-Yossef et al. 2002; the BJKST/KMV
    * estimator every engine's approx_count_distinct descends from).
    * Groups with fewer than k distinct values report the sketch's own
    * exact count — KMV is exact below its capacity, and the audit's
    * rel_err is 0 there by construction. At corpus scale the sketch is
    * a bounded k-row state per group (mergeable, no exact distinct
    * shuffle); here we also compute the exact count to measure the
    * error, which is the audit's point, not the production path. */
  val q358KmvDistinct: QueryDef = QueryDef(
    "q358_kmv_distinct",
    (s, dir) => {
      val k = 32
      val users = Tables(s, dir).events
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("u",
          conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long"))
      val w = Window.partitionBy(col("event_type"))
      users
        .withColumn("rn", row_number().over(w.orderBy(col("u"))))
        .withColumn("n_exact", count(lit(1)).over(w))
        .filter(col("rn") === least(lit(k.toLong), col("n_exact")))
        .withColumn("est_kmv", round(
          when(col("n_exact") < k, col("n_exact").cast("double"))
            .otherwise(lit((k - 1).toDouble * 1152921504606846976.0) /
              col("u").cast("double")), 4))
        .withColumn("rel_err", round(
          abs(col("est_kmv") - col("n_exact").cast("double")) /
            col("n_exact").cast("double"), 6))
        .select(col("event_type"), col("n_exact"), col("est_kmv"),
          col("rel_err"))
        .orderBy(col("event_type"))
    },
    Some("""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
      h AS (SELECT event_type,
          ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS u
        FROM d),
      r AS (SELECT event_type, u,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn,
          CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_exact
        FROM h)
      SELECT event_type, n_exact,
        round(CASE WHEN n_exact < 32 THEN CAST(n_exact AS DOUBLE)
          ELSE 31.0 * 1152921504606846976.0 / CAST(u AS DOUBLE) END, 4) AS est_kmv,
        round(abs(CASE WHEN n_exact < 32 THEN CAST(n_exact AS DOUBLE)
          ELSE round(31.0 * 1152921504606846976.0 / CAST(u AS DOUBLE), 4) END
            - CAST(n_exact AS DOUBLE)) / CAST(n_exact AS DOUBLE), 6) AS rel_err
      FROM r WHERE rn = CASE WHEN n_exact < 32 THEN n_exact ELSE 32 END
      ORDER BY event_type"""))

  /** Yule's K lexical-richness characteristic per source:
    * K = 10⁴·(Σ m²·V_m − N)/N² over the frequency spectrum (V_m = #types
    * occurring m times, N = token count), plus the hapax-legomena ratio
    * V₁/V — the two classic repetitiveness signals a corpus-quality
    * dashboard tracks (K is length-invariant where raw TTR is not;
    * Yule 1944, Tweedie & Baayen 1998). Template-generated text shows
    * inflated K; the numerator is exact integer arithmetic, so the only
    * doubles are two final divisions. */
  val q359YuleK: QueryDef = QueryDef(
    "q359_yule_k",
    (s, dir) => {
      val tf = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("w"))
        .groupBy(col("source"), col("w")).agg(count(lit(1)).as("m"))
      tf.groupBy(col("source"))
        .agg(
          sum(col("m")).as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("m") === 1, 1L).otherwise(0L)).as("v1"),
          sum(col("m") * col("m")).as("sum_m2"))
        .withColumn("hapax_ratio", round(
          col("v1").cast("double") / col("n_types").cast("double"), 6))
        .withColumn("yule_k", round(
          lit(1.0e4) * (col("sum_m2") - col("n_tokens")).cast("double") /
            (col("n_tokens") * col("n_tokens")).cast("double"), 6))
        .select(col("source"), col("n_tokens"), col("n_types"), col("v1"),
          col("hapax_ratio"), col("yule_k"))
    },
    Some("""WITH tf AS (SELECT source, u.w, CAST(COUNT(*) AS BIGINT) AS m
        FROM (SELECT source, regexp_extract_all(lower(text), '\w+') AS tk
              FROM documents), UNNEST(tk) AS u(w)
        GROUP BY 1, 2)
      SELECT source,
        CAST(SUM(m) AS BIGINT) AS n_tokens,
        CAST(COUNT(*) AS BIGINT) AS n_types,
        CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
        round(CAST(SUM(CASE WHEN m = 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio,
        round(1e4 * CAST(SUM(m * m) - SUM(m) AS DOUBLE)
          / CAST(SUM(m) * SUM(m) AS DOUBLE), 6) AS yule_k
      FROM tf GROUP BY 1"""))

  /** Murphy decomposition of the Brier score. Orders are binned into 10
    * price-derived forecast bins with forecast p_b = (b + 0.5)/10 for
    * the outcome "order status is F"; the decomposition
    * Brier = REL − RES + UNC (reliability − resolution + uncertainty;
    * Murphy 1973) is computed from the 10-row bin frame and holds as an
    * identity because the forecast is constant within bins. This is the
    * standard audit for any probabilistic quality/contamination
    * classifier: REL says "are the probabilities honest", RES says "do
    * they separate anything". Per-bin squared terms follow q344's
    * order-free discipline — round(·,9) → DECIMAL → sum — so the
    * 10-term sums are associativity-proof; each ȳ_b is one double
    * division. The scan collapses to 10 rows before any of that. */
  val q360BrierDecomposition: QueryDef = QueryDef(
    "q360_brier_decomposition",
    (s, dir) => {
      val bins = Tables(s, dir).orders
        .select(
          least(lit(9L), floor(col("o_totalprice") / 50000)).as("bin"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_b"), sum(col("y")).as("s_b"))
        .withColumn("p_b", (col("bin").cast("double") + 0.5) / 10.0)
        .withColumn("ybar_b", col("s_b").cast("double") / col("n_b").cast("double"))
        .localCheckpoint()
      val tot = bins.agg(sum(col("n_b")).as("n"), sum(col("s_b")).as("s"))
        .withColumn("ybar", col("s").cast("double") / col("n").cast("double"))
      val terms = bins.crossJoin(tot)
        .select(col("bin"), col("n_b"), col("p_b"), col("ybar_b"), col("n"),
          col("ybar"),
          round(col("n_b") * (col("p_b") - col("ybar_b")) *
            (col("p_b") - col("ybar_b")), 9).cast("decimal(28,9)").as("t_rel"),
          round(col("n_b") * (col("ybar_b") - col("ybar")) *
            (col("ybar_b") - col("ybar")), 9).cast("decimal(28,9)").as("t_res"),
          // direct per-bin Brier mass: Σ_i (p_b − y_i)² = n·p² − 2·p·s + s
          round(col("n_b") * col("p_b") * col("p_b") -
            lit(2.0) * col("p_b") * col("s_b") + col("s_b"), 9)
            .cast("decimal(28,9)").as("t_brier"))
      val global = terms
        .groupBy(col("n"), col("ybar"))
        .agg(sum(col("t_rel")).as("rel_sum"), sum(col("t_res")).as("res_sum"),
          sum(col("t_brier")).as("brier_sum"))
        .select(
          round(col("rel_sum").cast("double") / col("n"), 6).as("reliability"),
          round(col("res_sum").cast("double") / col("n"), 6).as("resolution"),
          round(col("ybar") * (lit(1.0) - col("ybar")), 6).as("uncertainty"),
          round(col("brier_sum").cast("double") / col("n"), 6).as("brier"))
      bins.crossJoin(global)
        .select(col("bin"), col("n_b"),
          round(col("p_b"), 6).as("p_forecast"),
          round(col("ybar_b"), 6).as("y_rate"),
          col("reliability"), col("resolution"), col("uncertainty"),
          col("brier"))
        .orderBy(col("bin"))
    },
    Some("""WITH b AS (SELECT least(9, CAST(floor(o_totalprice / 50000) AS BIGINT)) AS bin,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
          CAST(SUM(y) AS BIGINT) AS s_b,
          (CAST(bin AS DOUBLE) + 0.5) / 10.0 AS p_b,
          CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ybar_b
        FROM b GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_b) AS BIGINT) AS n, CAST(SUM(s_b) AS BIGINT) AS s,
          CAST(SUM(s_b) AS DOUBLE) / CAST(SUM(n_b) AS DOUBLE) AS ybar
        FROM bins),
      terms AS (SELECT bins.*, tot.n, tot.ybar,
          CAST(round(n_b * (p_b - ybar_b) * (p_b - ybar_b), 9) AS DECIMAL(28,9)) AS t_rel,
          CAST(round(n_b * (ybar_b - ybar) * (ybar_b - ybar), 9) AS DECIMAL(28,9)) AS t_res,
          CAST(round(n_b * p_b * p_b - 2.0 * p_b * s_b + s_b, 9) AS DECIMAL(28,9)) AS t_brier
        FROM bins CROSS JOIN tot),
      g AS (SELECT
          round(CAST(SUM(t_rel) AS DOUBLE) / n, 6) AS reliability,
          round(CAST(SUM(t_res) AS DOUBLE) / n, 6) AS resolution,
          round(ybar * (1.0 - ybar), 6) AS uncertainty,
          round(CAST(SUM(t_brier) AS DOUBLE) / n, 6) AS brier
        FROM terms GROUP BY n, ybar)
      SELECT bin, n_b, round(p_b, 6) AS p_forecast, round(ybar_b, 6) AS y_rate,
        reliability, resolution, uncertainty, brier
      FROM bins CROSS JOIN g
      ORDER BY bin"""))

  val all: Seq[QueryDef] = Seq(q358KmvDistinct, q359YuleK, q360BrierDecomposition)
}
