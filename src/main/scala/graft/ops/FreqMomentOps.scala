package graft.ops

import org.apache.spark.sql.functions._

/** AMS "tug-of-war" second frequency moment sketch (Alon–Matias–Szegedy
  * 1996) — F2 = Σ_k f_k² of the part-key stream, the quantity that IS the
  * self-join size |lineitem ⋈_partkey lineitem| and the variance proxy
  * every shuffle-size planner wants before materializing a join. At
  * 100 TB the exact answer needs a full groupBy; the sketch needs 64
  * counters: each estimator j keeps t_j = Σ_k f_k·s_j(k) with a ±1
  * 4-wise-style hash sign, and t_j² is an unbiased F2 estimate. 64
  * estimators → 8 groups of 8 → median of the 8 group means (the paper's
  * median-of-means boosting).
  *
  * Exactness across engines: signs come from one hex digit of
  * md5(key|j) (the q358/q474 hash convention), every t_j and t_j² is
  * BIGINT algebra, group means are single BIGINT/8.0 divisions, and the
  * 8-value median is spelled out as (m[4]+m[5])/2 over the sorted list —
  * both engines reproduce the ESTIMATE bit-for-bit, so rel_err is data.
  *
  * Scale shape: one hash-agg to the key-frequency frame (the only
  * corpus-sized shuffle — and the estimator fan-out rides the KEY frame,
  * |keys| ≪ |rows|, not the raw stream), one 64-row agg, one 8-row agg,
  * then 1-row × 1-row scalar combines (PlanGuard-declared). In a true
  * streaming deployment the t_j counters fold per partition and merge by
  * addition; here the frequency frame plays the per-key partial.
  */
object FreqMomentOps {

  private val R = 64 // estimators
  private val G = 8  // median-of-means groups

  val q483AmsF2: QueryDef = QueryDef(
    "q483_ams_f2",
    (s, dir) => {
      val freq = Tables(s, dir).lineitem
        .groupBy(col("l_partkey").as("k"))
        .agg(count(lit(1)).as("f"))
        .localCheckpoint() // feeds the sketch AND the exact truth
      val est = freq
        .select(col("k"), col("f"),
          explode(sequence(lit(0), lit(R - 1))).as("j"))
        .withColumn("sgn",
          lit(1L) - lit(2L) * pmod(
            conv(substring(md5(concat_ws("|",
              col("k").cast("string"), col("j").cast("string"))), 1, 1),
              16, 10).cast("long"), lit(2L)))
        .groupBy(col("j"))
        .agg(sum(col("f") * col("sgn")).as("t"))
        .groupBy((col("j") / lit(R / G)).cast("long").as("g"))
        .agg((sum(col("t") * col("t")) / lit((R / G).toDouble)).as("m"))
        .agg(sort_array(collect_list(col("m"))).as("ms"))
        .select(((element_at(col("ms"), G / 2) +
          element_at(col("ms"), G / 2 + 1)) / lit(2.0)).as("f2_est_raw"))
      val exact = freq.agg(
        count(lit(1)).as("n_keys"),
        sum(col("f") * col("f")).as("f2_exact"))
      exact.crossJoin(broadcast(est)) // 1-row × 1-row scalar combine
        .select(col("n_keys"), col("f2_exact"),
          round(col("f2_est_raw"), 4).as("f2_est"),
          round(abs(col("f2_est_raw") - col("f2_exact").cast("double")) /
            col("f2_exact").cast("double"), 6).as("rel_err"))
    },
    Some(s"""WITH freq AS (
        SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS f
        FROM lineitem GROUP BY 1),
      signed AS (
        SELECT k, f, j,
          1 - 2 * (('0x' || substr(md5(CAST(k AS VARCHAR) || '|' ||
            CAST(j AS VARCHAR)), 1, 1))::BIGINT % 2) AS sgn
        FROM freq, range($R) r(j)),
      est AS (
        SELECT j, CAST(SUM(f * sgn) AS BIGINT) AS t FROM signed GROUP BY 1),
      grp AS (
        SELECT j // ${R / G} AS g,
          CAST(SUM(t * t) AS BIGINT) / ${(R / G).toDouble} AS m
        FROM est GROUP BY 1),
      med AS (
        SELECT (ms[${G / 2}] + ms[${G / 2 + 1}]) / 2.0 AS f2_est_raw
        FROM (SELECT list_sort(list(m)) AS ms FROM grp)),
      ex AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
          CAST(SUM(f * f) AS BIGINT) AS f2_exact FROM freq)
      SELECT ex.n_keys, ex.f2_exact,
        round(med.f2_est_raw, 4) AS f2_est,
        round(abs(med.f2_est_raw - CAST(ex.f2_exact AS DOUBLE)) /
          CAST(ex.f2_exact AS DOUBLE), 6) AS rel_err
      FROM ex, med"""))

  val all: Seq[QueryDef] = Seq(q483AmsF2)
}
