package graft.ops

import org.apache.spark.sql.functions._

/** Randomized-response estimation (Warner 1965) — the original local
  * differential privacy mechanism: each customer reports their
  * sensitive bit ("urgent buyer") TRUTHFULLY with probability 3/4 and
  * INVERTED otherwise (an md5 coin, so both engines flip identically),
  * and the analyst recovers the population rate with the unbiased
  * estimator π̂ = (p_obs − (1−q)) / (2q − 1) = 2·p_obs − 1/2. The
  * fixture keeps the TRUE rate beside the estimate, so the query is
  * the end-to-end privacy-utility audit (reference: overseer's
  * arbitrary handler fns, src/overseer/executor.clj:12-39; PrivacyOps'
  * central-DP mechanisms are the server-side cousins).
  *
  * Scale shape: one orders semi-aggregate + one customer scan, then a
  * per-nation census — all hash-aggs, model-sized after.
  * Exactness: truth bits, coins and counts are BIGINTs; π̂ and its
  * error are fixed float expressions over exact counts (rounded) —
  * cross-engine deterministic.
  */
object RandResponseOps {

  val q536RandomizedResponse: QueryDef = QueryDef(
    "q536_randomized_response",
    (s, dir) => {
      val t = Tables(s, dir)
      val truth = t.orders
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(col("o_custkey").as("c_custkey")).distinct()
        .withColumn("sensitive", lit(1L))
      val reported = t.customer
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"))
        .join(truth, Seq("c_custkey"), "left")
        .na.fill(0L, Seq("sensitive"))
        .withColumn("honest",
          (pmod(conv(substring(md5(concat(lit("rr|"),
            col("c_custkey").cast("string"))), 1, 15), 16, 10).cast("long"),
            lit(4L)) < 3).cast("long"))
        .withColumn("report",
          when(col("honest") === 1, col("sensitive"))
            .otherwise(lit(1L) - col("sensitive")))
      reported.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"),
          sum(col("sensitive")).as("true_pos"),
          sum(col("report")).as("obs_yes"))
        .select(col("nation"), col("n"), col("true_pos"), col("obs_yes"),
          round(lit(2.0) * col("obs_yes") / col("n") - 0.5, 9).as("pi_hat"),
          round(lit(2.0) * col("obs_yes") / col("n") - 0.5 -
            col("true_pos").cast("double") / col("n"), 9).as("est_error"))
    },
    Some("""WITH truth AS (
        SELECT DISTINCT o_custkey AS c_custkey, CAST(1 AS BIGINT) AS sensitive
        FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')),
      reported AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
          COALESCE(t.sensitive, 0) AS sensitive,
          CASE WHEN ('0x' || substr(md5('rr|' ||
              CAST(c.c_custkey AS VARCHAR)), 1, 15))::BIGINT % 4 < 3
            THEN COALESCE(t.sensitive, 0)
            ELSE 1 - COALESCE(t.sensitive, 0) END AS report
        FROM customer c LEFT JOIN truth t ON t.c_custkey = c.c_custkey)
      SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(sensitive) AS BIGINT) AS true_pos,
        CAST(SUM(report) AS BIGINT) AS obs_yes,
        round(2.0 * SUM(report) / COUNT(*) - 0.5, 9) AS pi_hat,
        round(2.0 * SUM(report) / COUNT(*) - 0.5
          - CAST(SUM(sensitive) AS DOUBLE) / COUNT(*), 9) AS est_error
      FROM reported GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q536RandomizedResponse)
}
