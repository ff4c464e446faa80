package graft.ops

import org.apache.spark.sql.functions._

/** Universe (key-domain) sampling for join-size estimation — the CBO
  * estimator that complements q493's AMS sketch (reference: overseer's
  * planner-statistics family, src/planner/stats.clj:1). To estimate the
  * self-join size J = Σ_k deg(k)² of lineitem on l_partkey, sample the
  * KEY UNIVERSE: keep key k iff hash(k) < 2⁶⁰/inv, estimate
  * Ĵ = inv · Σ_{sampled k} deg(k)². Unlike row-level Bernoulli sampling
  * (which shatters heavy keys and biases Σdeg² down), universe sampling
  * keeps every surviving key's degree INTACT — the correlated-sampling
  * property that makes it the join-cardinality workhorse in cost-based
  * optimizers. Three inverse rates (4, 16, 64) show the variance/cost
  * trade beside the exact truth.
  *
  * Scale shape: ONE map-side-combinable hash agg builds the degree
  * frame (|keys| rows — the 100 TB reality is that the DEGREE frame,
  * not the fact table, is what estimation math should touch);
  * everything after is three conditional sums over it in a single pass
  * (rates are a generated 3-row dimension, broadcast). In a real
  * planner the sampled-degree pass runs on the sample ONLY — here the
  * exact truth is computed beside it because the whole point of the
  * query is the error column.
  *
  * Exactness: thresholds are exact BIGINTs (2⁶⁰ divides by all three
  * inv rates); estimates are BIGINT products (no float scaling);
  * rel_err is one BIGINT→DOUBLE division chain rounded at 6.
  */
object UniverseSampleOps {

  private val MaxHashL = 1152921504606846976L // 2^60

  val q498UniverseSample: QueryDef = QueryDef(
    "q498_universe_sample",
    (s, dir) => {
      import s.implicits._
      val deg = Tables(s, dir).lineitem
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("deg"))
        .withColumn("h",
          conv(substring(md5(col("l_partkey").cast("string")), 1, 15), 16, 10)
            .cast("long"))
        .localCheckpoint() // feeds all three rates AND the exact truth
      val rates = Seq(4L, 16L, 64L)
        .map(inv => (inv, MaxHashL / inv)).toDF("inv_rate", "threshold")
      val exact = deg.agg(sum(col("deg") * col("deg")).as("exact_j"),
        count(lit(1)).as("n_keys"))
      deg.crossJoin(broadcast(rates))
        .groupBy(col("inv_rate"))
        .agg(
          sum(when(col("h") < col("threshold"), lit(1L)).otherwise(lit(0L)))
            .as("n_keys_sampled"),
          sum(when(col("h") < col("threshold"), col("deg") * col("deg"))
            .otherwise(lit(0L))).as("samp_j"))
        .crossJoin(broadcast(exact))
        .select(col("inv_rate"), col("n_keys"), col("n_keys_sampled"),
          col("exact_j"), (col("samp_j") * col("inv_rate")).as("est_j"),
          round(abs((col("samp_j") * col("inv_rate") - col("exact_j"))
            .cast("double")) / col("exact_j").cast("double"), 6)
            .as("rel_err"))
        .orderBy(col("inv_rate"))
    },
    Some(s"""WITH deg AS (
        SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS deg,
          ('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))::BIGINT
            AS h
        FROM lineitem GROUP BY 1),
      rates AS (SELECT * FROM (VALUES
        (CAST(4 AS BIGINT), CAST(${MaxHashL / 4} AS BIGINT)),
        (CAST(16 AS BIGINT), CAST(${MaxHashL / 16} AS BIGINT)),
        (CAST(64 AS BIGINT), CAST(${MaxHashL / 64} AS BIGINT)))
        t(inv_rate, threshold)),
      exact AS (SELECT CAST(SUM(deg * deg) AS BIGINT) AS exact_j,
        CAST(COUNT(*) AS BIGINT) AS n_keys FROM deg),
      samp AS (
        SELECT r.inv_rate,
          CAST(SUM(CASE WHEN d.h < r.threshold THEN 1 ELSE 0 END) AS BIGINT)
            AS n_keys_sampled,
          CAST(SUM(CASE WHEN d.h < r.threshold THEN d.deg * d.deg ELSE 0 END)
            AS BIGINT) AS samp_j
        FROM deg d CROSS JOIN rates r GROUP BY 1)
      SELECT s.inv_rate, e.n_keys, s.n_keys_sampled, e.exact_j,
        s.samp_j * s.inv_rate AS est_j,
        round(abs(CAST(s.samp_j * s.inv_rate - e.exact_j AS DOUBLE)) /
          CAST(e.exact_j AS DOUBLE), 6) AS rel_err
      FROM samp s CROSS JOIN exact e ORDER BY s.inv_rate"""))

  val all: Seq[QueryDef] = Seq(q498UniverseSample)
}
