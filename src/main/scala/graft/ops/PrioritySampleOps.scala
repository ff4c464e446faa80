package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Priority sampling (Duffield–Lund–Thorup 2007) — the weight-aware
  * fixed-size sample whose subset-sum estimator is unbiased for ANY
  * later-chosen subset: draw u_i hash-uniform, give item i priority
  * q_i = w_i / u_i, keep the top k+1 priorities, set the threshold τ to
  * the (k+1)-th, and estimate Σ_{i∈A} w_i by Σ_{i∈S∩A} max(w_i, τ). One
  * top-k pass replaces a per-subset scan — the way a 100 TB fact table
  * answers ad-hoc "how much revenue does segment X hold" from a 64-row
  * summary with per-query error you can audit.
  *
  * This audit builds a k=64 sample over orders weighted by price cents
  * and scores the estimator against the EXACT totals of every
  * o_orderpriority segment. Exactness across engines: u_i comes from the
  * md5 60-bit convention, priorities are single double divisions
  * (identical IEEE ops both sides), and the estimator works in
  * τ-quantized integer space — tau4 = floor(τ·10⁴) and per-item terms
  * max(w·10⁴, tau4) are BIGINT, so sums are order-independent and
  * bit-identical (floor, not round: round(double) is the documented
  * cross-engine tie hazard).
  *
  * Scale shape: one scan computes priorities; the sample is a global
  * top-(k+1) (TakeOrderedAndProject — no full sort); exact truths are
  * one hash-agg. The 65-row sample frame and 1-row τ are model-sized
  * (PlanGuard-declared broadcast).
  */
object PrioritySampleOps {

  private val K = 64
  private val TwoPow60 = 1.152921504606846976e18

  val q488PrioritySample: QueryDef = QueryDef(
    "q488_priority_sample",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_orderpriority"),
          floor(col("o_totalprice") * 100).cast("long").as("w"))
      val pri = o
        .withColumn("h",
          conv(substring(md5(concat(lit("ps|"),
            col("o_orderkey").cast("string"))), 1, 15), 16, 10).cast("long"))
        .withColumn("q", col("w").cast("double") * lit(TwoPow60) /
          (col("h").cast("double") + lit(1.0)))
      val top = pri.orderBy(col("q").desc, col("o_orderkey")).limit(K + 1)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("q").desc, col("o_orderkey"))))
        .localCheckpoint() // 65 rows: sample + threshold
      val tau = top.filter(col("rk") === K + 1)
        .select(floor(col("q") * 1e4).cast("long").as("tau4"))
      val est = top.filter(col("rk") <= K)
        .crossJoin(broadcast(tau)) // 1-row threshold
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_sampled"),
          sum(greatest(col("w") * lit(10000L), col("tau4"))).as("est4"))
      val exact = o.groupBy(col("o_orderpriority"))
        .agg(sum(col("w")).as("exact_cents"))
      exact.join(est, Seq("o_orderpriority"), "left")
        .na.fill(0L, Seq("n_sampled", "est4"))
        .select(col("o_orderpriority"), col("exact_cents"),
          col("n_sampled"),
          // no round(): at sf10 magnitudes the 4th decimal sits below
          // double precision and the two engines' rounding paths differ;
          // BIGINT->double + /1e4 is bit-identical as-is
          (col("est4").cast("double") / 1e4).as("est_cents"),
          round(abs(col("est4").cast("double") / 1e4 -
            col("exact_cents").cast("double")) /
            col("exact_cents").cast("double"), 6).as("rel_err"))
    },
    Some(s"""WITH o AS (
        SELECT o_orderkey, o_orderpriority,
          CAST(floor(o_totalprice * 100) AS BIGINT) AS w
        FROM orders),
      pri AS (
        SELECT *,
          CAST(w AS DOUBLE) * $TwoPow60 /
            (CAST(('0x' || substr(md5('ps|' || CAST(o_orderkey AS VARCHAR)),
              1, 15))::BIGINT AS DOUBLE) + 1.0) AS q
        FROM o),
      top AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY q DESC, o_orderkey) AS rk
        FROM (SELECT * FROM pri ORDER BY q DESC, o_orderkey LIMIT ${K + 1})),
      tau AS (
        SELECT CAST(floor(q * 1e4) AS BIGINT) AS tau4 FROM top
        WHERE rk = ${K + 1}),
      est AS (
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_sampled,
          CAST(SUM(greatest(w * 10000, tau4)) AS BIGINT) AS est4
        FROM top, tau WHERE rk <= $K
        GROUP BY 1),
      exact AS (
        SELECT o_orderpriority, CAST(SUM(w) AS BIGINT) AS exact_cents
        FROM o GROUP BY 1)
      SELECT x.o_orderpriority, x.exact_cents,
        COALESCE(e.n_sampled, 0) AS n_sampled,
        CAST(COALESCE(e.est4, 0) AS DOUBLE) / 1e4 AS est_cents,
        round(abs(CAST(COALESCE(e.est4, 0) AS DOUBLE) / 1e4 -
          CAST(x.exact_cents AS DOUBLE)) /
          CAST(x.exact_cents AS DOUBLE), 6) AS rel_err
      FROM exact x LEFT JOIN est e ON e.o_orderpriority = x.o_orderpriority"""))

  val all: Seq[QueryDef] = Seq(q488PrioritySample)
}
