package graft.ops

import org.apache.spark.sql.functions._

/** Zero-inflated Poisson fit by method of moments (Lambert 1992) —
  * per-nation order-count-per-customer modeling WITH the structural
  * zeros a plain Poisson (q201) cannot absorb: customers who never
  * order are a separate "always-zero" regime with probability π, and
  * the active regime orders at rate λ. Moment estimators:
  * λ̂ = (s² + m² − m)/m, π̂ = 1 − m/λ̂ — closed form from the first two
  * moments plus the observed zero fraction for the excess-zeros check
  * (reference: overseer's arbitrary handler fns,
  * src/overseer/executor.clj:12-39; q201/q424's count-model family).
  *
  * Scale shape: one orders scan (hash-agg to per-customer counts — the
  * customer spine left-joined so true zeros are structural rows), one
  * grouped moment pass per nation. Exactness: all moments are exact
  * BIGINT sums; λ̂/π̂/zero-excess are fixed float expressions over them
  * (rounded for display) — cross-engine deterministic.
  */
object CountModelOps {

  val q532ZipFit: QueryDef = QueryDef(
    "q532_zip_fit",
    (s, dir) => {
      val t = Tables(s, dir)
      val perCust = t.customer
        .select(col("c_custkey"), col("c_nationkey").cast("long").as("nation"))
        .join(t.orders.groupBy(col("o_custkey").as("c_custkey"))
          .agg(count(lit(1)).as("k")), Seq("c_custkey"), "left")
        .na.fill(0L, Seq("k"))
      perCust.groupBy(col("nation"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("k") === 0, 1L).otherwise(0L)).as("zeros"),
          sum(col("k")).as("sk"),
          sum(col("k") * col("k")).as("skk"))
        .select(col("nation"), col("n"), col("zeros"),
          round(col("sk").cast("double") / col("n"), 9).as("mean_k"),
          round((col("n").cast("double") * col("skk") -
            col("sk").cast("double") * col("sk")) /
            (col("n").cast("double") * (col("n") - 1)), 9).as("var_k"),
          round(((col("n").cast("double") * col("skk") -
              col("sk").cast("double") * col("sk")) /
              (col("n").cast("double") * (col("n") - 1)) +
            (col("sk").cast("double") / col("n")) *
              (col("sk").cast("double") / col("n")) -
            col("sk").cast("double") / col("n")) /
            (col("sk").cast("double") / col("n")), 9).as("lambda_hat"),
          round(lit(1.0) - (col("sk").cast("double") / col("n")) /
            (((col("n").cast("double") * col("skk") -
                col("sk").cast("double") * col("sk")) /
                (col("n").cast("double") * (col("n") - 1)) +
              (col("sk").cast("double") / col("n")) *
                (col("sk").cast("double") / col("n")) -
              col("sk").cast("double") / col("n")) /
              (col("sk").cast("double") / col("n"))), 9).as("pi_hat"))
    },
    Some("""WITH per_cust AS (
        SELECT CAST(c_nationkey AS BIGINT) AS nation,
          CAST(COALESCE(o.k, 0) AS BIGINT) AS k
        FROM customer c LEFT JOIN
          (SELECT o_custkey, COUNT(*) AS k FROM orders GROUP BY 1) o
          ON o.o_custkey = c.c_custkey),
      mom AS (
        SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN k = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zeros,
          CAST(SUM(k) AS BIGINT) AS sk,
          CAST(SUM(k * k) AS BIGINT) AS skk
        FROM per_cust GROUP BY 1)
      SELECT nation, n, zeros,
        round(CAST(sk AS DOUBLE) / n, 9) AS mean_k,
        round((CAST(n AS DOUBLE) * skk - CAST(sk AS DOUBLE) * sk) /
          (CAST(n AS DOUBLE) * (n - 1)), 9) AS var_k,
        round(((CAST(n AS DOUBLE) * skk - CAST(sk AS DOUBLE) * sk) /
            (CAST(n AS DOUBLE) * (n - 1)) +
          (CAST(sk AS DOUBLE) / n) * (CAST(sk AS DOUBLE) / n) -
          CAST(sk AS DOUBLE) / n) / (CAST(sk AS DOUBLE) / n), 9)
          AS lambda_hat,
        round(1.0 - (CAST(sk AS DOUBLE) / n) /
          (((CAST(n AS DOUBLE) * skk - CAST(sk AS DOUBLE) * sk) /
              (CAST(n AS DOUBLE) * (n - 1)) +
            (CAST(sk AS DOUBLE) / n) * (CAST(sk AS DOUBLE) / n) -
            CAST(sk AS DOUBLE) / n) / (CAST(sk AS DOUBLE) / n)), 9)
          AS pi_hat
      FROM mom"""))

  val all: Seq[QueryDef] = Seq(q532ZipFit)
}
