package graft.ops

import org.apache.spark.sql.functions._

/** Negative-binomial moment fit of daily per-user event counts — the
  * overdispersed sibling of q532's zero-inflated Poisson (the q173
  * burstiness audit showed Fano > 1, so a pure Poisson understates the
  * tail; NB(r, p) is the standard correction a capacity planner fits).
  * Method-of-moments on the exact integer scatter: m = Σk/n,
  * v = Σk²/n − m²; p̂ = m/v, r̂ = m²/(v−m), with the dispersion index
  * v/m and an `overdispersed` flag guarding the estimator's validity
  * (reference: overseer's monitoring/report family,
  * doc/guide/Monitoring.md:1).
  *
  * Scale shape: one (user, day) hash agg then ONE global agg of n, Σk,
  * Σk² — map-side combinable, nothing else.
  *
  * Exactness: all moments from exact BIGINT sums; the double algebra is
  * a fixed chain of the same IEEE ops both engines, round 6.
  */
object NbFitOps {

  val q556NegbinFit: QueryDef = QueryDef(
    "q556_negbin_fit",
    (s, dir) => {
      val counts = EventOps.events(s, dir)
        .groupBy(col("user_id"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("k"))
      val mom = counts.agg(count(lit(1)).as("n"),
        sum(col("k")).as("s1"), sum(col("k") * col("k")).as("s2"))
      mom.select(col("n"), col("s1"), col("s2"),
          (col("s1").cast("double") / col("n").cast("double")).as("m"),
          (col("s2").cast("double") / col("n").cast("double")).as("m2"))
        .select(col("n"), col("s1"), col("s2"),
          round(col("m"), 6).as("mean_k"),
          round(col("m2") - col("m") * col("m"), 6).as("var_k"),
          round((col("m2") - col("m") * col("m")) / col("m"), 6)
            .as("dispersion"),
          (col("m2") - col("m") * col("m") > col("m")).as("overdispersed"),
          round(col("m") / (col("m2") - col("m") * col("m")), 6).as("p_hat"),
          round(col("m") * col("m") /
            (col("m2") - col("m") * col("m") - col("m")), 6).as("r_hat"))
    },
    Some("""WITH counts AS (
        SELECT user_id, CAST(ts AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS k
        FROM events GROUP BY 1, 2),
      mom AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(k) AS BIGINT) AS s1,
          CAST(SUM(k * k) AS BIGINT) AS s2
        FROM counts),
      d AS (
        SELECT n, s1, s2,
          CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m,
          CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS m2
        FROM mom)
      SELECT n, s1, s2,
        round(m, 6) AS mean_k,
        round(m2 - m * m, 6) AS var_k,
        round((m2 - m * m) / m, 6) AS dispersion,
        m2 - m * m > m AS overdispersed,
        round(m / (m2 - m * m), 6) AS p_hat,
        round(m * m / (m2 - m * m - m), 6) AS r_hat
      FROM d"""))

  val all: Seq[QueryDef] = Seq(q556NegbinFit)
}
