package graft.ops

import org.apache.spark.sql.functions._

/** Transform-selection wave: Box–Cox λ chosen by exact profile
  * log-likelihood over the dyadic grid λ ∈ {-1, -1/2, 0, 1/2, 1} — the
  * "should this metric be logged, square-rooted, or left alone?"
  * decision made from data instead of convention. Every z_λ is written
  * with sqrt/reciprocal (no pow), so both engines compute bit-identical
  * transforms; the argmax is scale-invariant, so y is pre-divided by
  * 10⁴ to keep the scaled-long accumulators in range (the shift this
  * induces in LL is constant across λ — documented Box–Cox identity).
  *
  * Scale shape: ONE corpus scan computes all five λ's moment sums as
  * parallel aggregate columns (no 5× explode); the likelihood profile
  * is a 5-row frame.
  */
object BoxCoxOps {

  /** Box–Cox profile likelihood for order value: per λ the variance of
    * z_λ and the profile LL, with the argmax flagged. */
  val q419BoxCox: QueryDef = QueryDef(
    "q419_box_cox",
    (s, dir) => {
      val xs = Tables(s, dir).orders
        .select((col("o_totalprice") / 10000.0).as("x"))
      def zl(lam: Double) = lam match {
        case -1.0 => lit(1.0) - lit(1.0) / col("x")
        case -0.5 => lit(2.0) * (lit(1.0) - lit(1.0) / sqrt(col("x")))
        case 0.0  => log(col("x"))
        case 0.5  => lit(2.0) * (sqrt(col("x")) - lit(1.0))
        case 1.0  => col("x") - lit(1.0)
      }
      val lams = Seq(-1.0, -0.5, 0.0, 0.5, 1.0)
      val sums = lams.zipWithIndex.flatMap { case (l, i) =>
        Seq(sum(round(zl(l) * 1e9).cast("long")).as(s"sz$i"),
          sum(round(zl(l) * zl(l) * 1e8).cast("long")).as(s"szz$i"))
      }
      val aggCols =
        sum(round(log(col("x")) * 1e9).cast("long")).as("slny") +: sums
      val agg = xs.agg(count(lit(1)).as("n"), aggCols: _*)
      val rows = agg.select(explode(array(lams.zipWithIndex.map {
        case (l, i) =>
          val mz = col(s"sz$i").cast("double") / 1e9 / col("n")
          val s2 = col(s"szz$i").cast("double") / 1e8 / col("n") - mz * mz
          struct(lit(l).as("lambda"),
            round(s2, 6).as("sigma2"),
            round(lit(-0.5) * col("n") * log(greatest(s2, lit(1e-12))) +
              lit(l - 1.0) * col("slny").cast("double") / lit(1e9), 4)
              .as("ll"))
      }: _*)).as("r")).select(col("r.*"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("ll").desc, col("lambda"))
      rows.withColumn("is_best", (row_number().over(w) === 1))
        .orderBy(col("lambda"))
    },
    Some("""WITH xs AS (SELECT o_totalprice / 10000.0 AS x FROM orders),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(round(ln(x) * 1000000000) AS BIGINT)) AS BIGINT)
            AS slny,
          CAST(SUM(CAST(round((1.0 - 1.0 / x) * 1000000000) AS BIGINT))
            AS BIGINT) AS sz0,
          CAST(SUM(CAST(round((1.0 - 1.0 / x) * (1.0 - 1.0 / x) * 100000000)
            AS BIGINT)) AS BIGINT) AS szz0,
          CAST(SUM(CAST(round(2.0 * (1.0 - 1.0 / sqrt(x)) * 1000000000)
            AS BIGINT)) AS BIGINT) AS sz1,
          CAST(SUM(CAST(round(2.0 * (1.0 - 1.0 / sqrt(x))
            * 2.0 * (1.0 - 1.0 / sqrt(x)) * 100000000) AS BIGINT)) AS BIGINT)
            AS szz1,
          CAST(SUM(CAST(round(ln(x) * 1000000000) AS BIGINT)) AS BIGINT)
            AS sz2,
          CAST(SUM(CAST(round(ln(x) * ln(x) * 100000000) AS BIGINT))
            AS BIGINT) AS szz2,
          CAST(SUM(CAST(round(2.0 * (sqrt(x) - 1.0) * 1000000000) AS BIGINT))
            AS BIGINT) AS sz3,
          CAST(SUM(CAST(round(2.0 * (sqrt(x) - 1.0) * 2.0 * (sqrt(x) - 1.0)
            * 100000000) AS BIGINT)) AS BIGINT) AS szz3,
          CAST(SUM(CAST(round((x - 1.0) * 1000000000) AS BIGINT)) AS BIGINT)
            AS sz4,
          CAST(SUM(CAST(round((x - 1.0) * (x - 1.0) * 100000000) AS BIGINT))
            AS BIGINT) AS szz4
        FROM xs),
      lamgrid AS (
        SELECT -1.0 AS lambda, sz0 AS sz, szz0 AS szz, n, slny FROM agg
        UNION ALL SELECT -0.5, sz1, szz1, n, slny FROM agg
        UNION ALL SELECT 0.0, sz2, szz2, n, slny FROM agg
        UNION ALL SELECT 0.5, sz3, szz3, n, slny FROM agg
        UNION ALL SELECT 1.0, sz4, szz4, n, slny FROM agg),
      prof AS (SELECT lambda,
          round(CAST(szz AS DOUBLE) / 100000000 / n
            - (CAST(sz AS DOUBLE) / 1000000000 / n)
              * (CAST(sz AS DOUBLE) / 1000000000 / n), 6) AS sigma2,
          round(-0.5 * n * ln(greatest(
              CAST(szz AS DOUBLE) / 100000000 / n
              - (CAST(sz AS DOUBLE) / 1000000000 / n)
                * (CAST(sz AS DOUBLE) / 1000000000 / n), 0.000000000001))
            + (lambda - 1.0) * CAST(slny AS DOUBLE) / 1000000000, 4) AS ll
        FROM lamgrid),
      best AS (SELECT lambda AS bl FROM prof ORDER BY ll DESC, lambda LIMIT 1)
      SELECT p.lambda, p.sigma2, p.ll, (p.lambda = b.bl) AS is_best
      FROM prof p, best b ORDER BY p.lambda"""))

  val all: Seq[QueryDef] = Seq(q419BoxCox)
}
