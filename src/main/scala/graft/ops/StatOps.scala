package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experimentation & robust-statistics operators: Welch's unequal-variance
  * t-test, weighted median, and Pareto/ABC inventory classification — the
  * A/B-measurement layer, built on the q54 exact-power-sum idiom.
  */
object StatOps {

  /** Welch's two-sample t-test of each event type's value against the
    * 'view' baseline — the A/B statistic for streams whose variances
    * differ (Welch-Satterthwaite degrees of freedom, not pooled). Each
    * group reduces to (n, Σx, Σx²) through exact DECIMAL power sums in
    * ONE scan (the q54 idiom: group means/variances are then pure double
    * arithmetic on exact inputs, so partitioning cannot move them); the
    * 1-row baseline aggregate broadcasts back onto the 4-row treatment
    * profile. Round to 9: the power sums sit where DuckDB's
    * decimal→double path can differ from the JVM's by 1 ulp.
    */
  val q164WelchTtest: QueryDef = QueryDef(
    "q164_welch_ttest",
    (s, dir) => {
      val n  = count(lit(1)).cast("double")
      val s1 = sum(col("value").cast(DecimalType(18, 4))).cast("double")
      val s2 = sum((col("value") * col("value")).cast(DecimalType(30, 8))).cast("double")
      val ev = EventOps.events(s, dir)
      val prof = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), (s1 / n).as("m"),
             (((s2 - s1 * s1 / n) / (n - lit(1.0))) / n).as("se2"))
        .localCheckpoint() // |types| rows; one events scan feeds both sides
      val base = prof.filter(col("event_type") === "view")
        .select(col("n").as("n0"), col("m").as("m0"), col("se2").as("se0"))
      prof.filter(col("event_type") =!= "view")
        .crossJoin(broadcast(base))
        .select(col("event_type"), col("n"), col("n0"),
          round(col("m") - col("m0"), 9).as("mean_diff"),
          round((col("m") - col("m0")) / sqrt(col("se2") + col("se0")), 9)
            .as("t_stat"),
          round((col("se2") + col("se0")) * (col("se2") + col("se0")) /
            (col("se2") * col("se2") / (col("n").cast("double") - 1.0) +
             col("se0") * col("se0") / (col("n0").cast("double") - 1.0)), 9)
            .as("welch_df"))
    },
    Some("""WITH prof AS (SELECT event_type, COUNT(*) AS n,
          CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE) AS m,
          ((CAST(SUM(CAST(value*value AS DECIMAL(30,8))) AS DOUBLE)
            - CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
              * CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE))
           / (CAST(COUNT(*) AS DOUBLE) - 1.0)) / CAST(COUNT(*) AS DOUBLE) AS se2
        FROM events GROUP BY 1),
      base AS (SELECT n AS n0, m AS m0, se2 AS se0 FROM prof
        WHERE event_type = 'view')
      SELECT p.event_type, p.n, b.n0,
        round(p.m - b.m0, 9) AS mean_diff,
        round((p.m - b.m0) / sqrt(p.se2 + b.se0), 9) AS t_stat,
        round((p.se2 + b.se0) * (p.se2 + b.se0) /
          (p.se2 * p.se2 / (CAST(p.n AS DOUBLE) - 1.0) +
           b.se0 * b.se0 / (CAST(b.n0 AS DOUBLE) - 1.0)), 9) AS welch_df
      FROM prof p, base b WHERE p.event_type <> 'view'"""))

  /** Weighted median: per return flag, the l_extendedprice at which
    * cumulative l_quantity weight first reaches half the total. Ties
    * collapse FIRST (one hash-agg to (flag, price, Σweight)), so the
    * cumulative window orders distinct prices only — deterministic
    * without a tiebreaker and orders of magnitude fewer rows than the
    * scan. Weights accumulate in DECIMAL: the 2·cum ≥ total threshold
    * is an exact comparison, immune to float summation order. Per-flag
    * partitions keep every window sub-sharded.
    */
  val q165WeightedMedian: QueryDef = QueryDef(
    "q165_weighted_median",
    (s, dir) => {
      val g = Tables(s, dir).lineitem
        .groupBy(col("l_returnflag"), col("l_extendedprice"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 4))).as("w"))
      val cumW = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_extendedprice").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("l_returnflag"))
      g.withColumn("cum", sum(col("w")).over(cumW))
        .withColumn("tot", sum(col("w")).over(totW))
        .filter(col("cum") * 2 >= col("tot"))
        .groupBy(col("l_returnflag"))
        .agg(min(col("l_extendedprice")).as("weighted_median"),
             count(lit(1)).as("n_prices_above"),
             max(col("tot").cast("double")).as("total_weight"))
    },
    Some("""WITH g AS (SELECT l_returnflag, l_extendedprice,
          SUM(CAST(l_quantity AS DECIMAL(18,4))) AS w
        FROM lineitem GROUP BY 1, 2),
      c AS (SELECT *,
          SUM(w) OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
          SUM(w) OVER (PARTITION BY l_returnflag) AS tot
        FROM g)
      SELECT l_returnflag,
        MIN(l_extendedprice) AS weighted_median,
        COUNT(*) AS n_prices_above,
        MAX(CAST(tot AS DOUBLE)) AS total_weight
      FROM c WHERE cum * 2 >= tot GROUP BY 1"""))

  /** Pareto/ABC classification: within each part category, rank parts by
    * revenue and classify A (first 80% of cumulative revenue), B (to
    * 95%), C (tail) — the inventory-prioritization operator. Per-part
    * revenue is an exact DECIMAL rollup; the cumulative window runs over
    * the per-part PROFILE (one row per part, partitioned by category,
    * ordered revenue-desc with a key tiebreaker), never the raw scan.
    * The class boundaries compare doubles both engines derive from
    * identical exact decimals, so the cut is deterministic.
    */
  val q166ParetoAbc: QueryDef = QueryDef(
    "q166_pareto_abc",
    (s, dir) => {
      val t = Tables(s, dir)
      val rev = t.lineitem
        .join(broadcast(t.part.select(col("p_partkey"), col("p_type"))),
              col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_type"), col("p_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
               .cast(DecimalType(22, 8))).as("rev"))
      val cumW = Window.partitionBy(col("p_type"))
        .orderBy(col("rev").desc, col("p_partkey").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val totW = Window.partitionBy(col("p_type"))
      val classW = Window.partitionBy(col("p_type"))
      rev
        .withColumn("cumshare",
          sum(col("rev")).over(cumW).cast("double") /
            sum(col("rev")).over(totW).cast("double"))
        .withColumn("abc_class",
          when(col("cumshare") <= 0.80, "A")
            .when(col("cumshare") <= 0.95, "B").otherwise("C"))
        .groupBy(col("p_type"), col("abc_class"))
        .agg(count(lit(1)).as("n_parts"), sum(col("rev")).as("crev"))
        .withColumn("revenue_share",
          round(col("crev").cast("double") /
            sum(col("crev")).over(classW).cast("double"), 6))
        .select(col("p_type"), col("abc_class"), col("n_parts"), col("revenue_share"))
    },
    Some("""WITH rev AS (SELECT p_type, p_partkey,
          SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(22,8))) AS rev
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY 1, 2),
      c AS (SELECT p_type, p_partkey, rev,
          CAST(SUM(rev) OVER (PARTITION BY p_type
              ORDER BY rev DESC, p_partkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) /
            CAST(SUM(rev) OVER (PARTITION BY p_type) AS DOUBLE) AS cumshare
        FROM rev),
      k AS (SELECT *, CASE WHEN cumshare <= 0.80 THEN 'A'
                           WHEN cumshare <= 0.95 THEN 'B'
                           ELSE 'C' END AS abc_class
        FROM c),
      g AS (SELECT p_type, abc_class, COUNT(*) AS n_parts, SUM(rev) AS crev
        FROM k GROUP BY 1, 2)
      SELECT p_type, abc_class, n_parts,
        round(CAST(crev AS DOUBLE) /
          CAST(SUM(crev) OVER (PARTITION BY p_type) AS DOUBLE), 6)
          AS revenue_share
      FROM g"""))

  val all: Seq[QueryDef] = Seq(q164WelchTtest, q165WeightedMedian, q166ParetoAbc)
}
