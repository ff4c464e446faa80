package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Cost-based-optimizer estimation wave: the textbook CBO cardinality
  * formula graded against exact join sizes, histogram-based range
  * selectivity, congressional (house+senate) sample allocation, and the
  * stratification design effect — the estimate-quality layer a planner
  * needs before it can trust its own statistics at 100 TB.
  *
  * Scale shapes: everything reduces to per-key/per-group statistics
  * frames first (the same passes an ANALYZE job runs); the audit math
  * happens on those model-sized frames.
  */
object CboOps {

  /** The System-R cardinality formula audited: for each star-schema
    * edge, estimate |A ⋈ B| = n_A·n_B / max(ndv_A, ndv_B) from the same
    * statistics q116/q221 collect, and grade it against the exact join
    * size (q156's Σ c_A·c_B, recomputed here in one pass over the key
    * profiles). err_factor = est/actual — the planner's over/under ratio
    * the formula's uniformity assumption produces on real skew. */
  val q306CboCardinality: QueryDef = QueryDef(
    "q306_cbo_cardinality",
    (s, dir) => {
      val t = Tables(s, dir)
      def audit(a: DataFrame, ka: String, b: DataFrame, kb: String, tag: String) = {
        val pa = a.groupBy(col(ka).as("k")).agg(count(lit(1)).as("ca"))
          .localCheckpoint() // feeds the stats aggregate AND the exact join
        val pb = b.groupBy(col(kb).as("k")).agg(count(lit(1)).as("cb"))
          .localCheckpoint()
        val statsA = pa.agg(sum(col("ca")).as("n_a"), count(lit(1)).as("ndv_a"))
        val statsB = pb.agg(sum(col("cb")).as("n_b"), count(lit(1)).as("ndv_b"))
        val exact = pa.join(pb, Seq("k"))
          .agg(coalesce(sum(col("ca") * col("cb")), lit(0L)).as("actual_rows"))
        statsA.crossJoin(statsB).crossJoin(exact)
          .select(lit(tag).as("join_name"), col("n_a"), col("n_b"),
            col("ndv_a"), col("ndv_b"),
            round(col("n_a").cast("double") * col("n_b") /
              greatest(col("ndv_a"), col("ndv_b")), 2).as("est_rows"),
            col("actual_rows"),
            round((col("n_a").cast("double") * col("n_b") /
              greatest(col("ndv_a"), col("ndv_b"))) / col("actual_rows"), 6)
              .as("err_factor"))
      }
      audit(t.orders, "o_orderkey", t.lineitem, "l_orderkey", "orders=lineitem")
        .unionAll(audit(t.customer, "c_custkey", t.orders, "o_custkey",
          "customer=orders"))
        .unionAll(audit(t.part, "p_partkey", t.lineitem, "l_partkey",
          "part=lineitem"))
        .unionAll(audit(t.supplier, "s_suppkey", t.lineitem, "l_suppkey",
          "supplier=lineitem"))
    },
    Some("""WITH edges(join_name, ta, tb) AS (VALUES
        ('orders=lineitem', 1, 1), ('customer=orders', 2, 2),
        ('part=lineitem', 3, 1), ('supplier=lineitem', 4, 1)),
      pa1 AS (SELECT o_orderkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
      pb1 AS (SELECT l_orderkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
      pa2 AS (SELECT c_custkey AS k, COUNT(*) AS c FROM customer GROUP BY 1),
      pb2 AS (SELECT o_custkey AS k, COUNT(*) AS c FROM orders GROUP BY 1),
      pa3 AS (SELECT p_partkey AS k, COUNT(*) AS c FROM part GROUP BY 1),
      pb3 AS (SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
      pa4 AS (SELECT s_suppkey AS k, COUNT(*) AS c FROM supplier GROUP BY 1),
      pb4 AS (SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY 1),
      one AS (
        SELECT 'orders=lineitem' AS join_name,
          (SELECT CAST(SUM(c) AS BIGINT) FROM pa1) AS n_a,
          (SELECT CAST(SUM(c) AS BIGINT) FROM pb1) AS n_b,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pa1) AS ndv_a,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pb1) AS ndv_b,
          (SELECT CAST(COALESCE(SUM(pa1.c * pb1.c), 0) AS BIGINT)
             FROM pa1 JOIN pb1 USING (k)) AS actual_rows
        UNION ALL
        SELECT 'customer=orders',
          (SELECT CAST(SUM(c) AS BIGINT) FROM pa2),
          (SELECT CAST(SUM(c) AS BIGINT) FROM pb2),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pa2),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pb2),
          (SELECT CAST(COALESCE(SUM(pa2.c * pb2.c), 0) AS BIGINT)
             FROM pa2 JOIN pb2 USING (k))
        UNION ALL
        SELECT 'part=lineitem',
          (SELECT CAST(SUM(c) AS BIGINT) FROM pa3),
          (SELECT CAST(SUM(c) AS BIGINT) FROM pb3),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pa3),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pb3),
          (SELECT CAST(COALESCE(SUM(pa3.c * pb3.c), 0) AS BIGINT)
             FROM pa3 JOIN pb3 USING (k))
        UNION ALL
        SELECT 'supplier=lineitem',
          (SELECT CAST(SUM(c) AS BIGINT) FROM pa4),
          (SELECT CAST(SUM(c) AS BIGINT) FROM pb4),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pa4),
          (SELECT CAST(COUNT(*) AS BIGINT) FROM pb4),
          (SELECT CAST(COALESCE(SUM(pa4.c * pb4.c), 0) AS BIGINT)
             FROM pa4 JOIN pb4 USING (k)))
      SELECT join_name, n_a, n_b, ndv_a, ndv_b,
        round(CAST(n_a AS DOUBLE) * n_b / greatest(ndv_a, ndv_b), 2) AS est_rows,
        actual_rows,
        round((CAST(n_a AS DOUBLE) * n_b / greatest(ndv_a, ndv_b))
          / actual_rows, 6) AS err_factor
      FROM one"""))

  /** Histogram-based range-selectivity estimation: a 16-bucket
    * equi-width histogram on o_totalprice (the statistics a CBO keeps),
    * then P(x > θ) estimated by full-bucket mass + linear interpolation
    * inside the boundary bucket, graded against the exact selectivity at
    * five thresholds. The histogram is one aggregation; the sweep runs
    * on the 16-row histogram × 5 thresholds. */
  val q307HistogramSelectivity: QueryDef = QueryDef(
    "q307_histogram_selectivity",
    (s, dir) => {
      val o = Tables(s, dir).orders.select(col("o_totalprice").as("x"))
      val bounds = o.agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        count(lit(1)).as("n"))
      val hist = o.crossJoin(broadcast(bounds))
        .withColumn("bucket", least(lit(15L),
          floor((col("x") - col("lo")) / ((col("hi") - col("lo")) / 16.0))
            .cast("long")))
        .groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // 16 rows; feeds every threshold
      val thetas = Seq(50000.0, 150000.0, 250000.0, 350000.0, 450000.0)
      val thFrame = broadcast(Tables(s, dir).region.limit(1)
        .select(explode(array(thetas.map(lit): _*)).as("theta")))
      // estimated: Σ over buckets of the mass above theta inside each
      val est = hist.crossJoin(thFrame).crossJoin(broadcast(bounds))
        .withColumn("bw", (col("hi") - col("lo")) / 16.0)
        .withColumn("b_lo", col("lo") + col("bucket") * col("bw"))
        .withColumn("b_hi", col("lo") + (col("bucket") + 1) * col("bw"))
        .withColumn("frac_above",
          when(col("theta") <= col("b_lo"), lit(1.0))
            .when(col("theta") >= col("b_hi"), lit(0.0))
            .otherwise((col("b_hi") - col("theta")) / col("bw")))
        // each bucket term is rounded-then-DECIMAL so the 16-term sum is
        // exact and partition-order-free on both engines
        .withColumn("contrib",
          col("cnt") * round(col("frac_above"), 12).cast(DecimalType(20, 12)))
        .groupBy(col("theta"), col("n"))
        .agg(round(sum(col("contrib")).cast("double") / col("n"), 6).as("est_sel"))
      val actual = o.crossJoin(thFrame)
        .groupBy(col("theta"))
        .agg((sum(when(col("x") > col("theta"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("act"))
        .select(col("theta"), round(col("act"), 6).as("actual_sel"))
      est.join(actual, Seq("theta"))
        .select(col("theta"), col("est_sel"), col("actual_sel"),
          round(abs(col("est_sel") - col("actual_sel")), 6).as("abs_err"))
        .orderBy(col("theta"))
    },
    Some("""WITH o AS (SELECT o_totalprice AS x FROM orders),
      b AS (SELECT MIN(x) AS lo, MAX(x) AS hi, CAST(COUNT(*) AS BIGINT) AS n FROM o),
      hist AS (SELECT least(15, CAST(floor((x - b.lo) / ((b.hi - b.lo) / 16.0))
            AS BIGINT)) AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM o, b GROUP BY 1),
      th AS (SELECT UNNEST([50000.0, 150000.0, 250000.0, 350000.0, 450000.0])
          AS theta),
      est AS (SELECT th.theta, b.n,
          round(CAST(SUM(hist.cnt * CAST(round(CASE
              WHEN th.theta <= b.lo + hist.bucket * ((b.hi - b.lo) / 16.0) THEN 1.0
              WHEN th.theta >= b.lo + (hist.bucket + 1) * ((b.hi - b.lo) / 16.0) THEN 0.0
              ELSE ((b.lo + (hist.bucket + 1) * ((b.hi - b.lo) / 16.0)) - th.theta)
                   / ((b.hi - b.lo) / 16.0) END, 12) AS DECIMAL(20,12)))
            AS DOUBLE) / b.n, 6) AS est_sel
        FROM hist, th, b GROUP BY 1, 2),
      act AS (SELECT th.theta,
          round(CAST(SUM(CASE WHEN o.x > th.theta THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 6) AS actual_sel
        FROM o, th GROUP BY 1)
      SELECT est.theta, est.est_sel, act.actual_sel,
        round(abs(est.est_sel - act.actual_sel), 6) AS abs_err
      FROM est JOIN act USING (theta) ORDER BY est.theta"""))

  /** Congressional sampling (house + senate): allocate a 1,000-row
    * sample budget across nations as the normalized MAX of proportional
    * (house) and equal (senate) allocation — the hybrid that keeps small
    * groups visible without starving large ones — then actually draw
    * each group's quota deterministically (md5 rank). Output per nation:
    * population, both raw quotas, the final integer quota, and the rows
    * actually drawn. The allocation math runs on the |nations| frame;
    * the draw is one per-group rank window. */
  val q308CongressionalSample: QueryDef = QueryDef(
    "q308_congressional_sample",
    (s, dir) => {
      val budget = 1000.0
      val t = Tables(s, dir)
      val cust = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("o_orderkey"))
      val w = Window.partitionBy()
      val alloc = cust.groupBy(col("n_name")).agg(count(lit(1)).as("pop"))
        .withColumn("total", sum(col("pop")).over(w))
        .withColumn("n_groups", count(lit(1)).over(w))
        .withColumn("q_house", lit(budget) * col("pop") / col("total"))
        .withColumn("q_senate", lit(budget) / col("n_groups"))
        .withColumn("q_max", greatest(col("q_house"), col("q_senate")))
        .withColumn("q_max_sum", sum(round(col("q_max"), 6)
          .cast(DecimalType(24, 6))).over(w).cast("double"))
        .withColumn("quota", least(col("pop"),
          floor(lit(budget) * col("q_max") / col("q_max_sum")).cast("long")))
        .localCheckpoint() // |nations| rows; feeds the draw and the report
      val drawn = cust.join(broadcast(alloc.select(col("n_name"), col("quota"))),
          Seq("n_name"))
        .withColumn("rk", row_number().over(Window.partitionBy(col("n_name"))
          .orderBy(md5(col("o_orderkey").cast("string")).asc,
            col("o_orderkey").asc)).cast("long"))
        .filter(col("rk") <= col("quota"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("sampled"))
      alloc.join(drawn, Seq("n_name"), "left")
        .select(col("n_name"), col("pop"),
          round(col("q_house"), 6).as("q_house"),
          round(col("q_senate"), 6).as("q_senate"),
          col("quota"), coalesce(col("sampled"), lit(0L)).as("sampled"))
        .orderBy(col("n_name"))
    },
    Some("""WITH cust AS (SELECT n.n_name, o.o_orderkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
      pops AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS pop
        FROM cust GROUP BY 1),
      alloc AS (SELECT n_name, pop,
          1000.0 * pop / SUM(pop) OVER () AS q_house,
          1000.0 / COUNT(*) OVER () AS q_senate,
          greatest(1000.0 * pop / SUM(pop) OVER (), 1000.0 / COUNT(*) OVER ())
            AS q_max
        FROM pops),
      norm AS (SELECT *, CAST(SUM(CAST(round(q_max, 6) AS DECIMAL(24,6)))
            OVER () AS DOUBLE) AS q_max_sum
        FROM alloc),
      quotas AS (SELECT n_name, pop, q_house, q_senate,
          least(pop, CAST(floor(1000.0 * q_max / q_max_sum) AS BIGINT)) AS quota
        FROM norm),
      ranked AS (SELECT cust.n_name, q.quota,
          ROW_NUMBER() OVER (PARTITION BY cust.n_name
            ORDER BY md5(CAST(cust.o_orderkey AS VARCHAR)), cust.o_orderkey) AS rk
        FROM cust JOIN quotas q USING (n_name)),
      drawn AS (SELECT n_name, CAST(COUNT(*) AS BIGINT) AS sampled
        FROM ranked WHERE rk <= quota GROUP BY 1)
      SELECT q.n_name, q.pop, round(q.q_house, 6) AS q_house,
        round(q.q_senate, 6) AS q_senate, q.quota,
        COALESCE(d.sampled, 0) AS sampled
      FROM quotas q LEFT JOIN drawn d USING (n_name)
      ORDER BY q.n_name"""))

  /** Stratification design effect: the variance of the mean-revenue
    * estimator under proportional stratification by market segment vs
    * simple random sampling, from exact population moments —
    * deff = Σ W_h σ²_h / σ² (the within-strata share of total
    * variance; < 1 exactly when strata separate means). Reports per-
    * design variance at n = 1,000 and the design effect. All exact
    * DECIMAL power sums; the comparison runs on the |segments| frame. */
  val q309DesignEffect: QueryDef = QueryDef(
    "q309_design_effect",
    (s, dir) => {
      val M = DecimalType(22, 4)
      val t = Tables(s, dir)
      val joined = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("seg"),
          col("o_totalprice").cast(M).as("x"))
      val strata = joined.groupBy(col("seg"))
        .agg(count(lit(1)).as("n_h"), sum(col("x")).as("s1"),
          sum(col("x") * col("x")).as("s2"))
        .localCheckpoint()
      val w = Window.partitionBy()
      strata
        .withColumn("n", sum(col("n_h")).over(w))
        .withColumn("g1", sum(col("s1")).over(w))
        .withColumn("g2", sum(col("s2")).over(w))
        .withColumn("var_h", col("s2").cast("double") / col("n_h") -
          (col("s1").cast("double") / col("n_h")) *
            (col("s1").cast("double") / col("n_h")))
        .withColumn("w_h", col("n_h").cast("double") / col("n"))
        .withColumn("within", round(col("w_h") * col("var_h"), 4)
          .cast(DecimalType(28, 4)))
        .groupBy(col("n"), col("g1"), col("g2"))
        .agg(sum(col("within")).cast("double").as("var_strat"))
        .withColumn("var_srs", col("g2").cast("double") / col("n") -
          (col("g1").cast("double") / col("n")) *
            (col("g1").cast("double") / col("n")))
        .select(
          round(col("var_srs") / 1000.0, 6).as("se2_srs_n1000"),
          round(col("var_strat") / 1000.0, 6).as("se2_strat_n1000"),
          round(col("var_strat") / col("var_srs"), 6).as("deff"))
    },
    Some("""WITH j AS (SELECT c.c_mktsegment AS seg,
          CAST(o.o_totalprice AS DECIMAL(22,4)) AS x
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      strata AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_h,
          SUM(x) AS s1, SUM(x * x) AS s2
        FROM j GROUP BY 1),
      g AS (SELECT *, SUM(n_h) OVER () AS n, SUM(s1) OVER () AS g1,
          SUM(s2) OVER () AS g2 FROM strata),
      parts AS (SELECT n, g1, g2,
          CAST(round((CAST(n_h AS DOUBLE) / n) *
            (CAST(s2 AS DOUBLE) / n_h - (CAST(s1 AS DOUBLE) / n_h)
              * (CAST(s1 AS DOUBLE) / n_h)), 4) AS DECIMAL(28,4)) AS within
        FROM g),
      agg AS (SELECT n, g1, g2, CAST(SUM(within) AS DOUBLE) AS var_strat
        FROM parts GROUP BY 1, 2, 3)
      SELECT
        round((CAST(g2 AS DOUBLE) / n - (CAST(g1 AS DOUBLE) / n)
          * (CAST(g1 AS DOUBLE) / n)) / 1000.0, 6) AS se2_srs_n1000,
        round(var_strat / 1000.0, 6) AS se2_strat_n1000,
        round(var_strat / (CAST(g2 AS DOUBLE) / n - (CAST(g1 AS DOUBLE) / n)
          * (CAST(g1 AS DOUBLE) / n)), 6) AS deff
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(q306CboCardinality, q307HistogramSelectivity,
    q308CongressionalSample, q309DesignEffect)
}
