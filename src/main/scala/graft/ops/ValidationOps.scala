package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Validation & release wave: k-fold cross-validation of a groupwise
  * model, difference-in-differences estimation, a seasonal-naive
  * forecast scored by MASE, and a k-anonymity audit of the
  * quasi-identifier surface. The evaluate-before-you-ship layer: CV and
  * MASE price a model, DiD prices an intervention, k-anonymity prices a
  * data release.
  */
object ValidationOps {

  private val dec = DecimalType(18, 4)

  /** 5-fold cross-validation of the priority-mean model (q243's model
    * fitted honestly): md5 assigns folds, each fold is scored by the
    * model trained on the OTHER four — computed as (group total − fold
    * total)/(n − n_fold), so the leave-fold-out fit needs no second scan
    * of the data. Output per fold: MAE and RMSE through rounded-term
    * DECIMAL sums. One aggregation + one fold-level join at any scale. */
  val q258CvFolds: QueryDef = QueryDef(
    "q258_cv_folds",
    (s, dir) => {
      val decS = DecimalType(28, 10)
      val o = Tables(s, dir).orders
        .withColumn("fold",
          pmod(conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(5L)))
        .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"), col("fold"))
        .localCheckpoint() // feeds the cell stats and the scoring pass
      val cells = o.groupBy(col("o_orderpriority"), col("fold"))
        .agg(count(lit(1)).as("nf"), sum(col("o_totalprice").cast(dec)).as("sf"))
      val wG = Window.partitionBy(col("o_orderpriority"))
      val model = cells
        .withColumn("mu_rest", round(
          (sum(col("sf")).over(wG) - col("sf")).cast("double") /
            (sum(col("nf")).over(wG) - col("nf")), 9))
        .select(col("o_orderpriority"), col("fold"), col("mu_rest"))
      o.join(broadcast(model), Seq("o_orderpriority", "fold"))
        .withColumn("err", col("o_totalprice") - col("mu_rest"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_held_out"),
          sum(round(abs(col("err")), 6).cast(decS)).as("sae"),
          sum(round(col("err") * col("err"), 4).cast(decS)).as("sse"))
        .select(col("fold"), col("n_held_out"),
          round(col("sae").cast("double") / col("n_held_out"), 6).as("mae"),
          round(sqrt(col("sse").cast("double") / col("n_held_out")), 6).as("rmse"))
    },
    Some("""WITH o AS (SELECT o_orderkey, o_orderpriority, o_totalprice,
          ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 5 AS fold
        FROM orders),
      cells AS (SELECT o_orderpriority, fold, COUNT(*) AS nf,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS sf
        FROM o GROUP BY 1, 2),
      model AS (SELECT o_orderpriority, fold,
          round(CAST(SUM(sf) OVER (PARTITION BY o_orderpriority) - sf AS DOUBLE)
            / (SUM(nf) OVER (PARTITION BY o_orderpriority) - nf), 9) AS mu_rest
        FROM cells),
      sc AS (SELECT o.fold, o.o_totalprice - m.mu_rest AS err
        FROM o JOIN model m ON m.o_orderpriority = o.o_orderpriority AND m.fold = o.fold)
      SELECT fold, CAST(COUNT(*) AS BIGINT) AS n_held_out,
        round(CAST(SUM(CAST(round(abs(err), 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS mae,
        round(sqrt(CAST(SUM(CAST(round(err * err, 4) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*)), 6) AS rmse
      FROM sc GROUP BY 1"""))

  /** Difference-in-differences: md5 splits customers into a treated and
    * a control arm, the order timeline splits at 1996-01-01, and the DiD
    * estimate is (T_post − T_pre) − (C_post − C_pre) on mean order
    * value, with the standard pooled SE from the four cell variances.
    * The 2×2 cell frame is all that leaves the one aggregation pass —
    * the causal-analytics primitive next to q215's A/B z-test. */
  val q259DiffInDiff: QueryDef = QueryDef(
    "q259_diff_in_diff",
    (s, dir) => {
      val wAll = Window.partitionBy()
      val cells = Tables(s, dir).orders
        .withColumn("arm",
          when(pmod(conv(substring(md5(col("o_custkey").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(2L)) === 1L, lit("treated")).otherwise(lit("control")))
        .withColumn("era",
          when(col("o_orderdate") >= lit("1996-01-01"), lit("post")).otherwise(lit("pre")))
        .groupBy(col("arm"), col("era"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(dec)).as("s1"),
          sum(round(col("o_totalprice") * col("o_totalprice"), 4)
            .cast(DecimalType(28, 6))).as("s2"))
        .withColumn("mu", round(col("s1").cast("double") / col("n"), 9))
        .withColumn("se2", round((col("s2").cast("double") -
          pow(col("s1").cast("double"), 2) / col("n")) /
          (col("n") - 1) / col("n"), 9))
      cells
        .withColumn("did", round(
          sum(when(col("arm") === "treated" && col("era") === "post", col("mu"))
            .when(col("arm") === "treated" && col("era") === "pre", -col("mu"))
            .when(col("arm") === "control" && col("era") === "post", -col("mu"))
            .otherwise(col("mu"))).over(wAll), 6))
        .withColumn("did_se", round(sqrt(sum(col("se2")).over(wAll)), 6))
        .select(col("arm"), col("era"), col("n"),
          round(col("mu"), 6).as("mean_value"), col("did"), col("did_se"))
    },
    Some("""WITH cells AS (SELECT
          CASE WHEN ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 = 1
            THEN 'treated' ELSE 'control' END AS arm,
          CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 'post' ELSE 'pre' END AS era,
          COUNT(*) AS n,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s1,
          SUM(CAST(round(o_totalprice * o_totalprice, 4) AS DECIMAL(28,6))) AS s2
        FROM orders GROUP BY 1, 2),
      mm AS (SELECT arm, era, n,
          round(CAST(s1 AS DOUBLE) / n, 9) AS mu,
          round((CAST(s2 AS DOUBLE) - pow(CAST(s1 AS DOUBLE), 2) / n) / (n - 1) / n, 9) AS se2
        FROM cells)
      SELECT arm, era, CAST(n AS BIGINT) AS n, round(mu, 6) AS mean_value,
        round(SUM(CASE WHEN arm = 'treated' AND era = 'post' THEN mu
                       WHEN arm = 'treated' AND era = 'pre' THEN -mu
                       WHEN arm = 'control' AND era = 'post' THEN -mu
                       ELSE mu END) OVER (), 6) AS did,
        round(sqrt(SUM(se2) OVER ()), 6) AS did_se
      FROM mm"""))

  /** Seasonal-naive forecast scored by MASE per nation: ŷ(d) = y(d−7)
    * on the daily revenue spine (missing lag → no forecast that day),
    * MASE = MAE(seasonal-naive)/MAE(naive-1) — Hyndman's scale-free
    * yardstick every fancier forecaster must beat. Lags are equi-joins
    * on (nation, day−k) against the calendar-bounded daily frame; a
    * MASE ≥ 1 nation is one where last week says nothing. */
  val q260SeasonalNaiveMase: QueryDef = QueryDef(
    "q260_seasonal_naive_mase",
    (s, dir) => {
      val decS = DecimalType(28, 10)
      val t = Tables(s, dir)
      val daily = t.lineitem
        .join(t.orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(round(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(22, 8))).cast("double"), 9).as("rev"))
        .select(col("n_name"), datediff(col("day"), lit("1992-01-01")).cast("long").as("d"),
          col("rev"))
        .localCheckpoint() // feeds the base and both lag sides
      val sea = daily
        .join(daily.select(col("n_name"), (col("d") + 7L).as("d"), col("rev").as("rev_l7")),
          Seq("n_name", "d"))
      val nai = daily
        .join(daily.select(col("n_name"), (col("d") + 1L).as("d"), col("rev").as("rev_l1")),
          Seq("n_name", "d"))
      val mae7 = sea.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_forecast"),
          sum(round(abs(col("rev") - col("rev_l7")), 6).cast(decS)).as("sae7"))
      val mae1 = nai.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_naive"),
          sum(round(abs(col("rev") - col("rev_l1")), 6).cast(decS)).as("sae1"))
      mae7.join(mae1, Seq("n_name"))
        .select(col("n_name"), col("n_forecast"),
          round(col("sae7").cast("double") / col("n_forecast"), 6).as("mae_seasonal"),
          round(col("sae1").cast("double") / col("n_naive"), 6).as("mae_naive"),
          round((col("sae7").cast("double") / col("n_forecast")) /
            (col("sae1").cast("double") / col("n_naive")), 6).as("mase"))
    },
    Some("""WITH daily AS (SELECT n.n_name,
          datediff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE)) AS d,
          round(CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount)
            AS DECIMAL(22,8))) AS DOUBLE), 9) AS rev
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      mae7 AS (SELECT a.n_name, COUNT(*) AS n_forecast,
          SUM(CAST(round(abs(a.rev - b.rev), 6) AS DECIMAL(28,10))) AS sae7
        FROM daily a JOIN daily b ON a.n_name = b.n_name AND b.d = a.d - 7
        GROUP BY 1),
      mae1 AS (SELECT a.n_name, COUNT(*) AS n_naive,
          SUM(CAST(round(abs(a.rev - b.rev), 6) AS DECIMAL(28,10))) AS sae1
        FROM daily a JOIN daily b ON a.n_name = b.n_name AND b.d = a.d - 1
        GROUP BY 1)
      SELECT m7.n_name, CAST(m7.n_forecast AS BIGINT) AS n_forecast,
        round(CAST(m7.sae7 AS DOUBLE) / m7.n_forecast, 6) AS mae_seasonal,
        round(CAST(m1.sae1 AS DOUBLE) / m1.n_naive, 6) AS mae_naive,
        round((CAST(m7.sae7 AS DOUBLE) / m7.n_forecast)
          / (CAST(m1.sae1 AS DOUBLE) / m1.n_naive), 6) AS mase
      FROM mae7 m7 JOIN mae1 m1 ON m1.n_name = m7.n_name"""))

  /** k-anonymity audit of the (nation, market segment, order year)
    * quasi-identifier: equivalence-class sizes over the released rows,
    * the share of customers sitting in classes smaller than k = 5, and
    * the minimum class size per nation. The release gate that belongs
    * next to q97's PII redaction: redaction hides the direct
    * identifiers, this measures whether the quasi-identifiers re-identify
    * anyway. One grouping pass; class counts are model-sized. */
  val q261KanonymityAudit: QueryDef = QueryDef(
    "q261_kanonymity_audit",
    (s, dir) => {
      val t = Tables(s, dir)
      val release = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_mktsegment"),
          year(col("o_orderdate")).cast("long").as("o_year"),
          col("o_custkey"))
      val classes = release
        .groupBy(col("n_name"), col("c_mktsegment"), col("o_year"))
        .agg(count(lit(1)).as("class_rows"),
          countDistinct(col("o_custkey")).as("class_customers"))
      classes.groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_classes"),
          min(col("class_rows")).as("min_class_rows"),
          sum(col("class_rows")).as("n_rows"),
          sum(when(col("class_rows") < 5, col("class_rows")).otherwise(0L))
            .as("rows_below_k"))
        .withColumn("share_below_k",
          round(col("rows_below_k").cast("double") / col("n_rows"), 6))
        .withColumn("k_anonymous", col("min_class_rows") >= 5)
    },
    Some("""WITH rel AS (SELECT n.n_name, c.c_mktsegment,
          CAST(year(o.o_orderdate) AS BIGINT) AS o_year, o.o_custkey
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
      cls AS (SELECT n_name, c_mktsegment, o_year, COUNT(*) AS class_rows,
          COUNT(DISTINCT o_custkey) AS class_customers
        FROM rel GROUP BY 1, 2, 3)
      SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_classes,
        CAST(MIN(class_rows) AS BIGINT) AS min_class_rows,
        CAST(SUM(class_rows) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN class_rows < 5 THEN class_rows ELSE 0 END) AS BIGINT) AS rows_below_k,
        round(CAST(SUM(CASE WHEN class_rows < 5 THEN class_rows ELSE 0 END) AS DOUBLE)
          / SUM(class_rows), 6) AS share_below_k,
        MIN(class_rows) >= 5 AS k_anonymous
      FROM cls GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q258CvFolds, q259DiffInDiff, q260SeasonalNaiveMase, q261KanonymityAudit)
}
