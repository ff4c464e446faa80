package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Blocked-rank wave: Friedman test + Kendall's W — the repeated-
  * measures member of the rank-test family: q421's Kruskal–Wallis
  * pools all rows into one ranking; Friedman ranks WITHIN each block
  * (month), so a between-month level shift cannot masquerade as a
  * treatment effect. Kendall's W restates the same statistic as
  * inter-block concordance in [0,1].
  *
  * Determinism: block cell values are exact DECIMAL revenue sums;
  * within-block mid-ranks are 2·rank integers (q412 idiom); the χ²
  * algebra runs in double on exact integer rank sums with the exact
  * Σ(t³−t) tie correction.
  *
  * Scale shape: one (block × treatment) aggregation, one rank window
  * per block (shuffle-partitioned on block), then a k-row report.
  */
object FriedmanOps {

  /** Friedman test of monthly revenue by order priority: per treatment
    * the rank sum and mean rank, tie-corrected χ², df, Kendall's W,
    * 5% verdict over complete blocks. */
  val q434FriedmanTest: QueryDef = QueryDef(
    "q434_friedman_test",
    (s, dir) => {
      val cells = Tables(s, dir).orders
        .groupBy(date_trunc("month", col("o_orderdate")).as("blk"),
          col("o_orderpriority").as("trt"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("v"))
      val kTot = cells.agg(countDistinct(col("trt")).as("k"))
      // complete blocks only (all k treatments present)
      val complete = cells
        .withColumn("nt", count(lit(1)).over(Window.partitionBy(col("blk"))))
        .crossJoin(broadcast(kTot))
        .where(col("nt") === col("k"))
        .localCheckpoint() // rank pass + tie pass
      val ranked = complete.withColumn("r2",
        (rank().over(Window.partitionBy(col("blk")).orderBy(col("v"))) * 2 +
          count(lit(1)).over(Window.partitionBy(col("blk"), col("v"))) - 1)
          .cast("long"))
      val d38 = DecimalType(38, 0)
      val perT = ranked.groupBy(col("trt"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("r2").cast(d38)).as("sr2"))
      val ties = complete.groupBy(col("blk"), col("v"))
        .agg(count(lit(1)).as("t"))
        .agg(sum((col("t") * col("t") * col("t") - col("t")).cast(d38))
          .as("tie3"))
      val w = Window.partitionBy()
      perT.crossJoin(broadcast(ties)).crossJoin(broadcast(kTot))
        .withColumn("n", first(col("n_blocks")).over(w).cast("double"))
        .withColumn("kk", col("k").cast("double"))
        .withColumn("mean_rank",
          round(col("sr2").cast("double") / 2 / col("n_blocks"), 4))
        // Σ(R_j − n(k+1)/2)² on exact 2·rank sums: dev = (sr2 − n(k+1))/2
        .withColumn("dev2",
          (col("sr2").cast("double") - col("n") * (col("kk") + 1)) *
            (col("sr2").cast("double") - col("n") * (col("kk") + 1)) / 4)
        .withColumn("ssdev", sum(round(col("dev2"), 6)
          .cast(DecimalType(28, 6))).over(w).cast("double"))
        .withColumn("denom", col("n") * col("kk") * (col("kk") + 1) / 12
          - col("tie3").cast("double") / ((col("kk") - 1) * 12))
        .withColumn("chi2", round(col("ssdev") / col("denom"), 6))
        .withColumn("kendall_w", round(col("chi2")
          / (col("n") * (col("kk") - 1)), 6))
        .select(col("trt"), col("n_blocks"),
          round(col("sr2").cast("double") / 2, 1).as("rank_sum"),
          col("mean_rank"), col("chi2"),
          (col("k") - 1).cast("long").as("df"), col("kendall_w"),
          (col("chi2") > 9.487729036781154).as("reject_5pct"))
        .orderBy(col("trt"))
    },
    Some("""WITH cells AS (SELECT date_trunc('month', o_orderdate) AS blk,
          o_orderpriority AS trt,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
        FROM orders GROUP BY 1, 2),
      ktot AS (SELECT CAST(COUNT(DISTINCT trt) AS BIGINT) AS k FROM cells),
      complete AS (SELECT c.* FROM cells c, ktot
        QUALIFY COUNT(*) OVER (PARTITION BY c.blk) = ktot.k),
      ranked AS (SELECT trt,
          CAST(RANK() OVER (PARTITION BY blk ORDER BY v) * 2
            + COUNT(*) OVER (PARTITION BY blk, v) - 1 AS BIGINT) AS r2
        FROM complete),
      pert AS (SELECT trt, CAST(COUNT(*) AS BIGINT) AS n_blocks,
          SUM(CAST(r2 AS DECIMAL(38,0))) AS sr2
        FROM ranked GROUP BY 1),
      ties AS (SELECT SUM(CAST(t * t * t - t AS DECIMAL(38,0))) AS tie3
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM complete
          GROUP BY blk, v)),
      alg AS (SELECT p.trt, p.n_blocks, p.sr2,
          CAST(ANY_VALUE(p.n_blocks) OVER () AS DOUBLE) AS n,
          CAST(k.k AS DOUBLE) AS kk, k.k, t.tie3
        FROM pert p, ties t, ktot k),
      alg2 AS (SELECT *,
          round(CAST(sr2 AS DOUBLE) / 2 / n_blocks, 4) AS mean_rank,
          (CAST(sr2 AS DOUBLE) - n * (kk + 1))
            * (CAST(sr2 AS DOUBLE) - n * (kk + 1)) / 4 AS dev2
        FROM alg),
      tot AS (SELECT CAST(SUM(CAST(round(dev2, 6) AS DECIMAL(28,6)))
            AS DOUBLE) AS ssdev,
          ANY_VALUE(n) AS n, ANY_VALUE(kk) AS kk,
          ANY_VALUE(CAST(tie3 AS DOUBLE)) AS tie3
        FROM alg2),
      chi AS (SELECT round(ssdev / (n * kk * (kk + 1) / 12
            - tie3 / (12 * (kk - 1))), 6) AS chi2,
          round(round(ssdev / (n * kk * (kk + 1) / 12
            - tie3 / (12 * (kk - 1))), 6) / (n * (kk - 1)), 6) AS kendall_w
        FROM tot)
      SELECT a.trt, a.n_blocks,
        round(CAST(a.sr2 AS DOUBLE) / 2, 1) AS rank_sum,
        a.mean_rank, c.chi2, CAST(a.k - 1 AS BIGINT) AS df, c.kendall_w,
        (c.chi2 > 9.487729036781154) AS reject_5pct
      FROM alg2 a, chi c ORDER BY a.trt"""))

  val all: Seq[QueryDef] = Seq(q434FriedmanTest)
}
