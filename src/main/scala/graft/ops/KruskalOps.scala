package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Rank-test wave: Kruskal–Wallis H — the k-group generalization of the
  * Mann–Whitney U (q362's tie-aware AUC is its 2-group twin): "do the
  * order-priority classes draw from the same value distribution?"
  * answered on ranks, free of the normality assumption Welch's t (q164)
  * needs. Tie-corrected via the exact Σ(t³−t) census.
  *
  * Determinism: mid-ranks are held as exact 2·rank integers (the q412
  * idiom) and every moment is an integer DECIMAL(38,0) sum; H is
  * computed once, in double, from identical sums.
  *
  * Scale shape: one global rank window, one per-group aggregation, one
  * tie census — all shuffle-partitioned; the H algebra runs on the
  * |groups|-row frame.
  */
object KruskalOps {

  /** Kruskal–Wallis over order value by priority: per-group n and mean
    * rank, plus tie-corrected H, df, and the 5%-level verdict. */
  val q421KruskalWallis: QueryDef = QueryDef(
    "q421_kruskal_wallis",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_orderpriority").as("grp"), col("o_totalprice").as("v"))
      val ranked = o
        .withColumn("r2",
          (rank().over(Window.orderBy(col("v"))) * 2 +
            count(lit(1)).over(Window.partitionBy(col("v"))) - 1).cast("long"))
      val dec = DecimalType(38, 0)
      val g = ranked.groupBy(col("grp"))
        .agg(count(lit(1)).as("n_g"), sum(col("r2").cast(dec)).as("sr2"))
        .withColumn("mean_rank",
          round(col("sr2").cast("double") / 2.0 / col("n_g"), 4))
      val ties = o.groupBy(col("v")).agg(count(lit(1)).as("t"))
        .agg(sum((col("t") * col("t") * col("t") - col("t")).cast(dec))
          .as("tie3"), sum(col("t").cast(dec)).as("n"))
      val w = Window.partitionBy()
      val perG = g.crossJoin(broadcast(ties))
        .withColumn("nn", col("n").cast("double"))
        // H = 12/(N(N+1)) Σ n_g (R̄_g − (N+1)/2)², via exact 2·rank sums:
        // R̄_g = sr2/(2 n_g) → n_g (R̄_g − (N+1)/2)² = (sr2 − n_g(N+1))²/(4 n_g)
        .withColumn("dev2",
          (col("sr2").cast("double") - col("n_g") * (col("nn") + 1)) *
            (col("sr2").cast("double") - col("n_g") * (col("nn") + 1)) /
            (lit(4.0) * col("n_g")))
      perG
        .withColumn("h_raw", round(lit(12.0) /
          (col("nn") * (col("nn") + 1)) * sum(col("dev2")).over(w), 6))
        .withColumn("tie_c", lit(1.0) - col("tie3").cast("double") /
          (col("nn") * col("nn") * col("nn") - col("nn")))
        .withColumn("h", round(col("h_raw") / col("tie_c"), 6))
        .withColumn("df", (count(lit(1)).over(w) - 1))
        .withColumn("reject_5pct", col("h") > 9.487729036781154)
        .select(col("grp"), col("n_g"), col("mean_rank"),
          col("h_raw"), round(col("tie_c"), 9).as("tie_c"), col("h"),
          col("df"), col("reject_5pct"))
        .orderBy(col("grp"))
    },
    Some("""WITH o AS (SELECT o_orderpriority AS grp, o_totalprice AS v
        FROM orders),
      ranked AS (SELECT grp,
          CAST(RANK() OVER (ORDER BY v) * 2
            + COUNT(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS r2
        FROM o),
      g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_g,
          SUM(CAST(r2 AS DECIMAL(38,0))) AS sr2
        FROM ranked GROUP BY 1),
      ties AS (SELECT
          SUM(CAST(t * t * t - t AS DECIMAL(38,0))) AS tie3,
          SUM(CAST(t AS DECIMAL(38,0))) AS n
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM o GROUP BY v)),
      perg AS (SELECT g.grp, g.n_g,
          round(CAST(g.sr2 AS DOUBLE) / 2.0 / g.n_g, 4) AS mean_rank,
          (CAST(g.sr2 AS DOUBLE) - g.n_g * (CAST(t.n AS DOUBLE) + 1))
            * (CAST(g.sr2 AS DOUBLE) - g.n_g * (CAST(t.n AS DOUBLE) + 1))
            / (4.0 * g.n_g) AS dev2,
          CAST(t.n AS DOUBLE) AS nn, CAST(t.tie3 AS DOUBLE) AS tie3
        FROM g, ties t),
      hh AS (SELECT
          round(12.0 / (ANY_VALUE(nn) * (ANY_VALUE(nn) + 1)) * SUM(dev2), 6)
            AS h_raw,
          1.0 - ANY_VALUE(tie3)
            / (ANY_VALUE(nn) * ANY_VALUE(nn) * ANY_VALUE(nn) - ANY_VALUE(nn))
            AS tie_c,
          CAST(COUNT(*) - 1 AS BIGINT) AS df
        FROM perg)
      SELECT p.grp, p.n_g, p.mean_rank, h.h_raw,
        round(h.tie_c, 9) AS tie_c,
        round(h.h_raw / h.tie_c, 6) AS h, h.df,
        (round(h.h_raw / h.tie_c, 6) > 9.487729036781154) AS reject_5pct
      FROM perg p, hh h ORDER BY p.grp"""))

  val all: Seq[QueryDef] = Seq(q421KruskalWallis)
}
