package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Inequality-decomposition wave: the Theil T index with its exact
  * between/within-group split — the question Gini (q140) and Lorenz
  * (q202) cannot answer: "how much of the concentration is BETWEEN
  * nations vs WITHIN them?" Theil is the only inequality index that
  * decomposes additively: T = T_between + Σ_g s_g·T_g.
  *
  * Determinism: group means come from exact DECIMAL revenue sums; the
  * per-row entropy terms (y/μ)·ln(y/μ) go through scaled-long sums
  * (the q413 accumulator — exact, order-free, codegen-primitive).
  *
  * Scale shape: one per-customer aggregation, one broadcast of the
  * |nations|-row group-stats frame, one terms scan — never a pair join.
  */
object TheilOps {

  /** Theil T of per-customer revenue decomposed by nation: per-nation
    * share, within-nation Theil, contribution, plus the global
    * T / T_between / ΣT_within constants. */
  val q417TheilDecomposition: QueryDef = QueryDef(
    "q417_theil_decomposition",
    (s, dir) => {
      val t = Tables(s, dir)
      val cust = t.orders
        .groupBy(col("o_custkey").as("ck"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("yd"))
        .join(t.customer.select(col("c_custkey").as("ck"), col("c_nationkey")),
          Seq("ck"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("c_nationkey"),
          col("n_name"))), Seq("c_nationkey"))
        .select(col("n_name").as("nation"), col("yd"))
        .localCheckpoint() // stats pass + terms pass
      val gstats = cust.groupBy(col("nation"))
        .agg(count(lit(1)).as("n_g"), sum(col("yd")).as("sum_g"))
        .withColumn("mu_g", round(col("sum_g").cast("double") / col("n_g"), 6))
      val tot = gstats.agg(sum(col("n_g")).as("n"),
        sum(col("sum_g")).as("sum_all"))
        .withColumn("mu", round(col("sum_all").cast("double") / col("n"), 6))
      val terms = cust
        .join(broadcast(gstats.select(col("nation"), col("mu_g"))), Seq("nation"))
        .crossJoin(broadcast(tot.select(col("mu"), col("n"))))
        .withColumn("y", col("yd").cast("double"))
        .groupBy(col("nation"))
        .agg(
          sum(round(col("y") / col("mu") * log(col("y") / col("mu")) * 1e9)
            .cast("long")).as("tg_term"),
          sum(round(col("y") / col("mu_g") * log(col("y") / col("mu_g")) * 1e9)
            .cast("long")).as("tw_term"))
      val perNation = gstats.join(terms, Seq("nation"))
        .crossJoin(broadcast(tot))
        .withColumn("share",
          round(col("sum_g").cast("double") / col("sum_all").cast("double"), 6))
        .withColumn("t_within",
          round(col("tw_term").cast("double") / 1e9 / col("n_g"), 6))
        .withColumn("contrib", round(col("share") * col("t_within"), 6))
        .withColumn("t_between_term",
          round(col("share") * log(col("mu_g") / col("mu")), 6))
      val w = org.apache.spark.sql.expressions.Window.partitionBy()
      perNation
        .withColumn("t_total", round(
          sum(col("tg_term")).over(w).cast("double") / 1e9 /
            first(col("n")).over(w), 6))
        .withColumn("t_between", round(
          sum(col("t_between_term").cast(DecimalType(18, 6))).over(w)
            .cast("double"), 6))
        .withColumn("t_within_sum", round(
          sum(col("contrib").cast(DecimalType(18, 6))).over(w)
            .cast("double"), 6))
        .select(col("nation"), col("n_g"), round(col("mu_g"), 2).as("mu_g"),
          col("share"), col("t_within"), col("contrib"),
          col("t_total"), col("t_between"), col("t_within_sum"))
        .orderBy(col("nation"))
    },
    Some("""WITH cust AS (SELECT n.n_name AS nation,
          SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS yd
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name, o.o_custkey),
      gstats AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_g,
          SUM(yd) AS sum_g,
          round(CAST(SUM(yd) AS DOUBLE) / COUNT(*), 6) AS mu_g
        FROM cust GROUP BY 1),
      tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n, SUM(sum_g) AS sum_all,
          round(CAST(SUM(sum_g) AS DOUBLE) / SUM(n_g), 6) AS mu
        FROM gstats),
      terms AS (SELECT c.nation,
          CAST(SUM(CAST(round(CAST(yd AS DOUBLE) / t.mu
            * ln(CAST(yd AS DOUBLE) / t.mu) * 1000000000) AS BIGINT))
            AS BIGINT) AS tg_term,
          CAST(SUM(CAST(round(CAST(yd AS DOUBLE) / g.mu_g
            * ln(CAST(yd AS DOUBLE) / g.mu_g) * 1000000000) AS BIGINT))
            AS BIGINT) AS tw_term
        FROM cust c JOIN gstats g ON g.nation = c.nation, tot t
        GROUP BY 1),
      pern AS (SELECT g.nation, g.n_g, g.mu_g,
          round(CAST(g.sum_g AS DOUBLE) / CAST(t.sum_all AS DOUBLE), 6)
            AS share,
          round(CAST(tm.tw_term AS DOUBLE) / 1000000000 / g.n_g, 6)
            AS t_within,
          tm.tg_term, t.n, t.mu
        FROM gstats g JOIN terms tm ON tm.nation = g.nation, tot t),
      pern2 AS (SELECT *, round(share * t_within, 6) AS contrib,
          round(share * ln(mu_g / mu), 6) AS t_between_term
        FROM pern),
      gsum AS (SELECT
          round(CAST(SUM(tg_term) AS DOUBLE) / 1000000000
            / ANY_VALUE(n), 6) AS t_total,
          round(CAST(SUM(CAST(t_between_term AS DECIMAL(18,6))) AS DOUBLE), 6)
            AS t_between,
          round(CAST(SUM(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE), 6)
            AS t_within_sum
        FROM pern2)
      SELECT p.nation, p.n_g, round(p.mu_g, 2) AS mu_g, p.share,
        p.t_within, p.contrib, g.t_total, g.t_between, g.t_within_sum
      FROM pern2 p, gsum g ORDER BY p.nation"""))

  val all: Seq[QueryDef] = Seq(q417TheilDecomposition)
}
