package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Join-planning wave: Selinger dynamic programming over the 5-table
  * chain region–nation–customer–orders–lineitem — the query-optimizer
  * computation itself as a data-parallel operator (q306 estimates one
  * join's cardinality, q307 a predicate's selectivity; this composes
  * them into the classic bottom-up bushy-plan search). Cardinalities
  * use the textbook |S|·Π 1/max(ndv) model from exactly-gathered
  * stats; cost(S) = min over connected splits of cost(S₁) + cost(S₂) +
  * est_rows(S).
  *
  * Determinism: est_rows rides log-space DECIMAL sums of 9-dp-rounded
  * ln(stats); DP costs round at 4 per state and argmins tie-break on
  * the split mask.
  *
  * Scale shape: stats are one scan per table/edge (the ANALYZE pass);
  * the DP runs on the 31-row subset lattice — 4 rounds of self-joins
  * on a model-sized frame, exactly how a distributed optimizer would
  * search a much larger join graph.
  */
object JoinPlanOps {

  /** Selinger DP over the 5-table chain: per connected subset its
    * estimated rows, optimal cost and argmin split; the full-join row
    * carries the plan the optimizer would pick. */
  val q458SelingerDp: QueryDef = QueryDef(
    "q458_selinger_dp",
    (s, dir) => {
      val t = Tables(s, dir)
      // stats pass: ONE aggregation per table gathers its size and the
      // NDVs of every join column it contributes (5 scans total)
      val rStats = t.region.agg(count(lit(1)).as("rn"),
        countDistinct(col("r_regionkey")).as("r_rk"))
      val nStats = t.nation.agg(count(lit(1)).as("nn_"),
        countDistinct(col("n_regionkey")).as("n_rk"),
        countDistinct(col("n_nationkey")).as("n_nk"))
      val cStats = t.customer.agg(count(lit(1)).as("cn"),
        countDistinct(col("c_nationkey")).as("c_nk"),
        countDistinct(col("c_custkey")).as("c_ck"))
      val oStats = t.orders.agg(count(lit(1)).as("on_"),
        countDistinct(col("o_custkey")).as("o_ck"),
        countDistinct(col("o_orderkey")).as("o_ok"))
      val lStats = t.lineitem.agg(count(lit(1)).as("ln_"),
        countDistinct(col("l_orderkey")).as("l_ok"))
      val allStats = rStats.crossJoin(broadcast(nStats))
        .crossJoin(broadcast(cStats)).crossJoin(broadcast(oStats))
        .crossJoin(broadcast(lStats))
        .localCheckpoint()
      val stats = allStats.selectExpr(
        """stack(5, 0L, rn, 1L, nn_, 2L, cn, 3L, on_, 4L, ln_)
           AS (idx, v)""")
        .withColumn("lnn", round(log(col("v").cast("double")), 9))
        .localCheckpoint()
      val edges = allStats.selectExpr(
        """stack(4, 0L, greatest(r_rk, n_rk), 1L, greatest(n_nk, c_nk),
           2L, greatest(c_ck, o_ck), 3L, greatest(o_ok, l_ok))
           AS (e, nd)""")
        .withColumn("lnsel", round(-log(col("nd").cast("double")), 9))
        .localCheckpoint()
      // connected-subset lattice with estimated rows
      val d9 = DecimalType(38, 9)
      val masks = s.range(1, 32).select(col("id").as("mask"))
        .where(expr(
          "((mask div (mask & -mask)) & ((mask div (mask & -mask)) + 1)) = 0"))
      val lnTab = masks
        .join(stats, expr("(mask div CAST(pow(2, idx) AS BIGINT)) % 2 = 1"))
        .groupBy(col("mask"))
        .agg(sum(col("lnn").cast(d9)).as("lt"),
          count(lit(1)).as("n_tables"))
      val lnEdge = masks
        .join(edges, expr("(mask div CAST(pow(2, e) AS BIGINT)) % 2 = 1" +
          " AND (mask div CAST(pow(2, e + 1) AS BIGINT)) % 2 = 1"), "left")
        .groupBy(col("mask"))
        .agg(coalesce(sum(col("lnsel").cast(d9)), lit(0).cast(d9)).as("le"))
      val rowsEst = lnTab.join(lnEdge, Seq("mask"))
        .withColumn("est_rows",
          round(exp((col("lt") + col("le")).cast("double")), 4))
        .localCheckpoint() // the 4 DP rounds all read it
      // DP rounds by subset size
      var cost = rowsEst.where(col("n_tables") === 1)
        .select(col("mask"), lit(0.0).as("cost"), lit(0L).as("best_split"))
        .localCheckpoint()
      for (k <- 2 to 5) {
        val target = rowsEst.where(col("n_tables") === k)
          .select(col("mask"), col("est_rows"))
        val cand = cost.select(col("mask").as("m1"), col("cost").as("c1"))
          .join(cost.select(col("mask").as("m2"), col("cost").as("c2")),
            col("m1") < col("m2"))
          .join(target, col("mask") === (col("m1").bitwiseOR(col("m2")))
            && (col("m1").bitwiseAND(col("m2")) === 0))
          .withColumn("c", round(col("c1") + col("c2") + col("est_rows"), 4))
          .groupBy(col("mask"))
          .agg(min(struct(col("c"), col("m1"))).as("b"))
          .select(col("mask"), col("b.c").as("cost"),
            col("b.m1").as("best_split"))
        cost = cost.unionByName(cand).localCheckpoint()
      }
      cost.join(rowsEst, Seq("mask"))
        .select(col("mask"), col("n_tables"),
          round(col("est_rows"), 2).as("est_rows"),
          round(col("cost"), 2).as("best_cost"), col("best_split"))
        .orderBy(col("n_tables"), col("mask"))
    },
    Some {
      val rounds = (2 to 5).map { k =>
        s"""cost$k AS (SELECT mask, cost, best_split
        FROM (SELECT re.mask,
            round(a.cost + b.cost + re.est_rows, 4) AS cost,
            a.mask AS best_split,
            ROW_NUMBER() OVER (PARTITION BY re.mask
              ORDER BY round(a.cost + b.cost + re.est_rows, 4), a.mask)
              AS rn
          FROM cost${k - 1}all a
          JOIN cost${k - 1}all b ON a.mask < b.mask
            AND (a.mask & b.mask) = 0
          JOIN rowsest re ON re.mask = (a.mask | b.mask)
            AND re.n_tables = $k)
        WHERE rn = 1),
      cost${k}all AS (SELECT * FROM cost${k - 1}all
        UNION ALL SELECT * FROM cost$k)"""
      }.mkString(",\n      ")
      s"""WITH stats AS MATERIALIZED (
        SELECT 0 AS idx, CAST(COUNT(*) AS BIGINT) AS v FROM region
        UNION ALL SELECT 1, COUNT(*) FROM nation
        UNION ALL SELECT 2, COUNT(*) FROM customer
        UNION ALL SELECT 3, COUNT(*) FROM orders
        UNION ALL SELECT 4, COUNT(*) FROM lineitem),
      stats2 AS (SELECT idx, v,
          round(ln(CAST(v AS DOUBLE)), 9) AS lnn FROM stats),
      edges AS MATERIALIZED (
        SELECT 0 AS e, GREATEST(
          (SELECT COUNT(DISTINCT r_regionkey) FROM region),
          (SELECT COUNT(DISTINCT n_regionkey) FROM nation)) AS nd
        UNION ALL SELECT 1, GREATEST(
          (SELECT COUNT(DISTINCT n_nationkey) FROM nation),
          (SELECT COUNT(DISTINCT c_nationkey) FROM customer))
        UNION ALL SELECT 2, GREATEST(
          (SELECT COUNT(DISTINCT c_custkey) FROM customer),
          (SELECT COUNT(DISTINCT o_custkey) FROM orders))
        UNION ALL SELECT 3, GREATEST(
          (SELECT COUNT(DISTINCT o_orderkey) FROM orders),
          (SELECT COUNT(DISTINCT l_orderkey) FROM lineitem))),
      edges2 AS (SELECT e, round(-ln(CAST(nd AS DOUBLE)), 9) AS lnsel
        FROM edges),
      masks AS (SELECT m AS mask FROM (SELECT UNNEST(range(1, 32)) AS m)
        WHERE ((m // (m & -m)) & ((m // (m & -m)) + 1)) = 0),
      lntab AS (SELECT m.mask,
          SUM(CAST(s.lnn AS DECIMAL(38,9))) AS lt,
          CAST(COUNT(*) AS BIGINT) AS n_tables
        FROM masks m JOIN stats2 s
          ON (m.mask // CAST(pow(2, s.idx) AS BIGINT)) % 2 = 1
        GROUP BY 1),
      lnedge AS (SELECT m.mask,
          COALESCE(SUM(CAST(e.lnsel AS DECIMAL(38,9))),
            CAST(0 AS DECIMAL(38,9))) AS le
        FROM masks m LEFT JOIN edges2 e
          ON (m.mask // CAST(pow(2, e.e) AS BIGINT)) % 2 = 1
          AND (m.mask // CAST(pow(2, e.e + 1) AS BIGINT)) % 2 = 1
        GROUP BY 1),
      rowsest AS MATERIALIZED (SELECT t.mask, t.n_tables,
          round(exp(CAST(t.lt + e.le AS DOUBLE)), 4) AS est_rows
        FROM lntab t JOIN lnedge e ON e.mask = t.mask),
      cost1all AS (SELECT mask, 0.0 AS cost, CAST(0 AS BIGINT) AS best_split
        FROM rowsest WHERE n_tables = 1),
      $rounds
      SELECT c.mask, r.n_tables, round(r.est_rows, 2) AS est_rows,
        round(c.cost, 2) AS best_cost, c.best_split
      FROM cost5all c JOIN rowsest r ON r.mask = c.mask
      ORDER BY r.n_tables, c.mask"""
    })

  /** Ansari–Bradley scale test: do urgent and non-urgent order values
    * differ in DISPERSION (not location)? Both-ends scores with exact
    * tie-averaged 2·scores, general linear-rank-statistic moments. */
  val q459AnsariBradley: QueryDef = QueryDef(
    "q459_ansari_bradley",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("g"), col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
      // both-ends midrank scores, doubled for exactness: the score of a
      // value block [lo, hi] (1-based ranks) is avg over the block of
      // min(rank, N+1-rank); 2*score stays integer only without ties, so
      // we carry 4*score = sum over the block bounds closed form
      // tie midranks from the VALUE CENSUS (r15): competition rank =
      // exclusive prefix + 1, so 2·midrank = 2·cum − cnt + 1 — the
      // whole rank pass is a size-adaptive prefix sum over distinct
      // values, never a window over the raw order frame; moments fold
      // the census row weights in (Σ_rows f(r2) = Σ_v cnt_v·f(r2(v)))
      val cells = o.groupBy(col("v"))
        .agg(count(lit(1)).as("cnt"), sum(col("g")).as("cnt1"))
        .localCheckpoint() // rank pass + the N/m1 fold below
      // r15-opt: N and m1 fold the census weights (Σcnt, Σcnt1 — exact
      // integers, identical to counting the raw order frame), so the
      // raw frame is scanned ONCE for the census; the window-vs-spine
      // probe is a metadata-cheap |orders| upper bound on |cells|
      // instead of re-running the census aggregation (the first
      // rewrite's probe: measured 0.72 s vs the 0.25 s floor at sf0.1).
      val nRow = cells.agg(sum(col("cnt")).as("nn"), sum(col("cnt1")).as("m1"))
      val ranked = Spine.adaptiveRank(cells, Seq(col("v")), Seq("cnt"),
          rankCol = "__rk", knownCount = Tables(s, dir).orders.count())
        .withColumn("r2", (lit(2L) * col("cum_cnt") - col("cnt") + 1)
          .cast("long")) // 2*midrank
        .crossJoin(broadcast(nRow))
        // 2*score via midrank: s = min(mr, N+1-mr) on the half-unit grid
        .withColumn("s2", least(col("r2"), (col("nn") + 1) * 2 - col("r2")))
      val mom = ranked.agg(
        max(col("nn")).as("nn"), max(col("m1")).as("m1"),
        sum(col("cnt1") * col("s2")).as("ab2"),
        sum(col("s2").cast(DecimalType(38, 0)) * col("cnt")).as("ss2"),
        sum((col("s2") * col("s2")).cast(DecimalType(38, 0)) * col("cnt"))
          .as("ss22"))
      mom
        .withColumn("n2", col("nn") - col("m1"))
        .withColumn("sbar2", col("ss2").cast("double") / col("nn"))
        .withColumn("e_ab2", col("m1") * col("sbar2"))
        .withColumn("var_ab4",
          col("m1").cast("double") * col("n2")
            / (col("nn").cast("double") * (col("nn") - 1))
            * (col("ss22").cast("double")
              - col("nn") * col("sbar2") * col("sbar2")))
        .withColumn("z", round((col("ab2").cast("double") - col("e_ab2"))
          / sqrt(col("var_ab4")), 6))
        .select(col("nn").as("n_orders"), col("m1").as("n_urgent"),
          (col("ab2").cast("double") / 2).as("ab_stat"),
          round(col("e_ab2") / 2, 4).as("e_ab"),
          round(col("var_ab4") / 4, 4).as("var_ab"), col("z"),
          (abs(col("z")) > 1.959963984540054).as("reject_5pct"))
    },
    Some("""WITH o AS (SELECT
          CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders),
      nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn,
          CAST(SUM(g) AS BIGINT) AS m1 FROM o),
      ranked AS (SELECT o.g, nr.nn, nr.m1,
          LEAST(r2, (nr.nn + 1) * 2 - r2) AS s2
        FROM (SELECT g,
            CAST(RANK() OVER (ORDER BY v) * 2
              + COUNT(*) OVER (PARTITION BY v) - 1 AS BIGINT) AS r2
          FROM o) o, nrow nr),
      mom AS (SELECT ANY_VALUE(nn) AS nn, ANY_VALUE(m1) AS m1,
          CAST(SUM(CASE WHEN g = 1 THEN s2 ELSE 0 END) AS BIGINT) AS ab2,
          SUM(CAST(s2 AS DECIMAL(38,0))) AS ss2,
          SUM(CAST(s2 * s2 AS DECIMAL(38,0))) AS ss22
        FROM ranked),
      alg AS (SELECT *, nn - m1 AS n2,
          CAST(ss2 AS DOUBLE) / nn AS sbar2 FROM mom),
      alg2 AS (SELECT *, m1 * sbar2 AS e_ab2,
          CAST(m1 AS DOUBLE) * n2 / (CAST(nn AS DOUBLE) * (nn - 1))
            * (CAST(ss22 AS DOUBLE) - nn * sbar2 * sbar2) AS var_ab4
        FROM alg)
      SELECT nn AS n_orders, m1 AS n_urgent,
        CAST(ab2 AS DOUBLE) / 2 AS ab_stat,
        round(e_ab2 / 2, 4) AS e_ab,
        round(var_ab4 / 4, 4) AS var_ab,
        round((CAST(ab2 AS DOUBLE) - e_ab2) / sqrt(var_ab4), 6) AS z,
        (abs(round((CAST(ab2 AS DOUBLE) - e_ab2) / sqrt(var_ab4), 6))
          > 1.959963984540054) AS reject_5pct
      FROM alg2"""))

  val all: Seq[QueryDef] = Seq(q458SelingerDp, q459AnsariBradley)
}
