package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** GARCH(1,1) volatility-grid audit (Bollerslev 1986) over the daily
  * revenue log-return series: for a 3×3 grid of (α, β) persistence
  * combos with ω variance-targeted to the sample variance
  * (ω = v̄(1−α−β)), fold the conditional-variance recursion
  * σ²ₜ = ω + α·r²ₜ₋₁ + β·σ²ₜ₋₁ and the Gaussian pseudo-log-likelihood
  * Σ(ln σ²ₜ + r²ₜ/σ²ₜ) in one pass each, reporting the grid with the
  * best (minimum) combo flagged — the volatility-regime dashboard a
  * revenue-anomaly monitor keeps (reference: overseer's report
  * pipelines, doc/guide/Introduction.md:3; q514's Kalman fold is the
  * state-space sibling, q538's adstock the marketing twin).
  *
  * Scale shape: the corpus-sized work is ONE hash agg to daily cents;
  * the 9 recursions are calendar-bounded folds inside codegen
  * `aggregate` HOFs over the shared sorted return array (q485's
  * wavefront discipline) — no driver loops, no per-step shuffles.
  *
  * Exactness: returns are quantized round(ln·,12) and their squares
  * round(·,14) (summed as DECIMAL for the variance target), σ² is
  * quantized round(·,16) every step — all quanta orders of magnitude
  * above cross-engine libm ulp — and the likelihood accumulates in
  * identical fold order both engines; surfaced at round 6.
  */
object VolatilityOps {

  // every combo keeps α+β < 1: ω = v̄(1−α−β) must stay positive for the
  // variance recursion (and the process stationary)
  private val Alphas = Seq(0.05, 0.10, 0.15)
  private val Betas  = Seq(0.70, 0.78, 0.84)

  val q548GarchGrid: QueryDef = QueryDef(
    "q548_garch_grid",
    (s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val daily = t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(floor(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast(DecimalType(22, 8))) * 100).cast("long").as("cents"))
      val rets = daily
        .withColumn("prev", lag(col("cents"), 1).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("day"))))
        .where(col("prev").isNotNull && col("prev") > 0 && col("cents") > 0)
        .select(col("day"),
          round(log(col("cents").cast("double") / col("prev").cast("double")),
            12).as("r"))
        .withColumn("r2", round(col("r") * col("r"), 14))
      val state = rets.agg(
        sort_array(collect_list(struct(col("day"), col("r2")))).as("seq"),
        (sum(col("r2").cast(DecimalType(30, 14))).cast("double") /
          count(lit(1)).cast("double")).as("vbar"))
        .localCheckpoint() // one 1-row frame feeds all 9 grid folds
      val grid = Alphas.flatMap(a => Betas.map(b => (a, b)))
        .toDF("alpha", "beta")
      val folded = broadcast(grid).crossJoin(state) // 9 × 1 rows
        .withColumn("omega",
          round(col("vbar") * (lit(1.0) - col("alpha") - col("beta")), 16))
        // fold state: (sig2, ll, first). σ²₁ = v̄ covers the first term;
        // each later step advances σ² from the PREVIOUS r² then adds its
        // likelihood term — identical order in the oracle recursion.
        .withColumn("fold", expr(
          """aggregate(seq,
               named_struct('sig2', vbar, 'll', 0.0D, 'prev', -1.0D),
               (st, x) -> IF(st.prev < 0.0D,
                 named_struct('sig2', st.sig2,
                   'll', ln(st.sig2) + x.r2 / st.sig2, 'prev', x.r2),
                 named_struct(
                   'sig2', round(omega + alpha * st.prev + beta * st.sig2, 16),
                   'll', st.ll
                     + ln(round(omega + alpha * st.prev + beta * st.sig2, 16))
                     + x.r2 / round(omega + alpha * st.prev + beta * st.sig2, 16),
                   'prev', x.r2)))"""))
        .select(col("alpha"), col("beta"),
          // surfaced coarser than the internal quantum: at O(0.1) magnitude
          // round(·,16) sits below one ulp and both engines can land on
          // adjacent doubles
          round(col("omega"), 12).as("omega"),
          expr("size(seq)").cast("long").as("n_terms"),
          round(col("fold.ll"), 6).as("neg2ll"))
      val best = folded.agg(min(col("neg2ll")).as("best_ll"))
      folded.crossJoin(broadcast(best))
        .select(col("alpha"), col("beta"), col("omega"), col("n_terms"),
          col("neg2ll"), (col("neg2ll") === col("best_ll")).as("is_best"))
        .orderBy(col("alpha"), col("beta"))
    },
    Some {
      val gridSql = Alphas.flatMap(a => Betas.map(b => s"($a, $b)"))
        .mkString(", ")
      s"""WITH RECURSIVE daily AS (
        SELECT CAST(o.o_orderdate AS DATE) AS day,
          CAST(floor(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
            AS DECIMAL(22,8))) * 100) AS BIGINT) AS cents
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1),
      rets AS (
        SELECT day,
          round(ln(CAST(cents AS DOUBLE) / CAST(prev AS DOUBLE)), 12) AS r
        FROM (SELECT day, cents,
            LAG(cents, 1) OVER (ORDER BY day) AS prev FROM daily)
        WHERE prev IS NOT NULL AND prev > 0 AND cents > 0),
      r2s AS (
        SELECT round(r * r, 14) AS r2,
          ROW_NUMBER() OVER (ORDER BY day) AS t
        FROM rets),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(CAST(r2 AS DECIMAL(30,14))) AS DOUBLE)
          / CAST(COUNT(*) AS DOUBLE) AS vbar FROM r2s),
      grid AS (
        SELECT CAST(alpha AS DOUBLE) AS alpha, CAST(beta AS DOUBLE) AS beta,
          round(nn.vbar * (1.0 - CAST(alpha AS DOUBLE)
            - CAST(beta AS DOUBLE)), 16) AS omega,
          nn.vbar, nn.n
        FROM (VALUES $gridSql) g(alpha, beta) CROSS JOIN nn),
      fold(alpha, beta, omega, t, sig2, ll) AS (
        SELECT g.alpha, g.beta, g.omega, 1, g.vbar,
          ln(g.vbar) + r.r2 / g.vbar
        FROM grid g JOIN r2s r ON r.t = 1
        UNION ALL
        SELECT f.alpha, f.beta, f.omega, f.t + 1,
          round(f.omega + f.alpha * p.r2 + f.beta * f.sig2, 16),
          f.ll + ln(round(f.omega + f.alpha * p.r2 + f.beta * f.sig2, 16))
            + c.r2 / round(f.omega + f.alpha * p.r2 + f.beta * f.sig2, 16)
        FROM fold f
        JOIN r2s p ON p.t = f.t
        JOIN r2s c ON c.t = f.t + 1),
      final AS (
        SELECT alpha, beta, round(omega, 12) AS omega, n AS n_terms,
          round(ll, 6) AS neg2ll
        FROM fold f CROSS JOIN nn
        WHERE f.t = nn.n),
      best AS (SELECT MIN(neg2ll) AS best_ll FROM final)
      SELECT f.alpha, f.beta, f.omega, f.n_terms, f.neg2ll,
        f.neg2ll = b.best_ll AS is_best
      FROM final f CROSS JOIN best b
      ORDER BY f.alpha, f.beta"""
    })

  val all: Seq[QueryDef] = Seq(q548GarchGrid)
}
