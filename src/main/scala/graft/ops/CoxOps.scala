package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Cox proportional-hazards wave: the semi-parametric survival
  * REGRESSION the lifecycle family was missing — q161 Kaplan–Meier and
  * q297 Nelson–Aalen describe one curve, q382's log-rank TESTS two
  * curves; Cox ESTIMATES the hazard ratio, with censoring handled and
  * no baseline assumed. Fixture: time from first to second order per
  * customer (single-order customers censored at the horizon),
  * covariate = first order was urgent. Breslow tie handling; 3 Newton
  * steps from β = 0 — whose very first score U(0) IS the log-rank O−E,
  * an identity the spec asserts against an independent replay.
  *
  * Determinism: risk sets are suffix counts over the event-time spine
  * (total − prefix, the q372 lesson); every per-time Newton term is
  * round(term·10⁹) summed as LONG (order-proof), and β rounds at 9
  * per step.
  *
  * Scale shape: one orders scan → per-customer (duration, event, x);
  * one event-time spine (≤ distinct durations); 3 Newton passes over
  * the checkpointed spine against a 1-row β broadcast.
  */
object CoxOps {

  private val NewtonSteps = 3

  /** Cox PH of time-to-second-order on first-order urgency: β, hazard
    * ratio, SE, z, the U(0) ≡ log-rank identity value, and the subject
    * census. */
  val q452CoxPh: QueryDef = QueryDef(
    "q452_cox_ph",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_custkey").as("ck"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("d"),
          col("o_orderpriority").as("pri"),
          col("o_orderkey").as("okey"))
      val horizon = o.agg(max(col("d")).as("hz"))
      val wC = Window.partitionBy(col("ck")).orderBy(col("d"), col("okey"))
      val subj = o
        .withColumn("rn", row_number().over(wC))
        .withColumn("nxt", lead(col("d"), 1).over(wC))
        .where(col("rn") === 1)
        .crossJoin(broadcast(horizon))
        .select(col("ck"),
          when(col("pri") === "1-URGENT", 1L).otherwise(0L).as("x"),
          when(col("nxt").isNotNull, col("nxt") - col("d"))
            .otherwise(col("hz") - col("d")).as("dur"),
          when(col("nxt").isNotNull, 1L).otherwise(0L).as("ev"))
        .localCheckpoint() // spine build + census
      // event-time spine with Breslow risk sets via total − prefix
      val tot = subj.agg(count(lit(1)).as("n_subjects"),
        sum(col("ev")).as("n_events"),
        sum(col("x")).as("tot1"),
        sum(lit(1L) - col("x")).as("tot0"))
      val cells = subj.groupBy(col("dur"))
        .agg(sum(when(col("ev") === 1, 1L).otherwise(0L)).as("d_t"),
          sum(when(col("ev") === 1, col("x")).otherwise(0L)).as("sx_t"),
          sum(col("x")).as("c1"), sum(lit(1L) - col("x")).as("c0"))
      val wPre = Window.orderBy(col("dur"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val spine = cells
        .withColumn("p1", coalesce(sum(col("c1")).over(wPre), lit(0L)))
        .withColumn("p0", coalesce(sum(col("c0")).over(wPre), lit(0L)))
        .crossJoin(broadcast(tot))
        .where(col("d_t") > 0)
        .select(col("dur"), col("d_t"), col("sx_t"),
          (col("tot1") - col("p1")).as("n1"),
          (col("tot0") - col("p0")).as("n0"))
        .localCheckpoint() // 3 Newton passes + the final stats pass
      def stats(beta: DataFrame): DataFrame =
        spine.crossJoin(broadcast(beta))
          .withColumn("eb", exp(col("beta")))
          .withColumn("pi",
            col("n1") * col("eb") / (col("n0") + col("n1") * col("eb")))
          .withColumn("uterm",
            round((col("sx_t") - col("d_t") * col("pi")) * 1e9).cast("long"))
          .withColumn("iterm",
            round(col("d_t") * col("pi") * (lit(1.0) - col("pi")) * 1e9)
              .cast("long"))
          .agg(max(col("beta")).as("beta"),
            (sum(col("uterm").cast(DecimalType(38, 0))).cast("double") / 1e9)
              .as("u"),
            (sum(col("iterm").cast(DecimalType(38, 0))).cast("double") / 1e9)
              .as("i"))
      var beta = spine.sparkSession.range(1)
        .select(lit(0.0).as("beta"))
      var u0: Option[DataFrame] = None
      for (k <- 1 to NewtonSteps) {
        val st = stats(beta).localCheckpoint()
        if (k == 1) u0 = Some(st.select(col("u").as("u0")))
        beta = st.select(round(col("beta") + col("u") / col("i"), 9)
          .as("beta"))
      }
      val fin = stats(beta)
      fin.crossJoin(broadcast(u0.get)).crossJoin(broadcast(tot))
        .withColumn("se", lit(1.0) / sqrt(col("i")))
        .select(col("n_subjects"), col("n_events"),
          round(col("beta"), 6).as("beta"),
          round(exp(col("beta")), 6).as("hazard_ratio"),
          round(col("se"), 6).as("se"),
          round(col("beta") / col("se"), 4).as("z"),
          round(col("u0"), 4).as("logrank_o_minus_e"),
          (abs(col("beta") / col("se")) > 1.959963984540054).as("reject_5pct"))
    },
    Some {
      // 3 unrolled Newton CTEs over the same spine
      val newton = (1 to NewtonSteps).map { k =>
        s"""st$k AS (SELECT b.beta,
          CAST(SUM(CAST(round((sp.sx_t - sp.d_t
            * (sp.n1 * exp(b.beta) / (sp.n0 + sp.n1 * exp(b.beta)))) * 1e9)
            AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS u,
          CAST(SUM(CAST(round(sp.d_t
            * (sp.n1 * exp(b.beta) / (sp.n0 + sp.n1 * exp(b.beta)))
            * (1.0 - (sp.n1 * exp(b.beta)
              / (sp.n0 + sp.n1 * exp(b.beta)))) * 1e9)
            AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS i
        FROM spine sp, beta${k - 1} b GROUP BY 1),
      beta$k AS (SELECT round(beta + u / i, 9) AS beta FROM st$k)"""
      }.mkString(",\n      ")
      s"""WITH o AS MATERIALIZED (SELECT o_custkey AS ck,
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
            AS d,
          o_orderpriority AS pri, o_orderkey AS okey
        FROM orders),
      horizon AS (SELECT MAX(d) AS hz FROM o),
      subj AS MATERIALIZED (SELECT ck,
          CASE WHEN pri = '1-URGENT' THEN 1 ELSE 0 END AS x,
          CASE WHEN nxt IS NOT NULL THEN nxt - d ELSE hz - d END AS dur,
          CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM (SELECT o.*, h.hz,
            ROW_NUMBER() OVER (PARTITION BY ck ORDER BY d, okey) AS rn,
            LEAD(d) OVER (PARTITION BY ck ORDER BY d, okey) AS nxt
          FROM o, horizon h)
        WHERE rn = 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
          CAST(SUM(ev) AS BIGINT) AS n_events,
          CAST(SUM(x) AS BIGINT) AS tot1,
          CAST(SUM(1 - x) AS BIGINT) AS tot0 FROM subj),
      cells AS (SELECT dur,
          CAST(SUM(CASE WHEN ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d_t,
          CAST(SUM(CASE WHEN ev = 1 THEN x ELSE 0 END) AS BIGINT) AS sx_t,
          CAST(SUM(x) AS BIGINT) AS c1,
          CAST(SUM(1 - x) AS BIGINT) AS c0
        FROM subj GROUP BY 1),
      spine AS MATERIALIZED (SELECT dur, d_t, sx_t,
          t.tot1 - COALESCE(SUM(c1) OVER (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
          t.tot0 - COALESCE(SUM(c0) OVER (ORDER BY dur
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
        FROM cells, tot t QUALIFY d_t > 0),
      beta0 AS (SELECT 0.0 AS beta),
      $newton,
      fin AS (SELECT b.beta,
          CAST(SUM(CAST(round((sp.sx_t - sp.d_t
            * (sp.n1 * exp(b.beta) / (sp.n0 + sp.n1 * exp(b.beta)))) * 1e9)
            AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS u,
          CAST(SUM(CAST(round(sp.d_t
            * (sp.n1 * exp(b.beta) / (sp.n0 + sp.n1 * exp(b.beta)))
            * (1.0 - (sp.n1 * exp(b.beta)
              / (sp.n0 + sp.n1 * exp(b.beta)))) * 1e9)
            AS DECIMAL(38,0))) AS DOUBLE) / 1e9 AS i
        FROM spine sp, beta$NewtonSteps b GROUP BY 1)
      SELECT t.n_subjects, t.n_events,
        round(f.beta, 6) AS beta,
        round(exp(f.beta), 6) AS hazard_ratio,
        round(1.0 / sqrt(f.i), 6) AS se,
        round(f.beta / (1.0 / sqrt(f.i)), 4) AS z,
        round(s1.u, 4) AS logrank_o_minus_e,
        (abs(f.beta / (1.0 / sqrt(f.i))) > 1.959963984540054) AS reject_5pct
      FROM fin f, st1 s1, tot t"""
    })

  val all: Seq[QueryDef] = Seq(q452CoxPh)
}
