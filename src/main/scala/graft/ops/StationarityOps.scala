package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Robust-location & stationarity wave: Mood's median test (q450) and
  * the KPSS level-stationarity test (q451). Mood's is the fully
  * nonparametric k-group location test (coarser but more outlier-proof
  * than Kruskal–Wallis q421 — it only uses above/below the grand
  * median); KPSS flips the changepoint family's null (q422 Pettitt,
  * q130 CUSUM *search* for a break — KPSS *tests* stationarity, with
  * level-stationarity as H₀, the complement of a unit-root test).
  *
  * Determinism: the grand median is the exact rank-selected DECIMAL;
  * Mood's cells are integers. KPSS partial sums ride exact prefix
  * LONGs of revenue cents minus t·μ (one deterministic expression);
  * S_t² is rounded to the unit and summed as DECIMAL; autocovariances
  * come from exact integer cross-moments (the q438 identity).
  *
  * Scale shape: one scan + one rank window each; KPSS adds 7
  * calendar-bounded lag equi-joins.
  */
object StationarityOps {

  /** Mood's median test of order value by priority: per priority the
    * above/below-median cells, the 2×k χ², df = 4 and its closed-form
    * p, 5% verdict. */
  val q450MoodMedian: QueryDef = QueryDef(
    "q450_mood_median",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_orderpriority").as("grp"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
          col("o_orderkey").as("okey"))
        .localCheckpoint() // median pass + cell pass
      val med = o
        .withColumn("r", row_number().over(Window.orderBy(col("v"), col("okey"))))
        .withColumn("n", count(lit(1)).over(Window.partitionBy()))
        .where(col("r") === expr("(n + 1) div 2"))
        .select(col("v").as("med"))
      val cells = o.crossJoin(broadcast(med))
        .where(col("v") =!= col("med")) // median-valued rows excluded
        .groupBy(col("grp"))
        .agg(sum(when(col("v") > col("med"), 1L).otherwise(0L)).as("n_above"),
          sum(when(col("v") > col("med"), 0L).otherwise(1L)).as("n_below"))
        .localCheckpoint() // margin pass + report pass
      val marg = cells.agg(sum(col("n_above")).as("ta"),
        sum(col("n_below")).as("tb"), count(lit(1)).as("k"))
      cells.crossJoin(broadcast(marg))
        .withColumn("ng", col("n_above") + col("n_below"))
        .withColumn("nn", (col("ta") + col("tb")).cast("double"))
        .withColumn("ea", col("ng") * col("ta") / col("nn"))
        .withColumn("eb", col("ng") * col("tb") / col("nn"))
        .withColumn("cell", round(
          (col("n_above") - col("ea")) * (col("n_above") - col("ea"))
            / col("ea")
            + (col("n_below") - col("eb")) * (col("n_below") - col("eb"))
            / col("eb"), 9))
        .withColumn("chi2", round(sum(col("cell")
          .cast(DecimalType(38, 9))).over(Window.partitionBy())
          .cast("double"), 6))
        .select(col("grp"), col("n_above"), col("n_below"),
          round(col("n_above") / col("ng").cast("double"), 6)
            .as("share_above"),
          col("chi2"), (col("k") - 1).as("df"),
          round(exp(-col("chi2") / 2) * (lit(1.0) + col("chi2") / 2), 6)
            .as("p_value"),
          (col("chi2") > 9.487729036781154).as("reject_5pct"))
        .orderBy(col("grp"))
    },
    Some("""WITH o AS (SELECT o_orderpriority AS grp,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v, o_orderkey AS okey
        FROM orders),
      med AS (SELECT v AS med FROM (SELECT v,
          ROW_NUMBER() OVER (ORDER BY v, okey) AS r,
          CAST(COUNT(*) OVER () AS BIGINT) AS n FROM o)
        WHERE r = (n + 1) // 2),
      cells AS (SELECT grp,
          CAST(SUM(CASE WHEN o.v > m.med THEN 1 ELSE 0 END) AS BIGINT)
            AS n_above,
          CAST(SUM(CASE WHEN o.v > m.med THEN 0 ELSE 1 END) AS BIGINT)
            AS n_below
        FROM o, med m WHERE o.v <> m.med GROUP BY 1),
      marg AS (SELECT CAST(SUM(n_above) AS BIGINT) AS ta,
          CAST(SUM(n_below) AS BIGINT) AS tb,
          CAST(COUNT(*) AS BIGINT) AS k FROM cells),
      alg AS (SELECT c.*, m.ta, m.tb, m.k,
          c.n_above + c.n_below AS ng,
          CAST(m.ta + m.tb AS DOUBLE) AS nn
        FROM cells c, marg m),
      alg2 AS (SELECT *,
          round((n_above - ng * ta / nn) * (n_above - ng * ta / nn)
              / (ng * ta / nn)
            + (n_below - ng * tb / nn) * (n_below - ng * tb / nn)
              / (ng * tb / nn), 9) AS cell
        FROM alg),
      tot AS (SELECT *, round(CAST(SUM(CAST(cell AS DECIMAL(38,9)))
          OVER () AS DOUBLE), 6) AS chi2 FROM alg2)
      SELECT grp, n_above, n_below,
        round(n_above / CAST(ng AS DOUBLE), 6) AS share_above,
        chi2, k - 1 AS df,
        round(exp(-chi2 / 2) * (1.0 + chi2 / 2), 6) AS p_value,
        (chi2 > 9.487729036781154) AS reject_5pct
      FROM tot ORDER BY grp"""))

  /** KPSS level-stationarity test on daily revenue (in 10⁴-dollar
    * units — the descaling keeps every cross-moment exactly
    * representable in double, so no >2⁵³ DECIMAL→DOUBLE cast whose
    * nearest-rounding the engines implement differently): η from the
    * exact partial-sum walk, Bartlett long-run variance with L = 7,
    * verdict at the 5% critical value 0.463. */
  val q451Kpss: QueryDef = QueryDef(
    "q451_kpss",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        // daily revenue in 1e4-dollar units (floored): cents / 1e6
        .agg(floor((sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
          .cast(DecimalType(18, 0)).cast("double") / 1000000.0)
          .cast("long").as("y"))
        .localCheckpoint() // prefix pass + moment pass + 7 lag joins
      val d38 = DecimalType(38, 0)
      val mom = daily.agg(count(lit(1)).as("n"),
        sum(col("y").cast(d38)).as("sy"),
        sum((col("y") * col("y")).cast(d38)).as("syy"))
      // partial sums S_t = prefixY - rank * mu, exact pieces
      val walk = daily
        .withColumn("rk", row_number().over(Window.orderBy(col("t"))).cast("long"))
        .withColumn("py", sum(col("y").cast(d38)).over(
          Window.orderBy(col("t"))))
        .crossJoin(broadcast(mom))
        .withColumn("st", col("py").cast("double")
          - col("rk") * (col("sy").cast("double") / col("n")))
        .agg(sum(round(col("st") * col("st"), 4).cast(DecimalType(38, 4)))
          .as("ss2"))
      // autocovariances from exact integer cross-moments
      val shifted = daily.select(col("t").as("t2"), col("y").as("y2"))
      val gammas = daily
        .withColumn("lag", explode(sequence(lit(1L), lit(7L))))
        .join(shifted, col("t2") === col("t") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("np"),
          sum((col("y") * col("y2")).cast(d38)).as("sp"),
          sum(col("y").cast(d38)).as("sa"),
          sum(col("y2").cast(d38)).as("sb"))
        .crossJoin(broadcast(mom))
        .withColumn("mu", col("sy").cast("double") / col("n"))
        .withColumn("gamma", (col("sp").cast("double")
          - col("mu") * (col("sa") + col("sb")).cast("double")
          + col("np") * col("mu") * col("mu")) / col("n"))
        .withColumn("wterm", round((lit(1.0) - col("lag") / 8.0)
          * col("gamma"), 4))
        .agg(sum(col("wterm").cast(DecimalType(38, 4))).as("gsum"))
      mom.crossJoin(broadcast(walk)).crossJoin(broadcast(gammas))
        .withColumn("mu", col("sy").cast("double") / col("n"))
        .withColumn("gamma0",
          col("syy").cast("double") / col("n") - col("mu") * col("mu"))
        .withColumn("s2lr", col("gamma0") + lit(2.0) * col("gsum").cast("double"))
        .withColumn("eta", round(col("ss2").cast("double")
          / (col("n").cast("double") * col("n") * col("s2lr")), 6))
        .select(col("n").as("n_days"),
          round(col("gamma0"), 4).as("gamma0"),
          round(col("s2lr"), 4).as("sigma2_lr"), col("eta"),
          lit(7L).as("bartlett_l"),
          (col("eta") > 0.463).as("reject_5pct"))
    },
    Some("""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(floor(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
            AS DECIMAL(18,0)) AS DOUBLE) / 1000000.0) AS BIGINT) AS y
        FROM orders GROUP BY 1),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(y AS DECIMAL(38,0))) AS sy,
          SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
        FROM daily),
      walk AS (SELECT SUM(CAST(round(st * st, 4) AS DECIMAL(38,4))) AS ss2
        FROM (SELECT CAST(SUM(CAST(d.y AS DECIMAL(38,0)))
              OVER (ORDER BY d.t) AS DOUBLE)
            - (ROW_NUMBER() OVER (ORDER BY d.t))
              * (CAST(m.sy AS DOUBLE) / m.n) AS st
          FROM daily d, mom m)),
      pairs AS (SELECT f.lag, CAST(COUNT(*) AS BIGINT) AS np,
          SUM(CAST(f.y * b.y AS DECIMAL(38,0))) AS sp,
          SUM(CAST(f.y AS DECIMAL(38,0))) AS sa,
          SUM(CAST(b.y AS DECIMAL(38,0))) AS sb
        FROM (SELECT l.lag, a.t, a.y
          FROM (SELECT UNNEST(range(1, 8)) AS lag) l CROSS JOIN daily a) f
        JOIN daily b ON b.t = f.t + f.lag GROUP BY 1),
      gammas AS (SELECT SUM(CAST(round((1.0 - p.lag / 8.0)
            * ((CAST(p.sp AS DOUBLE)
              - (CAST(m.sy AS DOUBLE) / m.n) * CAST(p.sa + p.sb AS DOUBLE)
              + p.np * (CAST(m.sy AS DOUBLE) / m.n)
                * (CAST(m.sy AS DOUBLE) / m.n)) / m.n), 4)
            AS DECIMAL(38,4))) AS gsum
        FROM pairs p, mom m)
      SELECT m.n AS n_days,
        round(CAST(m.syy AS DOUBLE) / m.n
          - (CAST(m.sy AS DOUBLE) / m.n) * (CAST(m.sy AS DOUBLE) / m.n), 4)
          AS gamma0,
        round(CAST(m.syy AS DOUBLE) / m.n
          - (CAST(m.sy AS DOUBLE) / m.n) * (CAST(m.sy AS DOUBLE) / m.n)
          + 2.0 * CAST(g.gsum AS DOUBLE), 4) AS sigma2_lr,
        round(CAST(w.ss2 AS DOUBLE) / (CAST(m.n AS DOUBLE) * m.n
          * (CAST(m.syy AS DOUBLE) / m.n
            - (CAST(m.sy AS DOUBLE) / m.n) * (CAST(m.sy AS DOUBLE) / m.n)
            + 2.0 * CAST(g.gsum AS DOUBLE))), 6) AS eta,
        CAST(7 AS BIGINT) AS bartlett_l,
        (round(CAST(w.ss2 AS DOUBLE) / (CAST(m.n AS DOUBLE) * m.n
          * (CAST(m.syy AS DOUBLE) / m.n
            - (CAST(m.sy AS DOUBLE) / m.n) * (CAST(m.sy AS DOUBLE) / m.n)
            + 2.0 * CAST(g.gsum AS DOUBLE))), 6) > 0.463) AS reject_5pct
      FROM mom m, walk w, gammas g"""))

val all: Seq[QueryDef] = Seq(q450MoodMedian, q451Kpss)
}
