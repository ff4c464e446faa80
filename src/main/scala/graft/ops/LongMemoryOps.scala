package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Long-memory wave: Hurst exponent by rescaled range (q444), partial
  * autocorrelation by Toeplitz–Cramer (q445), and Granger causality
  * (q446) — the "how far back does this series remember?" family that
  * completes q175/q438's plain ACF: R/S measures memory across SCALES,
  * PACF isolates the direct effect of lag m with the intervening lags
  * regressed out, and Granger asks whether one series' past improves
  * the other's forecast beyond its own past.
  *
  * Determinism: all series are integerized (daily counts, revenue in
  * cents) on the zero-filled calendar spine, so every raw moment is an
  * exact integer DECIMAL sum; PACF/Granger solve their linear systems
  * with the shared generated Leibniz expansions (q441's trick — the
  * identical expression text runs in both engines); per-block R/S and
  * per-lag ACF round at 9 before any DECIMAL re-aggregation.
  *
  * Scale shape: one corpus scan to the daily census; the spine is
  * calendar-bounded (~2 400 rows at any SF); the R/S fan-out is
  * 6 window sizes × spine; lag joins are spine equi-joins; the solves
  * run on 1-row moment frames.
  */
object LongMemoryOps {

  import Leibniz.{det, replaceCol}

  private val Ws = Seq(8, 16, 32, 64, 128, 256)

  /** Hurst exponent of daily order counts via rescaled range over
    * dyadic windows: per-window mean R/S, the log2-log2 regression
    * slope H, and the persistence verdict. Constant blocks (S = 0)
    * are dropped, by contract. */
  val q444HurstRs: QueryDef = QueryDef(
    "q444_hurst_rs",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(count(lit(1)).as("c"))
      val bounds = daily.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
      val series = bounds
        .select(col("tmin"), explode(sequence(col("tmin"), col("tmax"))).as("t"))
        .join(daily, Seq("t"), "left")
        .na.fill(0L, Seq("c"))
        .withColumn("idx", col("t") - col("tmin"))
        .localCheckpoint() // fanned out over 6 window sizes
      val fan = series
        .withColumn("w", explode(array(Ws.map(w => lit(w.toLong)): _*)))
        .withColumn("blk", expr("idx div w"))
        .withColumn("pos", col("idx") % col("w"))
      val wB = Window.partitionBy(col("w"), col("blk"))
      val wP = wB.orderBy(col("pos"))
      val blocks = fan
        .withColumn("nb", count(lit(1)).over(wB))
        .where(col("nb") === col("w")) // complete blocks only
        .withColumn("sc", sum(col("c")).over(wB))
        .withColumn("sc2", sum(col("c") * col("c")).over(wB))
        .withColumn("mean", col("sc").cast("double") / col("w"))
        .withColumn("prefix", sum(col("c")).over(wP))
        .withColumn("dev",
          col("prefix").cast("double") - (col("pos") + 1) * col("mean"))
        .groupBy(col("w"), col("blk"))
        .agg((max(col("dev")) - min(col("dev"))).as("r"),
          sqrt(max(col("sc2")).cast("double") / max(col("w"))
            - (max(col("sc")).cast("double") / max(col("w")))
            * (max(col("sc")).cast("double") / max(col("w")))).as("s"))
        .where(col("s") > 0)
        .withColumn("rs", round(col("r") / col("s"), 9))
      val perW = blocks.groupBy(col("w"))
        .agg(count(lit(1)).as("n_blocks"),
          sum(col("rs").cast(DecimalType(38, 9))).as("srs"))
        .withColumn("avg_rs",
          round(col("srs").cast("double") / col("n_blocks"), 9))
        .withColumn("l2w", round(log(col("w").cast("double")) / log(lit(2.0)), 9))
        .withColumn("l2rs", round(log(col("avg_rs")) / log(lit(2.0)), 9))
        .localCheckpoint() // slope pass + report pass
      val d9 = DecimalType(38, 9)
      val slope = perW.agg(count(lit(1)).as("k"),
        sum(col("l2w").cast(d9)).as("sx"),
        sum(col("l2rs").cast(d9)).as("sy"),
        sum(round(col("l2w") * col("l2w"), 9).cast(d9)).as("sxx"),
        sum(round(col("l2w") * col("l2rs"), 9).cast(d9)).as("sxy"))
        .select(round(
          (col("k") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
            / (col("k") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double")), 6)
          .as("hurst"))
      perW.crossJoin(broadcast(slope))
        .select(col("w"), col("n_blocks"), round(col("avg_rs"), 6).as("avg_rs"),
          round(col("l2rs"), 6).as("log2_rs"), col("hurst"),
          (col("hurst") > 0.5).as("persistent"))
        .orderBy(col("w"))
    },
    Some(s"""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
      bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM daily),
      spine AS (SELECT b.tmin, UNNEST(range(b.tmin, b.tmax + 1)) AS t
        FROM bounds b),
      series AS (SELECT s.t - s.tmin AS idx, COALESCE(d.c, 0) AS c
        FROM spine s LEFT JOIN daily d ON d.t = s.t),
      fan AS (SELECT v.w, s.idx // v.w AS blk, s.idx % v.w AS pos, s.c
        FROM series s CROSS JOIN (SELECT UNNEST([${Ws.map(w => s"CAST($w AS BIGINT)").mkString(", ")}]) AS w) v),
      wins AS (SELECT *, COUNT(*) OVER pb AS nb,
          SUM(c) OVER pb AS sc, SUM(c * c) OVER pb AS sc2,
          SUM(c) OVER (PARTITION BY w, blk ORDER BY pos) AS prefix
        FROM fan
        WINDOW pb AS (PARTITION BY w, blk)),
      devs AS (SELECT *, CAST(sc AS DOUBLE) / w AS mean,
          CAST(prefix AS DOUBLE) - (pos + 1) * (CAST(sc AS DOUBLE) / w) AS dev
        FROM wins WHERE nb = w),
      blocks AS (SELECT w, blk,
          MAX(dev) - MIN(dev) AS r,
          sqrt(CAST(MAX(sc2) AS DOUBLE) / MAX(w)
            - (CAST(MAX(sc) AS DOUBLE) / MAX(w))
            * (CAST(MAX(sc) AS DOUBLE) / MAX(w))) AS s
        FROM devs GROUP BY 1, 2),
      rsb AS (SELECT w, blk, round(r / s, 9) AS rs FROM blocks WHERE s > 0),
      perw AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS n_blocks,
          round(CAST(SUM(CAST(rs AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 9)
            AS avg_rs
        FROM rsb GROUP BY 1),
      perw2 AS (SELECT *,
          round(ln(CAST(w AS DOUBLE)) / ln(2.0), 9) AS l2w,
          round(ln(avg_rs) / ln(2.0), 9) AS l2rs
        FROM perw),
      slope AS (SELECT round(
          (COUNT(*) * CAST(SUM(CAST(round(l2w * l2rs, 9) AS DECIMAL(38,9)))
              AS DOUBLE)
            - CAST(SUM(CAST(l2w AS DECIMAL(38,9))) AS DOUBLE)
              * CAST(SUM(CAST(l2rs AS DECIMAL(38,9))) AS DOUBLE))
          / (COUNT(*) * CAST(SUM(CAST(round(l2w * l2w, 9) AS DECIMAL(38,9)))
              AS DOUBLE)
            - CAST(SUM(CAST(l2w AS DECIMAL(38,9))) AS DOUBLE)
              * CAST(SUM(CAST(l2w AS DECIMAL(38,9))) AS DOUBLE)), 6)
          AS hurst FROM perw2)
      SELECT p.w, p.n_blocks, round(p.avg_rs, 6) AS avg_rs,
        round(p.l2rs, 6) AS log2_rs, sl.hurst,
        (sl.hurst > 0.5) AS persistent
      FROM perw2 p, slope sl ORDER BY p.w"""))

  // ——— q445 PACF: Toeplitz systems solved by the shared Leibniz dets ———

  private def toeplitz(m: Int): Seq[Seq[String]] =
    (0 until m).map(i => (0 until m).map(j =>
      if (i == j) "1.0" else s"a${math.abs(i - j)}"))

  private def pacfExpr(m: Int): String = {
    val rhs = (1 to m).map(j => s"a$j")
    s"round(${det(replaceCol(toeplitz(m), m - 1, rhs))} / ${det(toeplitz(m))}, 6)"
  }

  /** PACF of the daily order-count series, lags 1–5: each lag's direct
    * effect via the Yule–Walker Toeplitz solve (Cramer on the 9-dp
    * ACFs; pacf₁ ≡ acf₁ by construction). */
  val q445Pacf: QueryDef = QueryDef(
    "q445_pacf",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(count(lit(1)).as("c"))
      val bounds = daily.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
      val series = bounds
        .select(explode(sequence(col("tmin"), col("tmax"))).as("t"))
        .join(daily, Seq("t"), "left")
        .na.fill(0L, Seq("c"))
        .localCheckpoint() // moment pass + both sides of 5 lag joins
      val d38 = DecimalType(38, 0)
      val mom = series.agg(count(lit(1)).as("n"),
        sum(col("c").cast(d38)).as("s"),
        sum((col("c") * col("c")).cast(d38)).as("s2"))
      val shifted = series.select(col("t").as("t2"), col("c").as("c2"))
      val acfRow = series
        .withColumn("lag", explode(sequence(lit(1L), lit(5L))))
        .join(shifted, col("t2") === col("t") + col("lag"))
        .groupBy(col("lag"))
        .agg(count(lit(1)).as("np"),
          sum((col("c") * col("c2")).cast(d38)).as("sp"),
          sum(col("c").cast(d38)).as("sa"),
          sum(col("c2").cast(d38)).as("sb"))
        .crossJoin(broadcast(mom))
        .withColumn("mu", col("s").cast("double") / col("n"))
        .withColumn("acf", round(
          (col("sp").cast("double")
            - col("mu") * (col("sa") + col("sb")).cast("double")
            + col("np") * col("mu") * col("mu"))
            / (col("s2").cast("double") - col("n") * col("mu") * col("mu")),
          9))
        .groupBy()
        .agg(sum(when(col("lag") === 1, col("acf"))).as("a1"),
          (2 to 5).map(k =>
            sum(when(col("lag") === k, col("acf"))).as(s"a$k")): _*)
      acfRow.select(explode(array((1 to 5).map(m =>
        struct(lit(m.toLong).as("lag"),
          round(col(s"a$m"), 6).as("acf"),
          expr(pacfExpr(m)).as("pacf"))): _*)).as("r"))
        .select(col("r.lag").as("lag"), col("r.acf").as("acf"),
          col("r.pacf").as("pacf"))
        .orderBy(col("lag"))
    },
    Some {
      val rows = (1 to 5).map(m =>
        s"""SELECT CAST($m AS BIGINT) AS lag, round(a$m, 6) AS acf,
          ${pacfExpr(m)} AS pacf FROM arow""").mkString("\n        UNION ALL ")
      s"""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders GROUP BY 1),
      bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM daily),
      spine AS (SELECT UNNEST(range(tmin, tmax + 1)) AS t FROM bounds),
      series AS (SELECT s.t, COALESCE(d.c, 0) AS c
        FROM spine s LEFT JOIN daily d ON d.t = s.t),
      mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(c AS DECIMAL(38,0))) AS s,
          SUM(CAST(c * c AS DECIMAL(38,0))) AS s2
        FROM series),
      fanl AS (SELECT l.lag, a.t, a.c
        FROM (SELECT UNNEST(range(1, 6)) AS lag) l CROSS JOIN series a),
      pairs AS (SELECT f.lag, CAST(COUNT(*) AS BIGINT) AS np,
          SUM(CAST(f.c * b.c AS DECIMAL(38,0))) AS sp,
          SUM(CAST(f.c AS DECIMAL(38,0))) AS sa,
          SUM(CAST(b.c AS DECIMAL(38,0))) AS sb
        FROM fanl f JOIN series b ON b.t = f.t + f.lag GROUP BY 1),
      acfs AS (SELECT p.lag,
          round((CAST(p.sp AS DOUBLE)
            - (CAST(m.s AS DOUBLE) / m.n) * CAST(p.sa + p.sb AS DOUBLE)
            + p.np * (CAST(m.s AS DOUBLE) / m.n)
              * (CAST(m.s AS DOUBLE) / m.n))
            / (CAST(m.s2 AS DOUBLE)
              - m.n * (CAST(m.s AS DOUBLE) / m.n)
                * (CAST(m.s AS DOUBLE) / m.n)), 9) AS acf
        FROM pairs p, mom m),
      arow AS (SELECT ${(1 to 5).map(k =>
        s"SUM(CASE WHEN lag = $k THEN acf END) AS a$k").mkString(", ")}
        FROM acfs)
      $rows
      ORDER BY lag"""
    })

  // ——— q446 Granger: centered lag-2 VAR F-test, both directions ———

  private val Vars = Seq("y", "x", "y1", "y2", "x1", "x2")

  private def cm(a: String, b: String): String = {
    val (lo, hi) =
      if (Vars.indexOf(a) <= Vars.indexOf(b)) (a, b) else (b, a)
    s"(m_${lo}_$hi - m_$lo * m_$hi / mn)"
  }

  /** cm() rendered as a pre-computed column reference — the Spark-side
    * twin of [[cm]]: same value, but evaluated once in a dedicated
    * projection so the determinant expansions reference slim columns
    * instead of re-inlining the centered-moment arithmetic ~2500 times
    * (r15: the inlined form's generated `generate_doConsume` exceeded
    * janino's 64 KB method limit and silently fell back to interpreted
    * evaluation — see OPTIMIZATION_r15.md). */
  private def cmRef(a: String, b: String): String = {
    val (lo, hi) =
      if (Vars.indexOf(a) <= Vars.indexOf(b)) (a, b) else (b, a)
    s"cm_${lo}_$hi"
  }

  /** One direction's F-statistic expressions: target w regressed on its
    * own two lags (restricted) and + the other series' two lags
    * (unrestricted), everything centered so no intercept column.
    * `cmF` renders a centered moment — [[cm]] inlines the arithmetic
    * (the oracle's form), [[cmRef]] references the hoisted column (the
    * Spark plan's form); the evaluated double tree is identical. */
  private def grangerExprs(w: String, own: Seq[String], other: Seq[String],
      cmF: (String, String) => String = cm)
      : (String, String) = {
    def cm(a: String, b: String): String = cmF(a, b)
    val regs = own ++ other
    val aU = regs.map(a => regs.map(b => cm(a, b)))
    val bU = regs.map(a => cm(a, w))
    val dU = det(aU)
    val betas = regs.indices.map(j =>
      s"round(${det(replaceCol(aU, j, bU))} / $dU, 12)")
    val sseU = s"(${cm(w, w)} - ${betas.zipWithIndex.map {
      case (b, j) => s"$b * ${bU(j)}" }.mkString(" - ")})"
    val aR = own.map(a => own.map(b => cm(a, b)))
    val bR = own.map(a => cm(a, w))
    val dR = det(aR)
    val gammas = own.indices.map(j =>
      s"round(${det(replaceCol(aR, j, bR))} / $dR, 12)")
    val sseR = s"(${cm(w, w)} - ${gammas.zipWithIndex.map {
      case (g, j) => s"$g * ${bR(j)}" }.mkString(" - ")})"
    (sseU, sseR)
  }

  /** Granger causality between daily order counts and daily revenue,
    * lag 2, both directions: unrestricted/restricted SSE, F, verdict
    * at the F(2, ∞) 5% point. */
  val q446GrangerCausality: QueryDef = QueryDef(
    "q446_granger_causality",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(count(lit(1)).as("x"),
          (sum(col("o_totalprice").cast(DecimalType(18, 2))) * 100)
            .cast(DecimalType(18, 0)).cast("long").as("y"))
      val bounds = daily.agg(min(col("t")).as("tmin"), max(col("t")).as("tmax"))
      val series = bounds
        .select(explode(sequence(col("tmin"), col("tmax"))).as("t"))
        .join(daily, Seq("t"), "left")
        .na.fill(0L, Seq("x", "y"))
        .localCheckpoint() // three sides of the lag joins
      val lag1 = series.select(col("t").as("tl1"),
        col("x").as("x1"), col("y").as("y1"))
      val lag2 = series.select(col("t").as("tl2"),
        col("x").as("x2"), col("y").as("y2"))
      val rows = series
        .join(lag1, col("tl1") === col("t") - 1)
        .join(lag2, col("tl2") === col("t") - 2)
      val d19 = DecimalType(19, 0)
      val d38 = DecimalType(38, 0)
      val sums =
        Vars.map(v => sum(col(v).cast(d38)).as(s"r_$v")) ++
          (for {
            i <- Vars.indices; j <- i until Vars.length
          } yield sum((col(Vars(i)).cast(d19) * col(Vars(j)).cast(d19))
            .cast(d38)).as(s"r_${Vars(i)}_${Vars(j)}"))
      val mom = rows.agg(count(lit(1)).as("rn"), sums: _*)
        .select(Seq(col("rn").cast("long").as("n_obs"),
          col("rn").cast("double").as("mn")) ++
          Vars.map(v => col(s"r_$v").cast("double").as(s"m_$v")) ++
          (for {
            i <- Vars.indices; j <- i until Vars.length
          } yield col(s"r_${Vars(i)}_${Vars(j)}").cast("double")
            .as(s"m_${Vars(i)}_${Vars(j)}")): _*)
      // r15 codegen fix: hoist the 21 centered moments, then the four
      // SSE determinants, into their own projections. The arithmetic
      // tree is unchanged (each hoisted column evaluates exactly the
      // expression the inline form evaluated, once); what changes is
      // the generated code shape — the explode's consume method now
      // reads 8 slim columns instead of re-expanding ~10k double ops,
      // which was past janino's 64 KB method cap and forced interpreted
      // fallback for the whole final stage.
      val cmCols = for {
        i <- Vars.indices; j <- i until Vars.length
      } yield expr(cm(Vars(i), Vars(j))).as(cmRef(Vars(i), Vars(j)))
      val momCm = mom.select(Seq(col("n_obs"), col("mn")) ++ cmCols: _*)
      val (sseU1, sseR1) =
        grangerExprs("y", Seq("y1", "y2"), Seq("x1", "x2"), cmRef)
      val (sseU2, sseR2) =
        grangerExprs("x", Seq("x1", "x2"), Seq("y1", "y2"), cmRef)
      val sse = momCm.select(col("n_obs"), col("mn"),
        expr(sseU1).as("su_cr"), expr(sseR1).as("sr_cr"),
        col(cmRef("y", "y")).as("sww_cr"),
        expr(sseU2).as("su_rc"), expr(sseR2).as("sr_rc"),
        col(cmRef("x", "x")).as("sww_rc"))
      val dirs = Seq(
        ("counts_to_revenue", "su_cr", "sr_cr", "sww_cr"),
        ("revenue_to_counts", "su_rc", "sr_rc", "sww_rc"))
      sse.select(col("n_obs"), explode(array(dirs.map {
        case (nm, su, sr, sww) =>
          struct(lit(nm).as("direction"),
            expr(s"round(1.0 - $su / $sww, 6)").as("r2_unrestricted"),
            expr(s"round((($sr - $su) / 2) / ($su / (mn - 5)), 6)")
              .as("f_stat"))
      }: _*)).as("r"))
        .select(col("r.direction").as("direction"), col("n_obs"),
          col("r.r2_unrestricted").as("r2_unrestricted"),
          col("r.f_stat").as("f_stat"), lit(2L).as("df1"),
          (col("n_obs") - 5).as("df2"),
          (col("r.f_stat") > 2.9957323575).as("reject_5pct"))
        .orderBy(col("direction"))
    },
    Some {
      val (sseU1, sseR1) = grangerExprs("y", Seq("y1", "y2"), Seq("x1", "x2"))
      val (sseU2, sseR2) = grangerExprs("x", Seq("x1", "x2"), Seq("y1", "y2"))
      val dirs = Seq(
        ("counts_to_revenue", sseU1, sseR1, cm("y", "y")),
        ("revenue_to_counts", sseU2, sseR2, cm("x", "x")))
      val rows = dirs.map { case (nm, su, sr, sww) =>
        s"""SELECT '$nm' AS direction, n_obs,
          round(1.0 - $su / $sww, 6) AS r2_unrestricted,
          round((($sr - $su) / 2) / ($su / (mn - 5)), 6) AS f_stat,
          CAST(2 AS BIGINT) AS df1, n_obs - 5 AS df2,
          (round((($sr - $su) / 2) / ($su / (mn - 5)), 6) > 2.9957323575)
            AS reject_5pct
        FROM m"""
      }.mkString("\n        UNION ALL ")
      val pairSums = (for {
        i <- Vars.indices; j <- i until Vars.length
      } yield s"CAST(SUM(CAST(CAST(${Vars(i)} AS DECIMAL(19,0)) * CAST(${Vars(j)} AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS DOUBLE) AS m_${Vars(i)}_${Vars(j)}")
        .mkString(",\n          ")
      s"""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(COUNT(*) AS BIGINT) AS x,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
            AS DECIMAL(18,0)) AS BIGINT) AS y
        FROM orders GROUP BY 1),
      bounds AS (SELECT MIN(t) AS tmin, MAX(t) AS tmax FROM daily),
      spine AS (SELECT UNNEST(range(tmin, tmax + 1)) AS t FROM bounds),
      series AS (SELECT s.t, COALESCE(d.x, 0) AS x, COALESCE(d.y, 0) AS y
        FROM spine s LEFT JOIN daily d ON d.t = s.t),
      rows_ AS (SELECT a.x, a.y, b.x AS x1, b.y AS y1, c.x AS x2, c.y AS y2
        FROM series a
        JOIN series b ON b.t = a.t - 1
        JOIN series c ON c.t = a.t - 2),
      m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_obs,
          CAST(COUNT(*) AS DOUBLE) AS mn,
          ${Vars.map(v => s"CAST(SUM(CAST($v AS DECIMAL(38,0))) AS DOUBLE) AS m_$v").mkString(",\n          ")},
          $pairSums
        FROM rows_)
      $rows
      ORDER BY direction"""
    })

  val all: Seq[QueryDef] = Seq(q444HurstRs, q445Pacf, q446GrangerCausality)
}
