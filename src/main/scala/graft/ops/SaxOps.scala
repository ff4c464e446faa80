package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Symbolic-series wave: SAX (Symbolic Aggregate approXimation) of the
  * daily order-count series — z-normalize, Piecewise Aggregate
  * Approximation into 64 equal-time segments, discretize against the
  * exact N(0,1) quartile breakpoints into a 4-letter alphabet, then
  * census the 3-symbol motifs. The representation behind whole-series
  * indexing and motif mining; q426's periodogram asks "what period?",
  * this asks "what shape?".
  *
  * Determinism: the daily census is integer; μ and σ come from exact
  * integer moment sums, so every z and PAA mean is an identical
  * double; breakpoints are exact double literals; segment ids use
  * integer arithmetic on day offsets.
  *
  * Scale shape: corpus → calendar-bounded daily census; everything
  * after runs on the 64-segment frame.
  */
object SaxOps {

  // exact N(0,1) quartiles for alphabet size 4
  private val Bp = 0.6744897501960817

  /** SAX(w=64, a=4) of daily order counts: per segment the day count,
    * PAA mean, symbol, trailing 3-motif, plus the dominant motif and
    * its support. */
  val q433SaxMotifs: QueryDef = QueryDef(
    "q433_sax_motifs",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(count(lit(1)).as("y"))
        .localCheckpoint() // bounds pass + moment pass + segment pass
      val bounds = daily.agg(min(col("t")).as("t0"), max(col("t")).as("t1"),
        count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum((col("y") * col("y"))).as("syy"))
        .withColumn("mu", col("sy").cast("double") / col("n"))
        .withColumn("sd", sqrt(col("syy").cast("double") / col("n")
          - col("mu") * col("mu")))
      val seg = daily.crossJoin(broadcast(bounds))
        .withColumn("seg",
          ((col("t") - col("t0")) * 64 / (col("t1") - col("t0") + 1))
            .cast("long"))
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n_days"), sum(col("y")).as("sy_g"),
          first(col("mu")).as("mu"), first(col("sd")).as("sd"))
        .withColumn("paa",
          (col("sy_g").cast("double") / col("n_days") - col("mu")) / col("sd"))
        .withColumn("sym",
          when(col("paa") < -Bp, "a").when(col("paa") < 0, "b")
            .when(col("paa") < Bp, "c").otherwise("d"))
      val wSeq = Window.orderBy(col("seg"))
      val motifs = seg
        .withColumn("motif3", when(lead(col("sym"), 2).over(wSeq).isNotNull,
          concat(col("sym"), lead(col("sym"), 1).over(wSeq),
            lead(col("sym"), 2).over(wSeq))))
      val top = motifs.where(col("motif3").isNotNull)
        .groupBy(col("motif3")).agg(count(lit(1)).as("cnt"))
        .agg(min(struct((-col("cnt")).as("nc"), col("motif3").as("m"))).as("t"))
        .select(col("t.m").as("top_motif"), (-col("t.nc")).as("top_motif_n"))
      motifs.crossJoin(broadcast(top))
        .select(col("seg"), col("n_days"), round(col("paa"), 6).as("paa"),
          col("sym"), col("motif3"), col("top_motif"),
          col("top_motif_n").cast("long").as("top_motif_n"))
        .orderBy(col("seg"))
    },
    Some(s"""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
            AS t,
          CAST(COUNT(*) AS BIGINT) AS y
        FROM orders GROUP BY 1),
      b AS (SELECT MIN(t) AS t0, MAX(t) AS t1,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(y * y) AS BIGINT) AS syy
        FROM daily),
      b2 AS (SELECT *, CAST(sy AS DOUBLE) / n AS mu,
          sqrt(CAST(syy AS DOUBLE) / n
            - (CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)) AS sd
        FROM b),
      seg AS (SELECT (d.t - b2.t0) * 64 // (b2.t1 - b2.t0 + 1) AS seg,
          CAST(COUNT(*) AS BIGINT) AS n_days, CAST(SUM(d.y) AS BIGINT)
            AS sy_g,
          ANY_VALUE(b2.mu) AS mu, ANY_VALUE(b2.sd) AS sd
        FROM daily d, b2 GROUP BY 1),
      paa AS (SELECT seg, n_days,
          (CAST(sy_g AS DOUBLE) / n_days - mu) / sd AS paa
        FROM seg),
      sym AS (SELECT *, CASE WHEN paa < -$Bp THEN 'a'
          WHEN paa < 0 THEN 'b' WHEN paa < $Bp THEN 'c' ELSE 'd' END AS sym
        FROM paa),
      mot AS (SELECT *, CASE WHEN LEAD(sym, 2) OVER (ORDER BY seg)
            IS NOT NULL
          THEN sym || LEAD(sym, 1) OVER (ORDER BY seg)
            || LEAD(sym, 2) OVER (ORDER BY seg) END AS motif3
        FROM sym),
      top AS (SELECT motif3 AS top_motif,
          CAST(COUNT(*) AS BIGINT) AS top_motif_n
        FROM mot WHERE motif3 IS NOT NULL
        GROUP BY 1 ORDER BY COUNT(*) DESC, motif3 LIMIT 1)
      SELECT m.seg, m.n_days, round(m.paa, 6) AS paa, m.sym, m.motif3,
        t.top_motif, t.top_motif_n
      FROM mot m, top t ORDER BY m.seg"""))

  val all: Seq[QueryDef] = Seq(q433SaxMotifs)
}
