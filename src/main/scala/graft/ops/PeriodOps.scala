package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spectral wave: single-frequency periodogram sweep (Goertzel-style)
  * over daily order counts — "WHAT period dominates this series?" where
  * q175's lag-k ACF answers only for a given lag and q194 assumes the
  * week. Power at candidate periods {3,5,7,14,30,91,365} from one pair
  * of trig sums each, with the variance share and the dominant-period
  * flag.
  *
  * Determinism: the trig argument is reduced to 2π·(t mod P)/P with an
  * INTEGER mod before the cosine (large-argument range reduction is
  * where libms drift apart); per-term products go through scaled-long
  * sums.
  *
  * Scale shape: corpus → daily census (calendar-bounded); 14 parallel
  * trig sums over the ~2 400-row spine; the period table is 7 rows.
  */
object PeriodOps {

  private val TwoPi = "6.283185307179586"
  private val Periods = Seq(3, 5, 7, 14, 30, 91, 365)

  /** Periodogram of daily order counts: per candidate period the
    * centered cosine/sine sums, spectral power, variance share, and
    * whether it is the dominant period. */
  val q426Periodogram: QueryDef = QueryDef(
    "q426_periodogram",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(count(lit(1)).cast("double").as("y"))
        .localCheckpoint() // mean pass + trig pass
      val mu = daily.agg(count(lit(1)).as("n"),
        sum(col("y").cast(DecimalType(18, 0))).as("sy"))
        .select(col("n"), round(col("sy").cast("double") / col("n"), 6).as("mu"))
      val centered = daily.crossJoin(broadcast(mu))
        .withColumn("yc", col("y") - col("mu"))
      def angle(p: Int) =
        lit(TwoPi.toDouble) * (col("t") % p).cast("double") / p
      val sums = Periods.flatMap { p =>
        Seq(sum(round(col("yc") * cos(angle(p)) * 100).cast("long")).as(s"c$p"),
          sum(round(col("yc") * sin(angle(p)) * 100).cast("long")).as(s"s$p"))
      } :+ sum(round(col("yc") * col("yc") * 100).cast("long")).as("ssq")
      val agg = centered.groupBy(col("n")).agg(sums.head, sums.tail: _*)
      val rows = agg.select(col("n"), col("ssq"),
        explode(array(Periods.map { p =>
          struct(lit(p.toLong).as("period"),
            (col(s"c$p").cast("double") / 100).as("c"),
            (col(s"s$p").cast("double") / 100).as("s"))
        }: _*)).as("r"))
        .select(col("n"), col("ssq"), col("r.period").as("period"),
          round(col("r.c"), 2).as("c"), round(col("r.s"), 2).as("s"))
        // power stays UNROUNDED: it is a same-inputs-same-ops product of
        // the 2-dp c/s (rounding a ~1e14 value at 2 dp is exactly the
        // scaled-double hazard zone where engines' round() semantics split)
        .withColumn("power", col("c") * col("c") + col("s") * col("s"))
        .withColumn("var_share", round(
          lit(2.0) * col("power") /
            (col("n") * (col("ssq").cast("double") / 100)), 6))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("power").desc, col("period"))
      rows.withColumn("is_dominant", row_number().over(w) === 1)
        .select(col("period"), col("c"), col("s"), col("power"),
          col("var_share"), col("is_dominant"))
        .orderBy(col("period"))
    },
    Some {
      val trigCols = Periods.map { p =>
        s"""CAST(SUM(CAST(round(yc * cos($TwoPi * (t % $p) / $p) * 100)
            AS BIGINT)) AS BIGINT) AS c$p,
          CAST(SUM(CAST(round(yc * sin($TwoPi * (t % $p) / $p) * 100)
            AS BIGINT)) AS BIGINT) AS s$p""" }.mkString(",\n          ")
      val unions = Periods.map { p =>
        s"SELECT CAST($p AS BIGINT) AS period, c$p AS craw, s$p AS sraw, n, ssq FROM agg"
      }.mkString("\n        UNION ALL ")
      s"""WITH daily AS (SELECT
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT) AS t,
          CAST(COUNT(*) AS DOUBLE) AS y
        FROM orders GROUP BY 1),
      mu AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          round(CAST(SUM(CAST(y AS DECIMAL(18,0))) AS DOUBLE) / COUNT(*), 6)
            AS mu
        FROM daily),
      centered AS (SELECT d.t, d.y - m.mu AS yc, m.n FROM daily d, mu m),
      agg AS (SELECT ANY_VALUE(n) AS n,
          $trigCols,
          CAST(SUM(CAST(round(yc * yc * 100) AS BIGINT)) AS BIGINT) AS ssq
        FROM centered),
      rows_ AS ($unions),
      scored0 AS (SELECT period,
          round(CAST(craw AS DOUBLE) / 100, 2) AS c,
          round(CAST(sraw AS DOUBLE) / 100, 2) AS s,
          n, ssq
        FROM rows_),
      scored AS (SELECT period, c, s,
          c * c + s * s AS power,
          round(2.0 * (c * c + s * s)
            / (n * (CAST(ssq AS DOUBLE) / 100)), 6) AS var_share
        FROM scored0),
      dom AS (SELECT period AS dp FROM scored
        ORDER BY power DESC, period LIMIT 1)
      SELECT sc.period, sc.c, sc.s, sc.power, sc.var_share,
        (sc.period = d.dp) AS is_dominant
      FROM scored sc, dom d ORDER BY sc.period"""
    })

  val all: Seq[QueryDef] = Seq(q426Periodogram)
}
