package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Ordered-alternatives wave: Cochran–Armitage trend (q453) and
  * Jonckheere–Terpstra (q454) — the tests that USE the ordering of the
  * priority levels, which χ² (q170) and Kruskal–Wallis (q421) throw
  * away: CA asks "does the high-value RATE trend monotonically with
  * priority?", JT asks the same of the whole VALUE distribution.
  *
  * Determinism: CA is pure integer algebra. JT's pairwise statistic is
  * computed WITHOUT pairing — 2·JT = Σ over (group, value) cells of
  * c·[2·(lower-group counts strictly below v) + (lower-group ties
  * at v)], all integer prefix sums over the distinct-value spine; the
  * tie-corrected null variance is assembled from exact Σt(t−1)(t−2)
  * style integer sums.
  *
  * Scale shape: one scan to the (group × value) census, k = 5 running
  * windows over the value order — linear, never the O(n²) pair join
  * the textbook definition suggests.
  */
object OrderedAltOps {

  private val HighValue = 300000.0

  /** Cochran–Armitage trend test: does the share of high-value orders
    * trend across the ordered priority levels (scores 1..5)? */
  val q453CochranArmitage: QueryDef = QueryDef(
    "q453_cochran_armitage",
    (s, dir) => {
      val cells = Tables(s, dir).orders
        .groupBy(substring(col("o_orderpriority"), 1, 1).cast("long")
          .as("score"))
        .agg(count(lit(1)).as("n_i"),
          sum(when(col("o_totalprice") > HighValue, 1L).otherwise(0L))
            .as("r_i"))
        .localCheckpoint() // margin pass + report pass
      val marg = cells.agg(sum(col("n_i")).as("nn"), sum(col("r_i")).as("rr"),
        sum(col("score") * col("n_i")).as("sn"),
        sum(col("score") * col("score") * col("n_i")).as("ssn"),
        sum(col("score") * col("r_i")).as("sr"))
      cells.crossJoin(broadcast(marg))
        .withColumn("pbar", col("rr").cast("double") / col("nn"))
        // T = Σs(r − n·p̄) exactly: (nn·Σs·r − rr·Σs·n)/nn
        .withColumn("tnum",
          (col("nn") * col("sr") - col("rr") * col("sn")).cast("double")
            / col("nn"))
        .withColumn("vden", col("pbar") * (lit(1.0) - col("pbar"))
          * (col("ssn") - col("sn").cast("double") * col("sn") / col("nn")))
        .withColumn("z", round(col("tnum") / sqrt(col("vden")), 6))
        .select(col("score"), col("n_i"), col("r_i"),
          round(col("r_i") / col("n_i").cast("double"), 6).as("rate"),
          col("z"), round(col("z") * col("z"), 6).as("chi2_trend"),
          (abs(col("z")) > 1.959963984540054).as("reject_5pct"))
        .orderBy(col("score"))
    },
    Some(s"""WITH cells AS (SELECT
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS score,
          CAST(COUNT(*) AS BIGINT) AS n_i,
          CAST(SUM(CASE WHEN o_totalprice > $HighValue THEN 1 ELSE 0 END)
            AS BIGINT) AS r_i
        FROM orders GROUP BY 1),
      marg AS (SELECT CAST(SUM(n_i) AS BIGINT) AS nn,
          CAST(SUM(r_i) AS BIGINT) AS rr,
          CAST(SUM(score * n_i) AS BIGINT) AS sn,
          CAST(SUM(score * score * n_i) AS BIGINT) AS ssn,
          CAST(SUM(score * r_i) AS BIGINT) AS sr
        FROM cells),
      alg AS (SELECT c.*, m.nn, m.rr, m.sn, m.ssn, m.sr,
          CAST(m.rr AS DOUBLE) / m.nn AS pbar,
          CAST(m.nn * m.sr - m.rr * m.sn AS DOUBLE) / m.nn AS tnum
        FROM cells c, marg m),
      alg2 AS (SELECT *,
          round(tnum / sqrt(pbar * (1.0 - pbar)
            * (ssn - CAST(sn AS DOUBLE) * sn / nn)), 6) AS z
        FROM alg)
      SELECT score, n_i, r_i,
        round(r_i / CAST(n_i AS DOUBLE), 6) AS rate,
        z, round(z * z, 6) AS chi2_trend,
        (abs(z) > 1.959963984540054) AS reject_5pct
      FROM alg2 ORDER BY score"""))

  /** Jonckheere–Terpstra: is order value stochastically ordered across
    * priority levels? 2·JT assembled from integer prefix counts over
    * the distinct-value spine; exact tie-corrected null variance. */
  val q454JonckheereTerpstra: QueryDef = QueryDef(
    "q454_jonckheere",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(substring(col("o_orderpriority"), 1, 1).cast("long")
          .as("g"), col("o_totalprice").cast(DecimalType(18, 2)).as("v"))
      val cells = o.groupBy(col("g"), col("v"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // 5 running windows + moment passes
      // per distinct value: running count per group (strictly below =
      // inclusive − own), all five prefixes in ONE size-adaptive pass
      // over the value spine (r15)
      val gSums = (1L to 5L).map(gg =>
        sum(when(col("g") === gg, col("c")).otherwise(0L)).as(s"c$gg"))
      val vSpine = cells.groupBy(col("v"))
        .agg(gSums.head, gSums.tail: _*)
      // r15-opt: the probe is a metadata-cheap |orders| upper bound on
      // the value spine (≤ one row per distinct price) instead of
      // re-running the spine aggregation
      val withPrefix = (1L to 5L).foldLeft(
        Spine.adaptiveRank(vSpine, Seq(col("v")),
          (1L to 5L).map(gg => s"c$gg"), rankCol = "__rk",
          knownCount = Tables(s, dir).orders.count())) { (df, gg) =>
        df.withColumn(s"le$gg", col(s"cum_c$gg"))
          .withColumn(s"lt$gg", col(s"le$gg") - col(s"c$gg"))
      }
      val d38 = DecimalType(38, 0)
      // 2·JT = Σ_cells c_jv · [ 2·Σ_{g<j} lt_g(v) + Σ_{g<j} c_gv ]
      val jt2 = withPrefix.select(col("v") +: (1L to 5L).flatMap(gg =>
          Seq(col(s"c$gg"), col(s"lt$gg"))): _*)
        .select((2L to 5L).map { j =>
          val lower = (1L until j)
          val lt = lower.map(g => col(s"lt$g")).reduce(_ + _)
          val eq = lower.map(g => col(s"c$g")).reduce(_ + _)
          (col(s"c$j") * (lt * 2 + eq)).as(s"t$j")
        }: _*)
        .agg(sum(((2L to 5L).map(j => col(s"t$j")).reduce(_ + _)).cast(d38))
          .as("jt2"))
      // r15-opt: group sizes and tie profiles fold the (g, v) census
      // weights (Σc — exact integers, identical to re-counting the raw
      // frame), so orders is scanned once total instead of three times
      val mom = cells.groupBy(col("g")).agg(sum(col("c")).as("n"))
        .agg(sum(col("n")).as("nn"),
          sum(col("n") * (col("n") - 1)).as("s2"),
          sum(col("n") * (col("n") - 1) * (lit(2L) * col("n") + 5)).as("s25"),
          sum(col("n") * (col("n") - 1) * (col("n") - 2)).as("s3"))
      val ties = cells.groupBy(col("v")).agg(sum(col("c")).as("t"))
        .agg(sum(col("t") * (col("t") - 1)).as("t2"),
          sum((col("t") * (col("t") - 1)).cast(d38)
            * (lit(2L) * col("t") + 5)).as("t25"),
          sum((col("t") * (col("t") - 1)).cast(d38) * (col("t") - 2))
            .as("t3"))
      jt2.crossJoin(broadcast(mom)).crossJoin(broadcast(ties))
        .withColumn("jt", col("jt2").cast("double") / 2)
        .withColumn("e_jt",
          (col("nn") * col("nn") - col("s2") - col("nn")).cast("double") / 4)
        .withColumn("var_jt",
          (col("nn").cast("double") * (col("nn") - 1) * (lit(2L) * col("nn") + 5)
            - col("s25") - col("t25").cast("double")) / 72.0
            + col("s3").cast("double") * col("t3").cast("double")
              / (lit(36.0) * col("nn") * (col("nn") - 1) * (col("nn") - 2))
            + col("s2").cast("double") * col("t2").cast("double")
              / (lit(8.0) * col("nn") * (col("nn") - 1)))
        .withColumn("z", round(
          (col("jt") - col("e_jt")) / sqrt(col("var_jt")), 6))
        .select(col("nn").as("n_orders"), col("jt"),
          round(col("e_jt"), 2).as("e_jt"),
          round(col("var_jt"), 2).as("var_jt"), col("z"),
          (abs(col("z")) > 1.959963984540054).as("reject_5pct"))
    },
    Some {
      val grpCols = (1 to 5).map(g =>
        s"CAST(SUM(CASE WHEN g = $g THEN c ELSE 0 END) AS BIGINT) AS c$g")
        .mkString(",\n          ")
      val prefixes = (1 to 5).map(g =>
        s"""SUM(c$g) OVER (ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c$g AS lt$g""")
        .mkString(",\n          ")
      val terms = (2 to 5).map { j =>
        val lt = (1 until j).map(g => s"lt$g").mkString(" + ")
        val eq = (1 until j).map(g => s"c$g").mkString(" + ")
        s"c$j * (($lt) * 2 + ($eq))"
      }.mkString("\n          + ")
      s"""WITH o AS MATERIALIZED (SELECT
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS g,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v
        FROM orders),
      cells AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c
        FROM o GROUP BY 1, 2),
      vspine AS (SELECT v,
          $grpCols
        FROM cells GROUP BY 1),
      pre AS (SELECT *,
          $prefixes
        FROM vspine),
      jt2 AS (SELECT SUM(CAST($terms AS DECIMAL(38,0))) AS jt2 FROM pre),
      mom AS (SELECT CAST(SUM(n) AS BIGINT) AS nn,
          CAST(SUM(n * (n - 1)) AS BIGINT) AS s2,
          CAST(SUM(n * (n - 1) * (2 * n + 5)) AS BIGINT) AS s25,
          CAST(SUM(n * (n - 1) * (n - 2)) AS BIGINT) AS s3
        FROM (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM o GROUP BY 1)),
      ties AS (SELECT CAST(SUM(t * (t - 1)) AS BIGINT) AS t2,
          SUM(CAST(t * (t - 1) AS DECIMAL(38,0)) * (2 * t + 5)) AS t25,
          SUM(CAST(t * (t - 1) AS DECIMAL(38,0)) * (t - 2)) AS t3
        FROM (SELECT v, CAST(COUNT(*) AS BIGINT) AS t FROM o GROUP BY 1)),
      alg AS (SELECT j.jt2, m.*, t.*,
          CAST(j.jt2 AS DOUBLE) / 2 AS jt,
          CAST(m.nn * m.nn - m.s2 - m.nn AS DOUBLE) / 4 AS e_jt,
          (CAST(m.nn AS DOUBLE) * (m.nn - 1) * (2 * m.nn + 5)
            - m.s25 - CAST(t.t25 AS DOUBLE)) / 72.0
            + CAST(m.s3 AS DOUBLE) * CAST(t.t3 AS DOUBLE)
              / (36.0 * m.nn * (m.nn - 1) * (m.nn - 2))
            + CAST(m.s2 AS DOUBLE) * CAST(t.t2 AS DOUBLE)
              / (8.0 * m.nn * (m.nn - 1)) AS var_jt
        FROM jt2 j, mom m, ties t)
      SELECT nn AS n_orders, jt, round(e_jt, 2) AS e_jt,
        round(var_jt, 2) AS var_jt,
        round((jt - e_jt) / sqrt(var_jt), 6) AS z,
        (abs(round((jt - e_jt) / sqrt(var_jt), 6)) > 1.959963984540054)
          AS reject_5pct
      FROM alg"""
    })

  val all: Seq[QueryDef] = Seq(q453CochranArmitage, q454JonckheereTerpstra)
}
