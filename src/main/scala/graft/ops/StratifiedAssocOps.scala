package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Stratified-association wave: Cochran–Mantel–Haenszel (q463),
  * Stuart–Maxwell marginal homogeneity (q464) and bias-corrected
  * Cramér's V (q465). CMH answers the question q437's single 2×2
  * cannot — "does the urgency → high-value association survive
  * controlling for region?" (the Simpson's-paradox-proof test, the
  * inferential sibling of q220's detector); Stuart–Maxwell generalizes
  * McNemar (q435) to the full 5×5 priority transition between a
  * customer's first and second order; Cramér's V puts the q170 χ² on
  * the comparable [0,1] scale with the Bergsma small-sample
  * correction.
  *
  * Determinism: every cell is an exact integer; per-stratum CMH terms
  * round at 9 and sum as DECIMAL; Stuart–Maxwell's quadratic form
  * d′S⁻¹d runs through the shared generated Leibniz adjugate on the
  * integer covariance entries.
  *
  * Scale shape: one scan to a ≤25-cell census each (one broadcast
  * dimension join for the region stratum), closed form after.
  */
object StratifiedAssocOps {

  import Leibniz.{det, minor}

  private val HighValue = 300000.0

  /** CMH test of urgency × high-value stratified by region: per-stratum
    * cells and OR, the Mantel–Haenszel common OR, continuity-corrected
    * CMH χ² and verdict. */
  val q463MantelHaenszel: QueryDef = QueryDef(
    "q463_mantel_haenszel",
    (s, dir) => {
      val t = Tables(s, dir)
      val cells = t.orders
        .join(t.customer.select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("nk")), Seq("o_custkey"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("nk"),
          col("n_regionkey").as("rk"))), Seq("nk"))
        .groupBy(col("rk"))
        .agg(
          sum(when(col("o_orderpriority") === "1-URGENT"
            && col("o_totalprice") > HighValue, 1L).otherwise(0L)).as("a"),
          sum(when(col("o_orderpriority") === "1-URGENT"
            && col("o_totalprice") <= HighValue, 1L).otherwise(0L)).as("b"),
          sum(when(col("o_orderpriority") =!= "1-URGENT"
            && col("o_totalprice") > HighValue, 1L).otherwise(0L)).as("c"),
          sum(when(col("o_orderpriority") =!= "1-URGENT"
            && col("o_totalprice") <= HighValue, 1L).otherwise(0L)).as("d"))
        .withColumn("n", col("a") + col("b") + col("c") + col("d"))
        .localCheckpoint() // term pass + report pass
      val d9 = DecimalType(38, 9)
      val terms = cells.agg(
        sum(round((col("a") * col("d")).cast("double") / col("n"), 9)
          .cast(d9)).as("s_ad"),
        sum(round((col("b") * col("c")).cast("double") / col("n"), 9)
          .cast(d9)).as("s_bc"),
        sum(col("a").cast(DecimalType(38, 0))).as("s_a"),
        sum(round((col("a") + col("b")).cast("double")
          * (col("a") + col("c")) / col("n"), 9).cast(d9)).as("s_e"),
        sum(round((col("a") + col("b")).cast("double") * (col("c") + col("d"))
          * (col("a") + col("c")) * (col("b") + col("d"))
          / (col("n").cast("double") * col("n") * (col("n") - 1)), 9)
          .cast(d9)).as("s_v"))
        .withColumn("or_mh", round(
          col("s_ad").cast("double") / col("s_bc").cast("double"), 6))
        .withColumn("cmh_chi2", round(
          (abs(col("s_a").cast("double") - col("s_e").cast("double")) - 0.5)
            * (abs(col("s_a").cast("double") - col("s_e").cast("double")) - 0.5)
            / col("s_v").cast("double"), 6))
      cells.crossJoin(broadcast(terms
          .select(col("or_mh"), col("cmh_chi2"))))
        .select(col("rk").cast("long").as("region"), col("a"), col("b"),
          col("c"), col("d"),
          when(col("b") * col("c") > 0, round(
            (col("a") * col("d")).cast("double") / (col("b") * col("c")), 4))
            .as("or_stratum"),
          col("or_mh"), col("cmh_chi2"),
          (col("cmh_chi2") > 3.841458820694124).as("reject_5pct"))
        .orderBy(col("region"))
    },
    Some(s"""WITH cells AS (SELECT n.n_regionkey AS rk,
          CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
            AND o.o_totalprice > $HighValue THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN o.o_orderpriority = '1-URGENT'
            AND o.o_totalprice <= $HighValue THEN 1 ELSE 0 END) AS BIGINT) AS b,
          CAST(SUM(CASE WHEN o.o_orderpriority <> '1-URGENT'
            AND o.o_totalprice > $HighValue THEN 1 ELSE 0 END) AS BIGINT) AS c,
          CAST(SUM(CASE WHEN o.o_orderpriority <> '1-URGENT'
            AND o.o_totalprice <= $HighValue THEN 1 ELSE 0 END) AS BIGINT) AS d
        FROM orders o
        JOIN customer cu ON cu.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = cu.c_nationkey
        GROUP BY 1),
      cells2 AS (SELECT *, a + b + c + d AS n FROM cells),
      terms AS (SELECT
          SUM(CAST(round(CAST(a * d AS DOUBLE) / n, 9) AS DECIMAL(38,9)))
            AS s_ad,
          SUM(CAST(round(CAST(b * c AS DOUBLE) / n, 9) AS DECIMAL(38,9)))
            AS s_bc,
          SUM(CAST(a AS DECIMAL(38,0))) AS s_a,
          SUM(CAST(round(CAST(a + b AS DOUBLE) * (a + c) / n, 9)
            AS DECIMAL(38,9))) AS s_e,
          SUM(CAST(round(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
            / (CAST(n AS DOUBLE) * n * (n - 1)), 9) AS DECIMAL(38,9)))
            AS s_v
        FROM cells2),
      rep AS (SELECT
          round(CAST(s_ad AS DOUBLE) / CAST(s_bc AS DOUBLE), 6) AS or_mh,
          round((abs(CAST(s_a AS DOUBLE) - CAST(s_e AS DOUBLE)) - 0.5)
            * (abs(CAST(s_a AS DOUBLE) - CAST(s_e AS DOUBLE)) - 0.5)
            / CAST(s_v AS DOUBLE), 6) AS cmh_chi2
        FROM terms)
      SELECT CAST(c.rk AS BIGINT) AS region, c.a, c.b, c.c, c.d,
        CASE WHEN c.b * c.c > 0 THEN round(CAST(c.a * c.d AS DOUBLE)
          / (c.b * c.c), 4) END AS or_stratum,
        r.or_mh, r.cmh_chi2,
        (r.cmh_chi2 > 3.841458820694124) AS reject_5pct
      FROM cells2 c, rep r ORDER BY region"""))

  // Stuart–Maxwell covariance entry names over the first 4 categories
  private val Sm: Seq[Seq[String]] =
    (1 to 4).map(i => (1 to 4).map(j =>
      if (i == j) s"s$i$i" else if (i < j) s"s$i$j" else s"s$j$i"))
  private val detSm = det(Sm)

  /** Stuart–Maxwell marginal-homogeneity test on the 5×5 priority
    * transition between each customer's first and second order:
    * marginal diffs, χ² = d′S⁻¹d via the generated adjugate, df = 4. */
  val q464StuartMaxwell: QueryDef = QueryDef(
    "q464_stuart_maxwell",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_custkey").as("ck"),
          datediff(col("o_orderdate"), lit("1992-01-01")).cast("long").as("d"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("p"),
          col("o_orderkey").as("okey"))
      val wC = Window.partitionBy(col("ck")).orderBy(col("d"), col("okey"))
      val pairs = o
        .withColumn("rn", row_number().over(wC))
        .withColumn("p2", lead(col("p"), 1).over(wC))
        .where(col("rn") === 1 && col("p2").isNotNull)
        .groupBy(col("p").as("i"), col("p2").as("j"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // marginal pass + covariance pass
      // integer covariance entries and marginal diffs for i,j in 1..4
      val aggCols =
        (1 to 4).map(i => sum(
          when(col("i") === i, col("c")).otherwise(0L)
            - when(col("j") === i, col("c")).otherwise(0L)).as(s"d$i")) ++
        (1 to 4).map(i => sum(
          when(col("i") === i, col("c")).otherwise(0L)
            + when(col("j") === i, col("c")).otherwise(0L)
            - when(col("i") === i && col("j") === i,
              col("c") * 2).otherwise(0L)).as(s"s$i$i")) ++
        (for { i <- 1 to 4; j <- i + 1 to 4 } yield sum(
          when(col("i") === i && col("j") === j, -col("c")).otherwise(0L)
            + when(col("i") === j && col("j") === i, -col("c"))
              .otherwise(0L)).as(s"s$i$j")) :+
        sum(col("c")).as("n_pairs")
      val momRaw = pairs.agg(aggCols.head, aggCols.tail: _*)
      // cast the matrix entries to DOUBLE: the generated dets carry 1.0
      // literals, which Spark SQL parses as DECIMAL against LONG columns
      val castCols = Seq("n_pairs") ++
        (1 to 4).map(i => s"CAST(d$i AS DOUBLE) AS d$i") ++
        (for { i <- 1 to 4; j <- i to 4 } yield
          s"CAST(s$i$j AS DOUBLE) AS s$i$j")
      val mom = momRaw.selectExpr(castCols: _*)
        .selectExpr(Seq("*") ++
          Seq(s"$detSm AS dets") ++
          (for { i <- 0 to 3; j <- 0 to 3 } yield {
            val sign = if ((i + j) % 2 == 0) "" else "-"
            s"($sign${det(minor(Sm, i, j))}) AS k$i$j"
          }): _*)
      val quad = (for { i <- 0 to 3; j <- 0 to 3 } yield
        s"d${i + 1} * d${j + 1} * k$j$i").mkString(" + ")
      mom.selectExpr("n_pairs",
        "CAST(d1 AS BIGINT) AS d1", "CAST(d2 AS BIGINT) AS d2",
        "CAST(d3 AS BIGINT) AS d3", "CAST(d4 AS BIGINT) AS d4",
        s"round(($quad) / dets, 6) AS chi2")
        .select(col("n_pairs"), col("d1"), col("d2"), col("d3"), col("d4"),
          col("chi2"), lit(4L).as("df"),
          (col("chi2") > 9.487729036781154).as("reject_5pct"))
    },
    Some {
      val cofCols = (for { i <- 0 to 3; j <- 0 to 3 } yield {
        val sign = if ((i + j) % 2 == 0) "" else "-"
        s"($sign${det(minor(Sm, i, j))}) AS k$i$j"
      }).mkString(",\n          ")
      val quad = (for { i <- 0 to 3; j <- 0 to 3 } yield
        s"d${i + 1} * d${j + 1} * k$j$i").mkString(" + ")
      val dCols = (1 to 4).map(i =>
        s"""CAST(SUM(CASE WHEN i = $i THEN c ELSE 0 END)
          - SUM(CASE WHEN j = $i THEN c ELSE 0 END) AS BIGINT) AS d$i""")
        .mkString(",\n          ")
      val sDiag = (1 to 4).map(i =>
        s"""CAST(SUM(CASE WHEN i = $i THEN c ELSE 0 END)
          + SUM(CASE WHEN j = $i THEN c ELSE 0 END)
          - SUM(CASE WHEN i = $i AND j = $i THEN c * 2 ELSE 0 END)
          AS BIGINT) AS s$i$i""").mkString(",\n          ")
      val sOff = (for { i <- 1 to 4; j <- i + 1 to 4 } yield
        s"""CAST(SUM(CASE WHEN i = $i AND j = $j THEN -c ELSE 0 END)
          + SUM(CASE WHEN i = $j AND j = $i THEN -c ELSE 0 END)
          AS BIGINT) AS s$i$j""").mkString(",\n          ")
      s"""WITH o AS (SELECT o_custkey AS ck,
          CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
            AS d,
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS p,
          o_orderkey AS okey
        FROM orders),
      pairs AS (SELECT p AS i, p2 AS j, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT p,
            ROW_NUMBER() OVER (PARTITION BY ck ORDER BY d, okey) AS rn,
            LEAD(p) OVER (PARTITION BY ck ORDER BY d, okey) AS p2
          FROM o)
        WHERE rn = 1 AND p2 IS NOT NULL GROUP BY 1, 2),
      mom AS (SELECT
          $dCols,
          $sDiag,
          $sOff,
          CAST(SUM(c) AS BIGINT) AS n_pairs
        FROM pairs),
      momd AS (SELECT n_pairs,
          ${(1 to 4).map(i => s"CAST(d$i AS DOUBLE) AS d$i").mkString(", ")},
          ${(for { i <- 1 to 4; j <- i to 4 } yield
            s"CAST(s$i$j AS DOUBLE) AS s$i$j").mkString(", ")}
        FROM mom),
      kf AS (SELECT *, $detSm AS dets,
          $cofCols
        FROM momd)
      SELECT n_pairs, CAST(d1 AS BIGINT) AS d1, CAST(d2 AS BIGINT) AS d2,
        CAST(d3 AS BIGINT) AS d3, CAST(d4 AS BIGINT) AS d4,
        round(($quad) / dets, 6) AS chi2,
        CAST(4 AS BIGINT) AS df,
        (round(($quad) / dets, 6) > 9.487729036781154) AS reject_5pct
      FROM kf"""
    })

  /** Bias-corrected Cramér's V of region × priority: raw χ², raw V and
    * the Bergsma-corrected V — the comparable-across-tables effect
    * size. */
  val q465CramersV: QueryDef = QueryDef(
    "q465_cramers_v",
    (s, dir) => {
      val t = Tables(s, dir)
      val cells = t.orders
        .join(t.customer.select(col("c_custkey").as("o_custkey"),
          col("c_nationkey").as("nk")), Seq("o_custkey"))
        .join(broadcast(t.nation.select(col("n_nationkey").as("nk"),
          col("n_regionkey").as("rk"))), Seq("nk"))
        .groupBy(col("rk"),
          substring(col("o_orderpriority"), 1, 1).cast("long").as("p"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // margin pass + chi2 pass
      val margR = cells.groupBy(col("rk")).agg(sum(col("c")).as("nr"))
      val margP = cells.groupBy(col("p")).agg(sum(col("c")).as("np_"))
      val tot = cells.agg(sum(col("c")).as("n"),
        countDistinct(col("rk")).as("r"), countDistinct(col("p")).as("k"))
      val chi2 = cells
        .join(margR, Seq("rk")).join(margP, Seq("p"))
        .crossJoin(broadcast(tot))
        .withColumn("e", col("nr").cast("double") * col("np_") / col("n"))
        .withColumn("term", round(
          (col("c") - col("e")) * (col("c") - col("e")) / col("e"), 9))
        .agg(sum(col("term").cast(DecimalType(38, 9))).as("x2"),
          max(col("n")).as("n"), max(col("r")).as("r"), max(col("k")).as("k"))
        .withColumn("chi2", round(col("x2").cast("double"), 6))
      chi2
        .withColumn("phi2", col("chi2") / col("n"))
        .withColumn("v_raw", round(sqrt(col("phi2")
          / least(col("r") - 1, col("k") - 1).cast("double")), 6))
        // Bergsma correction
        .withColumn("phi2c", greatest(lit(0.0), col("phi2")
          - (col("r") - 1).cast("double") * (col("k") - 1)
            / (col("n") - 1)))
        .withColumn("rc", col("r").cast("double")
          - (col("r") - 1).cast("double") * (col("r") - 1) / (col("n") - 1))
        .withColumn("kc", col("k").cast("double")
          - (col("k") - 1).cast("double") * (col("k") - 1) / (col("n") - 1))
        .withColumn("v_corrected", round(sqrt(col("phi2c")
          / least(col("rc") - 1, col("kc") - 1)), 6))
        .select(col("n").as("n_orders"), col("r").as("n_regions"),
          col("k").as("n_priorities"), col("chi2"), col("v_raw"),
          col("v_corrected"))
    },
    Some("""WITH cells AS (SELECT n.n_regionkey AS rk,
          CAST(substring(o.o_orderpriority, 1, 1) AS BIGINT) AS p,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM orders o
        JOIN customer cu ON cu.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = cu.c_nationkey
        GROUP BY 1, 2),
      margr AS (SELECT rk, CAST(SUM(c) AS BIGINT) AS nr
        FROM cells GROUP BY 1),
      margp AS (SELECT p, CAST(SUM(c) AS BIGINT) AS np_
        FROM cells GROUP BY 1),
      tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
          CAST(COUNT(DISTINCT rk) AS BIGINT) AS r,
          CAST(COUNT(DISTINCT p) AS BIGINT) AS k FROM cells),
      x2 AS (SELECT
          round(CAST(SUM(CAST(round((ce.c - CAST(mr.nr AS DOUBLE) * mp.np_
              / t.n) * (ce.c - CAST(mr.nr AS DOUBLE) * mp.np_ / t.n)
            / (CAST(mr.nr AS DOUBLE) * mp.np_ / t.n), 9) AS DECIMAL(38,9)))
            AS DOUBLE), 6) AS chi2,
          ANY_VALUE(t.n) AS n, ANY_VALUE(t.r) AS r, ANY_VALUE(t.k) AS k
        FROM cells ce
        JOIN margr mr ON mr.rk = ce.rk
        JOIN margp mp ON mp.p = ce.p, tot t),
      alg AS (SELECT *, chi2 / n AS phi2,
          GREATEST(0.0, chi2 / n - CAST(r - 1 AS DOUBLE) * (k - 1) / (n - 1))
            AS phi2c,
          CAST(r AS DOUBLE) - CAST(r - 1 AS DOUBLE) * (r - 1) / (n - 1) AS rc,
          CAST(k AS DOUBLE) - CAST(k - 1 AS DOUBLE) * (k - 1) / (n - 1) AS kc
        FROM x2)
      SELECT n AS n_orders, r AS n_regions, k AS n_priorities, chi2,
        round(sqrt(phi2 / CAST(LEAST(r - 1, k - 1) AS DOUBLE)), 6) AS v_raw,
        round(sqrt(phi2c / LEAST(rc - 1, kc - 1)), 6) AS v_corrected
      FROM alg"""))

  val all: Seq[QueryDef] = Seq(q463MantelHaenszel, q464StuartMaxwell,
    q465CramersV)
}
