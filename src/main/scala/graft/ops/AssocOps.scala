package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Association wave: partial correlations (q460), the ordinal
  * concordance family γ / Somers' D / τ-b (q461), and Theil's
  * uncertainty coefficient (q462) — three different answers to "how
  * are these columns related?": q460 removes the OTHER variables from
  * a Pearson correlation (the graphical-model edge weight plain
  * correlation q272/q412 can't give), q461 measures monotone
  * association between ORDINALS without any scores, q462 measures
  * asymmetric categorical predictability in bits.
  *
  * Determinism: q460 rides the q441 exact integer moments with
  * generated cofactor determinants on the 9-dp correlation matrix;
  * q461 is pure integer pair algebra on the (5×3) grid via 2-D suffix
  * sums — never an O(n²) pair join; q462's entropy terms round at 12
  * and sum as DECIMAL.
  *
  * Scale shape: one scan each to a model-sized census (15 moments / a
  * 15-cell grid), closed-form after.
  */
object AssocOps {

  import Leibniz.{det, minor}

  private val Vars = Seq("y", "x1", "x2", "x3")
  private val Names = Seq("price", "n_items", "sum_qty", "sum_disc_pts")

  // correlation-matrix entry names: diag 1.0, off-diag cXY (canonical)
  private def rname(i: Int, j: Int): String =
    if (i == j) "1.0" else if (i < j) s"c${i}$j" else s"c${j}$i"
  private val Rm: Seq[Seq[String]] =
    (0 to 3).map(i => (0 to 3).map(j => rname(i, j)))

  /** Pairwise Pearson vs partial correlations of (price, items,
    * quantity, discount points) — the partial removes the other two
    * via cofactors of the correlation matrix. */
  val q460PartialCorr: QueryDef = QueryDef(
    "q460_partial_corr",
    (s, dir) => {
      // centered second moments from the exact q441 moments; the raw
      // moment names there are (y, 1, 2, 3) with m_y suffixes
      val raw = Seq("my" -> "myy", "m1" -> "m11", "m2" -> "m22", "m3" -> "m33")
      def cm(i: Int, j: Int): String = {
        val f = Seq("my", "m1", "m2", "m3")
        val ss = (i, j) match {
          case (0, 0) => "myy"
          case (0, b) => s"m${b}y"
          case (a, b) if a <= b => s"m$a$b"
          case (a, b) => s"m$b$a"
        }
        s"($ss - ${f(i)} * ${f(j)} / mn)"
      }
      val corrCols = (for { i <- 0 to 3; j <- i + 1 to 3 } yield
        s"round(${cm(i, j)} / sqrt(${cm(i, i)} * ${cm(j, j)}), 9) AS c$i$j")
      val cofCols = (for { i <- 0 to 3; j <- 0 to 3 if i <= j } yield {
        val sign = if ((i + j) % 2 == 0) "" else "-"
        s"($sign${det(minor(Rm, i, j))}) AS k$i$j"
      })
      val pairs = for { i <- 0 to 3; j <- i + 1 to 3 } yield (i, j)
      val fit = RegressionOps.moments(RegressionOps.design(s, dir))
        .selectExpr(Seq("n") ++ corrCols: _*)
        .selectExpr(Seq("n") ++ (for { i <- 0 to 3; j <- i + 1 to 3 }
          yield s"c$i$j") ++ cofCols: _*)
      fit.select(col("n"), explode(array(pairs.map { case (i, j) =>
        struct(lit(Names(i)).as("var_a"), lit(Names(j)).as("var_b"),
          round(col(s"c$i$j"), 6).as("pearson"),
          expr(s"round(-k$i$j / sqrt(k$i$i * k$j$j), 6)").as("partial"))
      }: _*)).as("r"))
        .select(col("r.var_a").as("var_a"), col("r.var_b").as("var_b"),
          col("r.pearson").as("pearson"), col("r.partial").as("partial"),
          col("n"))
        .orderBy(col("var_a"), col("var_b"))
    },
    Some {
      def cm(i: Int, j: Int): String = {
        val f = Seq("my", "m1", "m2", "m3")
        val ss = (i, j) match {
          case (0, 0) => "myy"
          case (0, b) => s"m${b}y"
          case (a, b) if a <= b => s"m$a$b"
          case (a, b) => s"m$b$a"
        }
        s"($ss - ${f(i)} * ${f(j)} / mn)"
      }
      val corrCols = (for { i <- 0 to 3; j <- i + 1 to 3 } yield
        s"round(${cm(i, j)} / sqrt(${cm(i, i)} * ${cm(j, j)}), 9) AS c$i$j")
        .mkString(",\n          ")
      val cofCols = (for { i <- 0 to 3; j <- 0 to 3 if i <= j } yield {
        val sign = if ((i + j) % 2 == 0) "" else "-"
        s"($sign${det(minor(Rm, i, j))}) AS k$i$j"
      }).mkString(",\n          ")
      val rows = (for { i <- 0 to 3; j <- i + 1 to 3 } yield
        s"""SELECT '${Names(i)}' AS var_a, '${Names(j)}' AS var_b,
          round(c$i$j, 6) AS pearson,
          round(-k$i$j / sqrt(k$i$i * k$j$j), 6) AS partial, n FROM kf""")
        .mkString("\n        UNION ALL ")
      s"""WITH design AS (${RegressionOps.designSql}),
      m AS (${RegressionOps.momentsSql}),
      cf AS (SELECT n,
          $corrCols
        FROM m),
      kf AS (SELECT *,
          $cofCols
        FROM cf)
      $rows
      ORDER BY var_a, var_b"""
    })

  /** Ordinal concordance of priority score × value tercile: γ, both
    * Somers' D directions and Kendall τ-b from exact integer pair
    * counts via 2-D suffix sums on the 15-cell grid. */
  val q461OrdinalConcordance: QueryDef = QueryDef(
    "q461_ordinal_concordance",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("x"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
          col("o_orderkey").as("okey"))
        .localCheckpoint() // cutoffs + grid
      val nRow = o.agg(count(lit(1)).as("n"))
      // size-adaptive tercile-cut ranks (r15): window at bench scale,
      // spine above; the count probe scans the checkpointed frame
      val cuts = Spine.adaptiveRank(o, Seq(col("v"), col("okey")),
          rankCol = "r")
        .crossJoin(broadcast(nRow))
        .where(col("r") === expr("n div 3") || col("r") === expr("2 * n div 3"))
        .groupBy().agg(min(col("v")).as("c1"), max(col("v")).as("c2"))
      val grid = o.crossJoin(broadcast(cuts))
        .withColumn("y", when(col("v") <= col("c1"), 1L)
          .when(col("v") <= col("c2"), 2L).otherwise(3L))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // self-paired for the suffix masses
      val other = grid.select(col("x").as("x2"), col("y").as("y2"),
        col("c").as("c2_"))
      val paired = grid.crossJoin(other)
      val d38 = DecimalType(38, 0)
      val mom = paired.agg(
        sum(when(col("x2") > col("x") && col("y2") > col("y"),
          col("c") * col("c2_")).otherwise(0L).cast(d38)).as("conc"),
        sum(when(col("x2") > col("x") && col("y2") < col("y"),
          col("c") * col("c2_")).otherwise(0L).cast(d38)).as("disc"))
      val margins = grid.groupBy(col("x")).agg(sum(col("c")).as("nx"))
        .agg(sum(col("nx")).as("n"),
          sum((col("nx") * (col("nx") - 1)).cast(d38)).as("tx2"))
      val marginsY = grid.groupBy(col("y")).agg(sum(col("c")).as("ny"))
        .agg(sum((col("ny") * (col("ny") - 1)).cast(d38)).as("ty2"))
      mom.crossJoin(broadcast(margins)).crossJoin(broadcast(marginsY))
        .withColumn("cc", col("conc").cast("double"))
        .withColumn("dd", col("disc").cast("double"))
        .withColumn("p2", (col("n") * (col("n") - 1)).cast("double"))
        .withColumn("gamma", round(
          (col("cc") - col("dd")) / (col("cc") + col("dd")), 6))
        .withColumn("somers_d_yx", round((col("cc") - col("dd"))
          / ((col("p2") - col("tx2").cast("double")) / 2), 6))
        .withColumn("somers_d_xy", round((col("cc") - col("dd"))
          / ((col("p2") - col("ty2").cast("double")) / 2), 6))
        .withColumn("tau_b", round((col("cc") - col("dd"))
          / sqrt(((col("p2") - col("tx2").cast("double")) / 2)
            * ((col("p2") - col("ty2").cast("double")) / 2)), 6))
        .select(col("n").as("n_orders"),
          col("conc").cast("long").as("concordant"),
          col("disc").cast("long").as("discordant"),
          col("gamma"), col("somers_d_yx"), col("somers_d_xy"), col("tau_b"))
    },
    Some("""WITH o AS MATERIALIZED (SELECT
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS x,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v, o_orderkey AS okey
        FROM orders),
      nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
      cuts AS (SELECT MIN(v) AS c1, MAX(v) AS c2 FROM (SELECT o.v,
          ROW_NUMBER() OVER (ORDER BY o.v, o.okey) AS r, nr.n
        FROM o, nrow nr) WHERE r = n // 3 OR r = 2 * n // 3),
      grid AS MATERIALIZED (SELECT o.x,
          CASE WHEN o.v <= c.c1 THEN 1
            WHEN o.v <= c.c2 THEN 2 ELSE 3 END AS y,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM o, cuts c GROUP BY 1, 2),
      mom AS (SELECT
          SUM(CASE WHEN b.x > a.x AND b.y > a.y
            THEN CAST(a.c * b.c AS DECIMAL(38,0))
            ELSE CAST(0 AS DECIMAL(38,0)) END) AS conc,
          SUM(CASE WHEN b.x > a.x AND b.y < a.y
            THEN CAST(a.c * b.c AS DECIMAL(38,0))
            ELSE CAST(0 AS DECIMAL(38,0)) END) AS disc
        FROM grid a, grid b),
      margx AS (SELECT CAST(SUM(nx) AS BIGINT) AS n,
          SUM(CAST(nx * (nx - 1) AS DECIMAL(38,0))) AS tx2
        FROM (SELECT x, CAST(SUM(c) AS BIGINT) AS nx FROM grid GROUP BY 1)),
      margy AS (SELECT SUM(CAST(ny * (ny - 1) AS DECIMAL(38,0))) AS ty2
        FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS ny FROM grid GROUP BY 1)),
      alg AS (SELECT m.*, x.n, x.tx2, y.ty2,
          CAST(m.conc AS DOUBLE) AS cc, CAST(m.disc AS DOUBLE) AS dd,
          CAST(x.n * (x.n - 1) AS DOUBLE) AS p2
        FROM mom m, margx x, margy y)
      SELECT n AS n_orders, CAST(conc AS BIGINT) AS concordant,
        CAST(disc AS BIGINT) AS discordant,
        round((cc - dd) / (cc + dd), 6) AS gamma,
        round((cc - dd) / ((p2 - CAST(tx2 AS DOUBLE)) / 2), 6) AS somers_d_yx,
        round((cc - dd) / ((p2 - CAST(ty2 AS DOUBLE)) / 2), 6) AS somers_d_xy,
        round((cc - dd) / sqrt(((p2 - CAST(tx2 AS DOUBLE)) / 2)
          * ((p2 - CAST(ty2 AS DOUBLE)) / 2)), 6) AS tau_b
      FROM alg"""))

  /** Theil's uncertainty coefficients between priority and value
    * tercile: H(X), H(Y), mutual information and both U directions,
    * all in nats from exact cell counts. */
  val q462TheilsU: QueryDef = QueryDef(
    "q462_theils_u",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("x"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("v"),
          col("o_orderkey").as("okey"))
        .localCheckpoint()
      val nRow = o.agg(count(lit(1)).as("n"))
      // size-adaptive tercile-cut ranks (r15): window at bench scale,
      // spine above; the count probe scans the checkpointed frame
      val cuts = Spine.adaptiveRank(o, Seq(col("v"), col("okey")),
          rankCol = "r")
        .crossJoin(broadcast(nRow))
        .where(col("r") === expr("n div 3") || col("r") === expr("2 * n div 3"))
        .groupBy().agg(min(col("v")).as("c1"), max(col("v")).as("c2"))
      val grid = o.crossJoin(broadcast(cuts))
        .withColumn("y", when(col("v") <= col("c1"), 1L)
          .when(col("v") <= col("c2"), 2L).otherwise(3L))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(nRow))
        .localCheckpoint() // three entropy passes
      val d12 = DecimalType(38, 12)
      def ent(df: org.apache.spark.sql.DataFrame, cCol: String) = df
        .withColumn("p", col(cCol).cast("double") / col("n"))
        .agg(sum(round(-col("p") * log(col("p")), 12).cast(d12)).as("h"))
        .select(col("h").cast("double").as("h"))
      val hxy = ent(grid, "c")
      val hx = ent(grid.groupBy(col("x"), col("n"))
        .agg(sum(col("c")).as("cx")), "cx")
      val hy = ent(grid.groupBy(col("y"), col("n"))
        .agg(sum(col("c")).as("cy")), "cy")
      hx.select(col("h").as("h_x"))
        .crossJoin(broadcast(hy.select(col("h").as("h_y"))))
        .crossJoin(broadcast(hxy.select(col("h").as("h_xy"))))
        .crossJoin(broadcast(nRow))
        .withColumn("mi", col("h_x") + col("h_y") - col("h_xy"))
        .select(col("n").as("n_orders"),
          round(col("h_x"), 6).as("h_x"), round(col("h_y"), 6).as("h_y"),
          round(col("mi"), 6).as("mutual_info"),
          round(col("mi") / col("h_y"), 6).as("u_y_given_x"),
          round(col("mi") / col("h_x"), 6).as("u_x_given_y"))
    },
    Some("""WITH o AS MATERIALIZED (SELECT
          CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS x,
          CAST(o_totalprice AS DECIMAL(18,2)) AS v, o_orderkey AS okey
        FROM orders),
      nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
      cuts AS (SELECT MIN(v) AS c1, MAX(v) AS c2 FROM (SELECT o.v,
          ROW_NUMBER() OVER (ORDER BY o.v, o.okey) AS r, nr.n
        FROM o, nrow nr) WHERE r = n // 3 OR r = 2 * n // 3),
      grid AS MATERIALIZED (SELECT o.x,
          CASE WHEN o.v <= c.c1 THEN 1
            WHEN o.v <= c.c2 THEN 2 ELSE 3 END AS y,
          CAST(COUNT(*) AS BIGINT) AS c
        FROM o, cuts c GROUP BY 1, 2),
      hxy AS (SELECT CAST(SUM(CAST(round(
            -(CAST(g.c AS DOUBLE) / nr.n) * ln(CAST(g.c AS DOUBLE) / nr.n),
            12) AS DECIMAL(38,12))) AS DOUBLE) AS h
        FROM grid g, nrow nr),
      hx AS (SELECT CAST(SUM(CAST(round(
            -(CAST(cx AS DOUBLE) / n) * ln(CAST(cx AS DOUBLE) / n),
            12) AS DECIMAL(38,12))) AS DOUBLE) AS h
        FROM (SELECT g.x, nr.n, CAST(SUM(g.c) AS BIGINT) AS cx
          FROM grid g, nrow nr GROUP BY 1, 2)),
      hy AS (SELECT CAST(SUM(CAST(round(
            -(CAST(cy AS DOUBLE) / n) * ln(CAST(cy AS DOUBLE) / n),
            12) AS DECIMAL(38,12))) AS DOUBLE) AS h
        FROM (SELECT g.y, nr.n, CAST(SUM(g.c) AS BIGINT) AS cy
          FROM grid g, nrow nr GROUP BY 1, 2))
      SELECT nr.n AS n_orders,
        round(hx.h, 6) AS h_x, round(hy.h, 6) AS h_y,
        round(hx.h + hy.h - hxy.h, 6) AS mutual_info,
        round((hx.h + hy.h - hxy.h) / hy.h, 6) AS u_y_given_x,
        round((hx.h + hy.h - hxy.h) / hx.h, 6) AS u_x_given_y
      FROM hx, hy, hxy, nrow nr"""))

  val all: Seq[QueryDef] = Seq(q460PartialCorr, q461OrdinalConcordance,
    q462TheilsU)
}
