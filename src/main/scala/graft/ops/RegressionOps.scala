package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Multiple-regression wave: the full OLS table (q441), collinearity
  * diagnostics (q442 VIF) and heteroskedasticity (q443 Breusch–Pagan)
  * over one shared design — per-order spend regressed on item count,
  * total quantity and discount points. q125's per-group OLS is the
  * simple (one-regressor) member; this is the p = 3 + intercept member
  * solved by Cramer's rule on the exact X'X moments.
  *
  * Determinism: the design is integerized (spend in cents, quantity as
  * BIGINT, discount as 0–10 points), so every X'X / X'y entry is an
  * exact integer DECIMAL(38,0) sum. The 4×4/3×3 determinants are
  * GENERATED Leibniz expansions — one permutation list renders the
  * identical expression text into both the Spark plan (via expr) and
  * the DuckDB oracle, so even the floating-point summation order is
  * shared. Coefficients round at 9 dp before any reuse.
  *
  * Scale shape: one lineitem scan to per-order features, one orders
  * join, one 15-moment aggregation; everything downstream is a 1-row
  * frame. Breusch–Pagan adds a second scan for the squared-residual
  * moments against a 1-row fit broadcast.
  */
object RegressionOps {

  // generated Leibniz determinants (identical text in both dialects) —
  // shared with the PACF/Granger members of the family
  import Leibniz.{det, replaceCol, minor}

  private val A = Seq(
    Seq("mn", "m1", "m2", "m3"),
    Seq("m1", "m11", "m12", "m13"),
    Seq("m2", "m12", "m22", "m23"),
    Seq("m3", "m13", "m23", "m33"))
  private val detA = det(A)

  private def betaExprs(b: Seq[String]): Seq[String] =
    (0 to 3).map(j => s"round(${det(replaceCol(A, j, b))} / $detA, 9)")

  private val cofExprs: Seq[String] = (0 to 3).map(j => det(minor(A, j, j)))

  /** Shared per-order design: y (cents), x1 = items, x2 = Σquantity,
    * x3 = Σ(discount points). */
  private[ops] def design(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val li = t.lineitem.groupBy(col("l_orderkey").as("ok"))
      .agg(count(lit(1)).as("x1"),
        sum(col("l_quantity").cast("long")).as("x2"),
        sum(round(col("l_discount") * 100).cast("long")).as("x3"))
    t.orders
      .select(col("o_orderkey").as("ok"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(DecimalType(18, 0)).cast("long").as("y"))
      .join(li, Seq("ok"))
  }

  private[ops] val designSql = """SELECT o.o_orderkey AS ok,
          CAST(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
            AS DECIMAL(18,0)) AS BIGINT) AS y,
          l.x1, l.x2, l.x3
        FROM orders o JOIN (SELECT l_orderkey,
            CAST(COUNT(*) AS BIGINT) AS x1,
            SUM(CAST(l_quantity AS BIGINT)) AS x2,
            SUM(CAST(round(l_discount * 100) AS BIGINT)) AS x3
          FROM lineitem GROUP BY 1) l ON l.l_orderkey = o.o_orderkey"""

  /** Exact integer moments → 1-row frame of doubles named exactly as the
    * determinant entries expect. */
  private[ops] def moments(d: DataFrame): DataFrame = {
    val d38 = DecimalType(38, 0)
    d.agg(
      count(lit(1)).as("rn"),
      sum(col("x1").cast(d38)).as("r1"),
      sum(col("x2").cast(d38)).as("r2_"),
      sum(col("x3").cast(d38)).as("r3"),
      sum((col("x1") * col("x1")).cast(d38)).as("r11"),
      sum((col("x1") * col("x2")).cast(d38)).as("r12"),
      sum((col("x1") * col("x3")).cast(d38)).as("r13"),
      sum((col("x2") * col("x2")).cast(d38)).as("r22"),
      sum((col("x2") * col("x3")).cast(d38)).as("r23"),
      sum((col("x3") * col("x3")).cast(d38)).as("r33"),
      sum(col("y").cast(d38)).as("ry"),
      sum((col("x1") * col("y")).cast(d38)).as("r1y"),
      sum((col("x2") * col("y")).cast(d38)).as("r2y"),
      sum((col("x3") * col("y")).cast(d38)).as("r3y"),
      sum((col("y").cast(DecimalType(19, 0)) *
        col("y").cast(DecimalType(19, 0))).cast(d38)).as("ryy"))
      .select(col("rn").cast("long").as("n"),
        col("rn").cast("double").as("mn"),
        col("r1").cast("double").as("m1"), col("r2_").cast("double").as("m2"),
        col("r3").cast("double").as("m3"), col("r11").cast("double").as("m11"),
        col("r12").cast("double").as("m12"), col("r13").cast("double").as("m13"),
        col("r22").cast("double").as("m22"), col("r23").cast("double").as("m23"),
        col("r33").cast("double").as("m33"), col("ry").cast("double").as("my"),
        col("r1y").cast("double").as("m1y"), col("r2y").cast("double").as("m2y"),
        col("r3y").cast("double").as("m3y"), col("ryy").cast("double").as("myy"))
  }

  private[ops] val momentsSql = s"""SELECT CAST(COUNT(*) AS BIGINT) AS n,
        CAST(COUNT(*) AS DOUBLE) AS mn,
        CAST(SUM(CAST(x1 AS DECIMAL(38,0))) AS DOUBLE) AS m1,
        CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DOUBLE) AS m2,
        CAST(SUM(CAST(x3 AS DECIMAL(38,0))) AS DOUBLE) AS m3,
        CAST(SUM(CAST(x1 * x1 AS DECIMAL(38,0))) AS DOUBLE) AS m11,
        CAST(SUM(CAST(x1 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS m12,
        CAST(SUM(CAST(x1 * x3 AS DECIMAL(38,0))) AS DOUBLE) AS m13,
        CAST(SUM(CAST(x2 * x2 AS DECIMAL(38,0))) AS DOUBLE) AS m22,
        CAST(SUM(CAST(x2 * x3 AS DECIMAL(38,0))) AS DOUBLE) AS m23,
        CAST(SUM(CAST(x3 * x3 AS DECIMAL(38,0))) AS DOUBLE) AS m33,
        CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DOUBLE) AS my,
        CAST(SUM(CAST(x1 * y AS DECIMAL(38,0))) AS DOUBLE) AS m1y,
        CAST(SUM(CAST(x2 * y AS DECIMAL(38,0))) AS DOUBLE) AS m2y,
        CAST(SUM(CAST(x3 * y AS DECIMAL(38,0))) AS DOUBLE) AS m3y,
        CAST(SUM(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
          AS DOUBLE) AS myy
      FROM design"""

  private val bY = betaExprs(Seq("my", "m1y", "m2y", "m3y"))
  private val fitCols = Seq(
    s"${bY(0)} AS b0", s"${bY(1)} AS b1", s"${bY(2)} AS b2",
    s"${bY(3)} AS b3", s"$detA AS deta",
    s"${cofExprs(0)} AS c0", s"${cofExprs(1)} AS c1",
    s"${cofExprs(2)} AS c2", s"${cofExprs(3)} AS c3")

  /** Full OLS table for spend-in-cents on (items, quantity, discount
    * points): per-coefficient estimate (dollars), SE, t, plus shared
    * R², adjusted R². Solved by generated Cramer expansions on exact
    * integer moments. */
  val q441MultipleRegression: QueryDef = QueryDef(
    "q441_multiple_regression",
    (s, dir) => {
      val fit = moments(design(s, dir))
        .selectExpr(Seq("*") ++ fitCols: _*)
        .selectExpr("*",
          "(myy - b0*my - b1*m1y - b2*m2y - b3*m3y) AS sse",
          "(myy - my*my/mn) AS sst")
        .selectExpr("*",
          "round(1.0 - sse/sst, 6) AS r2",
          "round(1.0 - (sse/sst) * (mn - 1) / (mn - 4), 6) AS adj_r2",
          "(sse / (mn - 4)) AS s2hat")
      val coefs = Seq(("intercept", "b0", "c0"), ("n_items", "b1", "c1"),
        ("sum_qty", "b2", "c2"), ("sum_disc_pts", "b3", "c3"))
      fit.select(col("n"), col("r2"), col("adj_r2"),
        explode(array(coefs.map { case (nm, b, c) =>
          struct(lit(nm).as("coef"),
            round(col(b) / 100, 6).as("beta"),
            round(sqrt(col("s2hat") * col(c) / col("deta")) / 100, 6)
              .as("se"),
            round(col(b) / sqrt(col("s2hat") * col(c) / col("deta")), 4)
              .as("t_stat"))
        }: _*)).as("r"))
        .select(col("r.coef").as("coef"), col("r.beta").as("beta"),
          col("r.se").as("se"), col("r.t_stat").as("t_stat"),
          col("r2"), col("adj_r2"), col("n"))
        .orderBy(col("coef"))
    },
    Some {
      val rows = Seq(("intercept", "b0", "c0"), ("n_items", "b1", "c1"),
        ("sum_qty", "b2", "c2"), ("sum_disc_pts", "b3", "c3"))
        .map { case (nm, b, c) =>
          s"""SELECT '$nm' AS coef, round($b / 100, 6) AS beta,
            round(sqrt(s2hat * $c / deta) / 100, 6) AS se,
            round($b / sqrt(s2hat * $c / deta), 4) AS t_stat,
            r2, adj_r2, n FROM fit2"""
        }.mkString("\n        UNION ALL ")
      s"""WITH design AS ($designSql),
      m AS ($momentsSql),
      fit AS (SELECT *, ${fitCols.mkString(",\n          ")} FROM m),
      fit1 AS (SELECT *,
          (myy - b0*my - b1*m1y - b2*m2y - b3*m3y) AS sse,
          (myy - my*my/mn) AS sst FROM fit),
      fit2 AS (SELECT *, round(1.0 - sse/sst, 6) AS r2,
          round(1.0 - (sse/sst) * (mn - 1) / (mn - 4), 6) AS adj_r2,
          (sse / (mn - 4)) AS s2hat FROM fit1)
      $rows
      ORDER BY coef"""
    })

  // aux 3×3 systems for the VIF of each regressor on the other two
  private def auxSystem(j: Int): (Seq[Seq[String]], Seq[String], String, String) = {
    // regress xj on intercept + the other two regressors
    val names = Seq("1", "2", "3")
    val others = names.filter(_ != names(j - 1))
    def mm(a: String, b: String) =
      if (a == "0" && b == "0") "mn"
      else if (a == "0") s"m$b" else if (b == "0") s"m$a"
      else if (a <= b) s"m$a$b" else s"m$b$a"
    val vars = Seq("0") ++ others
    val mat = vars.map(a => vars.map(b => mm(a, b)))
    val rhs = vars.map(a => mm(a, names(j - 1)))
    (mat, rhs, s"m${names(j - 1)}${names(j - 1)}", s"m${names(j - 1)}")
  }

  /** Variance-inflation factors and standardized coefficients: each
    * regressor regressed on the other two (3×3 Cramer), VIF = 1/(1−R²),
    * plus β·sd(x)/sd(y) from the main fit. */
  val q442Vif: QueryDef = QueryDef(
    "q442_vif",
    (s, dir) => {
      val aux = (1 to 3).map { j =>
        val (mat, rhs, sjj, sj) = auxSystem(j)
        val dA = det(mat)
        val g = (0 to 2).map(i => s"round(${det(replaceCol(mat, i, rhs))} / $dA, 9)")
        val sse = s"($sjj - ${g(0)}*$sj - ${g(1)}*${rhs(1)} - ${g(2)}*${rhs(2)})"
        val sst = s"($sjj - $sj*$sj/mn)"
        (s"round(1.0 - $sse/$sst, 6)",
          s"round(sqrt(($sjj/mn - ($sj/mn)*($sj/mn)) / (myy/mn - (my/mn)*(my/mn))), 12)")
      }
      val fit = moments(design(s, dir))
        .selectExpr(Seq("*") ++ fitCols.take(4): _*)
      val rows = Seq("n_items", "sum_qty", "sum_disc_pts").zipWithIndex
        .map { case (nm, i) =>
          val (r2e, sdRatio) = aux(i)
          struct(lit(nm).as("feature"),
            expr(r2e).as("r2_aux"),
            expr(s"round(1.0 / (1.0 - $r2e), 6)").as("vif"),
            expr(s"round(b${i + 1} * $sdRatio, 6)").as("beta_std"))
        }
      fit.select(col("n"), explode(array(rows: _*)).as("r"))
        .select(col("r.feature").as("feature"), col("r.r2_aux").as("r2_aux"),
          col("r.vif").as("vif"), col("r.beta_std").as("beta_std"), col("n"))
        .orderBy(col("feature"))
    },
    Some {
      val aux = (1 to 3).map { j =>
        val (mat, rhs, sjj, sj) = auxSystem(j)
        val dA = det(mat)
        val g = (0 to 2).map(i => s"round(${det(replaceCol(mat, i, rhs))} / $dA, 9)")
        val sse = s"($sjj - ${g(0)}*$sj - ${g(1)}*${rhs(1)} - ${g(2)}*${rhs(2)})"
        val sst = s"($sjj - $sj*$sj/mn)"
        (s"round(1.0 - $sse/$sst, 6)",
          s"round(sqrt(($sjj/mn - ($sj/mn)*($sj/mn)) / (myy/mn - (my/mn)*(my/mn))), 12)")
      }
      val rows = Seq("n_items", "sum_qty", "sum_disc_pts").zipWithIndex
        .map { case (nm, i) =>
          val (r2e, sdRatio) = aux(i)
          s"""SELECT '$nm' AS feature, $r2e AS r2_aux,
            round(1.0 / (1.0 - $r2e), 6) AS vif,
            round(b${i + 1} * $sdRatio, 6) AS beta_std, n FROM fit"""
        }.mkString("\n        UNION ALL ")
      s"""WITH design AS ($designSql),
      m AS ($momentsSql),
      fit AS (SELECT *, ${fitCols.take(4).mkString(",\n          ")} FROM m)
      $rows
      ORDER BY feature"""
    })

  private val bU = betaExprs(Seq("mu_", "m1u", "m2u", "m3u"))

  /** Breusch–Pagan heteroskedasticity test: squared OLS residuals
    * regressed back on the design; BP = n·R²_aux ~ χ²₃. */
  val q443BreuschPagan: QueryDef = QueryDef(
    "q443_breusch_pagan",
    (s, dir) => {
      val d = design(s, dir).localCheckpoint() // moment pass + residual pass
      val fit = moments(d).selectExpr(Seq("*") ++ fitCols.take(4): _*)
      val d38 = DecimalType(38, 0)
      val resid = d.crossJoin(broadcast(
          fit.select(col("b0"), col("b1"), col("b2"), col("b3"))))
        .withColumn("e", col("y").cast("double") - col("b0")
          - col("b1") * col("x1") - col("b2") * col("x2")
          - col("b3") * col("x3"))
        .withColumn("u", round(col("e") * col("e")).cast("long"))
      val umom = resid.agg(
        sum(col("u").cast(d38)).as("ru"),
        sum((col("x1") * col("u")).cast(d38)).as("r1u"),
        sum((col("x2") * col("u")).cast(d38)).as("r2u"),
        sum((col("x3") * col("u")).cast(d38)).as("r3u"),
        sum((col("u").cast(DecimalType(19, 0)) *
          col("u").cast(DecimalType(19, 0))).cast(d38)).as("ruu"))
        .select(col("ru").cast("double").as("mu_"),
          col("r1u").cast("double").as("m1u"),
          col("r2u").cast("double").as("m2u"),
          col("r3u").cast("double").as("m3u"),
          col("ruu").cast("double").as("muu"))
      moments(d).crossJoin(broadcast(umom))
        .selectExpr("*",
          s"${bU(0)} AS g0", s"${bU(1)} AS g1",
          s"${bU(2)} AS g2", s"${bU(3)} AS g3")
        .selectExpr("n",
          "round(1.0 - (muu - g0*mu_ - g1*m1u - g2*m2u - g3*m3u) / (muu - mu_*mu_/mn), 6) AS r2_aux",
          "round(mn * round(1.0 - (muu - g0*mu_ - g1*m1u - g2*m2u - g3*m3u) / (muu - mu_*mu_/mn), 6), 6) AS bp_stat")
        .select(col("n"), col("r2_aux"), col("bp_stat"),
          lit(3L).as("df"),
          (col("bp_stat") > 7.814727903251179).as("reject_5pct"))
    },
    Some {
      s"""WITH design AS ($designSql),
      m AS ($momentsSql),
      fit AS (SELECT *, ${fitCols.take(4).mkString(",\n          ")} FROM m),
      resid AS (SELECT d.*, CAST(round(
          (CAST(d.y AS DOUBLE) - f.b0 - f.b1 * d.x1 - f.b2 * d.x2
            - f.b3 * d.x3)
          * (CAST(d.y AS DOUBLE) - f.b0 - f.b1 * d.x1 - f.b2 * d.x2
            - f.b3 * d.x3)) AS BIGINT) AS u
        FROM design d, fit f),
      um AS (SELECT
          CAST(SUM(CAST(u AS DECIMAL(38,0))) AS DOUBLE) AS mu_,
          CAST(SUM(CAST(x1 * u AS DECIMAL(38,0))) AS DOUBLE) AS m1u,
          CAST(SUM(CAST(x2 * u AS DECIMAL(38,0))) AS DOUBLE) AS m2u,
          CAST(SUM(CAST(x3 * u AS DECIMAL(38,0))) AS DOUBLE) AS m3u,
          CAST(SUM(CAST(u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0)))
            AS DOUBLE) AS muu
        FROM resid),
      alg AS (SELECT m.*, um.*,
          ${bU(0)} AS g0, ${bU(1)} AS g1, ${bU(2)} AS g2, ${bU(3)} AS g3
        FROM m, um)
      SELECT n,
        round(1.0 - (muu - g0*mu_ - g1*m1u - g2*m2u - g3*m3u)
          / (muu - mu_*mu_/mn), 6) AS r2_aux,
        round(mn * round(1.0 - (muu - g0*mu_ - g1*m1u - g2*m2u - g3*m3u)
          / (muu - mu_*mu_/mn), 6), 6) AS bp_stat,
        CAST(3 AS BIGINT) AS df,
        (round(mn * round(1.0 - (muu - g0*mu_ - g1*m1u - g2*m2u - g3*m3u)
          / (muu - mu_*mu_/mn), 6), 6) > 7.814727903251179) AS reject_5pct
      FROM alg"""
    })

  val all: Seq[QueryDef] = Seq(q441MultipleRegression, q442Vif, q443BreuschPagan)
}
