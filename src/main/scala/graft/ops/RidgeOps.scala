package graft.ops

import org.apache.spark.sql.functions._

/** Ridge regression path (Hoerl & Kennard 1970) — the L2-regularized
  * fit of daily revenue on (order count, distinct customers), solved in
  * CLOSED FORM over a λ sweep: b(λ) = (S + λ'I)⁻¹ s_y on the centered
  * scatter matrix, where the 2×2 inverse is the adjugate formula. Shows
  * the coefficient-shrinkage path every tabular-ML pipeline inspects
  * before picking a regularizer (reference: overseer's arbitrary
  * handler fns, src/overseer/executor.clj:12-39; the q125/q443 OLS family's
  * regularized sibling).
  *
  * Scale shape: ONE corpus scan to the calendar-bounded daily frame;
  * the scatter matrix is a 1-row aggregate of exact integer sums; the
  * λ sweep is a 3-row fan-out over that single row. Nothing data-sized
  * past the first hash-agg.
  *
  * Exactness: the scatter matrix uses the n-scaled centering identity
  * S_ij = n·Σx_ix_j − Σx_iΣx_j (all BIGINT, no rational means), λ is
  * applied in the same n²-units (λ' = λ·n², documented contract), and
  * each coefficient is ONE float division of exact integers —
  * cross-engine deterministic. BIGINT headroom: kilodollar y keeps
  * n·Σxy under 2⁶³ at sf100 (the q484 discipline).
  */
object RidgeOps {

  private val Lambdas = Seq(0L, 1L, 10L)

  val q525RidgePath: QueryDef = QueryDef(
    "q525_ridge_path",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("x1"),
          countDistinct(col("o_custkey")).as("x2"),
          expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
            "DIV 100000").as("y"))
      val sums = daily.agg(
        count(lit(1)).as("n"),
        sum(col("x1")).as("t1"), sum(col("x2")).as("t2"), sum(col("y")).as("ty"),
        sum(col("x1") * col("x1")).as("s11r"),
        sum(col("x1") * col("x2")).as("s12r"),
        sum(col("x2") * col("x2")).as("s22r"),
        sum(col("x1") * col("y")).as("sy1r"),
        sum(col("x2") * col("y")).as("sy2r"))
      val scat = sums.select(col("n"),
        (col("n") * col("s11r") - col("t1") * col("t1")).as("s11"),
        (col("n") * col("s12r") - col("t1") * col("t2")).as("s12"),
        (col("n") * col("s22r") - col("t2") * col("t2")).as("s22"),
        (col("n") * col("sy1r") - col("t1") * col("ty")).as("sy1"),
        (col("n") * col("sy2r") - col("t2") * col("ty")).as("sy2"))
      val lam = s.createDataFrame(Lambdas.map(Tuple1(_))).toDF("lambda")
      broadcast(lam).join(scat, lit(true))
        .select(col("lambda"),
          ((col("s22") + col("lambda") * col("n") * col("n")).cast("double") * col("sy1") -
            col("s12").cast("double") * col("sy2")).as("num1"),
          ((col("s11") + col("lambda") * col("n") * col("n")).cast("double") * col("sy2") -
            col("s12").cast("double") * col("sy1")).as("num2"),
          ((col("s11") + col("lambda") * col("n") * col("n")).cast("double") *
            (col("s22") + col("lambda") * col("n") * col("n")) -
            col("s12").cast("double") * col("s12")).as("det"))
        .select(col("lambda"),
          round(col("num1") / col("det"), 9).as("b1"),
          round(col("num2") / col("det"), 9).as("b2"))
    },
    Some(s"""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS x1,
          CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS x2,
          CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // 100000 AS BIGINT) AS y
        FROM orders GROUP BY 1),
      sums AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x1) AS BIGINT) AS t1, CAST(SUM(x2) AS BIGINT) AS t2,
          CAST(SUM(y) AS BIGINT) AS ty,
          CAST(SUM(x1 * x1) AS BIGINT) AS s11r,
          CAST(SUM(x1 * x2) AS BIGINT) AS s12r,
          CAST(SUM(x2 * x2) AS BIGINT) AS s22r,
          CAST(SUM(x1 * y) AS BIGINT) AS sy1r,
          CAST(SUM(x2 * y) AS BIGINT) AS sy2r
        FROM daily),
      scat AS (
        SELECT n,
          n * s11r - t1 * t1 AS s11, n * s12r - t1 * t2 AS s12,
          n * s22r - t2 * t2 AS s22,
          n * sy1r - t1 * ty AS sy1, n * sy2r - t2 * ty AS sy2
        FROM sums),
      lam AS (SELECT CAST(unnest([${Lambdas.mkString(", ")}]) AS BIGINT)
        AS lambda)
      SELECT lambda,
        round((CAST(s22 + lambda * n * n AS DOUBLE) * sy1 -
          CAST(s12 AS DOUBLE) * sy2) /
          (CAST(s11 + lambda * n * n AS DOUBLE) * (s22 + lambda * n * n) -
            CAST(s12 AS DOUBLE) * s12), 9) AS b1,
        round((CAST(s11 + lambda * n * n AS DOUBLE) * sy2 -
          CAST(s12 AS DOUBLE) * sy1) /
          (CAST(s11 + lambda * n * n AS DOUBLE) * (s22 + lambda * n * n) -
            CAST(s12 AS DOUBLE) * s12), 9) AS b2
      FROM lam CROSS JOIN scat"""))

  val all: Seq[QueryDef] = Seq(q525RidgePath)
}
