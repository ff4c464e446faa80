package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Mondrian-conformal wave: GROUP-CONDITIONAL prediction intervals
  * (Vovk's Mondrian conformal; Romano et al.'s group-balanced variant)
  * — q243 computes a pooled split-conformal interval; this wave shows
  * why a pooled interval is not enough and repairs it. A pooled q̂
  * guarantees only *marginal* 1−α coverage: segments with wider error
  * distributions silently undercover. Calibrating one q̂ per segment
  * (the Mondrian taxonomy) restores the guarantee per group — the
  * fairness-flavored eval a production model audit actually needs.
  *
  * Scale shape: one lineitem aggregation to per-order features, one
  * single-row OLS fit (exact DECIMAL sums), one residual sort per
  * taxonomy cell (a partitioned window, not a global one), one test
  * pass — no driver loops.
  */
object ConformalOps {

  /** Pooled vs Mondrian split-conformal at α = 0.1 over order-priority
    * segments, predictor = pooled OLS of o_totalprice on line count fit
    * on the even-orderkey half. Per segment: the pooled q̂, the
    * segment's own q̂_g (the ⌈(n_g+1)(1−α)⌉-th smallest calibration
    * residual within the segment), and both interval families' test
    * coverage — pooled coverage scatters around 1−α per group, the
    * Mondrian column is the repaired, per-group-valid one. */
  val q396MondrianConformal: QueryDef = QueryDef(
    "q396_mondrian_conformal",
    (s, dir) => {
      val t = Tables(s, dir)
      val perOrder = t.lineitem.groupBy(col("l_orderkey").as("okey"))
        .agg(count(lit(1)).cast("long").as("x"))
        .join(t.orders.select(col("o_orderkey").as("okey"),
          col("o_orderpriority").as("segment"),
          col("o_totalprice").cast(DecimalType(18, 2)).as("y")), Seq("okey"))
        .withColumn("calib", pmod(col("okey"), lit(2L)) === 0)
      val fit = perOrder.where(col("calib"))
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          sum(col("y")).as("sy"),
          sum(col("y") * col("x").cast(DecimalType(18, 2))).as("sxy"))
        .withColumn("b", round((col("n") * col("sxy") - col("sx") * col("sy"))
          .cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"), 6))
        .withColumn("a", round((col("sy").cast("double") -
          col("b") * col("sx").cast("double")) / col("n"), 6))
        .select(col("a"), col("b"))
      val resid = perOrder.crossJoin(broadcast(fit))
        .withColumn("r", round(abs(col("y").cast("double") -
          col("a") - col("b") * col("x").cast("double")), 6))
        .select(col("okey"), col("segment"), col("calib"), col("r"))
        .localCheckpoint()
      val cal = resid.where(col("calib"))
      // pooled q-hat: global order statistic at ceil((n+1)·0.9) —
      // size-adaptive rank (r15), probe = the nPool already counted
      val nPool = cal.count()
      val kPool = math.min(nPool, math.ceil((nPool + 1) * 0.9).toLong)
      val qPool = Spine.adaptiveRank(cal, Seq(col("r"), col("okey")),
          rankCol = "rk", knownCount = nPool)
        .where(col("rk") === kPool)
        .select(col("r").as("qhat_pooled"))
      // Mondrian q-hat: the same order statistic within each segment
      val wSeg = Window.partitionBy(col("segment"))
        .orderBy(col("r"), col("okey"))
      val qSeg = cal
        .withColumn("n_g", count(lit(1)).over(
          Window.partitionBy(col("segment"))))
        .withColumn("rk", row_number().over(wSeg).cast("long"))
        .withColumn("k_g", least(col("n_g"),
          ceil((col("n_g") + 1) * 0.9).cast("long")))
        .where(col("rk") === col("k_g"))
        .select(col("segment"), col("n_g").as("n_cal_seg"),
          col("r").as("qhat_seg"))
      resid.where(!col("calib"))
        .join(broadcast(qSeg), Seq("segment"))
        .crossJoin(broadcast(qPool))
        .groupBy(col("segment"), col("n_cal_seg"), col("qhat_seg"),
          col("qhat_pooled"))
        .agg(count(lit(1)).cast("long").as("n_test"),
          sum(when(col("r") <= col("qhat_pooled"), 1L).otherwise(0L))
            .as("cov_pooled_n"),
          sum(when(col("r") <= col("qhat_seg"), 1L).otherwise(0L))
            .as("cov_mondrian_n"))
        .withColumn("cov_pooled",
          round(col("cov_pooled_n").cast("double") / col("n_test"), 6))
        .withColumn("cov_mondrian",
          round(col("cov_mondrian_n").cast("double") / col("n_test"), 6))
        .withColumn("mondrian_valid", col("cov_mondrian") >= 0.88)
        .select(col("segment"), col("n_cal_seg"), col("qhat_pooled"),
          col("qhat_seg"), col("n_test"), col("cov_pooled"),
          col("cov_mondrian"), col("mondrian_valid"))
        .orderBy(col("segment"))
    },
    Some("""WITH per AS (SELECT l_orderkey AS okey,
          CAST(COUNT(*) AS BIGINT) AS x
        FROM lineitem GROUP BY 1),
      po AS (SELECT p.okey, p.x, o.o_orderpriority AS segment,
          CAST(o.o_totalprice AS DECIMAL(18,2)) AS y,
          p.okey % 2 = 0 AS calib
        FROM per p JOIN orders o ON o.o_orderkey = p.okey),
      fit AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x * x) AS BIGINT) AS sxx,
          SUM(y) AS sy, SUM(y * CAST(x AS DECIMAL(18,2))) AS sxy
        FROM po WHERE calib),
      ab AS (SELECT n, sx, sy,
          round(CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS b
        FROM fit),
      ab2 AS (SELECT round((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE)) / n, 6)
          AS a, b FROM ab),
      resid AS (SELECT po.okey, po.segment, po.calib,
          round(abs(CAST(po.y AS DOUBLE) - ab2.a - ab2.b * CAST(po.x AS DOUBLE)), 6)
            AS r
        FROM po, ab2),
      cal AS (SELECT * FROM resid WHERE calib),
      np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pool FROM cal),
      qpool AS (SELECT r AS qhat_pooled FROM (
          SELECT r, ROW_NUMBER() OVER (ORDER BY r, okey) AS rk FROM cal)
        WHERE rk = (SELECT least(n_pool,
          CAST(ceil((n_pool + 1) * 0.9) AS BIGINT)) FROM np)),
      qseg AS (SELECT segment, n_g AS n_cal_seg, r AS qhat_seg FROM (
          SELECT segment, r,
            COUNT(*) OVER (PARTITION BY segment) AS n_g,
            ROW_NUMBER() OVER (PARTITION BY segment ORDER BY r, okey) AS rk
          FROM cal)
        WHERE rk = least(n_g, CAST(ceil((n_g + 1) * 0.9) AS BIGINT))),
      test AS (SELECT * FROM resid WHERE NOT calib)
      SELECT t.segment, q.n_cal_seg, p.qhat_pooled, q.qhat_seg,
        CAST(COUNT(*) AS BIGINT) AS n_test,
        round(CAST(SUM(CASE WHEN t.r <= p.qhat_pooled THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*), 6) AS cov_pooled,
        round(CAST(SUM(CASE WHEN t.r <= q.qhat_seg THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*), 6) AS cov_mondrian,
        round(CAST(SUM(CASE WHEN t.r <= q.qhat_seg THEN 1 ELSE 0 END)
          AS DOUBLE) / COUNT(*), 6) >= 0.88 AS mondrian_valid
      FROM test t JOIN qseg q ON q.segment = t.segment, qpool p
      GROUP BY 1, 2, 3, 4
      ORDER BY t.segment"""))

  val all: Seq[QueryDef] = Seq(q396MondrianConformal)
}
