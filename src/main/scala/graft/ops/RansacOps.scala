package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** RANSAC wave: robust line fit of the daily-revenue trend by random
  * sample consensus — the high-breakdown member of the trend family
  * (q125 OLS breaks at one outlier, q254 Theil–Sen survives 29%,
  * RANSAC survives any inlier majority). 32 md5-seeded point pairs
  * propose lines, each is scored by its MAD-banded inlier count, the
  * best consensus set is refit by exact-decimal OLS.
  *
  * Determinism: candidate indices are md5-derived (the q29/q136
  * seeding idiom, reproduced bit-for-bit in both engines); the inlier
  * band is 3·MAD with both medians exact rank-selects; the refit uses
  * the q440 exact-moment normal equations.
  *
  * Scale shape: one scan to the daily census; 32 candidate lines ride
  * one rank equi-join; scoring is census × 32 (a bounded broadcast);
  * the refit is one more pass.
  */
object RansacOps {

  import graft.functions.VectorFunctions.md5Long

  private val Cands = 32

  /** RANSAC line fit of daily revenue vs day index: best candidate,
    * consensus size, the refit slope/intercept, and the all-points OLS
    * slope for contrast. */
  val q455Ransac: QueryDef = QueryDef(
    "q455_ransac",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
          .as("t"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).as("v"))
        .withColumn("rk",
          (row_number().over(Window.orderBy(col("t"))) - 1).cast("long"))
        .localCheckpoint() // medians + candidates + scoring + refit
      val nRow = daily.agg(count(lit(1)).as("n"))
      // exact 3·MAD inlier band from two rank-selected medians
      val medY = daily
        .withColumn("r", row_number().over(Window.orderBy(col("v"), col("t"))))
        .crossJoin(broadcast(nRow))
        .where(col("r") === expr("(n + 1) div 2"))
        .select(col("v").as("med"))
      val tau = daily.crossJoin(broadcast(medY))
        .withColumn("ad", abs(col("v") - col("med")))
        .withColumn("r", row_number().over(Window.orderBy(col("ad"), col("t"))))
        .crossJoin(broadcast(nRow))
        .where(col("r") === expr("(n + 1) div 2"))
        .select((col("ad") * 3).as("tau"), col("med"))
      // 32 md5-seeded index pairs -> candidate lines via rank joins
      val cands = nRow
        .select(col("n"), explode(sequence(lit(0L), lit(Cands - 1L))).as("c"))
        .withColumn("i1", pmod(md5Long(concat(lit("ransac-"), col("c"),
          lit("-a"))), col("n")))
        .withColumn("i2r", pmod(md5Long(concat(lit("ransac-"), col("c"),
          lit("-b"))), col("n") - 1))
        .withColumn("i2",
          when(col("i2r") >= col("i1"), col("i2r") + 1).otherwise(col("i2r")))
      val lines = cands
        .join(daily.select(col("rk").as("i1"), col("t").as("t1"),
          col("v").as("v1")), Seq("i1"))
        .join(daily.select(col("rk").as("i2"), col("t").as("t2"),
          col("v").as("v2")), Seq("i2"))
        .withColumn("slope", round(
          (col("v2") - col("v1")).cast("double") / (col("t2") - col("t1")), 9))
        .withColumn("icept", round(
          col("v1").cast("double") - col("slope") * col("t1"), 9))
        .select(col("c"), col("slope"), col("icept"))
        .localCheckpoint() // scoring + best-line refit read it
      val scored = daily.crossJoin(broadcast(lines))
        .crossJoin(broadcast(tau))
        .withColumn("inl", (abs(col("v").cast("double")
          - (col("icept") + col("slope") * col("t")))
          <= col("tau").cast("double")).cast("long"))
        .groupBy(col("c"), col("slope"), col("icept"))
        .agg(sum(col("inl")).as("n_inliers"))
      val best = scored
        .orderBy(col("n_inliers").desc, col("c")).limit(1)
        .localCheckpoint()
      // exact-decimal OLS refit on the consensus set (the q440 idiom)
      val d38 = DecimalType(38, 0)
      val dm = DecimalType(38, 2)
      def olsMoments(pts: org.apache.spark.sql.DataFrame) = pts
        .agg(count(lit(1)).as("np"),
          sum(col("t").cast(d38)).as("st"),
          sum((col("t") * col("t")).cast(d38)).as("stt"),
          sum(col("v").cast(dm)).as("sy"),
          sum((col("v") * col("t")).cast(dm)).as("sty"))
        .withColumn("sl", round(
          (col("np") * col("sty").cast("double")
            - col("st").cast("double") * col("sy").cast("double"))
            / (col("np") * col("stt").cast("double")
              - col("st").cast("double") * col("st").cast("double")), 9))
        .withColumn("ic", round((col("sy").cast("double")
          - col("sl") * col("st").cast("double")) / col("np"), 9))
      val inlierPts = daily.crossJoin(broadcast(best))
        .crossJoin(broadcast(tau))
        .where(abs(col("v").cast("double")
          - (col("icept") + col("slope") * col("t")))
          <= col("tau").cast("double"))
      val refit = olsMoments(inlierPts)
        .select(col("sl").as("slope_ransac"), col("ic").as("icept_ransac"))
      val allFit = olsMoments(daily)
        .select(col("sl").as("slope_all"))
      best.crossJoin(broadcast(refit)).crossJoin(broadcast(allFit))
        .crossJoin(broadcast(tau)).crossJoin(broadcast(nRow))
        .select(col("n").as("n_points"), col("c").as("best_cand"),
          col("n_inliers"),
          round(col("n_inliers") / col("n").cast("double"), 6)
            .as("inlier_share"),
          round(col("tau").cast("double"), 2).as("tau"),
          round(col("slope_ransac"), 6).as("slope_ransac"),
          round(col("icept_ransac"), 2).as("icept_ransac"),
          round(col("slope_all"), 6).as("slope_all"))
    },
    Some(s"""WITH daily AS (SELECT t, v,
          CAST(ROW_NUMBER() OVER (ORDER BY t) - 1 AS BIGINT) AS rk
        FROM (SELECT
            CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)
              AS t,
            SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS v
          FROM orders GROUP BY 1)),
      nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
      medy AS (SELECT v AS med FROM (SELECT d.v,
          ROW_NUMBER() OVER (ORDER BY d.v, d.t) AS r, nr.n
        FROM daily d, nrow nr) WHERE r = (n + 1) // 2),
      tau AS (SELECT ad * 3 AS tau, med FROM (SELECT
          abs(d.v - m.med) AS ad, m.med,
          ROW_NUMBER() OVER (ORDER BY abs(d.v - m.med), d.t) AS r, nr.n
        FROM daily d, medy m, nrow nr) WHERE r = (n + 1) // 2),
      cands AS (SELECT c,
          hv % n + CASE WHEN hv % n < 0 THEN n ELSE 0 END AS i1,
          CASE WHEN (hv2 % (n - 1) + CASE WHEN hv2 % (n - 1) < 0
              THEN n - 1 ELSE 0 END)
            >= (hv % n + CASE WHEN hv % n < 0 THEN n ELSE 0 END)
            THEN (hv2 % (n - 1) + CASE WHEN hv2 % (n - 1) < 0
              THEN n - 1 ELSE 0 END) + 1
            ELSE hv2 % (n - 1) + CASE WHEN hv2 % (n - 1) < 0
              THEN n - 1 ELSE 0 END END AS i2
        FROM (SELECT nr.n, cc.c,
            ((('0x' || substr(md5('ransac-' || cc.c || '-a'), 1, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5('ransac-' || cc.c || '-a'), 1, 8))::BIGINT >= 2147483648
                   THEN 4294967296 ELSE 0 END) * 4294967296
            + ('0x' || substr(md5('ransac-' || cc.c || '-a'), 9, 8))::BIGINT) AS hv,
            ((('0x' || substr(md5('ransac-' || cc.c || '-b'), 1, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5('ransac-' || cc.c || '-b'), 1, 8))::BIGINT >= 2147483648
                   THEN 4294967296 ELSE 0 END) * 4294967296
            + ('0x' || substr(md5('ransac-' || cc.c || '-b'), 9, 8))::BIGINT) AS hv2
          FROM nrow nr, (SELECT UNNEST(range(0, $Cands)) AS c) cc)),
      lines AS MATERIALIZED (SELECT ca.c,
          round(CAST(d2.v - d1.v AS DOUBLE) / (d2.t - d1.t), 9) AS slope,
          round(CAST(d1.v AS DOUBLE)
            - round(CAST(d2.v - d1.v AS DOUBLE) / (d2.t - d1.t), 9) * d1.t, 9)
            AS icept
        FROM cands ca
        JOIN daily d1 ON d1.rk = ca.i1
        JOIN daily d2 ON d2.rk = ca.i2),
      scored AS (SELECT l.c, l.slope, l.icept,
          CAST(SUM(CASE WHEN abs(CAST(d.v AS DOUBLE)
            - (l.icept + l.slope * d.t)) <= CAST(tu.tau AS DOUBLE)
            THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers
        FROM daily d, lines l, tau tu GROUP BY 1, 2, 3),
      best AS (SELECT * FROM scored ORDER BY n_inliers DESC, c LIMIT 1),
      inl AS (SELECT d.* FROM daily d, best b, tau tu
        WHERE abs(CAST(d.v AS DOUBLE) - (b.icept + b.slope * d.t))
          <= CAST(tu.tau AS DOUBLE)),
      refit AS (SELECT
          round((np * CAST(sty AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
            / (np * CAST(stt AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 9) AS slope_r,
          st, sy, np
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS np,
            SUM(CAST(t AS DECIMAL(38,0))) AS st,
            SUM(CAST(t * t AS DECIMAL(38,0))) AS stt,
            SUM(CAST(v AS DECIMAL(38,2))) AS sy,
            SUM(CAST(v * t AS DECIMAL(38,2))) AS sty
          FROM inl)),
      refit2 AS (SELECT slope_r,
          round((CAST(sy AS DOUBLE) - slope_r * CAST(st AS DOUBLE)) / np, 9)
            AS icept_r FROM refit),
      allfit AS (SELECT
          round((np * CAST(sty AS DOUBLE)
            - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE))
            / (np * CAST(stt AS DOUBLE)
              - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 9) AS slope_all
        FROM (SELECT CAST(COUNT(*) AS BIGINT) AS np,
            SUM(CAST(t AS DECIMAL(38,0))) AS st,
            SUM(CAST(t * t AS DECIMAL(38,0))) AS stt,
            SUM(CAST(v AS DECIMAL(38,2))) AS sy,
            SUM(CAST(v * t AS DECIMAL(38,2))) AS sty
          FROM daily))
      SELECT nr.n AS n_points, b.c AS best_cand, b.n_inliers,
        round(b.n_inliers / CAST(nr.n AS DOUBLE), 6) AS inlier_share,
        round(CAST(tu.tau AS DOUBLE), 2) AS tau,
        round(r.slope_r, 6) AS slope_ransac,
        round(r.icept_r, 2) AS icept_ransac,
        round(a.slope_all, 6) AS slope_all
      FROM best b, refit2 r, allfit a, tau tu, nrow nr"""))

  val all: Seq[QueryDef] = Seq(q455Ransac)
}
