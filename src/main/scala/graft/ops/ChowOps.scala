package graft.ops

import org.apache.spark.sql.functions._

/** Chow structural-break test (Chow 1960) — did the revenue-vs-volume
  * relationship CHANGE at a known date? Fit y = a + b·x by OLS on the
  * daily frame three times (pooled, before 1995-07-01, after), and
  * compare the pooled SSE against the sum of the split SSEs:
  * F = ((SSE_p − SSE_1 − SSE_2)/k) / ((SSE_1 + SSE_2)/(n − 2k)), k = 2.
  * The regime-change screen every pricing/forecasting pipeline runs at
  * suspected policy breaks — q408 finds an unknown breakpoint, Chow
  * TESTS a hypothesized one (reference: overseer's monitoring/series
  * family — arbitrary handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: ONE corpus scan, then three 1-row aggregates over the
  * calendar-bounded daily frame (the split is a CASE label, so all
  * three fits come from ONE grouped pass). Nothing data-sized after
  * the first hash-agg.
  *
  * Exactness: x (count) and y (exact kilodollars) are BIGINTs; each
  * segment's SSE uses the n-scaled identity
  * n·SSE = S_yy − S_xy²/S_xx over integer scatter sums, evaluated as
  * ONE fixed float expression; F assembles three such numbers —
  * cross-engine deterministic. BIGINT headroom: n·Σy² stays under 2⁶³
  * through ~sf30 (sf10 measured: 5e18); past that, requantize y to
  * megadollars — the q484 unit-scaling discipline.
  */
object ChowOps {

  private val Break = "1995-07-01"

  val q526ChowTest: QueryDef = QueryDef(
    "q526_chow_test",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as("x"),
          expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
            "DIV 100000").as("y"))
        .withColumn("seg",
          when(col("day") < lit(Break).cast("date"), 1L).otherwise(2L))
      // one grouped pass: segment scatters; pooled = summed moments
      val seg = daily.groupBy(col("seg"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("tx"), sum(col("y")).as("ty"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        .localCheckpoint()
      def sse = (n: org.apache.spark.sql.Column, tx: org.apache.spark.sql.Column,
                 ty: org.apache.spark.sql.Column, sxx: org.apache.spark.sql.Column,
                 sxy: org.apache.spark.sql.Column, syy: org.apache.spark.sql.Column) => {
        val vxx = (n * sxx - tx * tx).cast("double")
        val vxy = (n * sxy - tx * ty).cast("double")
        val vyy = (n * syy - ty * ty).cast("double")
        (vyy - vxy * vxy / vxx) / n.cast("double") // SSE = (S_yy − S_xy²/S_xx)/n
      }
      val pooled = seg.agg(sum(col("n")).as("n"),
        sum(col("tx")).as("tx"), sum(col("ty")).as("ty"),
        sum(col("sxx")).as("sxx"), sum(col("sxy")).as("sxy"),
        sum(col("syy")).as("syy"))
        .select(lit(0L).as("seg"), col("n"),
          sse(col("n"), col("tx"), col("ty"), col("sxx"), col("sxy"),
            col("syy")).as("sse"))
      val parts = seg
        .select(col("seg"), col("n"),
          sse(col("n"), col("tx"), col("ty"), col("sxx"), col("sxy"),
            col("syy")).as("sse"))
      val wide = pooled.select(col("n").as("n_all"), col("sse").as("sse_p"))
        .crossJoin(parts.groupBy()
          .agg(sum(when(col("seg") === 1, col("sse"))).as("sse1"),
            sum(when(col("seg") === 2, col("sse"))).as("sse2"),
            sum(when(col("seg") === 1, col("n"))).as("n1"),
            sum(when(col("seg") === 2, col("n"))).as("n2")))
      wide.select(col("n_all"), col("n1"), col("n2"),
        round(col("sse_p"), 6).as("sse_pooled"),
        round(col("sse1") + col("sse2"), 6).as("sse_split"),
        round(((col("sse_p") - col("sse1") - col("sse2")) / 2) /
          ((col("sse1") + col("sse2")) / (col("n_all") - 4)), 9)
          .as("chow_f"))
    },
    Some(s"""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(COUNT(*) AS BIGINT) AS x,
          CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // 100000 AS BIGINT) AS y
        FROM orders GROUP BY 1),
      lab AS (SELECT *,
          CASE WHEN day < DATE '$Break' THEN 1 ELSE 2 END AS seg
        FROM daily),
      seg AS (
        SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(x) AS BIGINT) AS tx, CAST(SUM(y) AS BIGINT) AS ty,
          CAST(SUM(x * x) AS BIGINT) AS sxx,
          CAST(SUM(x * y) AS BIGINT) AS sxy,
          CAST(SUM(y * y) AS BIGINT) AS syy
        FROM lab GROUP BY 1),
      pooled AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(tx) AS BIGINT) AS tx,
          CAST(SUM(ty) AS BIGINT) AS ty, CAST(SUM(sxx) AS BIGINT) AS sxx,
          CAST(SUM(sxy) AS BIGINT) AS sxy, CAST(SUM(syy) AS BIGINT) AS syy
        FROM seg),
      sses AS (
        SELECT
          (SELECT (CAST(n * syy - ty * ty AS DOUBLE) -
              CAST(n * sxy - tx * ty AS DOUBLE) * (n * sxy - tx * ty) /
              CAST(n * sxx - tx * tx AS DOUBLE)) / CAST(n AS DOUBLE)
            FROM pooled) AS sse_p,
          (SELECT n FROM pooled) AS n_all,
          (SELECT (CAST(n * syy - ty * ty AS DOUBLE) -
              CAST(n * sxy - tx * ty AS DOUBLE) * (n * sxy - tx * ty) /
              CAST(n * sxx - tx * tx AS DOUBLE)) / CAST(n AS DOUBLE)
            FROM seg WHERE seg = 1) AS sse1,
          (SELECT (CAST(n * syy - ty * ty AS DOUBLE) -
              CAST(n * sxy - tx * ty AS DOUBLE) * (n * sxy - tx * ty) /
              CAST(n * sxx - tx * tx AS DOUBLE)) / CAST(n AS DOUBLE)
            FROM seg WHERE seg = 2) AS sse2,
          (SELECT n FROM seg WHERE seg = 1) AS n1,
          (SELECT n FROM seg WHERE seg = 2) AS n2)
      SELECT n_all, n1, n2,
        round(sse_p, 6) AS sse_pooled,
        round(sse1 + sse2, 6) AS sse_split,
        round(((sse_p - sse1 - sse2) / 2) / ((sse1 + sse2) / (n_all - 4)), 9)
          AS chow_f
      FROM sses"""))

  val all: Seq[QueryDef] = Seq(q526ChowTest)
}
