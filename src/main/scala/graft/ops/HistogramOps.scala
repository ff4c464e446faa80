package graft.ops

import org.apache.spark.sql.functions._

/** V-optimal histogram wave: the optimal B-bucket histogram (Jagadish
  * et al., VLDB'98) — bucket boundaries minimizing total within-bucket
  * variance — computed by exact dynamic programming over a quantized
  * domain, and compared against the equi-width and equi-depth heuristics
  * on the same data. This is the missing member of the histogram family
  * (q63 equi-width, q152 equi-depth, q387 merged summaries): the one an
  * optimizer's statistics collector would actually want.
  *
  * Scale shape: the corpus-sized work is ONE quantized census
  * (count/Σp/Σp² per 32-cell); the DP runs on that model-sized array —
  * at the driver here (the q385/q397 model-frame idiom), while the
  * DuckDB oracle runs the SAME DP as pure SQL over the 528-segment
  * frame, so two independent implementations of the recurrence must
  * agree exactly.
  */
object HistogramOps {

  /** B=4 V-optimal buckets over o_totalprice quantized to 32 cells,
    * with per-bucket (count, SSE) rows for v_optimal / equi_width /
    * equi_depth and the scheme totals implicit in the rows. SSE uses
    * the cell index as the value (the V-optimal histogram of the
    * quantized distribution — integer-exact prefix sums, IEEE-exact
    * division), so both engines compute bit-identical costs. */
  val q402VoptHistogram: QueryDef = QueryDef(
    "q402_vopt_histogram",
    (s, dir) => {
      val sess = s
      import sess.implicits._
      val o = Tables(s, dir).orders.select(col("o_totalprice").as("v"))
      val maxv = o.agg(max(col("v"))).head().getDouble(0)
      val census = o
        .withColumn("pos", least(lit(31L),
          floor(col("v") * 32.0 / (maxv + 1.0)).cast("long")))
        .groupBy(col("pos")).agg(count(lit(1)).cast("long").as("c"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // prefix sums over the dense 0..31 domain (value = cell index)
      val n = new Array[Long](33); val sp = new Array[Long](33)
      val qp = new Array[Long](33)
      for (p <- 0 until 32) {
        val c = census.getOrElse(p.toLong, 0L)
        n(p + 1) = n(p) + c
        sp(p + 1) = sp(p) + c * p
        qp(p + 1) = qp(p) + c * p * p
      }
      def sse(j: Int, i: Int): Double = {
        val cnt = n(i) - n(j)
        if (cnt == 0) 0.0
        else {
          val sS = (sp(i) - sp(j)).toDouble
          (qp(i) - qp(j)).toDouble - sS * sS / cnt
        }
      }
      // dp(b)(i): best cost of covering cells [0, i) with b buckets;
      // arg(b)(i): the boundary j of the last bucket, min-j on ties
      val B = 4
      val dp = Array.fill(B + 1, 33)(Double.MaxValue)
      val arg = Array.fill(B + 1, 33)(-1)
      dp(0)(0) = 0.0
      for (b <- 1 to B; i <- 1 to 32) {
        var bestC = Double.MaxValue; var bestJ = -1
        for (j <- (b - 1) until i) {
          if (dp(b - 1)(j) != Double.MaxValue) {
            val c = dp(b - 1)(j) + sse(j, i)
            if (c < bestC) { bestC = c; bestJ = j }
          }
        }
        dp(b)(i) = bestC; arg(b)(i) = bestJ
      }
      // backtrack the v-optimal boundaries
      val bounds = new Array[Int](B + 1); bounds(B) = 32
      for (b <- B to 1 by -1) bounds(b - 1) = arg(b)(bounds(b))
      def bucketRows(scheme: String, bs: Seq[Int]): Seq[(String, Long, Long, Long, Long, Double)] =
        (0 until B).map { b =>
          val (lo, hi) = (bs(b), bs(b + 1))
          (scheme, (b + 1).toLong, lo.toLong, (hi - 1).toLong,
            n(hi) - n(lo),
            BigDecimal(sse(lo, hi)).setScale(6,
              BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      val ew = Seq(0, 8, 16, 24, 32)
      val nTot = n(32)
      val ed = 0 +: (1 to 3).map { k =>
        (1 to 32).find(i => n(i) * 4 >= k.toLong * nTot).get
      } :+ 32
      val rows = bucketRows("v_optimal", bounds.toSeq) ++
        bucketRows("equi_width", ew) ++ bucketRows("equi_depth", ed)
      rows.toDF("scheme", "bucket", "lo_pos", "hi_pos", "n_rows", "sse")
        .orderBy(col("scheme"), col("bucket"))
    },
    Some {
      // the same DP as SQL: dp_b(i) = min_j dp_{b-1}(j) + sse(j, i),
      // argmin = min j achieving the min (exactly the Scala tie-break)
      val dpRounds = (2 to 4).map { b =>
        s"""dp$b AS (SELECT s.i, MIN(d.cost + s.sse) AS cost
           |  FROM seg s JOIN dp${b - 1} d ON d.i = s.j WHERE s.j >= ${b - 1}
           |  GROUP BY 1),
           |arg$b AS (SELECT s.i, MIN(s.j) AS a
           |  FROM seg s JOIN dp${b - 1} d ON d.i = s.j
           |  JOIN dp$b m ON m.i = s.i AND d.cost + s.sse = m.cost
           |  WHERE s.j >= ${b - 1}
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH o AS (SELECT o_totalprice AS v FROM orders),
         |mx AS (SELECT MAX(v) AS maxv FROM o),
         |census AS (SELECT least(31, CAST(floor(v * 32.0
         |    / ((SELECT maxv FROM mx) + 1.0)) AS BIGINT)) AS pos,
         |    CAST(COUNT(*) AS BIGINT) AS c
         |  FROM o GROUP BY 1),
         |cells AS (SELECT r.range AS p, COALESCE(c.c, 0) AS c
         |  FROM range(0, 32) r LEFT JOIN census c ON c.pos = r.range),
         |pfx AS (SELECT p,
         |    SUM(c) OVER w AS cn, SUM(c * p) OVER w AS cs,
         |    SUM(c * p * p) OVER w AS cq
         |  FROM cells WINDOW w AS (ORDER BY p
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |pfx0 AS (SELECT 0 AS i, 0 AS cn, 0 AS cs, 0 AS cq
         |  UNION ALL SELECT p + 1, cn, cs, cq FROM pfx),
         |seg AS (SELECT j.i AS j, i.i AS i,
         |    i.cn - j.cn AS cnt,
         |    CASE WHEN i.cn - j.cn = 0 THEN 0.0
         |      ELSE CAST(i.cq - j.cq AS DOUBLE)
         |        - CAST(i.cs - j.cs AS DOUBLE) * CAST(i.cs - j.cs AS DOUBLE)
         |          / (i.cn - j.cn) END AS sse
         |  FROM pfx0 j JOIN pfx0 i ON j.i < i.i),
         |dp1 AS (SELECT i, sse AS cost FROM seg WHERE j = 0),
         |$dpRounds,
         |b4 AS (SELECT a FROM arg4 WHERE i = 32),
         |b3 AS (SELECT a FROM arg3 WHERE i = (SELECT a FROM b4)),
         |b2 AS (SELECT a FROM arg2 WHERE i = (SELECT a FROM b3)),
         |vb AS (SELECT 0 AS lo, (SELECT a FROM b2) AS hi, 1 AS bucket
         |  UNION ALL SELECT (SELECT a FROM b2), (SELECT a FROM b3), 2
         |  UNION ALL SELECT (SELECT a FROM b3), (SELECT a FROM b4), 3
         |  UNION ALL SELECT (SELECT a FROM b4), 32, 4),
         |nt AS (SELECT cn AS n_tot FROM pfx0 WHERE i = 32),
         |edb AS (SELECT k, MIN(i) AS boundary FROM pfx0,
         |    (SELECT UNNEST([1, 2, 3]) AS k)
         |  WHERE i >= 1 AND cn * 4 >= k * (SELECT n_tot FROM nt)
         |  GROUP BY 1),
         |eb AS (SELECT 0 AS lo, (SELECT boundary FROM edb WHERE k = 1) AS hi,
         |    1 AS bucket
         |  UNION ALL SELECT (SELECT boundary FROM edb WHERE k = 1),
         |    (SELECT boundary FROM edb WHERE k = 2), 2
         |  UNION ALL SELECT (SELECT boundary FROM edb WHERE k = 2),
         |    (SELECT boundary FROM edb WHERE k = 3), 3
         |  UNION ALL SELECT (SELECT boundary FROM edb WHERE k = 3), 32, 4),
         |wb AS (SELECT 0 AS lo, 8 AS hi, 1 AS bucket
         |  UNION ALL SELECT 8, 16, 2 UNION ALL SELECT 16, 24, 3
         |  UNION ALL SELECT 24, 32, 4),
         |schemes AS (
         |  SELECT 'v_optimal' AS scheme, bucket, lo, hi FROM vb
         |  UNION ALL SELECT 'equi_width', bucket, lo, hi FROM wb
         |  UNION ALL SELECT 'equi_depth', bucket, lo, hi FROM eb)
         |SELECT s.scheme, CAST(s.bucket AS BIGINT) AS bucket,
         |  CAST(s.lo AS BIGINT) AS lo_pos, CAST(s.hi - 1 AS BIGINT) AS hi_pos,
         |  CAST(g.cnt AS BIGINT) AS n_rows, round(g.sse, 6) AS sse
         |FROM schemes s JOIN (
         |  SELECT j, i, cnt, sse FROM seg
         |  UNION ALL SELECT i, i, 0, 0.0 FROM pfx0) g
         |  ON g.j = s.lo AND g.i = s.hi
         |ORDER BY scheme, bucket""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(q402VoptHistogram)
}
