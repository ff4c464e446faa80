package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Haar wavelet synopsis (Matias/Vitter/Wang 1998) of the daily-revenue
  * series — the classic multi-resolution alternative to histograms for
  * approximate range aggregation: keep the overall-sum coefficient plus
  * the top-k detail coefficients by retained energy, answer any range
  * sum from O(k + log n) terms. The synopsis here covers the first 64
  * shipping days as a 6-level transform; the emitted report is the
  * synopsis itself (rank, level, position, coefficient) plus its
  * Parseval energy accounting — the number a synopsis planner compares
  * against an equi-depth histogram's (q152) before choosing.
  *
  * Exactness across engines: the series is integer KILOdollars — per-row
  * floor(extendedprice·(1−discount)) dollars summed per day, then
  * floor-divided by 1000 (at sf10 a day holds ~1.25e9 dollars; Parseval
  * energies square the 64-day TOTAL and carry a ×64 scale, so dollar
  * units would overflow BIGINT ~6.5e19 already at sf1 — kilodollar units
  * keep the worst term ≤ ~2e17 with headroom past sf100). The
  * UNNORMALIZED Haar recurrence (pairwise sum / signed difference) stays
  * in BIGINT at every level, and Parseval energies are scaled by 64 to
  * stay integer: a detail coefficient d at level ℓ (support 2^ℓ) carries
  * e = d²·(64/2^ℓ), and Σ_coef e = 64·Σ_t x_t². Shares are single
  * BIGINT/BIGINT double divisions — bit-identical both engines.
  *
  * Scale shape: one filtered scan aggregates straight to the 64-bin
  * spine (map-side partial combine; the calendar bound makes every
  * downstream frame model-sized), then 6 unrolled 2-to-1 level
  * aggregations over ≤64 rows and one 63-row ranking window. The 1-row
  * total-energy broadcast is PlanGuard-declared.
  */
object WaveletOps {

  private val N      = 64 // series length (2^6)
  private val Levels = 6
  private val TopK   = 8 // retained detail coefficients

  val q484HaarSynopsis: QueryDef = QueryDef(
    "q484_haar_synopsis",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(datediff(col("l_shipdate").cast("date"),
          lit("1995-01-01").cast("date")).as("pos"),
          floor(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast("long").as("r"))
        .filter(col("pos") >= 0 && col("pos") < N)
        .groupBy(col("pos")).agg(sum(col("r")).as("a"))
      val spine = s.range(N).select(col("id").cast("int").as("pos"))
      val l0 = spine.join(li, Seq("pos"), "left")
        .na.fill(0L, Seq("a"))
        .select(col("pos").cast("long").as("pos"),
          floor(col("a") / 1000).cast("long").as("a")) // kilodollar units
        .localCheckpoint() // reused by 6 levels + the energy total

      // unrolled cascade: level k halves the frame, emitting the detail
      // coefficients (support 2^k) and passing the pair sums upward
      var approx: DataFrame = l0
      var details: DataFrame = null
      for (k <- 1 to Levels) {
        val lk = approx
          .groupBy(floor(col("pos") / 2).cast("long").as("pos"))
          .agg(sum(col("a")).as("a"),
            sum(when(pmod(col("pos"), lit(2)) === 0, col("a"))
              .otherwise(-col("a"))).as("d"))
          .localCheckpoint()
        val dk = lk.select(lit("detail").as("kind"), lit(k).as("level"),
          col("pos"), col("d").as("coef"),
          (col("d") * col("d") * lit((N >> k).toLong)).as("e"))
        details = if (details == null) dk else details.unionAll(dk)
        approx = lk.select(col("pos"), col("a"))
      }
      val approxRow = approx.select(lit("approx").as("kind"),
        lit(Levels).as("level"), col("pos"), col("a").as("coef"),
        (col("a") * col("a")).as("e")) // support 64 -> e = a²·(64/64)
      val total = l0.agg((sum(col("a") * col("a")) * lit(N.toLong))
        .as("total_e")) // Parseval: Σ e over ALL coefficients

      val ranked = details
        .withColumn("rank", row_number().over(Window.orderBy(
          abs(col("coef")).desc, col("level"), col("pos"))).cast("long"))
        .filter(col("rank") <= TopK)
        .unionByName(approxRow.withColumn("rank", lit(0L)))
        .localCheckpoint()
      val kept = ranked.agg(sum(col("e")).as("kept_e"))
      ranked
        .crossJoin(broadcast(total))   // 1-row scalar combines
        .crossJoin(broadcast(kept))
        .select(col("rank"), col("kind"), col("level"), col("pos"),
          col("coef"),
          round(col("e").cast("double") / col("total_e").cast("double"), 6)
            .as("energy_share"),
          round(col("kept_e").cast("double") / col("total_e").cast("double"), 6)
            .as("kept_energy_frac"))
    },
    Some(s"""WITH l0 AS (
        SELECT CAST(sp.pos AS BIGINT) AS pos, COALESCE(v.a, 0) // 1000 AS a
        FROM range($N) sp(pos)
        LEFT JOIN (
          SELECT date_diff('day', DATE '1995-01-01',
              CAST(l_shipdate AS DATE)) AS pos,
            CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount))
              AS BIGINT)) AS BIGINT) AS a
          FROM lineitem
          WHERE date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE))
            BETWEEN 0 AND ${N - 1}
          GROUP BY 1) v ON v.pos = sp.pos),
      l1 AS (SELECT pos // 2 AS pos, CAST(SUM(a) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN pos % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d
        FROM l0 GROUP BY 1),
      l2 AS (SELECT pos // 2 AS pos, CAST(SUM(a) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN pos % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d
        FROM l1 GROUP BY 1),
      l3 AS (SELECT pos // 2 AS pos, CAST(SUM(a) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN pos % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d
        FROM l2 GROUP BY 1),
      l4 AS (SELECT pos // 2 AS pos, CAST(SUM(a) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN pos % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d
        FROM l3 GROUP BY 1),
      l5 AS (SELECT pos // 2 AS pos, CAST(SUM(a) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN pos % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d
        FROM l4 GROUP BY 1),
      l6 AS (SELECT pos // 2 AS pos, CAST(SUM(a) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN pos % 2 = 0 THEN a ELSE -a END) AS BIGINT) AS d
        FROM l5 GROUP BY 1),
      details AS (
        SELECT 'detail' AS kind, 1 AS level, pos, d AS coef, d*d*${N / 2} AS e FROM l1
        UNION ALL SELECT 'detail', 2, pos, d, d*d*${N / 4} FROM l2
        UNION ALL SELECT 'detail', 3, pos, d, d*d*${N / 8} FROM l3
        UNION ALL SELECT 'detail', 4, pos, d, d*d*${N / 16} FROM l4
        UNION ALL SELECT 'detail', 5, pos, d, d*d*${N / 32} FROM l5
        UNION ALL SELECT 'detail', 6, pos, d, d*d*${N / 64} FROM l6),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY abs(coef) DESC, level, pos)
          AS rank
        FROM details),
      keptrows AS (
        SELECT CAST(rank AS BIGINT) AS rank, kind, level, pos,
          CAST(coef AS BIGINT) AS coef, CAST(e AS BIGINT) AS e
        FROM ranked WHERE rank <= $TopK
        UNION ALL
        SELECT 0, 'approx', $Levels, pos, a, a*a FROM l6),
      total AS (SELECT CAST(SUM(a*a) * $N AS BIGINT) AS total_e FROM l0),
      kept AS (SELECT CAST(SUM(e) AS BIGINT) AS kept_e FROM keptrows)
      SELECT k.rank, k.kind, k.level, k.pos, k.coef,
        round(CAST(k.e AS DOUBLE) / CAST(t.total_e AS DOUBLE), 6)
          AS energy_share,
        round(CAST(kp.kept_e AS DOUBLE) / CAST(t.total_e AS DOUBLE), 6)
          AS kept_energy_frac
      FROM keptrows k, total t, kept kp"""))

  val all: Seq[QueryDef] = Seq(q484HaarSynopsis)
}
