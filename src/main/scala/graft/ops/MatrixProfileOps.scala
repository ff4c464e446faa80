package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Matrix-profile discord discovery — "which week of revenue looks like
  * NO other week?" (Yeh et al. 2016's matrix profile, the exact
  * all-pairs special case): for every 7-day subsequence of the daily
  * revenue series, the profile value is the distance to its nearest
  * non-overlapping neighbor; the top discords (largest profile values)
  * are the anomalies a monitoring pipeline flags without choosing a
  * model (reference: overseer's monitoring/series family,
  * doc/guide/Introduction.md:3).
  *
  * Scale shape: the series is CALENDAR-BOUNDED (~2,400 days at every
  * SF), so the all-pairs stage is a constant ~5.7M-pair frame at any
  * corpus size — quadratic BY CONTRACT in a quantity that does not
  * grow with the data (q408's calendar-melt precedent,
  * PlanGuard-declared). The corpus-sized work is ONE day aggregation.
  * Each pair's distance folds a 7-element zip_with in codegen — no
  * element-level explosion. (At streaming-telemetry lengths the exact
  * profile gives way to MASS/FFT or sketched variants; for a
  * calendar-day series, exact is the right tool.)
  *
  * Exactness: day totals are quantized to KILODOLLARS (exact cents
  * summed, then one BIGINT floor-division — the q484 overflow
  * discipline: Δ² of raw daily cents passes 2⁶³ at sf1), so distances
  * are Σ(Δk$)² BIGINTs — no z-normalization floats, no
  * summation-order hazard; the nearest neighbor is chosen by
  * (d2, position) so ties are total. Top-5 by (profile DESC,
  * position).
  */
object MatrixProfileOps {

  private val M = 7 // subsequence length (days)

  val q507MatrixProfile: QueryDef = QueryDef(
    "q507_matrix_profile",
    (s, dir) => {
      val daily = Tables(s, dir).orders
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(expr("sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) " +
          "DIV 100000").as("c")) // exact cents → kilodollars per day
      val wOrd = Window.orderBy(col("day"))
      val leads = (1 until M).foldLeft(
        daily.withColumn("pos", row_number().over(wOrd))) { (df, k) =>
        df.withColumn(s"c$k", lead(col("c"), k).over(wOrd))
      }
      // windows as M SCALAR columns, not arrays: the distance is a pure
      // codegen sum of 7 squared diffs per pair — no per-pair array
      // allocation on the ~5.7M-pair hot path
      val cols0 = col("c").as("k0") +:
        (1 until M).map(k => col(s"c$k").as(s"k$k"))
      val windows = leads
        .where(col(s"c${M - 1}").isNotNull) // full windows only
        .select((col("pos") +: col("day") +: cols0): _*)
        .localCheckpoint() // both sides of the ~2.4k×2.4k pair frame
      val a = windows.toDF("pa" +: "da" +: (0 until M).map(k => s"a$k"): _*)
      val b = windows.drop("day")
        .toDF("pb" +: (0 until M).map(k => s"b$k"): _*)
      val d2 = (0 until M).map { k =>
        (col(s"a$k") - col(s"b$k")) * (col(s"a$k") - col(s"b$k"))
      }.reduce(_ + _)
      // nearest neighbor via the hash-aggregable pair-min (r16):
      // min(struct(d2, pb)) planned Sort + SortAggregate — struct
      // buffers are not mutable, so the whole pair frame was SORTED per
      // side before aggregating; MinPairLong keeps two mutable long
      // slots, giving a plain partial+final HashAggregate with the same
      // (d2, pb) lexicographic semantics, and the pair rows never
      // shuffle (map-side combine to one pair per window per task)
      val profile = a.join(b, abs(col("pa") - col("pb")) >= M)
        .withColumn("d2", d2)
        .groupBy(col("pa"), col("da"))
        .agg(graft.functions.VectorFunctions.min_pair_long(
          col("d2"), col("pb").cast("long")).as("nn"))
        .select(col("pa"), col("da"), col("nn.a").as("nn_d2"),
          col("nn.b").as("nn_pos"))
      profile
        .orderBy(col("nn_d2").desc, col("pa"))
        .limit(5)
        .select(col("da").as("start_day"), col("nn_d2"),
          col("nn_pos").cast("long").as("nn_pos"))
    },
    Some(s"""WITH daily AS (
        SELECT CAST(o_orderdate AS DATE) AS day,
          CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            // 100000 AS BIGINT) AS c
        FROM orders GROUP BY 1),
      series AS (
        SELECT day, c, row_number() OVER (ORDER BY day) AS pos FROM daily),
      windows AS (
        SELECT pos, day, list(c) OVER (ORDER BY pos
          ROWS BETWEEN CURRENT ROW AND ${M - 1} FOLLOWING) AS v
        FROM series QUALIFY len(v) = $M),
      dists AS (
        SELECT a.pos AS pa, a.day AS da, b.pos AS pb,
          CAST((SELECT SUM((a.v[g.k + 1] - b.v[g.k + 1]) *
            (a.v[g.k + 1] - b.v[g.k + 1])) FROM range($M) g(k)) AS BIGINT)
            AS d2
        FROM windows a JOIN windows b ON abs(a.pos - b.pos) >= $M),
      profile AS (
        SELECT pa, da, d2 AS nn_d2, pb AS nn_pos,
          row_number() OVER (PARTITION BY pa ORDER BY d2, pb) AS rn
        FROM dists)
      SELECT da AS start_day, nn_d2, CAST(nn_pos AS BIGINT) AS nn_pos
      FROM profile WHERE rn = 1
      ORDER BY nn_d2 DESC, pa LIMIT 5"""))

  val all: Seq[QueryDef] = Seq(q507MatrixProfile)
}
