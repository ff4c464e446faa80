package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** PPS-sampling wave: Madow's systematic probability-proportional-to-
  * size sampling (Madow 1949) — the fixed-size weighted sample a
  * data-selection pipeline takes when inclusion probability must track
  * a size measure exactly (token mass, revenue, bytes): walk the
  * hash-shuffled cumulative-weight line with a fixed step; an item is
  * drawn once per step boundary its weight interval covers. Unlike
  * q112's weighted-without-replacement keys, systematic PPS gives
  * EXACTLY n draws and multiplicity ∝ weight with zero variance in
  * sample size — the survey-sampling classic.
  *
  * Scale shape: one deterministic hash sort + cumulative window, then
  * a per-item boundary count — no rejection loop, no per-draw pass;
  * the Horvitz–Thompson check rides the same frame.
  */
object PpsOps {

  private val N = 50

  /** 50 systematic PPS draws from part weighted by retail price, in
    * md5-shuffled order. Output: each drawn part with its multiplicity
    * (large items straddle several boundaries) and draw positions,
    * plus the Horvitz–Thompson estimate of total p_size from the
    * sample vs the true total — the unbiasedness audit, carried on
    * every row. Σ multiplicity = floor(W/step) = 50 up to one final
    * float-boundary draw, reported as n_draws. */
  val q407PpsSample: QueryDef = QueryDef(
    "q407_pps_sample",
    (s, dir) => {
      import graft.functions.VectorFunctions.md5Long
      val p = Tables(s, dir).part
        .select(col("p_partkey").as("part"),
          col("p_retailprice").cast(DecimalType(18, 2)).as("w"),
          col("p_size").cast("long").as("size"))
        .withColumn("h", md5Long(concat(lit("pps|"), col("part"))))
        // exact cents: DECIMAL(18,2) × 100 is integral, so the cumulative
        // weight line can ride the BIGINT prefix spine at scale
        .withColumn("w_c", (col("w") * 100).cast("long"))
      // ONE totals action carries the weight total, the true-size total
      // (previously a second driver action) and the frame count (the
      // window-vs-spine probe — previously free only in theory):
      // three scalars, one scan
      val totals = p.agg(sum(col("w")).as("w_tot"),
        sum(col("size")).as("size_tot"), count(lit(1)).as("n")).head()
      // the cum_w_c/100.0 ≡ CAST(SUM(DECIMAL) AS DOUBLE) identity below
      // needs every cents prefix sum exact as a double — guard the 2^53
      // assumption at runtime instead of in a comment (r15 advice; at
      // 2^53 cents ≈ $90T total weight the BIGINT spine would need the
      // DECIMAL-window form instead)
      require(totals.getDecimal(0).movePointRight(2).longValueExact() < (1L << 53),
        "q407: total weight cents >= 2^53 — the long cents line would " +
          "double-round; switch the cumulative line to the DECIMAL window form")
      val wTot = totals.getDecimal(0).doubleValue()
      val step = wTot / N
      val nParts = totals.getLong(2)
      // r15: the cumulative-weight line over a frame that grows with the
      // corpus (parts) — was Window.orderBy(h, part) with no partition
      // clause (Exchange SinglePartition); now size-adaptive: classic
      // window at bench scale, range-partitioned prefix spine above 8M
      // rows. cum_w_c/100.0 ≡ cast(SUM(DECIMAL w) AS DOUBLE): both
      // correctly round the same rational (cents sums stay < 2^53).
      val cum = Spine.adaptiveRank(p, Seq(col("h"), col("part")),
          sumCols = Seq("w_c"), knownCount = nParts)
        .withColumn("cum", col("cum_w_c") / lit(100.0))
        .withColumn("cum_prev", col("cum") - col("w").cast("double"))
        .withColumn("mult",
          (floor(col("cum") / step) - floor(col("cum_prev") / step))
            .cast("long"))
        .where(col("mult") > 0)
      val sampled = cum
        .withColumn("pi_hat",
          round(least(lit(1.0), col("w").cast("double") / step), 9))
        .withColumn("ht_term",
          round(col("mult") * col("size").cast("double") /
            (col("w").cast("double") / step), 6))
      val trueSize = totals.getLong(1)
      val w0 = Window.partitionBy()
      sampled
        .withColumn("n_draws", sum(col("mult")).over(w0))
        .withColumn("ht_size_est", round(
          sum(col("ht_term").cast(DecimalType(28, 6))).over(w0)
            .cast("double"), 2))
        .withColumn("true_size_total", lit(trueSize))
        .withColumn("ht_rel_err", round(
          abs(col("ht_size_est") - col("true_size_total")) /
            col("true_size_total"), 6))
        .select(col("part"), col("w").cast("double").as("weight"),
          col("mult"), col("pi_hat"), col("n_draws"),
          col("ht_size_est"), col("true_size_total"), col("ht_rel_err"))
        .orderBy(col("part"))
    },
    Some(s"""WITH p AS (SELECT p_partkey AS part,
          CAST(p_retailprice AS DECIMAL(18,2)) AS w,
          CAST(p_size AS BIGINT) AS size,
          ((('0x' || substr(md5('pps|' || p_partkey), 1, 8))::BIGINT
            - CASE WHEN ('0x' || substr(md5('pps|' || p_partkey), 1, 8))::BIGINT
              >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296
            + ('0x' || substr(md5('pps|' || p_partkey), 9, 8))::BIGINT) AS h
        FROM part),
      tot AS (SELECT CAST(SUM(w) AS DOUBLE) AS w_tot,
          CAST(SUM(size) AS BIGINT) AS size_tot FROM p),
      cum AS (SELECT *,
          CAST(SUM(w) OVER (ORDER BY h, part
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
            AS cum
        FROM p),
      marked AS (SELECT *, cum - CAST(w AS DOUBLE) AS cum_prev,
          CAST(floor(cum / ((SELECT w_tot FROM tot) / $N))
            - floor((cum - CAST(w AS DOUBLE))
              / ((SELECT w_tot FROM tot) / $N)) AS BIGINT) AS mult
        FROM cum),
      sampled AS (SELECT *,
          round(least(1.0, CAST(w AS DOUBLE)
            / ((SELECT w_tot FROM tot) / $N)), 9) AS pi_hat,
          round(mult * CAST(size AS DOUBLE)
            / (CAST(w AS DOUBLE) / ((SELECT w_tot FROM tot) / $N)), 6)
            AS ht_term
        FROM marked WHERE mult > 0)
      SELECT part, CAST(w AS DOUBLE) AS weight, mult, pi_hat,
        CAST(SUM(mult) OVER () AS BIGINT) AS n_draws,
        round(CAST(SUM(CAST(ht_term AS DECIMAL(28,6))) OVER () AS DOUBLE), 2)
          AS ht_size_est,
        (SELECT size_tot FROM tot) AS true_size_total,
        round(abs(round(CAST(SUM(CAST(ht_term AS DECIMAL(28,6))) OVER ()
            AS DOUBLE), 2) - (SELECT size_tot FROM tot))
          / (SELECT size_tot FROM tot), 6) AS ht_rel_err
      FROM sampled ORDER BY part"""))

  val all: Seq[QueryDef] = Seq(q407PpsSample)
}
