package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Calibration & shrinkage wave: isotonic (PAV) recalibration of the
  * reliability curve, and James–Stein shrinkage of per-source means.
  *
  * Scale shapes: both collapse the scan to a model-sized frame (10
  * bins / |sources| rows) before any fitting; q374's minimax grid is a
  * 10³ bounded fan-out, q375 is two aggregations and a 1-row
  * hyperparameter broadcast.
  */
object CalibrateOps {

  private val dec = DecimalType(28, 10)

  /** Isotonic recalibration of q360's reliability curve via the minimax
    * closed form: the pool-adjacent-violators solution at bin i equals
    * max_{j≤i} min_{k≥i} (Σ_{b=j..k} s_b)/(Σ_{b=j..k} n_b) (Ayer et al.
    * 1955; Robertson & Wright's minimax characterization) — so instead
    * of the sequential PAV stack, the whole fit is a 10×10×10 bounded
    * grid of prefix-sum window averages, exact rationals until one
    * division each. The isotonic fit is THE standard probability
    * recalibrator (Zadrozny & Elkan 2002); the spec checks it against
    * an actual PAV stack implementation plus the monotonicity and
    * mass-preservation laws. */
  val q374IsotonicCalibration: QueryDef = QueryDef(
    "q374_isotonic_calibration",
    (s, dir) => {
      val bins = Tables(s, dir).orders
        .select(
          least(lit(9L), floor(col("o_totalprice") / 50000)).as("bin"),
          when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_b"), sum(col("y")).as("s_b"))
        .localCheckpoint() // the 10-row frame feeds the whole grid
      val j = bins.select(col("bin").as("j"))
      val k = bins.select(col("bin").as("k"))
      // window averages A(j,k) over contiguous bin ranges j..k
      val a = j.crossJoin(k).filter(col("j") <= col("k"))
        .join(bins, col("bin").between(col("j"), col("k")))
        .groupBy(col("j"), col("k"))
        .agg((sum(col("s_b")).cast("double") / sum(col("n_b"))).as("avg_jk"))
      val iso = bins.select(col("bin"))
        .join(a, col("j") <= col("bin") && col("k") >= col("bin"))
        .groupBy(col("bin"), col("j")).agg(min(col("avg_jk")).as("inner_min"))
        .groupBy(col("bin")).agg(max(col("inner_min")).as("iso"))
      bins.join(iso, Seq("bin"))
        .select(col("bin"), col("n_b"),
          round(col("s_b").cast("double") / col("n_b"), 6).as("y_rate"),
          round(col("iso"), 6).as("iso_rate"))
        .orderBy(col("bin"))
    },
    Some("""WITH b AS (SELECT least(9, CAST(floor(o_totalprice / 50000) AS BIGINT)) AS bin,
          CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders),
      bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_b,
          CAST(SUM(y) AS BIGINT) AS s_b
        FROM b GROUP BY 1),
      a AS (SELECT j.bin AS j, k.bin AS k,
          CAST(SUM(m.s_b) AS DOUBLE) / SUM(m.n_b) AS avg_jk
        FROM bins j JOIN bins k ON j.bin <= k.bin
        JOIN bins m ON m.bin BETWEEN j.bin AND k.bin
        GROUP BY 1, 2),
      iso AS (SELECT i.bin, MAX(inner_min) AS iso FROM (
          SELECT i.bin, a.j, MIN(a.avg_jk) AS inner_min
          FROM bins i JOIN a ON a.j <= i.bin AND a.k >= i.bin
          GROUP BY 1, 2) i
        GROUP BY 1)
      SELECT bins.bin, bins.n_b,
        round(CAST(bins.s_b AS DOUBLE) / bins.n_b, 6) AS y_rate,
        round(iso.iso, 6) AS iso_rate
      FROM bins JOIN iso USING (bin)
      ORDER BY bins.bin"""))

  /** Positive-part James–Stein shrinkage of per-source mean document
    * length (Efron & Morris 1975 — the canonical fix for the winner's
    * curse in per-slice dashboards: extreme source means are mostly
    * noise, and shrinking ALL of them toward the grand mean strictly
    * dominates the raw means for m ≥ 4). Shrink factor
    * c = max(0, 1 − (m−3)·σ̄²_se/Σ(x̄_i − x̄)²) with σ̄²_se the average
    * squared standard error of the source means; each source reports
    * raw, shrunk, and the common factor. Moment sums ride the
    * round→DECIMAL discipline; the hyperparameters are a 1-row
    * broadcast over the |sources| frame. */
  val q375JamesStein: QueryDef = QueryDef(
    "q375_james_stein",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("source"), col("n_chars").cast("double").as("x"))
      val per = docs.groupBy(col("source"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x"), 6).cast(dec)).as("sx"),
          sum(round(col("x") * col("x"), 6).cast(dec)).as("sxx"))
        .withColumn("mean", col("sx").cast("double") / col("n"))
        // unbiased within-source variance, then the mean's squared SE
        .withColumn("var_x",
          (col("sxx").cast("double") - col("sx").cast("double") *
            col("sx").cast("double") / col("n")) / (col("n") - 1))
        .withColumn("se2", col("var_x") / col("n"))
        .localCheckpoint() // feeds the hyper frame and the output join
      val hyper = per.agg(
          count(lit(1)).as("m"),
          (sum(round(col("mean"), 6).cast(dec)).cast("double") /
            count(lit(1))).as("grand"),
          (sum(round(col("se2"), 6).cast(dec)).cast("double") /
            count(lit(1))).as("se2_bar"))
      val withDev = per.crossJoin(hyper)
        .withColumn("dev2", round((col("mean") - col("grand")) *
          (col("mean") - col("grand")), 6).cast(dec))
      val c = withDev.groupBy(col("m"), col("grand"), col("se2_bar"))
        .agg(sum(col("dev2")).cast("double").as("ss_dev"))
        .select(col("grand"),
          greatest(lit(0.0), lit(1.0) -
            (col("m") - 3).cast("double") * col("se2_bar") / col("ss_dev"))
            .as("c"))
      per.crossJoin(c)
        .select(col("source"), col("n").as("n_docs"),
          round(col("mean"), 4).as("raw_mean"),
          round(col("grand") + col("c") * (col("mean") - col("grand")), 4)
            .as("js_mean"),
          round(col("c"), 6).as("shrink_factor"))
        .orderBy(col("source"))
    },
    Some("""WITH d AS (SELECT source, CAST(n_chars AS DOUBLE) AS x FROM documents),
      per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(round(x, 6) AS DECIMAL(28,10))) AS sx,
          SUM(CAST(round(x * x, 6) AS DECIMAL(28,10))) AS sxx
        FROM d GROUP BY 1),
      per2 AS (SELECT source, n,
          CAST(sx AS DOUBLE) / n AS mean,
          ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / n)
            / (n - 1)) / n AS se2
        FROM per),
      hyper AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
          CAST(SUM(CAST(round(mean, 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS grand,
          CAST(SUM(CAST(round(se2, 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*) AS se2_bar
        FROM per2),
      cdf AS (SELECT h.grand,
          greatest(0.0, 1.0 - CAST(h.m - 3 AS DOUBLE) * h.se2_bar / s.ss_dev) AS c
        FROM hyper h CROSS JOIN (
          SELECT CAST(SUM(CAST(round((p.mean - h2.grand) * (p.mean - h2.grand), 6)
            AS DECIMAL(28,10))) AS DOUBLE) AS ss_dev
          FROM per2 p CROSS JOIN hyper h2) s)
      SELECT p.source, p.n AS n_docs, round(p.mean, 4) AS raw_mean,
        round(c.grand + c.c * (p.mean - c.grand), 4) AS js_mean,
        round(c.c, 6) AS shrink_factor
      FROM per2 p CROSS JOIN cdf c
      ORDER BY p.source"""))

  val all: Seq[QueryDef] = Seq(q374IsotonicCalibration, q375JamesStein)
}
