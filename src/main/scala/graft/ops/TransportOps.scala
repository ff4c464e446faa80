package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Optimal-transport wave: the 1-D Wasserstein (earth-mover) distance
  * between each source's document-length distribution and the corpus
  * distribution — the transport metric that, unlike PSI (q174) or KS
  * (q235), weighs *how far* mass must move, not just that it differs,
  * so a source whose lengths shifted by one bin scores far below one
  * whose lengths jumped to the tail.
  *
  * Scale shape: one scan bins every document; everything after is a
  * (source × 20-bin) frame. W1 on the line is the closed form
  * Σ_bins |F_a − F_b| · binwidth — no transport LP needed.
  */
object TransportOps {

  /** W1 between per-source and global n_chars distributions on 20
    * equal-width bins. Bins are densified (a source missing a bin
    * still carries its CDF forward), CDFs are exact-integer ratios,
    * and the 20 |ΔCDF| terms are summed as DECIMAL so neither engine's
    * float order can perturb the reported distance. */
  val q392WassersteinDrift: QueryDef = QueryDef(
    "q392_wasserstein_drift",
    (s, dir) => {
      val d = Tables(s, dir).documents.select(col("source"), col("n_chars"))
      val w = Window.partitionBy()
      val binned = d
        .withColumn("maxc", max(col("n_chars")).over(w))
        .withColumn("bin",
          (col("n_chars") * 20L / (col("maxc") + 1L)).cast("long"))
      val perSrc = binned.groupBy(col("source"), col("bin"))
        .agg(count(lit(1)).cast("long").as("cnt"))
      val srcTot = perSrc.groupBy(col("source"))
        .agg(sum(col("cnt")).as("n_src"))
      val glob = binned.groupBy(col("bin"))
        .agg(count(lit(1)).cast("long").as("gcnt"))
      val nTot = d.count()
      val maxc = d.agg(max(col("n_chars"))).head().getLong(0)
      // densify: every source × every bin 0..19
      val grid = srcTot.select(col("source"), col("n_src"),
        explode(sequence(lit(0L), lit(19L))).as("bin"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("bin"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val cdf = grid
        .join(perSrc, Seq("source", "bin"), "left")
        .join(glob, Seq("bin"), "left")
        .withColumn("scum", sum(coalesce(col("cnt"), lit(0L))).over(wCum))
        .withColumn("gcum", sum(coalesce(col("gcnt"), lit(0L))).over(wCum))
        .withColumn("f_src", col("scum").cast("double") / col("n_src"))
        .withColumn("f_glob", col("gcum").cast("double") / lit(nTot.toDouble))
      cdf.groupBy(col("source"))
        .agg(max(col("n_src")).as("n_docs"),
          sum(round(abs(col("f_src") - col("f_glob")), 9)
            .cast(DecimalType(24, 9))).as("sum_dcdf"))
        .withColumn("w1_chars", round(
          col("sum_dcdf").cast("double") * lit((maxc + 1L).toDouble / 20.0), 4))
        .withColumn("w1_norm", round(
          col("sum_dcdf").cast("double") / lit(20.0), 6))
        .withColumn("drift_rank", row_number().over(
          Window.orderBy(col("w1_norm").desc, col("source"))).cast("long"))
        .select(col("source"), col("n_docs"), col("w1_chars"),
          col("w1_norm"), col("drift_rank"))
        .orderBy(col("drift_rank"))
    },
    Some("""WITH d AS (SELECT source, n_chars,
          MAX(n_chars) OVER () AS maxc,
          CAST(COUNT(*) OVER () AS BIGINT) AS n_tot
        FROM documents),
      binned AS (SELECT source, n_tot, maxc,
          (n_chars * 20) // (maxc + 1) AS bin FROM d),
      per AS (SELECT source, bin, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM binned GROUP BY 1, 2),
      tot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_src
        FROM per GROUP BY 1),
      gbins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS gcnt
        FROM binned GROUP BY 1),
      consts AS (SELECT MAX(maxc) AS maxc, MAX(n_tot) AS n_tot FROM d),
      grid AS (SELECT t.source, t.n_src, b.range AS bin
        FROM tot t, range(0, 20) b),
      cdf AS (SELECT g.source, g.n_src, g.bin,
          SUM(COALESCE(p.cnt, 0)) OVER (PARTITION BY g.source ORDER BY g.bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS scum,
          SUM(COALESCE(gl.gcnt, 0)) OVER (PARTITION BY g.source ORDER BY g.bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gcum
        FROM grid g
        LEFT JOIN per p ON p.source = g.source AND p.bin = g.bin
        LEFT JOIN gbins gl ON gl.bin = g.bin),
      agg AS (SELECT source, MAX(n_src) AS n_docs,
          SUM(CAST(round(abs(CAST(scum AS DOUBLE) / n_src
            - CAST(gcum AS DOUBLE) / (SELECT n_tot FROM consts)), 9)
            AS DECIMAL(24,9))) AS sum_dcdf
        FROM cdf GROUP BY 1)
      SELECT source, n_docs,
        round(CAST(sum_dcdf AS DOUBLE)
          * (CAST((SELECT maxc FROM consts) + 1 AS DOUBLE) / 20.0), 4)
          AS w1_chars,
        round(CAST(sum_dcdf AS DOUBLE) / 20.0, 6) AS w1_norm,
        CAST(ROW_NUMBER() OVER (ORDER BY round(CAST(sum_dcdf AS DOUBLE) / 20.0, 6)
          DESC, source) AS BIGINT) AS drift_rank
      FROM agg ORDER BY drift_rank"""))

  val all: Seq[QueryDef] = Seq(q392WassersteinDrift)
}
