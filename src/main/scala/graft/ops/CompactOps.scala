package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Compaction-planning wave: the small-file compaction plan a lakehouse
  * table service (Iceberg/Delta-style OPTIMIZE) computes before
  * rewriting — group each source's undersized files into target-sized
  * output bins and audit the fill. The greedy size-descending
  * cumulative-sum assignment is the deterministic, shuffle-free form of
  * first-fit-decreasing: every bin except possibly the last is ≥ the
  * target when closed.
  *
  * Scale shape: file statistics are one aggregation of the corpus
  * (here: (source × 32-bucket) char masses standing in for file
  * bytes); planning itself is windows over the file-stat frame — a
  * metadata-sized problem at any corpus scale, which is the point:
  * compaction planning must never rescan the data.
  */
object CompactOps {

  /** Plan compaction of the (source, doc_id%32) "files" into bins of
    * target size T = 4× the global mean file size: files sorted size
    * desc within source, bin = prior-cumulative-size div T. Output one
    * row per planned bin with its fill ratio, plus the source's
    * before/after small-file census (small = < T/2). */
  val q400CompactionPlan: QueryDef = QueryDef(
    "q400_compaction_plan",
    (s, dir) => {
      val files = Tables(s, dir).documents
        .groupBy(col("source"), pmod(col("doc_id"), lit(32L)).as("bucket"))
        .agg(sum(col("n_chars")).as("bytes"))
      val w = Window.partitionBy()
      val withT = files
        .withColumn("tot4", sum(col("bytes")).over(w) * 4L)
        .withColumn("nf_tot", count(lit(1)).over(w))
        .withColumn("t_target", expr("tot4 DIV nf_tot"))
      val wSrc = Window.partitionBy(col("source"))
        .orderBy(col("bytes").desc, col("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val planned = withT
        .withColumn("cum_prev",
          coalesce(sum(col("bytes")).over(wSrc), lit(0L)))
        .withColumn("bin", expr("cum_prev DIV t_target"))
      val small = planned
        .groupBy(col("source").as("src2"))
        .agg(sum(when(col("bytes") * 2 < col("t_target"), 1L).otherwise(0L))
          .as("n_small_before"))
      planned
        .groupBy(col("source"), col("bin"), col("t_target"))
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum(col("bytes")).as("planned_bytes"))
        .join(small, col("source") === col("src2"))
        .withColumn("fill_ratio", round(
          col("planned_bytes").cast("double") / col("t_target"), 4))
        .withColumn("n_bins", count(lit(1)).over(
          Window.partitionBy(col("source"))).cast("long"))
        .select(col("source"), col("bin"), col("n_files"),
          col("planned_bytes"), col("t_target"), col("fill_ratio"),
          col("n_small_before"), col("n_bins"))
        .orderBy(col("source"), col("bin"))
    },
    Some("""WITH files AS (SELECT source, doc_id % 32 AS bucket,
          CAST(SUM(n_chars) AS BIGINT) AS bytes
        FROM documents GROUP BY 1, 2),
      tt AS (SELECT *, CAST(SUM(bytes) OVER () * 4
          // COUNT(*) OVER () AS BIGINT) AS t_target
        FROM files),
      planned AS (SELECT *,
          CAST(COALESCE(SUM(bytes) OVER (PARTITION BY source
            ORDER BY bytes DESC, bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // t_target AS BIGINT) AS bin
        FROM tt),
      small AS (SELECT source,
          CAST(SUM(CASE WHEN bytes * 2 < t_target THEN 1 ELSE 0 END)
            AS BIGINT) AS n_small_before
        FROM planned GROUP BY 1),
      bins AS (SELECT p.source, p.bin, p.t_target,
          CAST(COUNT(*) AS BIGINT) AS n_files,
          CAST(SUM(p.bytes) AS BIGINT) AS planned_bytes
        FROM planned p GROUP BY 1, 2, 3)
      SELECT b.source, b.bin, b.n_files, b.planned_bytes, b.t_target,
        round(CAST(b.planned_bytes AS DOUBLE) / b.t_target, 4) AS fill_ratio,
        s.n_small_before,
        CAST(COUNT(*) OVER (PARTITION BY b.source) AS BIGINT) AS n_bins
      FROM bins b JOIN small s ON s.source = b.source
      ORDER BY b.source, b.bin"""))

  val all: Seq[QueryDef] = Seq(q400CompactionPlan)
}
