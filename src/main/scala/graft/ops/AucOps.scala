package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ROC AUC via the Mann–Whitney U identity (Hanley & McNeil 1982) —
  * the ranking-quality number every classifier eval reports, computed
  * EXACTLY with midrank tie handling: AUC = (Σ_pos 2·midrank − n₁(n₁+1))
  * / (2·n₁·n₀). Here the score is order value (cents) and the label is
  * urgency — the audit answers "does price rank urgency at all?"
  * (reference: overseer's arbitrary handler fns,
  * src/overseer/executor.clj:12-39; q193's PR-curve sibling on the
  * threshold-free side).
  *
  * Scale shape: ONE scan hash-aggs to the distinct-score census
  * (value → count, pos-count); midranks come from a single window over
  * that census — ranks of the CENSUS, not the rows, so the sort is
  * distinct-value-sized (the q152/q490 no-row-sort discipline).
  *
  * Exactness: 2·midrank = 2·cum_before + cnt + 1 is an exact BIGINT
  * (no half-rank floats), S₂ = Σ pos·(2·midrank) is an exact sum, and
  * AUC is ONE float division — cross-engine deterministic.
  */
object AucOps {

  val q533AucMannWhitney: QueryDef = QueryDef(
    "q533_auc_mann_whitney",
    (s, dir) => {
      val census = Tables(s, dir).orders
        .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("y"))
        .groupBy(col("c"))
        .agg(count(lit(1)).as("cnt"), sum(col("y")).as("pos"))
      // cents-census prefix counts, size-adaptive (r15); rank column
      // renamed away from the 'pos' (positives) output column.
      // r15-opt: the probe is a metadata-cheap |orders| upper bound on
      // the census (≤ one row per distinct cents value), so the census
      // is computed once in the prefix pass — no checkpoint, no count
      // job.
      val ranked = Spine.adaptiveRank(census, Seq(col("c")), Seq("cnt"),
          rankCol = "__rk", knownCount = Tables(s, dir).orders.count())
        .withColumnRenamed("cum_cnt", "cum")
        .select(col("pos"), col("cnt"),
          // 2·midrank of every row in this tie group
          (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + 1).as("mr2"))
      ranked.agg(
          sum(col("pos")).as("n1"),
          sum(col("cnt") - col("pos")).as("n0"),
          sum(col("pos") * col("mr2")).as("s2"))
        .select(col("n1"), col("n0"), col("s2"),
          round((col("s2") - col("n1") * (col("n1") + 1)).cast("double") /
            (lit(2.0) * col("n1") * col("n0")), 9).as("auc"))
    },
    Some("""WITH census AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
          CAST(COUNT(*) AS BIGINT) AS cnt,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS pos
        FROM orders GROUP BY 1),
      ranked AS (
        SELECT pos, cnt,
          2 * (SUM(cnt) OVER (ORDER BY c) - cnt) + cnt + 1 AS mr2
        FROM census),
      sums AS (
        SELECT CAST(SUM(pos) AS BIGINT) AS n1,
          CAST(SUM(cnt - pos) AS BIGINT) AS n0,
          CAST(SUM(pos * mr2) AS BIGINT) AS s2
        FROM ranked)
      SELECT n1, n0, s2,
        round(CAST(s2 - n1 * (n1 + 1) AS DOUBLE) / (2.0 * n1 * n0), 9) AS auc
      FROM sums"""))

  val all: Seq[QueryDef] = Seq(q533AucMannWhitney)
}
