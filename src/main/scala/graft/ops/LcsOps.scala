package graft.ops

import org.apache.spark.sql.functions._

/** Longest-common-subsequence length between paired documents — the
  * order-aware similarity the set-based dedup family (Jaccard, SimHash,
  * suffix dup) cannot see: LCS distinguishes shuffled token bags from
  * genuinely shared passages. Classic O(m·n) Wagner-Fischer DP, run as
  * a ROW-MAJOR rolling-window fold: the state is the last n_b+2 DP
  * cells, so cell (i,j) reads dp[i−1][j−1], dp[i−1][j] and dp[i][j−1]
  * from fixed window positions — the SAME recurrence evaluates in both
  * engines (one codegen `aggregate` per pair here, one recursive-CTE
  * chain per pair in DuckDB), eliminating any reformulation-parity
  * risk.
  *
  * Scale shape: the fixture is explicitly BOUNDED — ten deterministic
  * doc pairs (2i, 2i+1), each truncated to its first 40 tokens — so
  * the DP is model-sized (≤ 10 × 40×41 cells). At corpus scale LCS is
  * what you run on candidate pairs AFTER a cheap blocking pass (the
  * q546 linkage discipline), never all-pairs; the per-pair fold shape
  * is unchanged there.
  *
  * Exactness: all-BIGINT DP — no floats anywhere.
  */
object LcsOps {

  private val Pairs  = 10
  private val MaxTok = 40

  val q569LcsPairs: QueryDef = QueryDef(
    "q569_lcs_pairs",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .filter(col("doc_id") < Pairs * 2)
        .select(expr("doc_id DIV 2").as("pair_id"),
          (col("doc_id") % 2).as("side"),
          expr(s"slice(regexp_extract_all(lower(text), '\\\\w+', 0), 1, $MaxTok)")
            .as("toks"))
      val pairs = docs.groupBy(col("pair_id"))
        .agg(max(when(col("side") === 0, col("toks"))).as("at"),
          max(when(col("side") === 1, col("toks"))).as("bt"))
      pairs
        .select(col("pair_id"),
          size(col("at")).cast("long").as("len_a"),
          size(col("bt")).cast("long").as("len_b"),
          expr("""aggregate(
            sequence(0, size(at) * (size(bt) + 1) - 1),
            array_repeat(0L, size(bt) + 2),
            (w, k) -> concat(slice(w, 2, size(bt) + 1), array(
              CASE WHEN k % (size(bt) + 1) = 0 THEN 0L
                WHEN element_at(at, CAST(k DIV (size(bt) + 1) AS INT) + 1)
                   = element_at(bt, CAST(k % (size(bt) + 1) AS INT)) THEN
                  element_at(w, 1) + 1L
                ELSE greatest(element_at(w, 2),
                  element_at(w, size(bt) + 2))
              END)),
            w -> element_at(w, size(bt) + 2)) AS lcs_len"""))
        .orderBy(col("pair_id"))
    },
    Some(s"""WITH RECURSIVE docs AS (
        SELECT doc_id // 2 AS pair_id, doc_id % 2 AS side,
          regexp_extract_all(lower(text), '\\w+')[1:$MaxTok] AS toks
        FROM documents WHERE doc_id < ${Pairs * 2}),
      pairs AS (
        SELECT pair_id,
          MAX(CASE WHEN side = 0 THEN toks END) AS at,
          MAX(CASE WHEN side = 1 THEN toks END) AS bt
        FROM docs GROUP BY 1),
      dims AS (
        SELECT pair_id, at, bt,
          CAST(len(at) AS BIGINT) AS na, CAST(len(bt) AS BIGINT) AS nb
        FROM pairs),
      -- row-major rolling window: w holds the last nb+2 DP cells; cell
      -- k (i = k // (nb+1) + 1, j = k % (nb+1)) reads dp[i-1][j-1] =
      -- w[1], dp[i-1][j] = w[2], dp[i][j-1] = w[nb+2]
      dp(pair_id, k, w) AS (
        SELECT pair_id, CAST(-1 AS BIGINT),
          list_transform(range(0, CAST(nb AS INT) + 2), x -> CAST(0 AS BIGINT))
        FROM dims
        UNION ALL
        SELECT d.pair_id, dp.k + 1,
          dp.w[2:] || [CASE WHEN (dp.k + 1) % (d.nb + 1) = 0 THEN CAST(0 AS BIGINT)
            WHEN d.at[CAST((dp.k + 1) // (d.nb + 1) AS INT) + 1]
               = d.bt[CAST((dp.k + 1) % (d.nb + 1) AS INT)] THEN dp.w[1] + 1
            ELSE greatest(dp.w[2], dp.w[CAST(d.nb AS INT) + 2])
          END]
        FROM dp JOIN dims d ON d.pair_id = dp.pair_id
        WHERE dp.k + 1 < d.na * (d.nb + 1))
      SELECT d.pair_id, d.na AS len_a, d.nb AS len_b,
        CAST(f.w[CAST(d.nb AS INT) + 2] AS BIGINT) AS lcs_len
      FROM dims d
      JOIN (SELECT pair_id, w,
              row_number() OVER (PARTITION BY pair_id ORDER BY k DESC) AS rn
            FROM dp) f ON f.pair_id = d.pair_id AND f.rn = 1
      ORDER BY d.pair_id"""))

  val all: Seq[QueryDef] = Seq(q569LcsPairs)
}
