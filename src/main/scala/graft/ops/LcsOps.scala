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

  /** The row-major rolling-window LCS fold over array columns `at`/`bt`
    * — ONE expression shared verbatim by q569 (token arrays) and q574
    * (char arrays), so the verify stage runs the exact recurrence the
    * fixture query certified. */
  private[graft] val lcsFoldSql: String = """aggregate(
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
            w -> element_at(w, size(bt) + 2))"""

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
          expr(s"$lcsFoldSql AS lcs_len"))
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

  private val TopK  = 2
  private val MaxCh = 24

  /** LCS as the post-blocking VERIFY stage of the linkage pipeline —
    * the role q569's scaladoc names: consume q546's (2-char block)
    * Jaro-Winkler candidates, keep the top-[[TopK]] per name (bounded
    * fan-in, the q115 ±1-probe discipline), and LCS-verify each pair
    * at CHARACTER level with the EXACT fold q569 certified
    * ([[lcsFoldSql]], shared verbatim; names truncated to [[MaxCh]]
    * chars by contract). The containment score lcs/min(len) is the
    * order-aware confirmation JW alone can't give — transposed-token
    * names score high on JW but low on LCS containment.
    *
    * Scale shape: |names| distinct census → block equi-join → per-name
    * top-K window over block-bounded candidates → one O(MaxCh²)
    * codegen fold per surviving pair: pairs ≤ TopK·|names| by
    * construction, never block². */
  val q574LcsLinkageVerify: QueryDef = QueryDef(
    "q574_lcs_linkage_verify",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val jw = udf((a: String, b: String) =>
        graft.functions.StringSim.jaroWinkler(a, b))
      val names = Tables(s, dir).part
        .select(lower(col("p_name")).as("name"))
        .distinct()
        .withColumn("blk", substring(col("name"), 1, 2))
        .localCheckpoint() // both sides of the block self-join read this
      val best = Window.partitionBy(col("name"))
        .orderBy(col("jw").desc, col("cand").asc)
      val pairs = names.alias("a")
        .join(names.alias("b"), Seq("blk"))
        .filter(col("a.name") =!= col("b.name"))
        .select(col("a.name").as("name"), col("b.name").as("cand"))
        .withColumn("jw", round(jw(col("name"), col("cand")), 6))
        .withColumn("rk", row_number().over(best))
        .filter(col("rk") <= TopK)
      pairs
        .withColumn("at",
          expr(s"slice(regexp_extract_all(name, '.', 0), 1, $MaxCh)"))
        .withColumn("bt",
          expr(s"slice(regexp_extract_all(cand, '.', 0), 1, $MaxCh)"))
        .select(col("name"), col("cand"), col("jw"),
          size(col("at")).cast("long").as("len_a"),
          size(col("bt")).cast("long").as("len_b"),
          expr(s"$lcsFoldSql AS lcs_len"))
        .withColumn("containment", round(
          col("lcs_len") / least(col("len_a"), col("len_b")), 6))
        .orderBy(col("name"), col("cand"))
    },
    Some(s"""WITH RECURSIVE names AS (
        SELECT DISTINCT lower(p_name) AS name FROM part),
      blocked AS (
        SELECT name, substr(name, 1, 2) AS blk FROM names),
      scored AS (
        SELECT a.name AS name, b.name AS cand,
          round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name <> b.name),
      pairs AS (
        SELECT name, cand, jw FROM (
          SELECT name, cand, jw, ROW_NUMBER() OVER (PARTITION BY name
            ORDER BY jw DESC, cand ASC) AS rk FROM scored)
        WHERE rk <= $TopK),
      dims AS (
        SELECT name, cand, jw,
          regexp_extract_all(name, '.')[1:$MaxCh] AS at,
          regexp_extract_all(cand, '.')[1:$MaxCh] AS bt,
          CAST(len(regexp_extract_all(name, '.')[1:$MaxCh]) AS BIGINT) AS na,
          CAST(len(regexp_extract_all(cand, '.')[1:$MaxCh]) AS BIGINT) AS nb
        FROM pairs),
      -- the q569 rolling-window DP, keyed per (name, cand) pair
      dp(name, cand, k, w) AS (
        SELECT name, cand, CAST(-1 AS BIGINT),
          list_transform(range(0, CAST(nb AS INT) + 2), x -> CAST(0 AS BIGINT))
        FROM dims
        UNION ALL
        SELECT d.name, d.cand, dp.k + 1,
          dp.w[2:] || [CASE WHEN (dp.k + 1) % (d.nb + 1) = 0 THEN CAST(0 AS BIGINT)
            WHEN d.at[CAST((dp.k + 1) // (d.nb + 1) AS INT) + 1]
               = d.bt[CAST((dp.k + 1) % (d.nb + 1) AS INT)] THEN dp.w[1] + 1
            ELSE greatest(dp.w[2], dp.w[CAST(d.nb AS INT) + 2])
          END]
        FROM dp JOIN dims d ON d.name = dp.name AND d.cand = dp.cand
        WHERE dp.k + 1 < d.na * (d.nb + 1))
      SELECT d.name, d.cand, d.jw, d.na AS len_a, d.nb AS len_b,
        CAST(f.w[CAST(d.nb AS INT) + 2] AS BIGINT) AS lcs_len,
        round(CAST(f.w[CAST(d.nb AS INT) + 2] AS BIGINT)
          / least(d.na, d.nb), 6) AS containment
      FROM dims d
      JOIN (SELECT name, cand, w,
              row_number() OVER (PARTITION BY name, cand ORDER BY k DESC) AS rn
            FROM dp) f ON f.name = d.name AND f.cand = d.cand AND f.rn = 1
      ORDER BY d.name, d.cand"""))

  val all: Seq[QueryDef] = Seq(q569LcsPairs, q574LcsLinkageVerify)
}
