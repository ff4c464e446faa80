package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Heavy-hitter wave: sharded Misra–Gries summaries merged by the
  * Agarwal et al. (PODS'12) mergeable-summaries rule, audited against
  * the exact global top tokens — the deterministic counter-based
  * counterpart of the CMS sketch (q128) and the frequency analogue of
  * q387's quantile-summary merge.
  *
  * Scale shape: each shard compresses its exact counts to ≤k counters
  * (the "subtract the (k+1)-th largest, drop ≤0" compress step — the
  * order-free formulation of running MG over the shard); the merge adds
  * counters and compresses once more. Only the ≤ 8k merged counters and
  * the audit's one extra count pass ever leave the shards.
  */
object HeavyOps {

  /** MG(k=16) over 8 document shards. Per shard the summary estimate is
    * est = max(0, c − t) with t the shard's (k+1)-th largest token
    * count; merged estimates subtract the merge-level t once more. The
    * published MG guarantee — est ≤ exact ≤ est + Σ_shard t + t_merge —
    * is carried as err_bound and checked row-by-row in the output
    * (`within_bound`), making the summary's contract part of the
    * result, not just a comment. */
  val q393MisraGriesMerge: QueryDef = QueryDef(
    "q393_misra_gries_merge",
    (s, dir) => {
      val k = 16
      val toks = Tables(s, dir).documents
        .select(pmod(col("doc_id"), lit(8L)).as("shard"),
          explode(TextOps.tokens(col("text"))).as("token"))
      val shardCnt = toks.groupBy(col("shard"), col("token"))
        .agg(count(lit(1)).cast("long").as("c"))
      val wShard = Window.partitionBy(col("shard"))
        .orderBy(col("c").desc, col("token"))
      val withT = shardCnt
        .withColumn("rn", row_number().over(wShard))
        .withColumn("t_shard", coalesce(
          max(when(col("rn") === k + 1, col("c")))
            .over(Window.partitionBy(col("shard"))), lit(0L)))
      val shardSummary = withT
        .withColumn("est", col("c") - col("t_shard"))
        .where(col("est") > 0)
      // merge: add counters, compress once more at the merge level
      val merged = shardSummary.groupBy(col("token"))
        .agg(sum(col("est")).as("m"))
      val wM = Window.orderBy(col("m").desc, col("token"))
      val wAll = Window.partitionBy()
      val finalEst = merged
        .withColumn("rn", row_number().over(wM))
        .withColumn("t_merge", coalesce(
          max(when(col("rn") === k + 1, col("m"))).over(wAll), lit(0L)))
        .withColumn("est", col("m") - col("t_merge"))
        .where(col("est") > 0)
      val subtracted = withT.groupBy(col("shard"))
        .agg(max(col("t_shard")).as("t_shard"))
        .agg(sum(col("t_shard")).as("sum_t")).head().getLong(0)
      val exact = toks.groupBy(col("token"))
        .agg(count(lit(1)).cast("long").as("exact"))
      finalEst.join(exact, Seq("token"))
        .withColumn("err_bound", lit(subtracted) + col("t_merge"))
        .withColumn("deficit", col("exact") - col("est"))
        .withColumn("within_bound",
          col("deficit") >= 0 && col("deficit") <= col("err_bound"))
        .withColumn("hh_rank", row_number().over(
          Window.orderBy(col("est").desc, col("token"))).cast("long"))
        .select(col("token"), col("est"), col("exact"), col("deficit"),
          col("err_bound"), col("within_bound"), col("hh_rank"))
        .orderBy(col("hh_rank"))
    },
    Some("""WITH toks AS (SELECT doc_id % 8 AS shard,
          UNNEST(regexp_extract_all(lower(text), '\w+')) AS token
        FROM documents),
      sc AS (SELECT shard, token, CAST(COUNT(*) AS BIGINT) AS c
        FROM toks GROUP BY 1, 2),
      rk AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY shard
          ORDER BY c DESC, token) AS rn FROM sc),
      tt AS (SELECT *, COALESCE(MAX(CASE WHEN rn = 17 THEN c END)
          OVER (PARTITION BY shard), 0) AS t_shard FROM rk),
      summ AS (SELECT shard, token, c - t_shard AS est, t_shard
        FROM tt WHERE c - t_shard > 0),
      merged AS (SELECT token, CAST(SUM(est) AS BIGINT) AS m
        FROM summ GROUP BY 1),
      mrk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY m DESC, token) AS rn
        FROM merged),
      mtt AS (SELECT *, COALESCE(MAX(CASE WHEN rn = 17 THEN m END)
          OVER (), 0) AS t_merge FROM mrk),
      fin AS (SELECT token, m - t_merge AS est, t_merge
        FROM mtt WHERE m - t_merge > 0),
      subt AS (SELECT CAST(SUM(t_shard) AS BIGINT) AS sum_t
        FROM (SELECT shard, MAX(t_shard) AS t_shard FROM tt GROUP BY 1)),
      exact AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS exact
        FROM toks GROUP BY 1)
      SELECT f.token, f.est, e.exact, e.exact - f.est AS deficit,
        (SELECT sum_t FROM subt) + f.t_merge AS err_bound,
        e.exact - f.est >= 0
          AND e.exact - f.est <= (SELECT sum_t FROM subt) + f.t_merge
          AS within_bound,
        CAST(ROW_NUMBER() OVER (ORDER BY f.est DESC, f.token) AS BIGINT)
          AS hh_rank
      FROM fin f JOIN exact e ON e.token = f.token
      ORDER BY hh_rank"""))

  val all: Seq[QueryDef] = Seq(q393MisraGriesMerge)
}
