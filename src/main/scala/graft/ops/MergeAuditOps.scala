package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sketch-mergeability wave: the distributed-quantile audit — how much
  * rank accuracy a 32-boundary per-shard summary loses when four
  * shards' summaries are merged, against exact global order
  * statistics. This is the correctness contract behind every
  * "approx_percentile over partitions then merge" pipeline.
  *
  * Scale shape: per-shard boundaries are one window pass; the audit
  * joins a 5-row probe frame against the 128-row merged summary —
  * everything after the scan is model-sized, and every estimate is
  * exact integer arithmetic (step-function ranks, no interpolation),
  * so the published error IS the summary's true error.
  */
object MergeAuditOps {

  /** Merged-summary quantile audit: orders are md5-split into 4 shards;
    * each shard publishes 32 equi-depth boundaries (value + cumulative
    * count — the mergeable state of any equi-depth sketch). For the
    * exact global q ∈ {.25, .5, .75, .9, .99} order statistics, the
    * merged rank estimate Σ_shards max{cum_j : v_j ≤ v} is compared to
    * the true rank; the step-function construction bounds per-shard
    * error by n_s/32, so merged relative error ≤ 1/32 — the theorem
    * the spec asserts and the audit certifies empirically. */
  val q387ShardQuantileMerge: QueryDef = QueryDef(
    "q387_shard_quantile_merge",
    (s, dir) => {
      val o = Tables(s, dir).orders
        .select(col("o_orderkey"), col("o_totalprice").as("v"),
          (conv(substring(md5(col("o_orderkey").cast("string")), 1, 2), 16, 10)
            .cast("long") % 4).as("shard"))
        .localCheckpoint() // feeds shard summaries, probes, and true ranks
      val n = o.count()
      // exact global probe values at the five quantiles
      // exact global probe ranks, size-adaptive (r15): window at bench
      // scale, spine above; probe count = the n already computed on the
      // checkpointed frame
      val probes = Spine.adaptiveRank(o,
          Seq(col("v"), col("o_orderkey")), rankCol = "rn", knownCount = n)
        .crossJoin(broadcast(s.createDataFrame(
          Seq(Tuple1(0.25), Tuple1(0.5), Tuple1(0.75), Tuple1(0.9), Tuple1(0.99)))
          .toDF("q")))
        .filter(col("rn") === ceil(col("q") * n).cast("long"))
        .select(col("q"), col("v").as("probe_v"), col("rn").cast("long").as("true_rank"))
        .localCheckpoint()
      // per-shard 32-boundary equi-depth summary (value, cumulative count)
      val shardN = o.groupBy(col("shard")).agg(count(lit(1)).as("n_s"))
      val bounds = o
        .withColumn("srn", row_number().over(
          Window.partitionBy(col("shard")).orderBy(col("v"), col("o_orderkey"))))
        .join(broadcast(shardN), Seq("shard"))
        .crossJoin(broadcast(s.range(1, 33).toDF("j")))
        .filter(col("srn") === ceil(col("j") * col("n_s") / 32.0).cast("long"))
        .select(col("shard"), col("j"), col("v").as("bv"), col("srn").as("cum"))
      // merged rank estimate: per shard the deepest boundary <= probe
      val est = probes.join(broadcast(bounds), col("bv") <= col("probe_v"))
        .groupBy(col("q"), col("probe_v"), col("true_rank"), col("shard"))
        .agg(max(col("cum")).as("rank_s"))
        .groupBy(col("q"), col("probe_v"), col("true_rank"))
        .agg(sum(col("rank_s")).as("merged_rank"))
      est
        .select(col("q"), round(col("probe_v"), 2).as("probe_value"),
          col("true_rank"), col("merged_rank"),
          round(abs(col("merged_rank") - col("true_rank")).cast("double") /
            lit(n.toDouble), 6).as("rel_rank_err"))
        .orderBy(col("q"))
    },
    Some("""WITH o AS (SELECT o_orderkey,  o_totalprice AS v,
          ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))::BIGINT % 4 AS shard
        FROM orders),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
      ranked AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v, o_orderkey) AS rn FROM o),
      qs AS (SELECT UNNEST([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE,
        0.9::DOUBLE, 0.99::DOUBLE]) AS q),
      probes AS (SELECT qs.q, r.v AS probe_v, r.rn AS true_rank
        FROM ranked r CROSS JOIN nn JOIN qs
          ON r.rn = CAST(ceil(qs.q * nn.n) AS BIGINT)),
      sn AS (SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_s FROM o GROUP BY 1),
      sr AS (SELECT shard, v,
          ROW_NUMBER() OVER (PARTITION BY shard ORDER BY v, o_orderkey) AS srn
        FROM o),
      bounds AS (SELECT sr.shard, j.j, sr.v AS bv, sr.srn AS cum
        FROM sr JOIN sn USING (shard)
        JOIN (SELECT UNNEST(range(1, 33)) AS j) j
          ON sr.srn = CAST(ceil(j.j * sn.n_s / 32.0) AS BIGINT)),
      est AS (SELECT p.q, p.probe_v, p.true_rank,
          CAST(SUM(rank_s) AS BIGINT) AS merged_rank
        FROM (SELECT p.q, p.probe_v, p.true_rank, b.shard,
            MAX(b.cum) AS rank_s
          FROM probes p JOIN bounds b ON b.bv <= p.probe_v
          GROUP BY 1, 2, 3, 4) p
        GROUP BY 1, 2, 3)
      SELECT est.q, round(est.probe_v, 2) AS probe_value, est.true_rank,
        est.merged_rank,
        round(CAST(abs(est.merged_rank - est.true_rank) AS DOUBLE)
          / (SELECT CAST(n AS DOUBLE) FROM nn), 6) AS rel_rank_err
      FROM est ORDER BY est.q"""))

  val all: Seq[QueryDef] = Seq(q387ShardQuantileMerge)
}
