package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Tuning & budget wave: train/test n-gram coverage (the
  * generalization-gap proxy), successive-halving hyperparameter
  * tournaments, top-k gradient sparsification accounting, and a
  * minimal-move shard rebalance plan.
  */
object TuneOps {

  /** Train/test n-gram coverage: an md5 75/25 document split, then for
    * n = 1, 2, 3 the share of distinct test n-grams (and of test n-gram
    * MASS) already seen in train. The held-out-coverage curve that
    * predicts how much of an eval set a memorizing model could have seen
    * — type coverage falls with n, mass coverage falls slower. All
    * frames are n-gram-type-sized; the join key is the n-gram itself. */
  val q282OovCoverage: QueryDef = QueryDef(
    "q282_oov_coverage",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .withColumn("is_test",
          conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10).cast("int") >= 12)
        .localCheckpoint() // feeds all three n-gram sizes on both sides
      def grams(n: Int) = docs
        .filter(size(col("toks")) >= n)
        .select(col("is_test"), explode(expr(
          s"transform(sequence(0, size(toks)-$n), i -> concat_ws(' ', slice(toks, i+1, $n)))")).as("g"))
        .groupBy(col("is_test"), col("g")).agg(count(lit(1)).as("c"))
      val parts = (1 to 3).map { n =>
        val byGram = grams(n)
        val test = byGram.filter(col("is_test")).select(col("g"), col("c"))
        val train = byGram.filter(!col("is_test")).select(col("g"), lit(1L).as("seen"))
        test.join(train, Seq("g"), "left")
          .agg(count(lit(1)).as("n_test_types"),
            sum(when(col("seen").isNotNull, 1L).otherwise(0L)).as("n_covered"),
            sum(col("c")).as("test_mass"),
            sum(when(col("seen").isNotNull, col("c")).otherwise(0L)).as("covered_mass"))
          .select(lit(n.toLong).as("n"), col("n_test_types"), col("n_covered"),
            round(col("n_covered").cast("double") / col("n_test_types"), 6)
              .as("type_coverage"),
            round(col("covered_mass").cast("double") / col("test_mass"), 6)
              .as("mass_coverage"))
      }
      parts.reduce(_ union _)
    },
    Some("""WITH docs AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))::INT >= 12 AS is_test
        FROM documents),
      g1 AS (SELECT is_test, t.t AS g, COUNT(*) AS c
        FROM docs, UNNEST(toks) AS t(t) GROUP BY 1, 2),
      g2 AS (SELECT is_test, t.t AS g, COUNT(*) AS c FROM (
          SELECT is_test, list_transform(range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1]) AS gs
          FROM docs WHERE len(toks) >= 2), UNNEST(gs) AS t(t) GROUP BY 1, 2),
      g3 AS (SELECT is_test, t.t AS g, COUNT(*) AS c FROM (
          SELECT is_test, list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS gs
          FROM docs WHERE len(toks) >= 3), UNNEST(gs) AS t(t) GROUP BY 1, 2),
      cov AS (
        SELECT 1 AS n, COUNT(*) AS n_test_types,
          SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS n_covered,
          SUM(te.c) AS test_mass,
          SUM(CASE WHEN tr.g IS NOT NULL THEN te.c ELSE 0 END) AS covered_mass
        FROM (SELECT g, c FROM g1 WHERE is_test) te
        LEFT JOIN (SELECT DISTINCT g FROM g1 WHERE NOT is_test) tr USING (g)
        UNION ALL
        SELECT 2, COUNT(*),
          SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END), SUM(te.c),
          SUM(CASE WHEN tr.g IS NOT NULL THEN te.c ELSE 0 END)
        FROM (SELECT g, c FROM g2 WHERE is_test) te
        LEFT JOIN (SELECT DISTINCT g FROM g2 WHERE NOT is_test) tr USING (g)
        UNION ALL
        SELECT 3, COUNT(*),
          SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END), SUM(te.c),
          SUM(CASE WHEN tr.g IS NOT NULL THEN te.c ELSE 0 END)
        FROM (SELECT g, c FROM g3 WHERE is_test) te
        LEFT JOIN (SELECT DISTINCT g FROM g3 WHERE NOT is_test) tr USING (g))
      SELECT CAST(n AS BIGINT) AS n, CAST(n_test_types AS BIGINT) AS n_test_types,
        CAST(n_covered AS BIGINT) AS n_covered,
        round(CAST(n_covered AS DOUBLE) / n_test_types, 6) AS type_coverage,
        round(CAST(covered_mass AS DOUBLE) / test_mass, 6) AS mass_coverage
      FROM cov"""))

  /** Successive halving: 16 arms with constructed success rates
    * p_a = 0.2 + 0.03a evaluated on md5-noise rewards over the order
    * log; rung 1 scores all arms on a 10% slice, rung 2 the top-8 on
    * 30%, rung 3 the top-4 on everything (ties → smaller arm). The
    * hyperparameter-search budget allocator, exactly unrolled: each
    * rung is one fan-out aggregation; the arm frame never exceeds 16
    * rows. The spec asserts the construction's best arm survives. */
  val q283SuccessiveHalving: QueryDef = QueryDef(
    "q283_successive_halving",
    (s, dir) => {
      val orders = Tables(s, dir).orders
        .select(col("o_orderkey"),
          conv(substring(md5(col("o_orderkey").cast("string")), 9, 8), 16, 10)
            .cast("double").divide(lit(4294967296.0)).as("slice_u"))
        .localCheckpoint() // three rungs, three slices
      def rung(armFilter: org.apache.spark.sql.Column, frac: Double, r: Int) =
        orders.filter(col("slice_u") < frac)
          .withColumn("arm", explode(array((0 until 16).map(lit): _*)))
          .filter(armFilter)
          .withColumn("u",
            conv(substring(md5(concat_ws("|", col("arm"), col("o_orderkey"))), 1, 8), 16, 10)
              .cast("double") / lit(4294967296.0))
          .withColumn("reward",
            when(col("u") < lit(0.2) + lit(0.03) * col("arm"), 1L).otherwise(0L))
          .groupBy(col("arm"))
          .agg(count(lit(1)).as("n_evals"), sum(col("reward")).as("wins"))
          .withColumn("mean_reward", round(col("wins").cast("double") / col("n_evals"), 9))
          .withColumn("rk", row_number().over(Window.partitionBy()
            .orderBy(col("mean_reward").desc, col("arm").asc)))
          .withColumn("rung", lit(r.toLong))
      val r1 = rung(lit(true), 0.1, 1).localCheckpoint()
      val s1 = r1.filter(col("rk") <= 8).select(col("arm")).collect().map(_.getInt(0)).toSet
      val r2 = rung(col("arm").isin(s1.toSeq: _*), 0.3, 2).localCheckpoint()
      val s2 = r2.filter(col("rk") <= 4).select(col("arm")).collect().map(_.getInt(0)).toSet
      val r3 = rung(col("arm").isin(s2.toSeq: _*), 1.0, 3)
      Seq(r1, r2, r3).reduce(_ union _)
        .select(col("rung"), col("arm").cast("long").as("arm"), col("n_evals"),
          round(col("mean_reward"), 6).as("mean_reward"), col("rk").cast("long").as("rank"))
    },
    Some("""WITH o AS (SELECT o_orderkey,
          CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 9, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 AS slice_u
        FROM orders),
      arms AS (SELECT UNNEST(range(0, 16)) AS arm),
      ev AS (SELECT o.o_orderkey, o.slice_u, a.arm,
          CASE WHEN CAST(('0x' || substr(md5(CAST(a.arm AS VARCHAR) || '|' || CAST(o.o_orderkey AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 < 0.2 + 0.03 * a.arm THEN 1 ELSE 0 END AS reward
        FROM o CROSS JOIN arms a),
      r1 AS (SELECT arm, COUNT(*) AS n_evals, SUM(reward) AS wins,
          round(CAST(SUM(reward) AS DOUBLE) / COUNT(*), 9) AS mean_reward
        FROM ev WHERE slice_u < 0.1 GROUP BY 1),
      r1k AS (SELECT *, ROW_NUMBER() OVER (ORDER BY mean_reward DESC, arm) AS rk FROM r1),
      r2 AS (SELECT arm, COUNT(*) AS n_evals, SUM(reward) AS wins,
          round(CAST(SUM(reward) AS DOUBLE) / COUNT(*), 9) AS mean_reward
        FROM ev WHERE slice_u < 0.3
          AND arm IN (SELECT arm FROM r1k WHERE rk <= 8) GROUP BY 1),
      r2k AS (SELECT *, ROW_NUMBER() OVER (ORDER BY mean_reward DESC, arm) AS rk FROM r2),
      r3 AS (SELECT arm, COUNT(*) AS n_evals, SUM(reward) AS wins,
          round(CAST(SUM(reward) AS DOUBLE) / COUNT(*), 9) AS mean_reward
        FROM ev WHERE arm IN (SELECT arm FROM r2k WHERE rk <= 4) GROUP BY 1),
      r3k AS (SELECT *, ROW_NUMBER() OVER (ORDER BY mean_reward DESC, arm) AS rk FROM r3)
      SELECT 1::BIGINT AS rung, CAST(arm AS BIGINT) AS arm,
        CAST(n_evals AS BIGINT) AS n_evals, round(mean_reward, 6) AS mean_reward,
        CAST(rk AS BIGINT) AS rank FROM r1k
      UNION ALL SELECT 2, arm, n_evals, round(mean_reward, 6), rk FROM r2k
      UNION ALL SELECT 3, arm, n_evals, round(mean_reward, 6), rk FROM r3k"""))

  /** Top-k gradient sparsification accounting: for k = 4/16/64 of 64
    * coordinates, the energy fraction each vector keeps when only its k
    * largest-magnitude coordinates survive (the deep-learning gradient
    * compression standard). Per-vector energies are order-exact DECIMAL
    * folds over the magnitude-sorted coordinate array; the corpus never
    * shuffles — one projection + a 3-row rollup. */
  val q284TopkSparsify: QueryDef = QueryDef(
    "q284_topk_sparsify",
    (s, dir) => {
      val sq = Tables(s, dir).embeddings
        .select(col("vec_id"), expr(
          """reverse(array_sort(transform(embedding,
               x -> cast(round(cast(x as double) * cast(x as double), 12) as decimal(28,14)))))""")
          .as("sqs"))
        .localCheckpoint() // three k values read the same sorted squares
      def energy(arr: String) = expr(
        s"""cast(aggregate($arr, cast(0 as decimal(28,14)),
             (acc, t) -> cast(acc + t as decimal(28,14))) as double)""")
      val parts = Seq(4, 16, 64).map { k =>
        sq.select(col("vec_id"),
            energy("sqs").as("total"),
            energy(s"slice(sqs, 1, $k)").as("kept"))
          .filter(col("total") > 0)
          .select(round(col("kept") / col("total"), 9).as("share"))
          .agg(count(lit(1)).as("n_vectors"),
            round(sum(round(col("share"), 9).cast(
              org.apache.spark.sql.types.DecimalType(28, 12))).cast("double") /
              count(lit(1)), 6).as("mean_energy"),
            round(min(col("share")), 6).as("min_energy"))
          .select(lit(k.toLong).as("k"), col("n_vectors"), col("mean_energy"),
            col("min_energy"))
      }
      parts.reduce(_ union _)
    },
    Some("""WITH sq AS (SELECT vec_id,
          list_reverse_sort(list_transform(embedding,
            x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE), 12) AS DECIMAL(28,14)))) AS sqs
        FROM embeddings),
      en AS (SELECT vec_id,
          CAST(list_sum(sqs) AS DOUBLE) AS total,
          CAST(list_sum(sqs[1:4]) AS DOUBLE) AS k4,
          CAST(list_sum(sqs[1:16]) AS DOUBLE) AS k16,
          CAST(list_sum(sqs[1:64]) AS DOUBLE) AS k64
        FROM sq),
      shares AS (SELECT vec_id,
          round(k4 / total, 9) AS s4, round(k16 / total, 9) AS s16,
          round(k64 / total, 9) AS s64
        FROM en WHERE total > 0)
      SELECT 4::BIGINT AS k, CAST(COUNT(*) AS BIGINT) AS n_vectors,
        round(CAST(SUM(CAST(round(s4, 9) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6) AS mean_energy,
        round(MIN(s4), 6) AS min_energy FROM shares
      UNION ALL SELECT 16, COUNT(*),
        round(CAST(SUM(CAST(round(s16, 9) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6),
        round(MIN(s16), 6) FROM shares
      UNION ALL SELECT 64, COUNT(*),
        round(CAST(SUM(CAST(round(s64, 9) AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*), 6),
        round(MIN(s64), 6) FROM shares"""))

  /** Minimal-move shard rebalance plan: token load per md5-mod-8 shard,
    * balanced integer targets (total div 8, remainder to the low
    * shards), and the exact minimal flow when shards sit on a line —
    * the running surplus between shard i and i+1 IS the optimal
    * transfer (transportation on a path). Output per boundary: the
    * signed flow; Σ|flow| is the minimal moved mass. One token-count
    * scan; everything after runs on the 8-row shard frame. */
  val q285ShardRebalance: QueryDef = QueryDef(
    "q285_shard_rebalance",
    (s, dir) => {
      import graft.functions.VectorFunctions.md5Long
      val wOrd = Window.partitionBy().orderBy(col("shard").asc)
      val wAll = Window.partitionBy()
      val loads = Tables(s, dir).documents
        .withColumn("shard", pmod(md5Long(col("doc_id").cast("string")), lit(8L)))
        .select(col("shard"), size(TextOps.tokens(col("text"))).cast("long").as("ntok"))
        .groupBy(col("shard")).agg(sum(col("ntok")).as("load"))
      loads
        .withColumn("total", sum(col("load")).over(wAll))
        .withColumn("target",
          floor(col("total") / 8.0).cast("long") +
            when(col("shard") < pmod(col("total"), lit(8L)), 1L).otherwise(0L))
        .withColumn("surplus", col("load") - col("target"))
        .withColumn("flow_out", sum(col("surplus")).over(wOrd))
        .select(col("shard"), col("load"), col("target"), col("surplus"),
          col("flow_out"),
          abs(col("flow_out")).as("moved_at_boundary"))
    },
    Some("""WITH sh AS (SELECT
          ((((h_hi - CASE WHEN h_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + h_lo) % 8) + 8) % 8 AS shard,
          len(regexp_extract_all(lower(text), '\w+')) AS ntok
        FROM (SELECT text,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT AS h_hi,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))::BIGINT AS h_lo
          FROM documents)),
      loads AS (SELECT shard, CAST(SUM(ntok) AS BIGINT) AS load FROM sh GROUP BY 1),
      t AS (SELECT shard, load, SUM(load) OVER () AS total FROM loads),
      tg AS (SELECT shard, load, total,
          CAST(total // 8 AS BIGINT)
            + CASE WHEN shard < total % 8 THEN 1 ELSE 0 END AS target
        FROM t),
      fl AS (SELECT shard, load, target, load - target AS surplus,
          SUM(load - target) OVER (ORDER BY shard
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS flow_out
        FROM tg)
      SELECT shard, load, CAST(target AS BIGINT) AS target,
        CAST(surplus AS BIGINT) AS surplus, CAST(flow_out AS BIGINT) AS flow_out,
        CAST(abs(flow_out) AS BIGINT) AS moved_at_boundary
      FROM fl"""))

  val all: Seq[QueryDef] =
    Seq(q282OovCoverage, q283SuccessiveHalving, q284TopkSparsify,
        q285ShardRebalance)
}
