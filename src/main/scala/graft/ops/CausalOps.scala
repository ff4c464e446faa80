package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.ops.Similarity.cosine

/** ANN-tuning & causal-inference wave: the IVF nprobe recall sweep, a
  * cross-shard duplicate audit (the "can dedup stay shard-local?"
  * question answered with numbers), instrumental-variables 2SLS, and a
  * regression-discontinuity fit. Completes the causal toolkit started
  * by q215 (A/B z), q259 (DiD): IV and RDD are the two standard designs
  * when randomization isn't available.
  */
object CausalOps {

  /** IVF recall sweep: q75's cell construction probed at nprobe = 1..4,
    * each sweep's top-10 graded against the exact top-10 (q30's
    * yardstick shape). The tuning curve an ANN deployment reads before
    * fixing nprobe: candidates scanned vs recall bought. Cell
    * assignment stays a projection; the sweep multiplies only the
    * probes frame (queries × nprobe), never the corpus. */
  val q278AnnRecallSweep: QueryDef = QueryDef(
    "q278_ann_recall_sweep",
    (s, dir) => {
      val nSeeds = 8
      val emb = Tables(s, dir).embeddings
      val seeds = Tables.seedVectors(dir, nSeeds)
      def seedScores(v: Column): Column = array(seeds.map { case (sid, vec) =>
        struct(cosine(v, typedlit(vec)).as("cos"), lit(-sid).as("nsid"))
      }: _*)
      val cells = emb
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").as("neighbor_id"),
          (-array_max(seedScores(col("embedding"))).getField("nsid")).as("cell"))
        .localCheckpoint() // probed four times
      val probeRanks = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
          posexplode(slice(sort_array(seedScores(col("embedding")), asc = false), 1, 4)))
        .select(col("query_id"), (col("pos") + 1).as("rn"), (-col("col.nsid")).as("cell"))
      val sweeps = probeRanks
        .withColumn("np", explode(array((1 to 4).map(lit): _*)))
        .filter(col("rn") <= col("np"))
        .select(col("np"), col("query_id"), col("cell"))
      val cand = sweeps.join(cells, Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("np"), col("query_id"), col("neighbor_id"))
        .localCheckpoint() // feeds the count and the rescore
      val nCand = cand.groupBy(col("np"), col("query_id"))
        .agg(count(lit(1)).as("n_candidates"))
      val qVec = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy(col("np"), col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      val ivfTop = cand
        .join(broadcast(qVec), Seq("query_id"))
        .join(emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb")),
          Seq("neighbor_id"))
        .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("np"), col("query_id"), col("neighbor_id"))
      val wX = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      val exactTop = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
        .crossJoin(broadcast(qVec))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(wX))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
      ivfTop.join(exactTop, Seq("query_id", "neighbor_id"), "left")
        .groupBy(col("np").cast("long").as("nprobe"), col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .join(nCand.select(col("np").cast("long").as("nprobe"), col("query_id"),
          col("n_candidates")), Seq("nprobe", "query_id"))
        .withColumn("recall", round(col("n_overlap") / lit(10.0), 6))
    },
    Some("""WITH seeds AS (
        SELECT vec_id AS seed_id, embedding AS s_emb FROM embeddings WHERE vec_id < 8),
      cos_all AS (
        SELECT e.vec_id, s.seed_id,
          list_sum(list_transform(list_zip(e.embedding, s.s_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(s.s_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM embeddings e CROSS JOIN seeds s),
      cells AS (SELECT vec_id AS neighbor_id, seed_id AS cell FROM (
          SELECT vec_id, seed_id,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
          FROM cos_all) t WHERE rn = 1),
      pr AS (SELECT vec_id AS query_id, seed_id AS cell,
          ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
        FROM cos_all WHERE vec_id < 5),
      sweeps AS (SELECT g.np, pr.query_id, pr.cell
        FROM pr CROSS JOIN (SELECT UNNEST([1, 2, 3, 4]) AS np) g
        WHERE pr.rn <= g.np),
      cand AS (SELECT s.np, s.query_id, c.neighbor_id
        FROM sweeps s JOIN cells c ON c.cell = s.cell
        WHERE c.neighbor_id <> s.query_id),
      nc AS (SELECT np, query_id, COUNT(*) AS n_candidates FROM cand GROUP BY 1, 2),
      scored AS (SELECT cd.np, cd.query_id, cd.neighbor_id,
          list_sum(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM cand cd JOIN embeddings a ON a.vec_id = cd.query_id
          JOIN embeddings b ON b.vec_id = cd.neighbor_id),
      ivf AS (SELECT np, query_id, neighbor_id FROM (
          SELECT np, query_id, neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY np, query_id ORDER BY cos DESC, neighbor_id) AS rk
          FROM scored) WHERE rk <= 10),
      exact AS (SELECT query_id, neighbor_id FROM (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
            ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
              list_sum(list_transform(list_zip(q.embedding, e.embedding),
                x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
              / (sqrt(list_sum(list_transform(q.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
               * sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) DESC,
              e.vec_id) AS rk
          FROM embeddings e CROSS JOIN (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5) q
          WHERE e.vec_id <> q.vec_id) WHERE rk <= 10)
      SELECT CAST(i.np AS BIGINT) AS nprobe, i.query_id,
        CAST(SUM(CASE WHEN ex.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_overlap,
        CAST(MIN(nc.n_candidates) AS BIGINT) AS n_candidates,
        round(SUM(CASE WHEN ex.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) / 10.0, 6) AS recall
      FROM ivf i
        LEFT JOIN exact ex ON ex.query_id = i.query_id AND ex.neighbor_id = i.neighbor_id
        JOIN nc ON nc.np = i.np AND nc.query_id = i.query_id
      GROUP BY 1, 2"""))

  /** Cross-shard duplicate audit: q28's verified near-dup pairs scored
    * against a 16-way md5 document sharding (q241's construction). The
    * cross-shard share answers the distributed-dedup design question
    * directly: shard-local dedup misses exactly these pairs, so a high
    * share (≈ 15/16 under random sharding) is the measured argument for
    * the global band-key shuffle the q28/q74 plans use. */
  val q279CrossShardDupAudit: QueryDef = QueryDef(
    "q279_cross_shard_dup_audit",
    (s, dir) => {
      import graft.functions.VectorFunctions.md5Long
      def shard(c: Column): Column = pmod(md5Long(c.cast("string")), lit(16L))
      Dedup.q28MinhashLsh.fn(s, dir)
        .select(col("id_a"), col("id_b"))
        .withColumn("shard_a", shard(col("id_a")))
        .withColumn("shard_b", shard(col("id_b")))
        .groupBy(col("shard_a").as("shard"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("shard_a") =!= col("shard_b"), 1L).otherwise(0L)).as("n_cross"))
        .withColumn("cross_share",
          round(col("n_cross").cast("double") / col("n_pairs"), 6))
    },
    Some("""WITH t AS (SELECT doc_id,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      sh AS (SELECT doc_id, list_transform(range(1, len(toks)-1),
          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
        FROM t WHERE len(toks) >= 3),
      pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      sharded AS (SELECT id_a, id_b,
          (((ha - CASE WHEN ha >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + la) % 16 + 16) % 16 AS shard_a,
          (((hb - CASE WHEN hb >= 2147483648 THEN 4294967296 ELSE 0 END) * 4294967296 + lb) % 16 + 16) % 16 AS shard_b
        FROM (SELECT id_a, id_b,
            ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 1, 8))::BIGINT AS ha,
            ('0x' || substr(md5(CAST(id_a AS VARCHAR)), 9, 8))::BIGINT AS la,
            ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 1, 8))::BIGINT AS hb,
            ('0x' || substr(md5(CAST(id_b AS VARCHAR)), 9, 8))::BIGINT AS lb
          FROM pairs))
      SELECT shard_a AS shard, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        CAST(SUM(CASE WHEN shard_a <> shard_b THEN 1 ELSE 0 END) AS BIGINT) AS n_cross,
        round(CAST(SUM(CASE WHEN shard_a <> shard_b THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS cross_share
      FROM sharded GROUP BY 1"""))

  /** Instrumental-variables 2SLS on a constructed strong instrument:
    * z = an md5 bit of the customer key, treatment t = z XOR an
    * independent 20% md5 flip (first stage ≈ 0.6 by construction),
    * outcome y = order value. β_IV = cov(z,y)/cov(z,t) via exact
    * DECIMAL sums; β_OLS alongside. The data carries no true effect, so
    * the estimator's job — and the spec's assertion — is to land at ~0
    * with a strong first stage, where a broken Wald ratio would not.
    * One aggregation pass; indicator×DECIMAL sums are exact. */
  val q280Iv2sls: QueryDef = QueryDef(
    "q280_iv_2sls",
    (s, dir) => {
      val dec = DecimalType(18, 4)
      val base = Tables(s, dir).orders
        .withColumn("z",
          pmod(conv(substring(md5(col("o_custkey").cast("string")), 1, 8), 16, 10)
            .cast("long"), lit(2L)))
        .withColumn("flip",
          when(conv(substring(md5(concat_ws("|", col("o_orderkey"), lit("iv"))), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0) < 0.2, 1L).otherwise(0L))
        .withColumn("t", (col("z") + col("flip")) % 2)
        .select(col("z"), col("t"), col("o_totalprice").as("y"))
      base.agg(
        count(lit(1)).as("n"),
        sum(col("z")).as("sz"), sum(col("t")).as("st"),
        sum(col("y").cast(dec)).as("sy"),
        sum(col("z") * col("t")).as("szt"),
        sum(when(col("z") === 1, col("y").cast(dec)).otherwise(lit(0).cast(dec))).as("szy"),
        sum(when(col("t") === 1, col("y").cast(dec)).otherwise(lit(0).cast(dec))).as("sty"))
        .select(col("n"),
          round((col("szt") - col("sz") * col("st") / col("n")).cast("double") /
            (col("sz") - col("sz") * col("sz") / col("n")), 6).as("first_stage"),
          round((col("szy").cast("double") - col("sz") * col("sy").cast("double") / col("n")) /
            (col("szt") - col("sz") * col("st") / col("n")).cast("double"), 6).as("beta_iv"),
          round((col("sty").cast("double") - col("st") * col("sy").cast("double") / col("n")) /
            (col("st") - col("st") * col("st") / col("n")).cast("double"), 6).as("beta_ols"))
    },
    Some("""WITH base AS (SELECT
          ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 AS z,
          (('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 2
           + CASE WHEN CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR) || '|iv'), 1, 8))::BIGINT AS DOUBLE)
               / 4294967296.0 < 0.2 THEN 1 ELSE 0 END) % 2 AS t,
          o_totalprice AS y
        FROM orders),
      s AS (SELECT COUNT(*) AS n, SUM(z) AS sz, SUM(t) AS st,
          SUM(CAST(y AS DECIMAL(18,4))) AS sy,
          SUM(z * t) AS szt,
          SUM(CASE WHEN z = 1 THEN CAST(y AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS szy,
          SUM(CASE WHEN t = 1 THEN CAST(y AS DECIMAL(18,4)) ELSE CAST(0 AS DECIMAL(18,4)) END) AS sty
        FROM base)
      SELECT CAST(n AS BIGINT) AS n,
        round(CAST(szt - CAST(sz AS DOUBLE) * st / n AS DOUBLE)
          / (sz - CAST(sz AS DOUBLE) * sz / n), 6) AS first_stage,
        round((CAST(szy AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sy AS DOUBLE) / n)
          / CAST(szt - CAST(sz AS DOUBLE) * st / n AS DOUBLE), 6) AS beta_iv,
        round((CAST(sty AS DOUBLE) - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE) / n)
          / CAST(st - CAST(st AS DOUBLE) * st / n AS DOUBLE), 6) AS beta_ols
      FROM s"""))

  /** Regression discontinuity at the 250k order-value cutoff, bandwidth
    * ±50k: local linear fits of the urgent-priority rate on each side
    * (exact normal-equation sums — the q125 idiom), the discontinuity
    * being the gap between the two intercepts AT the cutoff. On this
    * fixture priority is independent of value, so the honest jump is
    * ≈ 0 — the design's null calibration, like q162's Benford pass. */
  val q281RegressionDiscontinuity: QueryDef = QueryDef(
    "q281_regression_discontinuity",
    (s, dir) => {
      val cutoff = 250000.0
      val bw = 50000.0
      val wAll = Window.partitionBy()
      val base = Tables(s, dir).orders
        .filter(col("o_totalprice") >= cutoff - bw && col("o_totalprice") < cutoff + bw)
        .select(
          when(col("o_totalprice") >= cutoff, lit("right")).otherwise(lit("left")).as("side"),
          round((col("o_totalprice") - cutoff) / bw, 9).as("x"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1.0).otherwise(0.0).as("y"))
      val fits = base.groupBy(col("side"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("x"), 9).cast(DecimalType(28, 12))).as("sx"),
          sum(round(col("x") * col("x"), 12).cast(DecimalType(28, 14))).as("sxx"),
          sum(col("y").cast(DecimalType(18, 2))).as("sy"),
          sum(round(col("x") * col("y"), 9).cast(DecimalType(28, 12))).as("sxy"))
        .withColumn("slope", round(
          (col("n") * col("sxy").cast("double") - col("sx").cast("double") * col("sy").cast("double")) /
          (col("n") * col("sxx").cast("double") - col("sx").cast("double") * col("sx").cast("double")), 9))
        .withColumn("intercept", round(
          (col("sy").cast("double") - col("slope") * col("sx").cast("double")) / col("n"), 9))
      fits
        .withColumn("jump", round(
          sum(when(col("side") === "right", col("intercept")).otherwise(-col("intercept")))
            .over(wAll), 6))
        .select(col("side"), col("n"), round(col("intercept"), 6).as("intercept"),
          round(col("slope"), 6).as("slope"), col("jump"))
    },
    Some("""WITH base AS (SELECT
          CASE WHEN o_totalprice >= 250000.0 THEN 'right' ELSE 'left' END AS side,
          round((o_totalprice - 250000.0) / 50000.0, 9) AS x,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1.0 ELSE 0.0 END AS y
        FROM orders
        WHERE o_totalprice >= 200000.0 AND o_totalprice < 300000.0),
      fits AS (SELECT side, COUNT(*) AS n,
          SUM(CAST(round(x, 9) AS DECIMAL(28,12))) AS sx,
          SUM(CAST(round(x * x, 12) AS DECIMAL(28,14))) AS sxx,
          SUM(CAST(y AS DECIMAL(18,2))) AS sy,
          SUM(CAST(round(x * y, 9) AS DECIMAL(28,12))) AS sxy
        FROM base GROUP BY 1),
      sl AS (SELECT side, n,
          round((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 9) AS slope,
          sx, sy
        FROM fits),
      ic AS (SELECT side, n, slope,
          round((CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / n, 9) AS intercept
        FROM sl)
      SELECT side, CAST(n AS BIGINT) AS n, round(intercept, 6) AS intercept,
        round(slope, 6) AS slope,
        round(SUM(CASE WHEN side = 'right' THEN intercept ELSE -intercept END) OVER (), 6) AS jump
      FROM ic"""))

  val all: Seq[QueryDef] =
    Seq(q278AnnRecallSweep, q279CrossShardDupAudit, q280Iv2sls,
        q281RegressionDiscontinuity)
}
