package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths per the north star: brute-force cosine top-k as the exactness
  * baseline, and an LSH-bucketed variant as the 100 TB path (random
  * hyperplane signs → band keys → equi-join; candidates only are scored).
  * Dot products are computed by `aggregate(zip_with(...))` — a codegen'd
  * column expression, no UDF, so scoring stays inside whole-stage codegen.
  */
object Similarity {

  /** Sequential-fold dot product in double precision — same left-to-right
    * accumulation order every engine uses, so results are bit-stable.
    * Primary path is the codegen'd native expression
    * [[graft.functions.VectorDot]]; `dotHof` is the pure-builtin
    * composition kept for cross-checking (identical fold order → identical
    * bits). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vector_dot(a, b)

  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
              lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: few query vectors broadcast against the full
    * corpus, ranked per query. At scale the corpus side stays partitioned
    * and never shuffles until the per-query top-k (TakeOrdered per group). */
  val q30CosineKnn: QueryDef = QueryDef(
    "q30_cosine_knn",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val cand = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      cand.crossJoin(broadcast(queries))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings WHERE vec_id < 5),
      scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
          list_sum(list_transform(list_zip(q.q_emb, e.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(q.q_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 10"""))

  /** LSH random-hyperplane signatures: bit i = sign(dot(v, plane_i)), with
    * pseudo-random planes derived deterministically from md5((i, dim)) — no
    * stored model, reproducible across runs AND engines: the DuckDB oracle
    * rebuilds the identical plane matrix in SQL (md5 hex → dyadic-rational
    * double, bit-identical), re-derives every signature, band key, candidate
    * pair, and exact cosine rescoring (cos >= 0.2), and hash-matches the
    * result end-to-end. Banding 16 bits into 4×4-bit keys gives candidate
    * buckets; SimilaritySpec additionally measures recall vs q30's exact
    * top-k. */
  val q31LshAnn: QueryDef = QueryDef(
    "q31_lsh_ann",
    (s, dir) => {
      val nBits = 16
      val emb = Tables(s, dir).embeddings
      // plane matrix built once on the driver (deterministic, md5-derived);
      // the signature is a single codegen'd expression — one tight loop per
      // row. Dim comes from a driver-side parquet record read, not a job.
      val dim = Tables.embeddingDim(dir)
      val planes = graft.functions.VectorFunctions.lshPlanes(nBits, dim)
      def sigBits(v: Column): Column =
        graft.functions.VectorFunctions.vector_lsh_bits(v, planes)
      // Signatures carry only (vec_id, band, key): the candidate join and
      // pair-dedup shuffle 24-byte rows, never the embedding vectors; the
      // vectors are joined back exactly once per surviving candidate pair.
      val banded = emb
        .select(col("vec_id"), sigBits(col("embedding")).as("sig"))
        .select(col("vec_id"),
          explode(array((0 until 4).map(i =>
            struct(lit(i).as("band"),
                   shiftright(col("sig"), i * 4).bitwiseAND(lit(0xFL)).as("key"))): _*)).as("bk"))
        .select(col("vec_id"), col("bk.band"), col("bk.key"))
      val qb = banded.filter(col("vec_id") < 5)
        .select(col("band"), col("key"), col("vec_id").as("query_id"))
      val cb = banded.select(col("band"), col("key"), col("vec_id").as("neighbor_id"))
      val pairs = qb.join(cb, Seq("band", "key"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id")).distinct()
      val qVec = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val cVec = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      pairs
        .join(broadcast(qVec), Seq("query_id"))
        .join(cVec, Seq("neighbor_id"))
        .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
        .filter(col("cos") >= 0.2)
        .select(col("query_id"), col("neighbor_id"), col("cos"))
    },
    Some("""WITH planes AS (
        SELECT b, list_transform(range(0, 64), d ->
          ('0x' || substr(md5(b::VARCHAR || '_' || d::VARCHAR), 1, 12))::BIGINT
            / 140737488355328.0 - 1.0) AS plane
        FROM range(0, 16) t(b)),
      bits AS (
        SELECT e.vec_id, p.b,
          list_sum(list_transform(list_zip(e.embedding, p.plane),
            x -> CAST(x[1] AS DOUBLE) * x[2])) > 0 AS bit
        FROM embeddings e CROSS JOIN planes p),
      keys AS (
        SELECT vec_id, b // 4 AS band,
          SUM(CASE WHEN bit THEN (1::BIGINT << (b % 4)) ELSE 0 END) AS key
        FROM bits GROUP BY 1, 2),
      pairs AS (
        SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM keys q JOIN keys c ON q.band = c.band AND q.key = c.key
        WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id),
      scored AS (
        SELECT p.query_id, p.neighbor_id,
          list_sum(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM pairs p
        JOIN embeddings a ON a.vec_id = p.query_id
        JOIN embeddings b ON b.vec_id = p.neighbor_id)
      SELECT query_id, neighbor_id, cos FROM scored WHERE cos >= 0.2"""))

  /** Embedding-cosine near-dup dedup: all pairs above the similarity
    * threshold, reduced to (dup → keeper) with keeper = the smallest
    * linked id. Exact O(n²) scoring — the recall-1.0 baseline, tractable
    * because the codegen'd VectorDot makes the pair scan compute-bound.
    * [[q74BandedEmbeddingDedup]] is the banded corpus-scale variant of the
    * same reduction; this query is the yardstick its measured recall is
    * defined against. */
  val q55EmbeddingDedup: QueryDef = QueryDef(
    "q55_embedding_dedup",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      // the streamed side of the O(n²) scan must span the worker pool: the
      // single-file test table arrives as ONE partition, which would put
      // the whole quadratic compute on one core. The repartition moves
      // |corpus| rows once — noise against the |corpus|² work it unlocks,
      // at any scale where the exact pair scan is viable at all.
      val a = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      a.crossJoin(broadcast(b)).filter(col("ia") < col("ib"))
        .withColumn("cos", cosine(col("ea"), col("eb")))
        .filter(col("cos") > 0.4)
        .groupBy(col("ib").as("dup_id"))
        .agg(min(col("ia")).as("keeper_id"),
             count(lit(1)).as("n_links"),
             max(col("cos")).as("best_cos"))
    },
    Some("""WITH pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib,
          list_sum(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
      SELECT ib AS dup_id, MIN(ia) AS keeper_id, COUNT(*) AS n_links, MAX(cos) AS best_cos
      FROM pairs WHERE cos > 0.4 GROUP BY 1"""))

  /** Banded corpus-vs-corpus embedding dedup — q55's scoring and reduction
    * with an LSH candidate generator instead of the all-pairs scan: BOTH
    * sides get 64-bit random-hyperplane signatures (md5-derived planes, so
    * the DuckDB oracle can rebuild them), banded into 16×4-bit keys; only
    * same-(band, key) pairs are rescored exactly and reduced.
    *
    * Precision is exactly 1 (candidates are rescored with the exact
    * cosine); recall is the banding's and is data-dependent. On THIS
    * corpus the near-dup threshold 0.4 sits against a continuum of
    * background pairs (measured: no margin anywhere in [0.2, 0.51], at
    * both gate SFs), which is the regime where no sublinear candidate
    * generator can be recall-1 — measured recall vs q55 here is 0.93 at
    * sf0.01 / 0.95 at sf0.1 (OpsSpec asserts the floor). On a real corpus,
    * near-dups are far above the background (and the dial is nBits /
    * bits-per-band). Because recall is a property of the fixed md5 planes,
    * the ORACLE replicates the banded pipeline itself — planes,
    * signatures, band keys, candidate join, rescoring, reduction — so the
    * driver hash-checks the whole operator end-to-end rather than a
    * recall claim the data can't support. The candidate join shuffles
    * (band, key, id) rows only; vectors are joined back once per
    * surviving pair. */
  val q74BandedEmbeddingDedup: QueryDef = QueryDef(
    "q74_banded_embedding_dedup",
    (s, dir) => {
      val nBits = 64
      val bandBits = 4
      val nBands = nBits / bandBits
      val emb = Tables(s, dir).embeddings
      val dim = Tables.embeddingDim(dir)
      val planes = graft.functions.VectorFunctions.lshPlanes(nBits, dim)
      // single-row-group scan → spread the signature pass across the pool
      val banded = emb
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"),
          graft.functions.VectorFunctions.vector_lsh_bits(col("embedding"), planes).as("sig"))
        .select(col("vec_id"),
          explode(array((0 until nBands).map(i =>
            struct(lit(i).as("band"),
                   shiftright(col("sig"), i * bandBits).bitwiseAND(lit(0xFL)).as("key"))): _*)).as("bk"))
        .select(col("vec_id"), col("bk.band"), col("bk.key"))
      val aS = banded.select(col("band"), col("key"), col("vec_id").as("ia"))
      val bS = banded.select(col("band"), col("key"), col("vec_id").as("ib"))
      val pairs = aS.join(bS, Seq("band", "key")).filter(col("ia") < col("ib"))
        .select(col("ia"), col("ib")).distinct()
      val va = emb.select(col("vec_id").as("ia"), col("embedding").as("ea"))
      val vb = emb.select(col("vec_id").as("ib"), col("embedding").as("eb"))
      pairs.join(va, Seq("ia")).join(vb, Seq("ib"))
        .withColumn("cos", cosine(col("ea"), col("eb")))
        .filter(col("cos") > 0.4)
        .groupBy(col("ib").as("dup_id"))
        .agg(min(col("ia")).as("keeper_id"),
             count(lit(1)).as("n_links"),
             max(col("cos")).as("best_cos"))
    },
    Some("""WITH planes AS (
        SELECT b, list_transform(range(0, 64), d ->
          ('0x' || substr(md5(b::VARCHAR || '_' || d::VARCHAR), 1, 12))::BIGINT
            / 140737488355328.0 - 1.0) AS plane
        FROM range(0, 64) t(b)),
      bits AS (
        SELECT e.vec_id, p.b,
          list_sum(list_transform(list_zip(e.embedding, p.plane),
            x -> CAST(x[1] AS DOUBLE) * x[2])) > 0 AS bit
        FROM embeddings e CROSS JOIN planes p),
      keys AS (
        SELECT vec_id, b // 4 AS band,
          SUM(CASE WHEN bit THEN (1::BIGINT << (b % 4)) ELSE 0 END) AS key
        FROM bits GROUP BY 1, 2),
      cand AS (
        SELECT DISTINCT a.vec_id AS ia, b.vec_id AS ib
        FROM keys a JOIN keys b ON a.band = b.band AND a.key = b.key
        WHERE a.vec_id < b.vec_id),
      scored AS (
        SELECT c.ia, c.ib,
          list_sum(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM cand c
        JOIN embeddings a ON a.vec_id = c.ia
        JOIN embeddings b ON b.vec_id = c.ib)
      SELECT ib AS dup_id, MIN(ia) AS keeper_id, COUNT(*) AS n_links, MAX(cos) AS best_cos
      FROM scored WHERE cos > 0.4 GROUP BY 1"""))

  /** IVF-bucketed ANN — the inverted-file counterpart of q31's LSH path:
    * the corpus is partitioned into cells by nearest coarse centroid, and
    * each query searches only its `nprobe` nearest cells.
    *
    * Seeds are the vectors with vec_id < 8 (deterministic "trained"
    * centroids — model parameters, like q31's plane matrix), read
    * driver-side from parquet records with no Spark job. Cell assignment
    * is a single PROJECTION: cosine to each of the 8 literal seed vectors
    * via the codegen'd VectorDot, argmax by `array_max` over
    * (cos, −seed_id) structs — no join, no shuffle, ties to the smaller
    * seed. Queries probe their top-2 cells; candidates come from a cell
    * EQUI-join shuffling (id, cell) pairs only; the exact rescore + top-k
    * touches candidates alone (~nprobe/nCells of the corpus per query).
    * The DuckDB oracle replicates the full pipeline — assignment,
    * probing, rescore, ranking — so the driver gate checks it end to end;
    * SimilaritySpec measures recall vs q30's exact top-k. At 100 TB the
    * cell count grows with the corpus and the argmax projection stays
    * embarrassingly parallel; only (id, cell) rows ever shuffle. */
  val q75IvfAnn: QueryDef = QueryDef(
    "q75_ivf_ann",
    (s, dir) => {
      val nSeeds = 8
      val nProbe = 2
      val emb = Tables(s, dir).embeddings
      val seeds = Tables.seedVectors(dir, nSeeds)
      // (cos to seed, -seed_id) structs; max = best cell, ties → smaller id
      def seedScores(v: Column): Column = array(seeds.map { case (sid, vec) =>
        struct(cosine(v, typedlit(vec)).as("cos"), lit(-sid).as("nsid"))
      }: _*)
      val cells = emb
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id").as("neighbor_id"),
                (-array_max(seedScores(col("embedding"))).getField("nsid")).as("cell"))
      val probes = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"),
                explode(slice(sort_array(seedScores(col("embedding")), asc = false), 1, nProbe))
                  .as("sc"))
        .select(col("query_id"), (-col("sc.nsid")).as("cell"))
      // a neighbor lives in exactly one cell, so the probe join cannot
      // duplicate a (query, neighbor) pair — no distinct needed
      val cand = probes.join(cells, Seq("cell"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"))
      val qVec = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val cVec = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id").asc)
      cand
        .join(broadcast(qVec), Seq("query_id"))
        .join(cVec, Seq("neighbor_id"))
        .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("neighbor_id"), col("rank"), col("cos"))
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
      cells AS (
        SELECT vec_id AS neighbor_id, seed_id AS cell FROM (
          SELECT vec_id, seed_id,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
          FROM cos_all) t WHERE rn = 1),
      probes AS (
        SELECT vec_id AS query_id, seed_id AS cell FROM (
          SELECT vec_id, seed_id,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
          FROM cos_all WHERE vec_id < 5) t WHERE rn <= 2),
      cand AS (
        SELECT p.query_id, c.neighbor_id
        FROM probes p JOIN cells c ON p.cell = c.cell
        WHERE c.neighbor_id <> p.query_id),
      scored AS (
        SELECT cd.query_id, cd.neighbor_id,
          list_sum(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM cand cd
        JOIN embeddings a ON a.vec_id = cd.query_id
        JOIN embeddings b ON b.vec_id = cd.neighbor_id),
      ranked AS (
        SELECT query_id, neighbor_id, cos,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
        FROM scored)
      SELECT query_id, neighbor_id, rank, cos FROM ranked WHERE rank <= 10"""))

  val all: Seq[QueryDef] =
    Seq(q30CosineKnn, q31LshAnn, q55EmbeddingDedup, q74BandedEmbeddingDedup, q75IvfAnn)
}
