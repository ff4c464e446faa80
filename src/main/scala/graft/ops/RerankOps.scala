package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Retrieval & selection wave: MMR diversity reranking over the BM25
  * candidates, cross-source quantile normalization of a quality score,
  * DSIR-style importance weights against a target domain, and an LSH
  * band-geometry tuning sweep. The common thread: every step that scales
  * with the corpus is a scan/agg; the iterative parts (greedy MMR picks,
  * band-config sweep) run on model-sized frames.
  */
object RerankOps {

  /** Maximal Marginal Relevance rerank (Carbonell & Goldstein 1998) of
    * q91's BM25 hits: top-20 candidates by score, then 5 greedy picks
    * maximizing λ·rel − (1−λ)·max-cosine-to-selected (λ = 0.7). Relevance
    * is BM25 normalized by the top score; diversity is embedding cosine
    * ([[Similarity.cosine]], bit-identical to the oracle's sequential
    * fold). The candidate frame (20 rows) and its pairwise cosine matrix
    * are model-sized at ANY corpus scale — the corpus-scale work is q91's
    * scan — so the greedy loop's 5 tiny argmax jobs are constant cost;
    * each pick is one window row_number on a ≤20-row frame. Ties break to
    * the smaller doc_id; the oracle unrolls the same 5 steps. */
  val q230MmrRerank: QueryDef = QueryDef(
    "q230_mmr_rerank",
    (s, dir) => {
      val K = 5
      val lam = 0.7
      val bm = CurationOps.q91Bm25.fn(s, dir)
      val wAll = Window.partitionBy()
      val top = bm
        .withColumn("rk", row_number().over(
          Window.partitionBy().orderBy(col("bm25").desc, col("doc_id").asc)))
        .filter(col("rk") <= 20)
        .withColumn("nb", col("bm25") / max(col("bm25")).over(wAll))
      val cand = top
        .join(Tables(s, dir).embeddings
                .select(col("vec_id").as("doc_id"), col("embedding")),
              Seq("doc_id"))
        .select(col("doc_id"), col("nb"), col("embedding"))
        .localCheckpoint()
      val pairs = cand.select(col("doc_id").as("da"), col("embedding").as("ea"))
        .crossJoin(cand.select(col("doc_id").as("db"), col("embedding").as("eb")))
        .filter(col("da") =!= col("db"))
        .select(col("da"), col("db"),
                Similarity.cosine(col("ea"), col("eb")).as("cos"))
        .localCheckpoint()
      var sel: DataFrame = null
      for (k <- 1 to K) {
        val remaining =
          if (k == 1) cand
          else cand.join(sel.select(col("doc_id")), Seq("doc_id"), "left_anti")
        val pen =
          if (k == 1) remaining.select(col("doc_id"), lit(0.0).as("maxcos"))
          else remaining.select(col("doc_id"))
            .join(pairs, col("doc_id") === col("da"))
            .join(sel.select(col("doc_id").as("db")), Seq("db"))
            .groupBy(col("doc_id")).agg(max(col("cos")).as("maxcos"))
        val pick = remaining.join(pen, Seq("doc_id"), "left")
          .withColumn("mmr",
            lit(lam) * col("nb") - lit(1.0 - lam) * coalesce(col("maxcos"), lit(0.0)))
          .withColumn("rn", row_number().over(
            Window.partitionBy().orderBy(col("mmr").desc, col("doc_id").asc)))
          .filter(col("rn") === 1)
          .select(col("doc_id"), lit(k).cast("long").as("pick_rank"),
                  col("mmr").as("mmr_score"))
        sel = (if (k == 1) pick else sel.union(pick)).localCheckpoint()
      }
      sel.select(col("pick_rank"), col("doc_id"),
                 round(col("mmr_score"), 6).as("mmr_score"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\w+')) AS token
        FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      bm AS (SELECT tf.doc_id,
          round(SUM(
            ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl))), 6) AS bm25
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s
        GROUP BY 1),
      top20 AS (SELECT doc_id, bm25 FROM (
          SELECT doc_id, bm25,
            ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM bm) t
        WHERE rk <= 20),
      cand AS (SELECT t.doc_id,
          t.bm25 / (SELECT MAX(bm25) FROM top20) AS nb, e.embedding
        FROM top20 t JOIN embeddings e ON e.vec_id = t.doc_id),
      p AS (SELECT a.doc_id AS da, b.doc_id AS db,
          list_sum(list_transform(list_zip(a.embedding, b.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(b.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM cand a JOIN cand b ON a.doc_id <> b.doc_id),
      s1 AS (SELECT doc_id, 0.7 * nb AS mmr FROM cand
        ORDER BY mmr DESC, doc_id LIMIT 1),
      s2 AS (SELECT c.doc_id, 0.7 * c.nb - 0.3 * MAX(p.cos) AS mmr
        FROM cand c JOIN p ON p.da = c.doc_id
          AND p.db IN (SELECT doc_id FROM s1)
        WHERE c.doc_id NOT IN (SELECT doc_id FROM s1)
        GROUP BY c.doc_id, c.nb ORDER BY mmr DESC, c.doc_id LIMIT 1),
      s3 AS (SELECT c.doc_id, 0.7 * c.nb - 0.3 * MAX(p.cos) AS mmr
        FROM cand c JOIN p ON p.da = c.doc_id
          AND p.db IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2)
        WHERE c.doc_id NOT IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2)
        GROUP BY c.doc_id, c.nb ORDER BY mmr DESC, c.doc_id LIMIT 1),
      s4 AS (SELECT c.doc_id, 0.7 * c.nb - 0.3 * MAX(p.cos) AS mmr
        FROM cand c JOIN p ON p.da = c.doc_id
          AND p.db IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
                       UNION ALL SELECT doc_id FROM s3)
        WHERE c.doc_id NOT IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
                               UNION ALL SELECT doc_id FROM s3)
        GROUP BY c.doc_id, c.nb ORDER BY mmr DESC, c.doc_id LIMIT 1),
      s5 AS (SELECT c.doc_id, 0.7 * c.nb - 0.3 * MAX(p.cos) AS mmr
        FROM cand c JOIN p ON p.da = c.doc_id
          AND p.db IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
                       UNION ALL SELECT doc_id FROM s3 UNION ALL SELECT doc_id FROM s4)
        WHERE c.doc_id NOT IN (SELECT doc_id FROM s1 UNION ALL SELECT doc_id FROM s2
                               UNION ALL SELECT doc_id FROM s3 UNION ALL SELECT doc_id FROM s4)
        GROUP BY c.doc_id, c.nb ORDER BY mmr DESC, c.doc_id LIMIT 1)
      SELECT pick_rank, doc_id, round(mmr, 6) AS mmr_score FROM (
        SELECT CAST(1 AS BIGINT) AS pick_rank, doc_id, mmr FROM s1
        UNION ALL SELECT 2, doc_id, mmr FROM s2
        UNION ALL SELECT 3, doc_id, mmr FROM s3
        UNION ALL SELECT 4, doc_id, mmr FROM s4
        UNION ALL SELECT 5, doc_id, mmr FROM s5) u"""))

  /** Cross-source quantile normalization of a per-document quality score
    * (type-token ratio): each document's within-source percentile is
    * mapped onto the GLOBAL score distribution — the standard fix when
    * heterogeneous sources score on incompatible scales and a single
    * threshold would gut one source and wave another through. Ranks are
    * integer-exact; the only real arithmetic is the percentile →
    * global-index map, written floor(p·(N−1)+0.5) on both engines (round()
    * half-up/half-even semantics differ between engines; floor(x+0.5)
    * does not). The global total-order window is the honest cost of exact
    * quantiles (the q166/q202 precedent); the approximate path at 100 TB
    * is q152's broadcast decile cutoffs. */
  val q231QuantileNorm: QueryDef = QueryDef(
    "q231_quantile_norm",
    (s, dir) => {
      val scored = Tables(s, dir).documents
        .withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) > 0)
        .select(col("doc_id"), col("source"),
          (size(array_distinct(col("toks"))).cast("double") /
            size(col("toks"))).as("score"))
        .localCheckpoint() // feeds the global ranking and the per-source ranking
      val n = scored.count() // bounded driver scalar: one number, not data
      val glob = scored
        .withColumn("gidx", row_number().over(
          Window.partitionBy().orderBy(col("score").asc, col("doc_id").asc)) - 1L)
      val bySrc = scored
        .withColumn("r", row_number().over(
          Window.partitionBy(col("source"))
            .orderBy(col("score").asc, col("doc_id").asc)) - 1L)
        .withColumn("m", count(lit(1)).over(Window.partitionBy(col("source"))))
        .withColumn("p",
          when(col("m") > 1, col("r").cast("double") / (col("m") - 1L))
            .otherwise(lit(0.5)))
        .withColumn("gidx", floor(col("p") * lit((n - 1).toDouble) + lit(0.5)).cast("long"))
      bySrc.join(glob.select(col("gidx"), col("score").as("norm_score")), Seq("gidx"))
        .select(col("doc_id"), col("source"),
                round(col("score"), 6).as("score"),
                round(col("norm_score"), 6).as("norm_score"))
    },
    Some("""WITH t AS (SELECT doc_id, source,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      scored AS (SELECT doc_id, source,
          CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS score
        FROM t WHERE len(toks) > 0),
      n AS (SELECT COUNT(*) AS n FROM scored),
      gall AS (SELECT score,
          ROW_NUMBER() OVER (ORDER BY score, doc_id) - 1 AS gidx FROM scored),
      bysrc AS (SELECT doc_id, source, score,
          ROW_NUMBER() OVER (PARTITION BY source ORDER BY score, doc_id) - 1 AS r,
          COUNT(*) OVER (PARTITION BY source) AS m
        FROM scored),
      mapped AS (SELECT doc_id, source, score,
          CAST(floor(
            (CASE WHEN m > 1 THEN CAST(r AS DOUBLE) / (m - 1) ELSE 0.5 END)
            * (n.n - 1) + 0.5) AS BIGINT) AS gidx
        FROM bysrc CROSS JOIN n)
      SELECT mp.doc_id, mp.source, round(mp.score, 6) AS score,
        round(g.score, 6) AS norm_score
      FROM mapped mp JOIN gall g USING (gidx)"""))

  /** DSIR-style importance weights (Xie et al. 2023, Data Selection via
    * Importance Resampling): each document scored by its per-token
    * log-likelihood ratio between a TARGET domain unigram LM (the English
    * slice) and the general-corpus unigram LM, both add-one smoothed over
    * the corpus vocabulary. High scores = looks like the target domain;
    * feeding the score into q83's quantile gate IS importance resampling.
    * Two token aggs (target counts, corpus counts) + one broadcast of the
    * 3 scalar totals + a per-token join — a linear corpus pass, and the
    * LM tables are vocabulary-sized (model-sized) at any corpus scale. */
  val q232DsirWeights: QueryDef = QueryDef(
    "q232_dsir_weights",
    (s, dir) => {
      // One explode → per-(doc, token) term frequencies; every later stage
      // (vocabulary counts, totals, the scoring join, the per-doc reduce)
      // runs on the tf frame, which is TTR-fraction the size of the raw
      // occurrence stream. Both LM counts come from one agg over tf, and
      // per-doc scores weight each distinct term's llr by tf — identical
      // values, roughly half the shuffled bytes of the per-occurrence
      // spelling (measured 16× → ~10× of the sf0.1 time on 10× data; the
      // perturbed sf1 corpus grows vocabulary ~linearly by construction,
      // which keeps the vocab join the honest scaling stage — Heaps-law
      // corpora grow vocab sub-linearly)
      val tf = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
                explode(TextOps.tokens(col("text"))).as("t"))
        .groupBy(col("doc_id"), col("lang"), col("t"))
        .agg(count(lit(1)).as("tf"))
      val counts = tf.groupBy(col("t")).agg(
        sum(col("tf")).as("cc"),
        sum(when(col("lang") === "en", col("tf")).otherwise(0L)).as("ct"))
      val totals = counts.agg(sum(col("cc")).as("nc"),
                              count(lit(1)).as("v"),
                              sum(col("ct")).as("nt"))
      tf.join(counts, Seq("t"))
        .crossJoin(broadcast(totals))
        .withColumn("llr",
          log((col("ct").cast("double") + lit(1.0)) /
              (col("nt").cast("double") + col("v"))) -
          log((col("cc").cast("double") + lit(1.0)) /
              (col("nc").cast("double") + col("v"))))
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("tf")).as("n_tokens"),
             round(sum(col("tf") * col("llr")) / sum(col("tf")), 6).as("avg_llr"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, lang, UNNEST(regexp_extract_all(lower(text), '\w+')) AS t
        FROM documents),
      tf AS (SELECT doc_id, lang, t, COUNT(*) AS tf FROM toks GROUP BY 1, 2, 3),
      counts AS (SELECT t, SUM(tf) AS cc,
          SUM(CASE WHEN lang = 'en' THEN tf ELSE 0 END) AS ct
        FROM tf GROUP BY 1),
      totals AS (SELECT CAST(SUM(cc) AS BIGINT) AS nc,
          CAST(COUNT(*) AS BIGINT) AS v,
          CAST(SUM(ct) AS BIGINT) AS nt FROM counts),
      sc AS (SELECT tf.doc_id, tf.lang, tf.tf,
          ln((CAST(counts.ct AS DOUBLE) + 1.0) / (CAST(tt.nt AS DOUBLE) + tt.v))
          - ln((CAST(counts.cc AS DOUBLE) + 1.0) / (CAST(tt.nc AS DOUBLE) + tt.v)) AS llr
        FROM tf JOIN counts USING (t) CROSS JOIN totals tt)
      SELECT doc_id, lang, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        round(SUM(tf * llr) / SUM(tf), 6) AS avg_llr
      FROM sc GROUP BY 1, 2"""))

  /** LSH band-geometry tuning sweep: the same k=32 MinHash signature cut
    * three ways — 16 bands × 2 rows, 8×4, 4×8 — with candidate-pair
    * count, recall, and precision against the exact Jaccard ≥ 0.5 truth
    * for each geometry. This is the sizing audit run before committing a
    * banding config at corpus scale: more rows per band = fewer, more
    * precise candidates. Signatures here are built from [[graft.functions
    * .VectorFunctions.md5Long]] per (hash-index, shingle) — md5 is the
    * hash both engines share, so the DuckDB oracle rebuilds the identical
    * signatures and the sweep is oracle-exact end to end (q28's xxhash64
    * family is faster per byte and stays the production path; the sweep
    * measures geometry, not the hash function). Each shingle is digested
    * ONCE; the 32 per-index hashes are xor-mixes with 32 md5-derived
    * constants (c_j = md5Long("bandseed|j")), so the whole signature is a
    * per-doc array fold with no per-index explode and no extra shuffle.
    * Band keys are order-concatenated minhash strings; the per-geometry
    * candidate join shuffles (band, key, id) only. */
  val q233BandTuning: QueryDef = QueryDef(
    "q233_band_tuning",
    (s, dir) => {
      import graft.functions.VectorFunctions.{md5Long, md5LongLocal, minhash_xor_sig}
      val k = 32
      val configs = Seq((16, 2), (8, 4), (4, 8))
      val shd = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), array_distinct(expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .as("shs"))
        .withColumn("hs", transform(col("shs"), x => md5Long(x)))
      val consts = (0 until k).map(j => md5LongLocal(s"bandseed|$j")).toArray
      val sig = shd
        .withColumn("sig", minhash_xor_sig(col("hs"), consts))
        .select(col("doc_id"), col("sig"))
        .localCheckpoint() // one signature build feeds all three geometries
      val truth = Dedup.q28MinhashLsh.fn(s, dir)
        .select(col("id_a"), col("id_b"))
        .localCheckpoint()
      val nTrue = truth.count() // bounded driver scalar for the report
      val reports = configs.map { case (bands, rows) =>
        val keyed = sig.select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, ${bands - 1}), b -> concat_ws(',', transform(slice(sig, b * $rows + 1, $rows), x -> cast(x as string))))")))
          .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
        val cand = keyed.select(col("band"), col("key"), col("doc_id").as("id_a"))
          .join(keyed.select(col("band"), col("key"), col("doc_id").as("id_b")),
                Seq("band", "key"))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b")).distinct()
        cand.join(truth, Seq("id_a", "id_b"), "left_semi")
          .agg(count(lit(1)).as("n_hit"))
          .crossJoin(broadcast(cand.agg(count(lit(1)).as("n_candidates"))))
          .select(lit(bands).cast("long").as("bands"),
                  lit(rows).cast("long").as("rows_per_band"),
                  col("n_candidates"), lit(nTrue).as("n_true"), col("n_hit"),
                  round(col("n_hit").cast("double") / lit(nTrue.toDouble), 6).as("recall"),
                  round(col("n_hit").cast("double") / col("n_candidates"), 6).as("precision"))
      }
      reports.reduce(_ union _)
    },
    Some("""WITH t AS (SELECT doc_id,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      s AS (SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, UNNEST(list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3)),
      hs AS (SELECT doc_id,
          (h_hi - CASE WHEN h_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + h_lo AS h
        FROM (SELECT doc_id,
            ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h_hi,
            ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h_lo FROM s)),
      cj AS (SELECT j,
          (c_hi - CASE WHEN c_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + c_lo AS c
        FROM (SELECT j.j AS j,
            ('0x' || substr(md5('bandseed|' || CAST(j.j AS VARCHAR)), 1, 8))::BIGINT AS c_hi,
            ('0x' || substr(md5('bandseed|' || CAST(j.j AS VARCHAR)), 9, 8))::BIGINT AS c_lo
          FROM range(0, 32) j(j))),
      sig AS (SELECT hs.doc_id, cj.j, MIN(xor(hs.h, cj.c)) AS mh
        FROM hs CROSS JOIN cj GROUP BY 1, 2),
      truth AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM (SELECT doc_id, list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
          FROM t WHERE len(toks) >= 3) a
        JOIN (SELECT doc_id, list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
          FROM t WHERE len(toks) >= 3) b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      nt AS (SELECT COUNT(*) AS n_true FROM truth),
      geo AS (SELECT * FROM (VALUES (16, 2), (8, 4), (4, 8)) g(bands, rws)),
      keyed AS (SELECT g.bands, g.rws, sig.doc_id, sig.j // g.rws AS band,
          string_agg(CAST(sig.mh AS VARCHAR), ',' ORDER BY sig.j) AS key
        FROM sig CROSS JOIN geo g
        GROUP BY 1, 2, 3, 4),
      cand AS (SELECT DISTINCT a.bands, a.rws, a.doc_id AS id_a, b.doc_id AS id_b
        FROM keyed a JOIN keyed b
          ON a.bands = b.bands AND a.rws = b.rws AND a.band = b.band
         AND a.key = b.key AND a.doc_id < b.doc_id),
      nc AS (SELECT bands, rws, COUNT(*) AS n_candidates FROM cand GROUP BY 1, 2),
      nh AS (SELECT c.bands, c.rws, COUNT(*) AS n_hit
        FROM cand c JOIN truth USING (id_a, id_b) GROUP BY 1, 2)
      SELECT CAST(nc.bands AS BIGINT) AS bands,
        CAST(nc.rws AS BIGINT) AS rows_per_band,
        CAST(nc.n_candidates AS BIGINT) AS n_candidates,
        CAST(nt.n_true AS BIGINT) AS n_true,
        CAST(COALESCE(nh.n_hit, 0) AS BIGINT) AS n_hit,
        round(CAST(COALESCE(nh.n_hit, 0) AS DOUBLE) / nt.n_true, 6) AS recall,
        round(CAST(COALESCE(nh.n_hit, 0) AS DOUBLE) / nc.n_candidates, 6) AS precision
      FROM nc LEFT JOIN nh USING (bands, rws) CROSS JOIN nt"""))

  val all: Seq[QueryDef] =
    Seq(q230MmrRerank, q231QuantileNorm, q232DsirWeights, q233BandTuning)
}
