package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Vector-quantization & search wave: product quantization (PQ) codebooks
  * and codes, asymmetric-distance top-k over those codes, b-bit minhash
  * Jaccard estimation, and a Matryoshka-style truncated-dimension recall
  * audit. The ANN compression stack under every 100 TB embedding corpus:
  * PQ shrinks vectors 32× (64 floats → one int64 code), ADC searches the
  * compressed corpus with a model-sized lookup table, b-bit minhash
  * shrinks signature storage 32×, and the truncation audit prices
  * cutting dimensions instead of precision.
  *
  * Determinism: distances are per-term rounded then DECIMAL-summed (so
  * partition order can't flip an argmin), centroids are 9 dp means, and
  * every argmin/rank tie breaks on the id. Both engines walk the same
  * float path end to end — all four oracles are hash-exact.
  */
object QuantizeOps {

  private val decD = DecimalType(28, 14)

  /** Subvector view of the embedding corpus: (vec_id, s = subspace 0..7,
    * sv = the 8-dim slice as array<double>). */
  private def subVecs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).embeddings
      // single-row-group scan → spread the corpus across the pool BEFORE
      // the CPU-heavy DECIMAL distance work (r16): with the in-row argmin
      // there is no exchange left downstream to re-parallelize the plan
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("vec_id"), explode(expr(
        """transform(sequence(0, 7),
             k -> struct(cast(k as bigint) AS s,
                         transform(slice(embedding, k * 8 + 1, 8),
                                   x -> cast(x as double)) AS sv))""")).as("e"))
      .select(col("vec_id"), col("e.s").as("s"), col("e.sv").as("sv"))

  /** Squared L2 between two array<double> columns as an order-exact
    * DECIMAL: each term rounded at 12 dp, folded in array order — the
    * same value the oracle's dim-level DECIMAL SUM produces, because
    * DECIMAL addition is order-free. Was an interpreted
    * `aggregate(zip_with(...))` HOF fold; now the codegen
    * [[graft.functions.DecimalSqDist]] expression with bit-identical
    * semantics (QuantizeOpsSpec pins the equivalence on real data). */
  private def sqDist(a: String, b: String) =
    graft.functions.VectorFunctions.decimal_sqdist(col(a), col(b))

  /** One Lloyd step of per-subspace k-means from the fixed seed vectors
    * (vec_id < 16 — each seed's subvector j seeds centroid j of every
    * subspace), then the final assignment against the updated centroids.
    * Both E-steps are IN-ROW argmins: the ≤16 candidate centroids of a
    * subspace ride as ONE broadcast array row and the codegen'd
    * [[graft.functions.DecimalSqDistArgmin]] picks min(dist, j) inside
    * the projection — bit-identical to the previous
    * `join(broadcast(centroids)) + min(struct(dist, j))` fan-out
    * (QuantizeOpsSpec pins it on real data), but with no 16× row fan-out,
    * no Sort+SortAggregate (struct min is not hash-aggregable), and no
    * per-phase Exchange. The M-step reads `sv` straight off the E1
    * projection, so the old corpus-sized a1⋈sub sort-merge join is gone
    * too. r15 measured this chain (the suite's #1 cost, 6.7 s combined)
    * at 3 Exchanges + 2 SortAggregates per run; this shape leaves one
    * model-sized groupBy per phase. Returns (codes, centroids):
    * codes = (vec_id, s, code, err); centroids = (s, j, d, c) dim-level
    * for the ADC LUT. */
  private def pq(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import graft.functions.VectorFunctions.decimal_sqdist_argmin
    val sub = subVecs(spark, dir).localCheckpoint() // feeds E1+M and E2
    val seedArr = sub.filter(col("vec_id") < 16)
      .select(col("vec_id").as("j"), col("s"), col("sv").as("cv"))
      .groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("j"), col("cv")))).as("cands"))
    // E1 fused with the M-step input: one projection row per (vec_id, s)
    // carrying its assignment j AND its subvector — no argmin exchange,
    // no assignment-to-vector join
    val a1sv = sub.join(broadcast(seedArr), Seq("s"))
      .select(col("s"),
        decimal_sqdist_argmin(col("sv"), col("cands")).getField("j").as("j"),
        col("sv"))
    val c1 = a1sv
      .select(col("s"), col("j"), posexplode(col("sv")))
      .groupBy(col("s"), col("j"), col("pos").cast("long").as("d"))
      .agg(round(sum(round(col("col"), 9).cast(decD)).cast("double") /
        count(lit(1)), 9).as("c"))
      .localCheckpoint() // feeds encode here and the ADC LUT in q251
    val c1arr = c1.groupBy(col("s"), col("j"))
      .agg(expr("transform(array_sort(collect_list(struct(d, c))), x -> x.c)").as("cv"))
      .groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("j"), col("cv")))).as("cands"))
    val codes = sub.join(broadcast(c1arr), Seq("s"))
      .withColumn("m", decimal_sqdist_argmin(col("sv"), col("cands")))
      .select(col("vec_id"), col("s"), col("m.j").as("code"),
        col("m.dist").cast("double").as("err"))
    (codes, c1)
  }

  /** The shared PQ CTE chain, verbatim in both q250's and q251's oracles. */
  private val pqSql =
    """flat AS (SELECT vec_id, (t.gs - 1) // 8 AS s, (t.gs - 1) % 8 AS d,
          CAST(embedding[t.gs] AS DOUBLE) AS v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)),
      seeds AS (SELECT vec_id AS j, s, d, v AS c0 FROM flat WHERE vec_id < 16),
      e1 AS (SELECT f.vec_id, f.s, sd.j,
          SUM(CAST(round((f.v - sd.c0) * (f.v - sd.c0), 12) AS DECIMAL(28,14))) AS dist
        FROM flat f JOIN seeds sd ON sd.s = f.s AND sd.d = f.d
        GROUP BY 1, 2, 3),
      a1 AS (SELECT vec_id, s, j FROM (
          SELECT vec_id, s, j,
            ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
          FROM e1) WHERE rn = 1),
      c1 AS (SELECT f.s, a1.j, f.d,
          round(CAST(SUM(CAST(round(f.v, 9) AS DECIMAL(28,14))) AS DOUBLE)
            / COUNT(*), 9) AS c
        FROM a1 JOIN flat f ON f.vec_id = a1.vec_id AND f.s = a1.s
        GROUP BY 1, 2, 3),
      e2 AS (SELECT f.vec_id, f.s, c1.j,
          SUM(CAST(round((f.v - c1.c) * (f.v - c1.c), 12) AS DECIMAL(28,14))) AS dist
        FROM flat f JOIN c1 ON c1.s = f.s AND c1.d = f.d
        GROUP BY 1, 2, 3),
      codes AS (SELECT vec_id, s, j AS code, CAST(dist AS DOUBLE) AS err FROM (
          SELECT vec_id, s, j, dist,
            ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY dist, j) AS rn
          FROM e2) WHERE rn = 1)"""

  /** Product quantization: 64 dims → 8 subspaces × 16 centroids, one
    * seeded Lloyd step per subspace, every vector packed to a single int64
    * (8 × 4-bit codes) with its exact reconstruction error. Everything is
    * equi-joins against model-sized frames (16×8×8 centroid rows
    * broadcast); the corpus is touched in linear dim-level passes. */
  val q250ProductQuantization: QueryDef = QueryDef(
    "q250_product_quantization",
    (s, dir) => {
      val (codes, _) = pq(s, dir)
      codes.groupBy(col("vec_id"))
        .agg(sum(col("code") * expr("shiftleft(cast(1 as bigint), cast(4 * s as int))"))
               .as("pq_code"),
             round(sum(round(col("err"), 9).cast(decD)).cast("double"), 6)
               .as("recon_err"))
    },
    Some(s"""WITH $pqSql
      SELECT vec_id, CAST(SUM(code * (1::BIGINT << CAST(4 * s AS INT))) AS BIGINT) AS pq_code,
        round(CAST(SUM(CAST(round(err, 9) AS DECIMAL(28,14))) AS DOUBLE), 6) AS recon_err
      FROM codes GROUP BY 1"""))

  /** Asymmetric-distance (ADC) top-k over the PQ codes: 3 query vectors
    * precompute an 8×16 lookup table of subspace distances to the q250
    * centroids, every corpus vector's approximate distance is 8 LUT adds
    * keyed by its codes, and the top-5 per query is reported. This is
    * the IVF-PQ probe arm: the corpus side never touches floats — at
    * 100 TB only int64 codes stream through the scan while the LUT
    * (model-sized) broadcasts. */
  val q251PqAdcTopk: QueryDef = QueryDef(
    "q251_pq_adc_topk",
    (s, dir) => {
      val (codes, c1) = pq(s, dir)
      val q = subVecs(s, dir).filter(col("vec_id") < 3)
        .select(col("vec_id").as("query_id"), col("s"), col("sv").as("qv"))
      val c1v = c1.groupBy(col("s"), col("j"))
        .agg(expr("transform(array_sort(collect_list(struct(d, c))), x -> x.c)").as("cv"))
      val lut = q.join(broadcast(c1v), Seq("s"))
        .withColumn("ld", sqDist("qv", "cv"))
        .select(col("query_id"), col("s"), col("j"), col("ld"))
      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("adc").asc, col("vec_id").asc)
      codes.join(broadcast(lut),
          codes("s") === lut("s") && codes("code") === lut("j"))
        .groupBy(col("query_id"), col("vec_id"))
        .agg(sum(col("ld")).as("adc_sum"))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("adc", col("adc_sum").cast("double"))
        .withColumn("rank", row_number().over(wTop).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
          round(col("adc"), 6).as("adc_dist"))
    },
    Some(s"""WITH $pqSql,
      q AS (SELECT vec_id AS query_id, s, d, v AS qv FROM flat WHERE vec_id < 3),
      lut AS (SELECT q.query_id, q.s, c1.j,
          SUM(CAST(round((q.qv - c1.c) * (q.qv - c1.c), 12) AS DECIMAL(28,14))) AS ld
        FROM q JOIN c1 ON c1.s = q.s AND c1.d = q.d
        GROUP BY 1, 2, 3),
      adc AS (SELECT l.query_id, co.vec_id, CAST(SUM(l.ld) AS DOUBLE) AS adc
        FROM codes co JOIN lut l ON l.s = co.s AND l.j = co.code
        GROUP BY 1, 2),
      ranked AS (SELECT query_id, vec_id, adc,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS BIGINT) AS rank
        FROM adc WHERE vec_id <> query_id)
      SELECT query_id, rank, vec_id AS neighbor_id, round(adc, 6) AS adc_dist
      FROM ranked WHERE rank <= 5"""))

  /** b-bit minhash (Li & König): keep only the low 2 bits of each of 64
    * md5-xor minhashes (q233's oracle-replicable signature family), and
    * estimate Jaccard from the bit-collision rate, Ĵ = (C − ¼)/(1 − ¼).
    * Candidates come from banding the first 32 signatures 16×2 (q28's
    * geometry) — never all pairs — and each surviving pair carries the
    * exact Jaccard next to the 2-bit estimate, so the oracle certifies
    * the estimator's error, not just its value. 32× less signature
    * storage than full minhash at a quantified accuracy cost. */
  val q252BbitMinhash: QueryDef = QueryDef(
    "q252_bbit_minhash",
    (s, dir) => {
      import graft.functions.VectorFunctions.{md5Long, md5LongLocal, minhash_xor_sig}
      val k = 64
      val consts = (0 until k).map(j => md5LongLocal(s"bbitseed|$j")).toArray
      val shd = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), array_distinct(expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .as("shs"))
        .withColumn("hs", array_distinct(transform(col("shs"), x => md5Long(x))))
        .withColumn("sig", minhash_xor_sig(col("hs"), consts))
        .select(col("doc_id"), col("hs"), col("sig"))
        .localCheckpoint() // one signature pass feeds banding + estimation
      val banded = shd.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 15), b -> concat_ws(',', cast(sig[b*2] as string), cast(sig[b*2+1] as string)))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
      val pairs = banded.select(col("band"), col("key"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("key"), col("doc_id").as("id_b")),
              Seq("band", "key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      pairs
        .join(shd.select(col("doc_id").as("id_a"), col("hs").as("hs_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(shd.select(col("doc_id").as("id_b"), col("hs").as("hs_b"), col("sig").as("sig_b")), Seq("id_b"))
        .withColumn("jac_true",
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") /
            size(array_union(col("hs_a"), col("hs_b"))))
        .filter(col("jac_true") >= 0.2)
        .withColumn("c_hits", expr(
          "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF((x & 3) = (y & 3), 1, 0)), 0, (acc, m) -> acc + m)"))
        .select(col("id_a"), col("id_b"),
          round(col("jac_true"), 6).as("jac_true"),
          col("c_hits").cast("long").as("n_collisions"),
          round((col("c_hits") / lit(64.0) - lit(0.25)) / lit(0.75), 6).as("jac_bbit"))
        .withColumn("abs_err", round(abs(col("jac_bbit") - col("jac_true")), 6))
    },
    Some("""WITH t AS (SELECT doc_id,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      sstr AS (SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, UNNEST(list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3)),
      hs AS (SELECT DISTINCT doc_id,
          (h_hi - CASE WHEN h_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + h_lo AS h
        FROM (SELECT doc_id,
            ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h_hi,
            ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h_lo FROM sstr)),
      cj AS (SELECT j,
          (c_hi - CASE WHEN c_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + c_lo AS c
        FROM (SELECT j.j AS j,
            ('0x' || substr(md5('bbitseed|' || CAST(j.j AS VARCHAR)), 1, 8))::BIGINT AS c_hi,
            ('0x' || substr(md5('bbitseed|' || CAST(j.j AS VARCHAR)), 9, 8))::BIGINT AS c_lo
          FROM range(0, 64) j(j))),
      sig AS (SELECT hs.doc_id, cj.j, MIN(xor(hs.h, cj.c)) AS mh
        FROM hs CROSS JOIN cj GROUP BY 1, 2),
      keyed AS (SELECT doc_id, j // 2 AS band,
          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS key
        FROM sig WHERE j < 32 GROUP BY 1, 2),
      pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM keyed a JOIN keyed b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      hsl AS (SELECT doc_id, list(h) AS hl FROM hs GROUP BY 1),
      jt AS (SELECT p.id_a, p.id_b,
          CAST(len(list_distinct(list_intersect(a.hl, b.hl))) AS DOUBLE)
            / len(list_distinct(list_concat(a.hl, b.hl))) AS jac_true
        FROM pairs p JOIN hsl a ON a.doc_id = p.id_a
          JOIN hsl b ON b.doc_id = p.id_b),
      coll AS (SELECT j.id_a, j.id_b, j.jac_true,
          SUM(CASE WHEN (sa.mh & 3) = (sb.mh & 3) THEN 1 ELSE 0 END) AS c_hits
        FROM jt j JOIN sig sa ON sa.doc_id = j.id_a
          JOIN sig sb ON sb.doc_id = j.id_b AND sb.j = sa.j
        WHERE j.jac_true >= 0.2
        GROUP BY 1, 2, 3)
      SELECT id_a, id_b, round(jac_true, 6) AS jac_true,
        CAST(c_hits AS BIGINT) AS n_collisions,
        round((c_hits / 64.0 - 0.25) / 0.75, 6) AS jac_bbit,
        round(abs(round((c_hits / 64.0 - 0.25) / 0.75, 6) - round(jac_true, 6)), 6) AS abs_err
      FROM coll"""))

  /** Matryoshka truncation audit: exact cosine top-10 for 5 fixed queries
    * at prefix dimensions 8/16/32/64, scored by overlap with the full-
    * dimension top-10. Prices the cheapest ANN compression of all —
    * just read fewer dimensions — against PQ's 4-bit codes (q250/q251).
    * The scan is queries × corpus × 4 prefixes, linear in the corpus
    * with a fixed-size broadcast side (the q30 yardstick contract). */
  val q253MatryoshkaRecall: QueryDef = QueryDef(
    "q253_matryoshka_recall",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val queries = emb.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val wTop = Window.partitionBy(col("p"), col("query_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      val tops = emb.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("p", explode(array(lit(8), lit(16), lit(32), lit(64))))
        .withColumn("cos", round(
          Similarity.cosine(slice(col("embedding"), lit(1), col("p")),
                            slice(col("q_emb"), lit(1), col("p"))), 9))
        .withColumn("rk", row_number().over(wTop))
        .filter(col("rk") <= 10)
        .select(col("p"), col("query_id"), col("vec_id"))
        .localCheckpoint() // feeds both sides of the overlap join
      val full = tops.filter(col("p") === 64)
        .select(col("query_id"), col("vec_id"), lit(1L).as("hit"))
      // left join, not semi: a (prefix, query) whose top-10 shares NOTHING
      // with the full-dim top-10 must still report recall 0
      tops.join(full, Seq("query_id", "vec_id"), "left")
        .groupBy(col("p").cast("long").as("prefix_dim"), col("query_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_overlap"))
        .withColumn("recall", round(col("n_overlap") / lit(10.0), 6))
    },
    Some("""WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
          FROM embeddings WHERE vec_id < 5),
      scored AS (SELECT p.p, q.query_id, e.vec_id,
          round(list_sum(list_transform(list_zip(e.embedding[1:p.p], q.q_emb[1:p.p]),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(e.embedding[1:p.p], y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
           * sqrt(list_sum(list_transform(q.q_emb[1:p.p], y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))), 9) AS cos
        FROM embeddings e CROSS JOIN q
          CROSS JOIN (SELECT UNNEST([8, 16, 32, 64]) AS p) p
        WHERE e.vec_id <> q.query_id),
      tops AS (SELECT p, query_id, vec_id FROM (
          SELECT p, query_id, vec_id,
            ROW_NUMBER() OVER (PARTITION BY p, query_id ORDER BY cos DESC, vec_id) AS rk
          FROM scored) WHERE rk <= 10),
      full64 AS (SELECT query_id, vec_id, 1 AS hit FROM tops WHERE p = 64)
      SELECT CAST(t.p AS BIGINT) AS prefix_dim, t.query_id,
        CAST(SUM(COALESCE(f.hit, 0)) AS BIGINT) AS n_overlap,
        round(SUM(COALESCE(f.hit, 0)) / 10.0, 6) AS recall
      FROM tops t LEFT JOIN full64 f
        ON f.query_id = t.query_id AND f.vec_id = t.vec_id
      GROUP BY 1, 2"""))

  val all: Seq[QueryDef] =
    Seq(q250ProductQuantization, q251PqAdcTopk, q252BbitMinhash,
        q253MatryoshkaRecall)
}
