package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM-data pipelines: exact (hash groupBy),
  * n-gram Jaccard, MinHash+LSH, SimHash. Design point is 100 TB of
  * documents: exact dedup is one hash shuffle on a 16-byte digest; LSH
  * turns the quadratic near-dup problem into an equi-join on band keys so
  * only same-bucket candidates are compared.
  */
object Dedup {

  /** Exact dedup: group by normalized-content digest, keep the smallest
    * doc_id, count copies. Shuffles only (digest → count) — never the text
    * itself beyond the first projection. */
  val q26ExactDedup: QueryDef = QueryDef(
    "q26_exact_dedup",
    (s, dir) => Tables(s, dir).documents
      .select(col("doc_id"),
              md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fingerprint"))
      .groupBy(col("fingerprint"))
      .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_copies")),
    Some("""SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fingerprint,
      MIN(doc_id) AS keeper_id, COUNT(*) AS n_copies
      FROM documents GROUP BY 1"""))

  /** Pairwise n-gram (token-set) Jaccard inside language blocks. The
    * blocked self-join is the correctness baseline the LSH path
    * approximates; blocking keys bound the quadratic term. */
  val q27NgramJaccard: QueryDef = QueryDef(
    "q27_ngram_jaccard",
    (s, dir) => {
      val t = Tables(s, dir).documents
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), col("lang"),
                array_distinct(TextOps.tokens(col("text"))).as("toks"))
      val a = t.select(col("lang"), col("doc_id").as("id_a"), col("toks").as("toks_a"))
      val b = t.select(col("lang"), col("doc_id").as("id_b"), col("toks").as("toks_b"))
      a.join(b, Seq("lang")).filter(col("id_a") < col("id_b"))
        .withColumn("jac",
          size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b"))))
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jac"))
    },
    Some("""WITH t AS (SELECT doc_id, lang,
          list_distinct(regexp_extract_all(lower(text), '\w+')) AS toks
        FROM documents WHERE doc_id < 300)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / len(list_distinct(list_concat(a.toks, b.toks))) AS jac
      FROM t a JOIN t b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
          / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.5"""))

  /** MinHash signature from pre-hashed shingles (int64): delegates to the
    * native codegen'd [[graft.functions.MinhashSig]] expression — one
    * tight primitive loop per row. (An equivalent
    * `aggregate(zip_with(transform(...)))` HOF composition runs
    * interpreted and allocates two boxed arrays per shingle; measured ~2×
    * slower end-to-end on the q28 pipeline.) */
  def minhashSig(hashedShingles: Column, k: Int): Column =
    graft.functions.VectorFunctions.minhash_sig(hashedShingles, k)

  /** MinHash + LSH banding near-dup pairs, verified with exact Jaccard.
    * Pipeline: 3-token shingle → k=32 minhashes → 16 bands of 2 →
    * equi-join on (band, band-key) → exact-Jaccard verify ≥ 0.5 on the
    * candidates only. Banding is the scale path (no quadratic pair scan);
    * the exact verify makes the OUTPUT exact, so the DuckDB oracle is the
    * brute-force pair set. Recall at 16×2 for a true pair at jac j is
    * 1−(1−j²)¹⁶ ≈ 0.99998 at j=0.7; this corpus's pairs are all ≥ 0.7 or
    * ≤ 0.2 (no pair in between), and the hash functions are fixed, so
    * candidate generation is deterministic and verified complete by
    * DedupSpec + the driver gate. */
  val q28MinhashLsh: QueryDef = QueryDef(
    "q28_minhash_lsh",
    (s, dir) => {
      val k = 32
      val bands = 16
      // shingles come from the ORIGINAL token sequence — never a deduped
      // array: array_distinct/list_distinct ordering is engine-specific,
      // and shingles are adjacency-dependent
      // single-row-group scan → repartition before the CPU-heavy shingle
      // hashing + signature work so it spans the pool (see q57)
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
      // 3-token shingles hashed DIRECTLY to int64 — xxhash64(t1,t2,t3)
      // chains the three token hashes, so the shingle string "t1 t2 t3"
      // is never materialized (tokens are \w+, so the triple↔string map
      // is bijective and set sizes are preserved modulo 64-bit
      // collisions); signature, banding, and the exact verify all run on
      // longs from this point on
      val shingled = docs.withColumn("hsh",
        expr("transform(sequence(0, size(toks)-3), i -> xxhash64(toks[i], toks[i+1], toks[i+2]))"))
        .withColumn("sig", minhashSig(col("hsh"), k))
      val banded = shingled.select(col("doc_id"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(element_at(col("sig"), b * 2 + 1),
                          element_at(col("sig"), b * 2 + 2)))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
      // candidate pairs shuffle only (band, hash, id) — the shingle arrays
      // are joined back exactly once per surviving pair, not carried
      // through the self-join + distinct
      val aSide = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_a"))
      val bSide = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_b"))
      val pairs = aSide.join(bSide, Seq("band", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      // exact verify on hashed shingle SETS: jaccard only needs sizes, and
      // intersecting int64 arrays beats intersecting shingle strings
      val sh = shingled.select(col("doc_id"), array_distinct(col("hsh")).as("shd"))
      pairs
        .join(sh.select(col("doc_id").as("id_a"), col("shd").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("shd").as("sh_b")), Seq("id_b"))
        .withColumn("jac",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("jac") >= 0.5)
        .select(col("id_a"), col("id_b"), col("jac"))
    },
    Some("""WITH t AS (SELECT doc_id,
          regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      s AS (SELECT doc_id,
          list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) AS sh
        FROM t WHERE len(toks) >= 3)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) AS jac
      FROM s a JOIN s b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_distinct(list_intersect(a.sh, b.sh))) AS DOUBLE)
          / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5"""))

  /** SimHash: 64-bit signature from token hashes — per-bit majority vote of
    * xxhash64(token). Near-dup docs differ in few bits; banding the 64 bits
    * into 4×16-bit keys gives the Hamming-distance blocking join. Output is
    * the per-doc signature + band keys (deterministic, hash-based). */
  val q29Simhash: QueryDef = QueryDef(
    "q29_simhash",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      // bit b of simhash = sign of sum over tokens of (bit b set ? +1 : -1)
      val withSig = docs.withColumn("sig", expr(
        """aggregate(sequence(0, 63), 0L, (acc, b) ->
             acc | if(aggregate(toks, 0L, (a2, t) ->
                        a2 + if(shiftright(xxhash64(t), b) & 1L = 1L, 1L, -1L)) > 0,
                      shiftleft(1L, b), 0L))"""))
      val bandCols = (0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(lit(0xFFFFL)).as(s"band$i"))
      withSig.select(Seq(col("doc_id"), col("sig")) ++ bandCols: _*)
    },
    None)

  val all: Seq[QueryDef] = Seq(q26ExactDedup, q27NgramJaccard, q28MinhashLsh, q29Simhash)
}
