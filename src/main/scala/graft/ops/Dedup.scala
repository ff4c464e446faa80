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

  /** MinHash signature column: k independent permutations approximated by
    * xxhash64 with per-row seeds; min over shingle hashes per seed. */
  def minhashSig(shingles: Column, k: Int): Column =
    array((0 until k).map { i =>
      array_min(transform(shingles, sh => xxhash64(sh, lit(i))))
    }: _*)

  /** MinHash + LSH banding near-dup candidates, verified with exact Jaccard.
    * Pipeline: shingle → k=16 minhashes → 4 bands of 4 → explode bands →
    * equi-join on (band, band-hash) → exact verify on candidates only.
    * No oracle (engine-specific hash function); checked rows-only by the
    * driver and semantically by DedupSpec. */
  val q28MinhashLsh: QueryDef = QueryDef(
    "q28_minhash_lsh",
    (s, dir) => {
      val k = 16
      val bands = 4
      val rows = k / bands
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), array_distinct(TextOps.tokens(col("text"))).as("toks"))
        .filter(size(col("toks")) >= 3)
      // 3-token shingles via zip of the token array with its own offsets
      val shingled = docs.withColumn("shingles",
        expr("transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
        .withColumn("sig", minhashSig(col("shingles"), k))
      val banded = shingled.select(col("doc_id"), col("shingles"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(slice(col("sig"), b * rows + 1, lit(rows)).cast("string")))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "band_hash")
      // candidate pairs shuffle only (band, hash, id) — the shingle arrays
      // are joined back exactly once per surviving pair, not carried
      // through the self-join + distinct
      val aSide = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_a"))
      val bSide = banded.select(col("band"), col("band_hash"), col("doc_id").as("id_b"))
      val pairs = aSide.join(bSide, Seq("band", "band_hash"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      val sh = shingled.select(col("doc_id"), col("shingles"))
      pairs
        .join(sh.select(col("doc_id").as("id_a"), col("shingles").as("sh_a")), Seq("id_a"))
        .join(sh.select(col("doc_id").as("id_b"), col("shingles").as("sh_b")), Seq("id_b"))
        .withColumn("jac",
          size(array_intersect(array_distinct(col("sh_a")), array_distinct(col("sh_b")))).cast("double") /
            size(array_union(col("sh_a"), col("sh_b"))))
        .select(col("id_a"), col("id_b"), col("jac"))
    },
    None)

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
