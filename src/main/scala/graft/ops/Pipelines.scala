package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Composed text-corpus pipelines — the operators of TextOps/Dedup chained
  * the way a training-data build actually runs them. */
object Pipelines {

  /** TF-IDF per (doc, token): membership and tf/df are exact integers; the
    * tfidf score is rounded so libm-vs-JVM ln() ulp differences cannot
    * surface. */
  val q56Tfidf: QueryDef = QueryDef(
    "q56_tfidf",
    (s, dir) => {
      val docs = Tables(s, dir).documents.filter(col("doc_id") < 100)
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      val n = docs.select(countDistinct(col("doc_id")).as("n_docs"))
      val tf = docs.groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      tf.join(df, Seq("token"))
        .crossJoin(broadcast(n))
        .withColumn("tfidf",
          round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
        .select(col("doc_id"), col("token"), col("tf"), col("df"), col("tfidf"))
    },
    Some("""WITH docs AS (
        SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\w+')) AS token
        FROM documents WHERE doc_id < 100),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM docs GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM docs)
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
        round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n"""))

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is", "value", "data", "table")

  /** The LLM training-corpus build, end to end: minimum length → stopword
    * quality gate → exact dedup (keep smallest id per fingerprint) →
    * near-dup prune (drop the larger id of any same-language pair with
    * token-Jaccard ≥ 0.6) → per-language corpus stats. Every stage is the
    * exact operator (so the whole pipeline is oracle-checkable); at corpus
    * scale the near-dup stage swaps its pairwise candidate generator for
    * the MinHash banding of q28 with identical verify/prune semantics. */
  val q57CorpusPipeline: QueryDef = QueryDef(
    "q57_corpus_pipeline",
    (s, dir) => {
      // single-row-group scan → spread the CPU-heavy tokenize/gate/hash
      // work across the pool; the exchange is paid ONCE because `exact`
      // below is checkpointed before its three consumers
      val base = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .withColumn("tk", TextOps.tokens(col("text")))
        .filter(size(col("tk")) >= 10)
        .withColumn("stop_ratio",
          size(filter(col("tk"), t => t.isin(stop.map(x => x: Any): _*)))
            .cast("double") / size(col("tk")))
        .filter(col("stop_ratio") >= 0.05)
        .withColumn("fp", md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))))
      val exact = base
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id").asc)))
        .filter(col("rn") === 1)
        // tokens are hashed to int64 BEFORE dedup/intersect: the near-dup
        // join only ever needs set SIZES, and intersecting longs is far
        // cheaper than intersecting long strings (and shuffles 8 bytes/
        // token instead of the token text). 64-bit collisions within one
        // pair's vocabulary (~1e3 tokens) are ~1e-12 — the oracle gate
        // would catch one. Sorted so the pair scan can use the zero-alloc
        // merge-count expression instead of hash-set array_intersect.
        .select(col("doc_id"), col("lang"),
                array_sort(array_distinct(transform(col("tk"), t => xxhash64(t)))).as("tkd"),
                size(col("tk")).cast("long").as("n_tokens"))
        // three consumers read `exact` (both pair-join sides + the final
        // aggregate): checkpoint so the tokenize→gate→dedup→hash lineage
        // runs once, not three times
        .localCheckpoint()
      // exact length prefilter: jac >= 0.6 forces |A∩B|/|A∪B| >= 0.6, hence
      // min/max set sizes >= 0.6 → 3·max <= 5·min. Evaluating this integer
      // predicate inside the join prunes the vast majority of pairs before
      // any O(n) array intersection runs — results are provably unchanged.
      // the join's only equi-key is lang (5 distinct values) — unsalted,
      // the quadratic pair scan lands on 5 tasks no matter how many cores
      // exist. Salting the probe side and replicating the build side x8
      // spreads the SAME pairs over 40 keys; results are identical
      // (Joins.saltedJoin pattern, inlined because of the extra join
      // predicates).
      val S = 8
      val a = exact.select(col("lang").as("langa"), col("doc_id").as("ia"),
                           col("tkd").as("ta"), size(col("tkd")).as("sa"))
        .withColumn("sala", pmod(xxhash64(col("ia")), lit(S)).cast("int"))
      val b = exact.select(col("lang").as("langb"), col("doc_id").as("ib"),
                           col("tkd").as("tb"), size(col("tkd")).as("sb"))
        .withColumn("salb", explode(sequence(lit(0), lit(S - 1))))
      // all predicates live in the join condition, cheapest leftmost: the
      // And-tree evaluates left-to-right, so id/size guards short-circuit
      // before the O(n) array intersection touches a pair (a post-join
      // .filter gets merged in FRONT of the cheap guards by
      // PushExtraPredicateThroughJoin — observed 2x slower).
      val nearDupIds = a.join(b,
          col("langa") === col("langb") && col("sala") === col("salb") &&
            col("ia") < col("ib") &&
            col("sa") * 3 <= col("sb") * 5 && col("sb") * 3 <= col("sa") * 5 &&
            // |A∪B| = sa + sb − |A∩B|, so jac ≥ 0.6 ⟺ 8·|A∩B| ≥ 3·(sa+sb):
            // one codegen'd two-pointer merge count per pair — no union,
            // no hash set, no output array, exact ints
            graft.functions.VectorFunctions.sorted_intersect_count(col("ta"), col("tb")) * 8
              >= (col("sa") + col("sb")) * 3)
        .select(col("ib").as("doc_id")).distinct()
      exact.join(nearDupIds, Seq("doc_id"), "left_anti")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             sum(col("n_tokens")).as("total_tokens"))
    },
    Some("""WITH base AS (
        SELECT doc_id, lang, text, regexp_extract_all(lower(text), '\w+') AS tk
        FROM documents),
      gated AS (
        SELECT doc_id, lang, tk,
          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM base
        WHERE len(tk) >= 10
          AND CAST(len(list_filter(tk, x -> list_contains(
                ['the','a','of','and','to','in','is','value','data','table'], x))) AS DOUBLE)
              / len(tk) >= 0.05),
      exact AS (
        SELECT doc_id, lang, list_distinct(tk) AS tkd, CAST(len(tk) AS BIGINT) AS n_tokens
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM gated)
        WHERE rn = 1),
      neardup AS (
        SELECT DISTINCT b.doc_id FROM exact a JOIN exact b
        ON a.lang = b.lang AND a.doc_id < b.doc_id
        WHERE len(list_intersect(a.tkd, b.tkd)) * 8 >= (len(a.tkd) + len(b.tkd)) * 3)
      SELECT lang, COUNT(*) AS n_docs,
        -- aggregate SUM(BIGINT) yields HUGEINT in DuckDB, which pandas
        -- renders as float64 and hash-mismatches Spark's int64 — cast back
        CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
      FROM exact WHERE doc_id NOT IN (SELECT doc_id FROM neardup)
      GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q56Tfidf, q57CorpusPipeline)
}
