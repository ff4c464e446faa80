package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Min-K% prob membership audit (Shi et al. 2023, "Detecting Pretraining
  * Data from Large Language Models"): a document's memorization signal is
  * the MEAN of its k% lowest token log-probabilities under the corpus
  * unigram LM — high values mean even the doc's rarest tokens are
  * well-modeled, the signature of text the model has seen. Here the
  * "model" is the corpus's own add-nothing unigram MLE, making the audit
  * a contamination/duplication detector over the training pool itself
  * (reference: overseer's corpus ETL family,
  * doc/guide/Introduction.md:3; q94's bigram cross-entropy and q78's
  * n-gram decontamination are the siblings).
  *
  * Scale shape: one token census (map-side-combinable hash agg), one
  * broadcast-join of per-token log-probs back onto the token stream,
  * one per-doc window for the bottom-k selection — token-mass linear,
  * no global sort (the window partitions by doc).
  *
  * Exactness: per-token log-probs quantized round(·,12) and summed as
  * DECIMAL(28,12) (order-free); k = max(1, ⌊0.2n⌋); ties at the k-th
  * value contribute the same VALUE whichever row wins, so the selection
  * is deterministic without a tiebreaker; surfaced means round 6.
  */
object MembershipOps {

  private val KPct = 0.2

  val q549MinKProb: QueryDef = QueryDef(
    "q549_min_k_prob",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
            .as("tok"))
        .localCheckpoint() // census and scoring both read the token stream
      val census = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val total = census.agg(sum(col("c")).as("n_corpus"))
      val lp = census.crossJoin(broadcast(total))
        .select(col("tok"),
          round(log(col("c").cast("double") /
            col("n_corpus").cast("double")), 12).as("lp"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("lp").asc)
      val scored = toks.join(lp, Seq("tok"))
        .withColumn("rn", row_number().over(wDoc))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("doc_id"))))
        .withColumn("k", greatest(lit(1L), floor(col("n") * KPct)))
        .where(col("rn") <= col("k"))
        .groupBy(col("doc_id"), col("source"))
        .agg(max(col("n")).cast("long").as("n_toks"),
          max(col("k")).cast("long").as("k"),
          round(sum(col("lp").cast(DecimalType(28, 12))).cast("double") /
            max(col("k")).cast("double"), 6).as("mink_score"))
      scored.orderBy(col("doc_id"))
        .select(col("doc_id"), col("source"), col("n_toks"), col("k"),
          col("mink_score"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '\w+'))
          AS tok
        FROM documents),
      census AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
      total AS (SELECT CAST(SUM(c) AS BIGINT) AS n_corpus FROM census),
      lp AS (
        SELECT tok,
          round(ln(CAST(c AS DOUBLE) / CAST(t.n_corpus AS DOUBLE)), 12) AS lp
        FROM census CROSS JOIN total t),
      ranked AS (
        SELECT t.doc_id, t.source, l.lp,
          ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY l.lp ASC) AS rn,
          COUNT(*) OVER (PARTITION BY t.doc_id) AS n
        FROM toks t JOIN lp l ON l.tok = t.tok)
      SELECT doc_id, source,
        CAST(MAX(n) AS BIGINT) AS n_toks,
        CAST(MAX(GREATEST(1, CAST(floor(n * 0.2) AS BIGINT))) AS BIGINT) AS k,
        round(CAST(SUM(CAST(lp AS DECIMAL(28,12))) AS DOUBLE)
          / CAST(MAX(GREATEST(1, CAST(floor(n * 0.2) AS BIGINT))) AS DOUBLE),
          6) AS mink_score
      FROM ranked
      WHERE rn <= GREATEST(1, CAST(floor(n * 0.2) AS BIGINT))
      GROUP BY 1, 2
      ORDER BY doc_id"""))

  val all: Seq[QueryDef] = Seq(q549MinKProb)
}
