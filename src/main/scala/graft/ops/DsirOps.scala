package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023):
  * select raw-corpus documents whose HASHED-feature distribution looks
  * like a target domain. Features are hashed word buckets (the paper's
  * hashed n-gram reduction); the bucket log-likelihood ratio
  * λ_b = ln p_target(b) − ln p_raw(b) is estimated with add-one
  * smoothing from ONE census pass, and a document's importance weight
  * is Σ_tokens λ_bucket(token). The deterministic top-m by weight is
  * taken in place of the paper's Gumbel resample (documented variant —
  * an md5-Gumbel draw would add float-parity risk for zero audit
  * value; the weight ordering IS the audit surface).
  *
  * Scale shape: one token pass → a 64-row bucket census; λ is a 64-row
  * broadcast; per-doc weights are one map-side-combinable sum; the
  * selection is a distributed TakeOrdered(m) with the rank window over
  * the m-row slice. Nothing grows except the token pass.
  *
  * Exactness: buckets are md5-derived BIGINTs (identical hex parse in
  * both engines); λ rounds at 12 into DECIMAL(28,12) so per-doc sums
  * are order-free; weights surface at round 6.
  */
object DsirOps {

  private val B = 64  // hashed feature buckets
  private val M = 50  // selected documents

  val q575DsirSelection: QueryDef = QueryDef(
    "q575_dsir_selection",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val toks = docs
        .select(col("doc_id"), col("lang"), col("source"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .withColumn("bucket",
          expr(s"pmod(CAST(conv(substring(md5(token), 1, 15), 16, 10) " +
            s"AS BIGINT), $B)"))
        .localCheckpoint() // census pass + weight pass share it
      val census = toks.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_raw"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_tgt"))
      val totals = census.agg(sum(col("n_raw")).as("t_raw"),
        sum(col("n_tgt")).as("t_tgt"))
      val lambda = census.crossJoin(broadcast(totals))
        .select(col("bucket"),
          round(
            log((col("n_tgt") + 1).cast("double") /
                (col("t_tgt") + B).cast("double")) -
            log((col("n_raw") + 1).cast("double") /
                (col("t_raw") + B).cast("double")), 12)
            .cast(DecimalType(28, 12)).as("lam"))
      val weights = toks.join(broadcast(lambda), Seq("bucket"))
        .groupBy(col("doc_id"), col("lang"), col("source"))
        .agg(count(lit(1)).as("n_tok"), sum(col("lam")).as("w"))
      weights
        .orderBy(col("w").desc, col("doc_id")).limit(M)
        .withColumn("rank", row_number().over( // m-row slice
          Window.orderBy(col("w").desc, col("doc_id"))).cast("long"))
        .select(col("rank"), col("doc_id"), col("lang"), col("source"),
          col("n_tok"), round(col("w").cast("double"), 6).as("dsir_weight"))
        .orderBy(col("rank"))
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, lang, source,
          ('0x' || substr(md5(token), 1, 15))::BIGINT % $B AS bucket
        FROM (SELECT doc_id, lang, source,
            UNNEST(regexp_extract_all(lower(text), '\\w+')) AS token
          FROM documents)),
      census AS (
        SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_raw,
          CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_tgt
        FROM toks GROUP BY 1),
      totals AS (SELECT SUM(n_raw) AS t_raw, SUM(n_tgt) AS t_tgt FROM census),
      lambda AS (
        SELECT bucket,
          CAST(round(ln((n_tgt + 1) / CAST(t_tgt + $B AS DOUBLE))
            - ln((n_raw + 1) / CAST(t_raw + $B AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS lam
        FROM census, totals),
      weights AS (
        SELECT t.doc_id, t.lang, t.source,
          CAST(COUNT(*) AS BIGINT) AS n_tok, SUM(l.lam) AS w
        FROM toks t JOIN lambda l USING (bucket)
        GROUP BY 1, 2, 3),
      ranked AS (
        SELECT *, ROW_NUMBER() OVER (ORDER BY w DESC, doc_id) AS rank
        FROM weights)
      SELECT CAST(rank AS BIGINT) AS rank, doc_id, lang, source, n_tok,
        round(CAST(w AS DOUBLE), 6) AS dsir_weight
      FROM ranked WHERE rank <= $M ORDER BY rank"""))

  val all: Seq[QueryDef] = Seq(q575DsirSelection)
}
