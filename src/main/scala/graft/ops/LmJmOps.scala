package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Jelinek-Mercer-smoothed unigram LM, scored as held-out perplexity —
  * the standard corpus-quality / LM-eval loop: train a ML unigram model
  * on a 7/8 md5-gated split, interpolate with the uniform background
  * p = λ·p_ml(w) + (1−λ)/|V|, and report cross-entropy + perplexity of
  * the held-out eighth at two λ (reference: overseer's report
  * pipelines, doc/guide/Introduction.md:3; the smoothing sibling of
  * q527's Dirichlet query model and q562's Good-Turing masses —
  * perplexity itself was the one LM-eval readout still missing).
  *
  * Scale shape: two token censuses (train, held) — each map-side
  * combinable; the scoring join is vocabulary-sized with the 1-row
  * model totals broadcast; the λ grid is 2 rows fanned over the ≤|V|
  * held census (PlanGuard-bounded).
  *
  * Exactness: counts exact BIGINT; each type's ln-probability is
  * quantized round(·,12), multiplied by its exact count, and summed as
  * DECIMAL(28,12) — order-free; H and ppl surfaced round 6.
  */
object LmJmOps {

  private val Lambdas = Seq(0.5, 0.9)

  val q564JmPerplexity: QueryDef = QueryDef(
    "q564_jm_perplexity",
    (s, dir) => {
      import s.implicits._
      val toks = Tables(s, dir).documents
        .select(col("doc_id"),
          substring(md5(col("doc_id").cast("string")), 1, 1).as("gate"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
            .as("tok"))
        .localCheckpoint() // both censuses read it
      val train = toks.filter(col("gate") =!= "0" && col("gate") =!= "1")
        .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      val held = toks.filter(col("gate") === "0" || col("gate") === "1")
        .groupBy(col("tok")).agg(count(lit(1)).as("k"))
      val model = train.agg(sum(col("c")).as("n_train"),
        count(lit(1)).as("v"))
      val lam = Lambdas.toDF("lambda")
      val scored = held
        .join(train, Seq("tok"), "left")
        .crossJoin(broadcast(model))
        .crossJoin(broadcast(lam)) // 2-row λ grid
        .select(col("lambda"), col("k"),
          col("c").isNull.as("oov"),
          round(log(
            col("lambda") * coalesce(col("c"), lit(0L)).cast("double")
              / col("n_train").cast("double")
            + (lit(1.0) - col("lambda")) / col("v").cast("double")), 12)
            .cast(DecimalType(28, 12)).as("lp"))
      scored.groupBy(col("lambda"))
        .agg(sum(col("k")).as("n_held"),
          sum(when(col("oov"), col("k")).otherwise(0L)).as("n_oov"),
          sum(col("lp") * col("k")).as("ll"))
        .select(col("lambda"), col("n_held"), col("n_oov"),
          round(-col("ll").cast("double") / col("n_held").cast("double"), 6)
            .as("cross_entropy"),
          round(exp(-col("ll").cast("double") / col("n_held").cast("double")), 4)
            .as("perplexity"))
        .orderBy(col("lambda"))
    },
    Some("""WITH toks AS (
        SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS gate,
          unnest(regexp_extract_all(lower(text), '\w+')) AS tok
        FROM documents),
      train AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks
        WHERE gate NOT IN ('0', '1') GROUP BY 1),
      held AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS k FROM toks
        WHERE gate IN ('0', '1') GROUP BY 1),
      model AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_train,
          CAST(COUNT(*) AS BIGINT) AS v
        FROM train),
      scored AS (
        SELECT l.lambda, h.k, (t.c IS NULL) AS oov,
          CAST(round(ln(
            l.lambda * CAST(COALESCE(t.c, 0) AS DOUBLE)
              / CAST(m.n_train AS DOUBLE)
            + (1.0 - l.lambda) / CAST(m.v AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS lp
        FROM held h
        LEFT JOIN train t ON t.tok = h.tok
        CROSS JOIN model m
        CROSS JOIN (VALUES (0.5), (0.9)) l(lambda))
      SELECT CAST(lambda AS DOUBLE) AS lambda,
        CAST(SUM(k) AS BIGINT) AS n_held,
        CAST(SUM(CASE WHEN oov THEN k ELSE 0 END) AS BIGINT) AS n_oov,
        round(-CAST(SUM(lp * k) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6)
          AS cross_entropy,
        round(exp(-CAST(SUM(lp * k) AS DOUBLE) / CAST(SUM(k) AS DOUBLE)), 4)
          AS perplexity
      FROM scored
      GROUP BY lambda
      ORDER BY lambda"""))

  val all: Seq[QueryDef] = Seq(q564JmPerplexity)
}
