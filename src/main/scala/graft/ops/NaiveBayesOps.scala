package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Multinomial naive Bayes language classifier, trained and evaluated
  * entirely in-plan — the classical generative text classifier
  * (McCallum & Nigam 1998): add-one-smoothed token likelihoods over a
  * capped vocabulary, log-prior from class frequencies, argmax over
  * classes, confusion matrix on a held-out split. The zero-dependency
  * baseline every corpus pipeline wants next to its langid heuristic
  * (q24/q191) — same task, now LEARNED from the train half (reference:
  * overseer's arbitrary handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: two token scans (train counts, test scoring) with
  * map-side partial aggregation; the MODEL — 5 classes × 200 vocabulary
  * rows of quantized log-likelihoods — is a broadcast-sized object, so
  * scoring is a broadcast join against the test tokens, never a
  * shuffle of the corpus. Exactly how a 100 TB corpus scores against a
  * small learned model.
  *
  * Exactness: all counts are BIGINTs; log-likelihoods are quantized to
  * integer MICRO-NATS (floor(ln(p)·1e6) — both engines floor the same
  * IEEE double of the same rational), so document scores are exact
  * BIGINT sums and the argmax (ties → lexicographically first class)
  * is cross-engine deterministic.
  */
object NaiveBayesOps {

  private val V = 200 // vocabulary cap (top tokens by train count)

  val q511NaiveBayes: QueryDef = QueryDef(
    "q511_naive_bayes",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)")).as("tok"))
      val train = toks.where(col("doc_id") % 2 === 0)
      val test  = toks.where(col("doc_id") % 2 === 1)

      val vocab = train.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("tok")).limit(V)
        .select(col("tok")).localCheckpoint()

      val docsTrain = Tables(s, dir).documents
        .where(col("doc_id") % 2 === 0)
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val nTrain = docsTrain.agg(sum(col("n_docs")).as("n_all"))
      val prior = docsTrain.crossJoin(broadcast(nTrain))
        .select(col("lang"),
          floor(log(col("n_docs").cast("double") / col("n_all")) * 1e6)
            .cast("long").as("lp0"))

      // smoothed per-(class, vocab-token) log-likelihood: zero counts are
      // structural rows (lang × vocab spine), not dropped ones
      val counts = train.join(broadcast(vocab), Seq("tok"))
        .groupBy(col("lang"), col("tok")).agg(count(lit(1)).as("c"))
      val classTot = counts.groupBy(col("lang")).agg(sum(col("c")).as("tot"))
      val model = docsTrain.select(col("lang")).crossJoin(broadcast(vocab))
        .join(counts, Seq("lang", "tok"), "left").na.fill(0L, Seq("c"))
        .join(classTot, Seq("lang"))
        .select(col("lang").as("cls"), col("tok"),
          floor(log((col("c") + 1).cast("double") / (col("tot") + V)) * 1e6)
            .cast("long").as("lp"))

      val docTok = test.groupBy(col("doc_id"), col("lang"), col("tok"))
        .agg(count(lit(1)).as("n"))
      val tokScore = docTok.join(broadcast(model), Seq("tok"))
        .groupBy(col("doc_id"), col("lang"), col("cls"))
        .agg(sum(col("n") * col("lp")).as("ts"))
      // spine keeps vocab-empty docs scoreable (prior-only argmax)
      val spine = test.select(col("doc_id"), col("lang")).distinct()
        .crossJoin(broadcast(prior.select(col("lang").as("cls"), col("lp0"))))
      val scores = spine.join(tokScore, Seq("doc_id", "lang", "cls"), "left")
        .na.fill(0L, Seq("ts"))
        .select(col("doc_id"), col("lang"), col("cls"),
          (col("ts") + col("lp0")).as("score"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cls"))
      scores.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .groupBy(col("lang").as("true_lang"), col("cls").as("pred_lang"))
        .agg(count(lit(1)).as("n"))
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, lang,
          unnest(regexp_extract_all(lower(text), '\\w+')) AS tok
        FROM documents),
      train AS (SELECT * FROM toks WHERE doc_id % 2 = 0),
      test  AS (SELECT * FROM toks WHERE doc_id % 2 = 1),
      vocab AS (
        SELECT tok FROM train GROUP BY tok
        ORDER BY COUNT(*) DESC, tok LIMIT $V),
      docs_train AS (
        SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents WHERE doc_id % 2 = 0 GROUP BY 1),
      prior AS (
        SELECT lang,
          CAST(floor(ln(CAST(n_docs AS DOUBLE) /
            (SELECT SUM(n_docs) FROM docs_train)) * 1e6) AS BIGINT) AS lp0
        FROM docs_train),
      counts AS (
        SELECT t.lang, t.tok, CAST(COUNT(*) AS BIGINT) AS c
        FROM train t JOIN vocab v ON v.tok = t.tok
        GROUP BY 1, 2),
      class_tot AS (SELECT lang, SUM(c) AS tot FROM counts GROUP BY 1),
      model AS (
        SELECT d.lang AS cls, v.tok,
          CAST(floor(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE) /
            (ct.tot + $V)) * 1e6) AS BIGINT) AS lp
        FROM docs_train d CROSS JOIN vocab v
        LEFT JOIN counts c ON c.lang = d.lang AND c.tok = v.tok
        JOIN class_tot ct ON ct.lang = d.lang),
      doc_tok AS (
        SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS n
        FROM test GROUP BY 1, 2, 3),
      tok_score AS (
        SELECT dt.doc_id, dt.lang, m.cls, SUM(dt.n * m.lp) AS ts
        FROM doc_tok dt JOIN model m ON m.tok = dt.tok
        GROUP BY 1, 2, 3),
      spine AS (
        SELECT DISTINCT t.doc_id, t.lang, p.lang AS cls, p.lp0
        FROM test t CROSS JOIN prior p),
      scores AS (
        SELECT s.doc_id, s.lang, s.cls,
          CAST(COALESCE(ts.ts, 0) + s.lp0 AS BIGINT) AS score
        FROM spine s LEFT JOIN tok_score ts
          ON ts.doc_id = s.doc_id AND ts.cls = s.cls),
      pred AS (
        SELECT doc_id, lang, cls,
          row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, cls) AS rn
        FROM scores)
      SELECT lang AS true_lang, cls AS pred_lang,
        CAST(COUNT(*) AS BIGINT) AS n
      FROM pred WHERE rn = 1 GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q511NaiveBayes)
}
