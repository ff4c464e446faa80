package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** IR-systems wave: posting-list intersection ordering, WAND upper-bound
  * pruning, two-stage cascade ranking, and Rocchio pseudo-relevance
  * feedback — the retrieval-engine mechanics on top of q91's BM25 and
  * q150's positional index.
  *
  * Scale shapes: posting lists and scores are (docs × |query terms|)
  * frames (3–6 fixed terms); every audit folds them with hash
  * aggregates and broadcast joins of model-sized term statistics. No
  * all-pairs anywhere.
  */
object IrOps {

  private val terms3 = Seq("spark", "join", "window")

  /** Per-doc BM25 over a fixed term set — q91's scoring, shared by the
    * whole wave. Returns (doc_id, bm25, n_hit). */
  private def bm25(s: SparkSession, dir: String, terms: Seq[String]): DataFrame = {
    val k1 = 1.2; val b = 0.75
    val toks = Tables(s, dir).documents
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
      .localCheckpoint()
    val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
    val tf = toks.filter(col("token").isin(terms: _*))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    tf.join(broadcast(df), Seq("token"))
      .join(dl, Seq("doc_id"))
      .crossJoin(broadcast(stats))
      .withColumn("idf", log(
        (col("n_docs").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("part",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("part")), 6).as("bm25"), count(lit(1)).as("n_hit"))
  }

  private def bm25Sql(termsList: String): String =
    s"""toks AS (SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\\w+')) AS token
        FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token IN ($termsList) GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      parts AS (SELECT tf.doc_id, tf.token,
          ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)) AS part
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s),
      scores AS (SELECT doc_id, round(SUM(part), 6) AS bm25,
          CAST(COUNT(*) AS BIGINT) AS n_hit
        FROM parts GROUP BY 1)"""

  /** Posting-list intersection ordering audit: the 3-term AND query
    * evaluated rarest-term-first vs commonest-term-first — the classic
    * query-optimizer decision, measured as the candidate count after
    * each intersection step (the final match set is identical; the
    * intermediate work is not). One per-doc presence aggregation feeds
    * every step count. */
  val q318BooleanRetrieval: QueryDef = QueryDef(
    "q318_boolean_retrieval",
    (s, dir) => {
      val present = Tables(s, dir).documents
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .filter(col("token").isin(terms3: _*))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val df = present.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val ranked = df
        .withColumn("rk", row_number().over(
          Window.orderBy(col("df").asc, col("token").asc)).cast("long"))
      val perDoc = present.join(broadcast(ranked), Seq("token"))
        .groupBy(col("doc_id"))
        .agg(max((col("rk") === 1).cast("long")).as("h1"),
          max((col("rk") === 2).cast("long")).as("h2"),
          max((col("rk") === 3).cast("long")).as("h3"))
      perDoc.agg(
        sum(col("h1")).as("r_s1"),
        sum(col("h1") * col("h2")).as("r_s2"),
        sum(col("h1") * col("h2") * col("h3")).as("r_s3"),
        sum(col("h3")).as("c_s1"),
        sum(col("h3") * col("h2")).as("c_s2"))
        .select(explode(array(
          struct(lit("rarest_first").as("ordering"), lit(1L).as("step"),
            col("r_s1").as("candidates")),
          struct(lit("rarest_first").as("ordering"), lit(2L).as("step"),
            col("r_s2").as("candidates")),
          struct(lit("rarest_first").as("ordering"), lit(3L).as("step"),
            col("r_s3").as("candidates")),
          struct(lit("commonest_first").as("ordering"), lit(1L).as("step"),
            col("c_s1").as("candidates")),
          struct(lit("commonest_first").as("ordering"), lit(2L).as("step"),
            col("c_s2").as("candidates")),
          struct(lit("commonest_first").as("ordering"), lit(3L).as("step"),
            col("r_s3").as("candidates")))).as("r"))
        .select(col("r.ordering"), col("r.step"), col("r.candidates"))
    },
    Some("""WITH present AS (SELECT doc_id, token, COUNT(*) AS tf
        FROM (SELECT doc_id, UNNEST(regexp_extract_all(lower(text), '\w+')) AS token
          FROM documents)
        WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2),
      ranked AS (SELECT token,
          CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*), token) AS BIGINT) AS rk
        FROM present GROUP BY token),
      perdoc AS (SELECT p.doc_id,
          MAX(CASE WHEN r.rk = 1 THEN 1 ELSE 0 END) AS h1,
          MAX(CASE WHEN r.rk = 2 THEN 1 ELSE 0 END) AS h2,
          MAX(CASE WHEN r.rk = 3 THEN 1 ELSE 0 END) AS h3
        FROM present p JOIN ranked r USING (token) GROUP BY 1),
      agg AS (SELECT CAST(SUM(h1) AS BIGINT) AS r_s1,
          CAST(SUM(h1 * h2) AS BIGINT) AS r_s2,
          CAST(SUM(h1 * h2 * h3) AS BIGINT) AS r_s3,
          CAST(SUM(h3) AS BIGINT) AS c_s1,
          CAST(SUM(h3 * h2) AS BIGINT) AS c_s2
        FROM perdoc)
      SELECT 'rarest_first' AS ordering, 1::BIGINT AS step, r_s1 AS candidates FROM agg
      UNION ALL SELECT 'rarest_first', 2, r_s2 FROM agg
      UNION ALL SELECT 'rarest_first', 3, r_s3 FROM agg
      UNION ALL SELECT 'commonest_first', 1, c_s1 FROM agg
      UNION ALL SELECT 'commonest_first', 2, c_s2 FROM agg
      UNION ALL SELECT 'commonest_first', 3, r_s3 FROM agg"""))

  /** WAND upper-bound pruning audit: each term's maximum per-doc BM25
    * contribution is its upper bound; a doc whose present-term bounds
    * sum below θ (the live top-k=10 threshold) can be skipped without
    * scoring. Reports θ, the scored universe, and the prunable share —
    * the number WAND's block-max refinements start from. */
  val q319WandPruning: QueryDef = QueryDef(
    "q319_wand_pruning",
    (s, dir) => {
      val k1 = 1.2; val b = 0.75
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .localCheckpoint()
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val stats = dl.agg(count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val tf = toks.filter(col("token").isin(terms3: _*))
        .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("tf"))
      val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
      val parts = tf.join(broadcast(df), Seq("token"))
        .join(dl, Seq("doc_id"))
        .crossJoin(broadcast(stats))
        .withColumn("idf", log(
          (col("n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5)) + lit(1.0)))
        .withColumn("part", round(
          col("idf") * (col("tf") * lit(k1 + 1.0)) /
            (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))),
          9))
        .localCheckpoint() // feeds scores, bounds, and the prune test
      val scores = parts.groupBy(col("doc_id"))
        .agg(round(sum(col("part")), 6).as("bm25"))
      val theta = scores
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(10)
        .withColumn("rk", row_number().over( // 10-row slice (r15)
          Window.orderBy(col("bm25").desc, col("doc_id").asc)))
        .filter(col("rk") === 10)
        .select(col("bm25").as("theta"))
      val ub = parts.groupBy(col("token")).agg(max(col("part")).as("ub"))
      val prunable = parts.join(broadcast(ub), Seq("token"))
        .groupBy(col("doc_id")).agg(round(sum(col("ub")), 6).as("ub_sum"))
        .crossJoin(broadcast(theta))
        .agg(count(lit(1)).as("n_scored_docs"),
          sum((col("ub_sum") < col("theta")).cast("long")).as("n_prunable"),
          max(col("theta")).as("theta"))
      prunable.select(round(col("theta"), 6).as("theta"), col("n_scored_docs"),
        col("n_prunable"),
        round(col("n_prunable").cast("double") / col("n_scored_docs"), 6)
          .as("prunable_share"))
    },
    Some("""WITH toks AS (SELECT doc_id,
          UNNEST(regexp_extract_all(lower(text), '\w+')) AS token FROM documents),
      dl AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
      tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
        WHERE token IN ('spark', 'join', 'window') GROUP BY 1, 2),
      df AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
      parts AS (SELECT tf.doc_id, tf.token,
          round(ln((CAST(s.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
            * (tf.tf * 2.2)
            / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / s.avgdl)), 9) AS part
        FROM tf JOIN df USING (token) JOIN dl USING (doc_id) CROSS JOIN stats s),
      scores AS (SELECT doc_id, round(SUM(part), 6) AS bm25 FROM parts GROUP BY 1),
      theta AS (SELECT bm25 AS theta FROM (SELECT bm25,
          ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM scores)
        WHERE rk = 10),
      ub AS (SELECT token, MAX(part) AS ub FROM parts GROUP BY 1),
      pd AS (SELECT p.doc_id, round(SUM(u.ub), 6) AS ub_sum
        FROM parts p JOIN ub u USING (token) GROUP BY 1)
      SELECT round(MAX(t.theta), 6) AS theta,
        CAST(COUNT(*) AS BIGINT) AS n_scored_docs,
        CAST(SUM(CASE WHEN pd.ub_sum < t.theta THEN 1 ELSE 0 END) AS BIGINT)
          AS n_prunable,
        round(CAST(SUM(CASE WHEN pd.ub_sum < t.theta THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS prunable_share
      FROM pd, theta t"""))

  /** Two-stage cascade ranking: stage 1 is cheap BM25; stage 2 reranks
    * by the 50/50 rank-normalized blend of BM25 and document quality
    * (n_chars, the q141 idiom). Ground truth is the blend's top-10 over
    * the full scored universe; the cascade reranks only stage 1's top-N.
    * Reports recall@10 at candidate budgets N = 25/50/100 — the
    * retrieval-quality-vs-cost curve every two-tower system sizes. */
  val q320CascadeRecall: QueryDef = QueryDef(
    "q320_cascade_recall",
    (s, dir) => {
      val scored = bm25(s, dir, terms3)
        .join(Tables(s, dir).documents.select(col("doc_id"), col("n_chars")),
          Seq("doc_id"))
        .localCheckpoint() // feeds truth ranking and every budget's cascade
      // all three full rankings size-adaptive (r15); the blend
      // normalizer n comes from the probe count instead of a
      // single-partition count window over the same frame
      val nDocs = scored.count()
      val withRanks = Spine.adaptiveRank(
        Spine.adaptiveRank(scored, Seq(col("bm25").desc, col("doc_id").asc),
          rankCol = "rk_b", knownCount = nDocs),
        Seq(col("n_chars").desc, col("doc_id").asc),
        rankCol = "rk_q", knownCount = nDocs)
      val ranked = Spine.adaptiveRank(
          withRanks
            .withColumn("n", lit(nDocs))
            .withColumn("blend", round(
              lit(0.5) * (lit(1.0) - (col("rk_b") - 1).cast("double") / col("n")) +
              lit(0.5) * (lit(1.0) - (col("rk_q") - 1).cast("double") / col("n")), 9)),
          Seq(col("blend").desc, col("doc_id").asc),
          rankCol = "rk_truth", knownCount = nDocs)
        .localCheckpoint()
      val budgets = broadcast(Tables(s, dir).region.limit(1)
        .select(explode(array(lit(25L), lit(50L), lit(100L))).as("budget")))
      ranked.crossJoin(budgets)
        .filter(col("rk_b") <= col("budget"))
        .withColumn("rk_cascade", row_number().over(
          Window.partitionBy(col("budget"))
            .orderBy(col("blend").desc, col("doc_id").asc)).cast("long"))
        .groupBy(col("budget"))
        .agg(sum((col("rk_cascade") <= 10 && col("rk_truth") <= 10).cast("long"))
          .as("n_overlap"))
        .select(col("budget"), col("n_overlap"),
          round(col("n_overlap").cast("double") / 10.0, 6).as("recall_at_10"))
        .orderBy(col("budget"))
    },
    Some(s"""WITH ${bm25Sql("'spark', 'join', 'window'")},
      sc AS (SELECT s.doc_id, s.bm25, d.n_chars
        FROM scores s JOIN documents d USING (doc_id)),
      ranked AS (SELECT *,
          CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rk_b,
          CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rk_q,
          COUNT(*) OVER () AS n
        FROM sc),
      blended AS (SELECT *, round(
          0.5 * (1.0 - CAST(rk_b - 1 AS DOUBLE) / n) +
          0.5 * (1.0 - CAST(rk_q - 1 AS DOUBLE) / n), 9) AS blend
        FROM ranked),
      truth AS (SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY blend DESC, doc_id)
          AS BIGINT) AS rk_truth FROM blended),
      budgets AS (SELECT UNNEST([25, 50, 100]) AS budget),
      cascade AS (SELECT t.doc_id, b.budget, t.rk_truth,
          CAST(ROW_NUMBER() OVER (PARTITION BY b.budget
            ORDER BY t.blend DESC, t.doc_id) AS BIGINT) AS rk_cascade
        FROM truth t JOIN budgets b ON t.rk_b <= b.budget)
      SELECT CAST(budget AS BIGINT) AS budget,
        CAST(SUM(CASE WHEN rk_cascade <= 10 AND rk_truth <= 10 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_overlap,
        round(CAST(SUM(CASE WHEN rk_cascade <= 10 AND rk_truth <= 10 THEN 1 ELSE 0 END)
          AS DOUBLE) / 10.0, 6) AS recall_at_10
      FROM cascade GROUP BY 1 ORDER BY 1"""))

  /** Rocchio pseudo-relevance feedback: retrieve BM25 top-10 for the
    * seed query, mine the 3 highest-mass non-query tokens from those
    * docs (the expansion terms), and report the final 6-term query with
    * each term's document frequency and provenance — the classic PRF
    * expansion step, all posting-list aggregates. */
  val q321RocchioPrf: QueryDef = QueryDef(
    "q321_rocchio_prf",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("token"))
        .localCheckpoint() // feeds seed retrieval, mining, and df stats
      val top10 = bm25(s, dir, terms3)
        .orderBy(col("bm25").desc, col("doc_id").asc).limit(10) // TakeOrdered (r15)
        .select(col("doc_id"))
      val mined = toks.join(broadcast(top10), Seq("doc_id"))
        .filter(!col("token").isin(terms3: _*))
        .groupBy(col("token")).agg(count(lit(1)).as("mass"))
        .orderBy(col("mass").desc, col("token").asc).limit(3) // TakeOrdered (r15)
        .select(col("token"), lit("expanded").as("provenance"))
      val orig = broadcast(Tables(s, dir).region.limit(1)
        .select(explode(array(terms3.map(lit): _*)).as("token"))
        .withColumn("provenance", lit("original")))
      val query = mined.unionByName(orig)
      val df = toks.join(broadcast(query.select(col("token"))), Seq("token"))
        .groupBy(col("token")).agg(countDistinct(col("doc_id")).as("df"))
      query.join(df, Seq("token"), "left")
        .select(col("token"), col("provenance"),
          coalesce(col("df"), lit(0L)).as("df"))
        .orderBy(col("provenance"), col("token"))
    },
    Some(s"""WITH ${bm25Sql("'spark', 'join', 'window'")},
      toksall AS (SELECT doc_id,
          UNNEST(regexp_extract_all(lower(text), '\\w+')) AS token FROM documents),
      top10 AS (SELECT doc_id FROM (SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS rk FROM scores)
        WHERE rk <= 10),
      mined AS (SELECT token, 'expanded' AS provenance
        FROM (SELECT t.token, COUNT(*) AS mass,
            ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, t.token) AS rk
          FROM toksall t JOIN top10 USING (doc_id)
          WHERE t.token NOT IN ('spark', 'join', 'window')
          GROUP BY t.token)
        WHERE rk <= 3),
      query AS (SELECT * FROM mined
        UNION ALL SELECT UNNEST(['spark', 'join', 'window']), 'original'),
      dfq AS (SELECT t.token, CAST(COUNT(DISTINCT t.doc_id) AS BIGINT) AS df
        FROM toksall t JOIN (SELECT token FROM query) q USING (token)
        GROUP BY 1)
      SELECT q.token, q.provenance, COALESCE(d.df, 0) AS df
      FROM query q LEFT JOIN dfq d USING (token)
      ORDER BY q.provenance, q.token"""))

  val all: Seq[QueryDef] = Seq(q318BooleanRetrieval, q319WandPruning,
    q320CascadeRecall, q321RocchioPrf)
}
