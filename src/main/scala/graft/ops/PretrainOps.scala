package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pretraining-prep wave: T5-style span-corruption mask accounting,
  * ROUGE overlap against the sorted-neighborhood predecessor, the
  * bigram greedy hit rate (corpus predictability), and curriculum
  * sharding by LM difficulty. The seq2seq/curriculum layer on top of
  * the tokenize/dedup/score stack.
  */
object PretrainOps {

  /** T5 span-corruption accounting: every token position draws an
    * md5-uniform and is masked at noise density 0.15; consecutive masked
    * positions coalesce into spans (the gaps-and-islands shape, q176).
    * Output per doc: tokens, masked count, span count, mask ratio and
    * mean span length — the knobs a span-corruption pretraining config
    * promises, audited on the actual corpus. One explode + two
    * windows, all partitioned by doc. */
  val q266SpanCorruption: QueryDef = QueryDef(
    "q266_span_corruption",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("pos").cast("long").as("p"))
        .withColumn("u",
          conv(substring(md5(concat_ws("|", col("doc_id"), col("p"))), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0))
        .withColumn("masked", col("u") < 0.15)
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("p").asc)
      val spans = toks.filter(col("masked"))
        .withColumn("isl", col("p") - row_number().over(wDoc))
        .groupBy(col("doc_id"), col("isl")).agg(count(lit(1)).as("span_len"))
      val spanStats = spans.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_spans"), sum(col("span_len")).as("n_masked"))
      toks.groupBy(col("doc_id")).agg(count(lit(1)).as("n_tokens"))
        .join(spanStats, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("n_masked"), lit(0L)).as("n_masked"),
          coalesce(col("n_spans"), lit(0L)).as("n_spans"),
          round(coalesce(col("n_masked"), lit(0L)).cast("double") /
            col("n_tokens"), 6).as("mask_ratio"),
          round(when(coalesce(col("n_spans"), lit(0L)) > 0,
            coalesce(col("n_masked"), lit(0L)).cast("double") / col("n_spans"))
            .otherwise(lit(0.0)), 6).as("mean_span"))
    },
    Some("""WITH toks AS (SELECT doc_id, t.p - 1 AS p,
          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(t.p - 1 AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 < 0.15 AS masked
        FROM (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS tk FROM documents),
          UNNEST(generate_series(1, len(tk))) AS t(p)),
      spans AS (SELECT doc_id, isl, COUNT(*) AS span_len FROM (
          SELECT doc_id, p, p - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY p) AS isl
          FROM toks WHERE masked) GROUP BY 1, 2),
      ss AS (SELECT doc_id, COUNT(*) AS n_spans, SUM(span_len) AS n_masked
        FROM spans GROUP BY 1),
      nt AS (SELECT doc_id, COUNT(*) AS n_tokens FROM toks GROUP BY 1)
      SELECT nt.doc_id, CAST(nt.n_tokens AS BIGINT) AS n_tokens,
        CAST(COALESCE(ss.n_masked, 0) AS BIGINT) AS n_masked,
        CAST(COALESCE(ss.n_spans, 0) AS BIGINT) AS n_spans,
        round(CAST(COALESCE(ss.n_masked, 0) AS DOUBLE) / nt.n_tokens, 6) AS mask_ratio,
        round(CASE WHEN COALESCE(ss.n_spans, 0) > 0
          THEN CAST(COALESCE(ss.n_masked, 0) AS DOUBLE) / ss.n_spans
          ELSE 0.0 END, 6) AS mean_span
      FROM nt LEFT JOIN ss ON ss.doc_id = nt.doc_id"""))

  /** ROUGE-1/ROUGE-2 recall against the sorted-neighborhood predecessor
    * (q135's pairing: within lang, ordered by n_chars then doc_id, each
    * doc scores against the previous one — n−|langs| pairs, no pair
    * join). Multiset overlaps come from token/bigram count frames joined
    * per pair on the term — the summarization-eval metric family, run
    * corpus-wide as a near-dup triage signal. */
  val q267RougeNeighbors: QueryDef = QueryDef(
    "q267_rouge_neighbors",
    (s, dir) => {
      val wLang = Window.partitionBy(col("lang"))
        .orderBy(col("n_chars").asc, col("doc_id").asc)
      val pairs = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("prev_id", lag(col("doc_id"), 1).over(wLang))
        .filter(col("prev_id").isNotNull)
        .select(col("doc_id"), col("prev_id"))
        .localCheckpoint() // feeds both unigram and bigram overlap joins
      val base = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .localCheckpoint()
      val uni = base.select(col("doc_id"), explode(col("toks")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // both sides of the unigram overlap
      val bi = base.filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> concat_ws(' ', toks[i], toks[i+1]))")).as("t"))
        .groupBy(col("doc_id"), col("t")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // both sides of the bigram overlap
      def overlap(counts: org.apache.spark.sql.DataFrame, name: String) =
        pairs
          .join(counts.select(col("doc_id"), col("t"), col("c").as("ca")), Seq("doc_id"))
          .join(counts.select(col("doc_id").as("prev_id"), col("t"), col("c").as("cb")),
            Seq("prev_id", "t"))
          .groupBy(col("doc_id"), col("prev_id"))
          .agg(sum(least(col("ca"), col("cb"))).as(name))
      val refUni = uni.groupBy(col("doc_id")).agg(sum(col("c")).as("ref_uni"))
      val refBi = bi.groupBy(col("doc_id")).agg(sum(col("c")).as("ref_bi"))
      pairs
        .join(overlap(uni, "ov1"), Seq("doc_id", "prev_id"), "left")
        .join(overlap(bi, "ov2"), Seq("doc_id", "prev_id"), "left")
        .join(refUni.withColumnRenamed("doc_id", "prev_id"), Seq("prev_id"))
        .join(refBi.withColumnRenamed("doc_id", "prev_id"), Seq("prev_id"), "left")
        .select(col("doc_id"), col("prev_id"),
          round(coalesce(col("ov1"), lit(0L)).cast("double") / col("ref_uni"), 6)
            .as("rouge1_recall"),
          round(when(coalesce(col("ref_bi"), lit(0L)) > 0,
            coalesce(col("ov2"), lit(0L)).cast("double") / col("ref_bi"))
            .otherwise(lit(0.0)), 6).as("rouge2_recall"))
    },
    Some("""WITH d AS (SELECT doc_id, lang, n_chars,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      pairs AS (SELECT doc_id, prev_id FROM (
          SELECT doc_id, LAG(doc_id) OVER (PARTITION BY lang
            ORDER BY n_chars, doc_id) AS prev_id FROM d)
        WHERE prev_id IS NOT NULL),
      uni AS (SELECT doc_id, t.t AS t, COUNT(*) AS c
        FROM d, UNNEST(toks) AS t(t) GROUP BY 1, 2),
      bi AS (SELECT doc_id, t.t AS t, COUNT(*) AS c FROM (
          SELECT doc_id, list_transform(range(1, len(toks)),
            i -> toks[i] || ' ' || toks[i+1]) AS bgs
          FROM d WHERE len(toks) >= 2), UNNEST(bgs) AS t(t)
        GROUP BY 1, 2),
      ov1 AS (SELECT p.doc_id, p.prev_id, SUM(LEAST(a.c, b.c)) AS ov
        FROM pairs p JOIN uni a ON a.doc_id = p.doc_id
          JOIN uni b ON b.doc_id = p.prev_id AND b.t = a.t
        GROUP BY 1, 2),
      ov2 AS (SELECT p.doc_id, p.prev_id, SUM(LEAST(a.c, b.c)) AS ov
        FROM pairs p JOIN bi a ON a.doc_id = p.doc_id
          JOIN bi b ON b.doc_id = p.prev_id AND b.t = a.t
        GROUP BY 1, 2),
      r1 AS (SELECT doc_id, SUM(c) AS ref_uni FROM uni GROUP BY 1),
      r2 AS (SELECT doc_id, SUM(c) AS ref_bi FROM bi GROUP BY 1)
      SELECT p.doc_id, p.prev_id,
        round(CAST(COALESCE(ov1.ov, 0) AS DOUBLE) / r1.ref_uni, 6) AS rouge1_recall,
        round(CASE WHEN COALESCE(r2.ref_bi, 0) > 0
          THEN CAST(COALESCE(ov2.ov, 0) AS DOUBLE) / r2.ref_bi
          ELSE 0.0 END, 6) AS rouge2_recall
      FROM pairs p
        LEFT JOIN ov1 ON ov1.doc_id = p.doc_id AND ov1.prev_id = p.prev_id
        LEFT JOIN ov2 ON ov2.doc_id = p.doc_id AND ov2.prev_id = p.prev_id
        JOIN r1 ON r1.doc_id = p.prev_id
        LEFT JOIN r2 ON r2.doc_id = p.prev_id"""))

  /** Bigram greedy hit rate: the corpus-trained bigram argmax (most
    * frequent continuation per w1, ties lexicographic) replayed over
    * every document — the fraction of transitions a 1-gram-context
    * greedy predictor gets right. The predictability proxy behind
    * speculative-decoding acceptance and compression-based quality
    * scores; one type-level argmax window + one occurrence join. */
  val q268BigramHitRate: QueryDef = QueryDef(
    "q268_bigram_hit_rate",
    (s, dir) => {
      val bg = Tables(s, dir).documents
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> struct(toks[i] AS w1, toks[i+1] AS w2))")).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .localCheckpoint() // feeds the model and the replay
      val wArg = Window.partitionBy(col("w1"))
        .orderBy(col("c12").desc, col("w2").asc)
      val argmax = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
        .withColumn("rn", row_number().over(wArg))
        .filter(col("rn") === 1)
        .select(col("w1"), col("w2").as("w2_hat"))
      bg.join(argmax, Seq("w1"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_transitions"),
          sum(when(col("w2") === col("w2_hat"), 1L).otherwise(0L)).as("n_hits"))
        .withColumn("hit_rate",
          round(col("n_hits").cast("double") / col("n_transitions"), 6))
    },
    Some("""WITH base AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
          FROM documents),
      bg AS (SELECT doc_id, t.u.w1 AS w1, t.u.w2 AS w2
        FROM (SELECT doc_id, toks FROM base WHERE len(toks) >= 2),
          UNNEST(list_transform(range(0, len(toks)-1),
            i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS t(u)),
      argmax AS (SELECT w1, w2 AS w2_hat FROM (
          SELECT w1, w2, ROW_NUMBER() OVER (PARTITION BY w1
            ORDER BY COUNT(*) DESC, w2) AS rn
          FROM bg GROUP BY w1, w2) WHERE rn = 1)
      SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_transitions,
        CAST(SUM(CASE WHEN bg.w2 = a.w2_hat THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
        round(CAST(SUM(CASE WHEN bg.w2 = a.w2_hat THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS hit_rate
      FROM bg JOIN argmax a USING (w1) GROUP BY 1"""))

  /** Curriculum sharding: documents ranked by q94's bigram difficulty
    * and cut into 8 monotone shards (easy → hard) with per-shard size,
    * difficulty band, and token mass — the curriculum-learning data
    * layout, priced per shard. The single global order window is the
    * honest exact-ranking cost (q231's precedent); everything else is a
    * shard-level rollup. */
  val q269CurriculumShards: QueryDef = QueryDef(
    "q269_curriculum_shards",
    (s, dir) => {
      val perDoc = ScoringOps.q94BigramPerplexity.fn(s, dir)
        .select(col("doc_id"), col("n_bigrams"), col("avg_nll"))
      val wOrd = Window.partitionBy().orderBy(col("avg_nll").asc, col("doc_id").asc)
      perDoc
        .withColumn("shard", ntile(8).over(wOrd).cast("long"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          round(min(col("avg_nll")), 6).as("min_nll"),
          round(max(col("avg_nll")), 6).as("max_nll"),
          round(sum(round(col("avg_nll"), 6)) / count(lit(1)), 6).as("mean_nll"),
          sum(col("n_bigrams")).as("token_mass"))
    },
    Some("""WITH base AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
          FROM documents),
      b2 AS (SELECT doc_id, toks FROM base WHERE len(toks) >= 2),
      bg AS (SELECT doc_id, t.u.w1 AS w1, t.u.w2 AS w2 FROM b2,
          UNNEST(list_transform(range(0, len(toks)-1),
            i -> {'w1': toks[i+1], 'w2': toks[i+2]})) AS t(u)),
      vstats AS (SELECT CAST(COUNT(DISTINCT t.tok) AS BIGINT) AS v
        FROM b2, UNNEST(toks) AS t(tok)),
      c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bg GROUP BY 1, 2),
      c1 AS (SELECT w1, COUNT(*) AS c1 FROM bg GROUP BY 1),
      sc AS (SELECT bg.doc_id,
          -ln((CAST(c12.c12 AS DOUBLE) + 1.0) / (CAST(c1.c1 AS DOUBLE) + v.v)) AS nll
        FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vstats v),
      perdoc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
          round(SUM(nll) / COUNT(*), 6) AS avg_nll FROM sc GROUP BY 1),
      sh AS (SELECT doc_id, n_bigrams, avg_nll,
          NTILE(8) OVER (ORDER BY avg_nll, doc_id) AS shard
        FROM perdoc)
      SELECT CAST(shard AS BIGINT) AS shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        round(MIN(avg_nll), 6) AS min_nll, round(MAX(avg_nll), 6) AS max_nll,
        round(SUM(round(avg_nll, 6)) / COUNT(*), 6) AS mean_nll,
        CAST(SUM(n_bigrams) AS BIGINT) AS token_mass
      FROM sh GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q266SpanCorruption, q267RougeNeighbors, q268BigramHitRate,
        q269CurriculumShards)
}
