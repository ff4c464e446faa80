package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dawid–Skene annotator-reliability estimation (Dawid & Skene 1979),
  * one EM round over a deterministic 3-annotator fixture — the classic
  * crowdsourced-label aggregation every labeling pipeline runs instead
  * of raw majority vote: initialize labels by majority, M-step the
  * per-annotator confusion matrices and class priors, E-step re-score
  * every document, report each annotator's per-class reliability
  * against the EM-refined labels. Votes are derived from the documents
  * table by salted md5 (each annotator is "right" on ~70% of docs,
  * wrong deterministically otherwise), so the fixture is self-contained
  * and both engines derive identical votes (reference: overseer's
  * arbitrary handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: votes are a 3× linear fan-out of the corpus; both EM
  * steps are hash-aggs; the model (3 annotators × 5 × 5 confusion
  * cells + 5 priors) is a broadcast-sized object, so the E-step is a
  * broadcast join against the vote stream — the NB/q511 scoring shape.
  *
  * Exactness: votes, confusion counts and priors are BIGINTs;
  * E-step log-likelihoods are integer micro-nats (floor(ln(p)·1e6),
  * add-one smoothed — the q511 discipline), so scores are exact BIGINT
  * sums and both argmaxes (ties → lexicographically first language)
  * are cross-engine deterministic.
  */
object DawidSkeneOps {

  val q520DawidSkene: QueryDef = QueryDef(
    "q520_dawid_skene",
    (s, dir) => {
      val docs = Tables(s, dir).documents.select(col("doc_id"), col("lang"))
        .localCheckpoint()
      val langs = docs.select(col("lang")).distinct()
        .withColumn("idx",
          (row_number().over(Window.orderBy(col("lang"))) - 1).cast("long"))
        .localCheckpoint()
      val nLangs = langs.count()
      val anns = s.range(1, 4).select(col("id").as("ann"))
      val votes = docs.join(broadcast(langs), Seq("lang"))
        .crossJoin(broadcast(anns))
        .withColumn("h", pmod(conv(substring(md5(concat(
          lit("ann"), col("ann").cast("string"), lit("|"),
          col("doc_id").cast("string"))), 1, 15), 16, 10).cast("long"),
          lit(10L)))
        .withColumn("vidx",
          when(col("h") < 7, col("idx"))
            .otherwise(pmod(col("idx") + 1 + (col("h") - 7), lit(nLangs))))
        .join(broadcast(langs.select(col("idx").as("vidx"),
          col("lang").as("vote"))), Seq("vidx"))
        .select(col("doc_id"), col("ann"), col("vote"))
        .localCheckpoint()

      // init: majority vote (ties -> lexicographically first language)
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("cnt").desc, col("vote"))
      val z0 = votes.groupBy(col("doc_id"), col("vote"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rn", row_number().over(wDoc)).where(col("rn") === 1)
        .select(col("doc_id"), col("vote").as("z0"))

      // M-step: per-annotator confusion + class priors (all counts)
      val joined = votes.join(z0, Seq("doc_id"))
      val conf = joined.groupBy(col("ann"), col("z0"), col("vote"))
        .agg(count(lit(1)).as("c"))
      val rowTot = conf.groupBy(col("ann"), col("z0")).agg(sum(col("c")).as("rt"))
      val prior = z0.groupBy(col("z0")).agg(count(lit(1)).as("pc"))
      val nDocs = docs.count()
      // full (ann × class × vote) model spine with add-one smoothing
      val spine = broadcast(anns)
        .crossJoin(broadcast(langs.select(col("lang").as("z0"))))
        .crossJoin(broadcast(langs.select(col("lang").as("vote"))))
      val model = spine
        .join(conf, Seq("ann", "z0", "vote"), "left").na.fill(0L, Seq("c"))
        .join(rowTot, Seq("ann", "z0"), "left").na.fill(0L, Seq("rt"))
        .select(col("ann"), col("z0").as("cls"), col("vote"),
          floor(log((col("c") + 1).cast("double") / (col("rt") + nLangs)) * 1e6)
            .cast("long").as("lp"))
      val priorLp = langs.select(col("lang").as("cls"))
        .join(prior.withColumnRenamed("z0", "cls"), Seq("cls"), "left")
        .na.fill(0L, Seq("pc"))
        .select(col("cls"),
          floor(log((col("pc") + 1).cast("double") / (nDocs + nLangs)) * 1e6)
            .cast("long").as("lp0"))

      // E-step: rescore every doc against every class, argmax
      val scores = votes.join(broadcast(model), Seq("ann", "vote"))
        .groupBy(col("doc_id"), col("cls")).agg(sum(col("lp")).as("ts"))
        .join(broadcast(priorLp), Seq("cls"))
        .select(col("doc_id"), col("cls"), (col("ts") + col("lp0")).as("score"))
      val wSc = Window.partitionBy(col("doc_id"))
        .orderBy(col("score").desc, col("cls"))
      val z1 = scores.withColumn("rn", row_number().over(wSc))
        .where(col("rn") === 1).select(col("doc_id"), col("cls").as("z1"))

      // report: per-annotator per-class reliability vs the EM labels
      votes.join(z1, Seq("doc_id"))
        .groupBy(col("ann"), col("z1").as("lang"))
        .agg(count(lit(1)).as("n_votes"),
          sum(when(col("vote") === col("z1"), 1L).otherwise(0L)).as("n_match"))
        .select(col("ann"), col("lang"), col("n_votes"), col("n_match"),
          expr("1000000 * n_match DIV n_votes").as("acc_micro"))
    },
    Some("""WITH langs AS (
        SELECT lang, CAST(row_number() OVER (ORDER BY lang) - 1 AS BIGINT) AS idx
        FROM (SELECT DISTINCT lang FROM documents)),
      nl AS (SELECT COUNT(*) AS n FROM langs),
      nd AS (SELECT COUNT(*) AS n FROM documents),
      anns AS (SELECT unnest(range(1, 4)) AS ann),
      votes AS (
        SELECT d.doc_id, a.ann, lv.lang AS vote
        FROM documents d
        JOIN langs l ON l.lang = d.lang
        CROSS JOIN anns a
        CROSS JOIN nl
        JOIN langs lv ON lv.idx = CASE
          WHEN ('0x' || substr(md5('ann' || CAST(a.ann AS VARCHAR) || '|' ||
            CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 < 7 THEN l.idx
          ELSE (l.idx + 1 + (('0x' || substr(md5('ann' ||
            CAST(a.ann AS VARCHAR) || '|' ||
            CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT % 10 - 7)) % nl.n
          END),
      z0 AS (
        SELECT doc_id, vote AS z0 FROM (
          SELECT doc_id, vote,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY COUNT(*) DESC, vote) AS rn
          FROM votes GROUP BY doc_id, vote)
        WHERE rn = 1),
      conf AS (
        SELECT v.ann, z.z0, v.vote, CAST(COUNT(*) AS BIGINT) AS c
        FROM votes v JOIN z0 z ON z.doc_id = v.doc_id
        GROUP BY 1, 2, 3),
      row_tot AS (SELECT ann, z0, SUM(c) AS rt FROM conf GROUP BY 1, 2),
      prior AS (SELECT z0, CAST(COUNT(*) AS BIGINT) AS pc FROM z0 GROUP BY 1),
      model AS (
        SELECT a.ann, c1.lang AS cls, c2.lang AS vote,
          CAST(floor(ln(CAST(COALESCE(cf.c, 0) + 1 AS DOUBLE) /
            (COALESCE(rt.rt, 0) + nl.n)) * 1e6) AS BIGINT) AS lp
        FROM anns a CROSS JOIN langs c1 CROSS JOIN langs c2 CROSS JOIN nl
        LEFT JOIN conf cf
          ON cf.ann = a.ann AND cf.z0 = c1.lang AND cf.vote = c2.lang
        LEFT JOIN row_tot rt ON rt.ann = a.ann AND rt.z0 = c1.lang),
      prior_lp AS (
        SELECT l.lang AS cls,
          CAST(floor(ln(CAST(COALESCE(p.pc, 0) + 1 AS DOUBLE) /
            (nd.n + nl.n)) * 1e6) AS BIGINT) AS lp0
        FROM langs l CROSS JOIN nd CROSS JOIN nl
        LEFT JOIN prior p ON p.z0 = l.lang),
      scores AS (
        SELECT v.doc_id, m.cls,
          CAST(SUM(m.lp) + MIN(pl.lp0) AS BIGINT) AS score
        FROM votes v
        JOIN model m ON m.ann = v.ann AND m.vote = v.vote
        JOIN prior_lp pl ON pl.cls = m.cls
        GROUP BY 1, 2),
      z1 AS (
        SELECT doc_id, cls AS z1 FROM (
          SELECT doc_id, cls,
            row_number() OVER (PARTITION BY doc_id
              ORDER BY score DESC, cls) AS rn
          FROM scores)
        WHERE rn = 1)
      SELECT v.ann, z.z1 AS lang,
        CAST(COUNT(*) AS BIGINT) AS n_votes,
        CAST(SUM(CASE WHEN v.vote = z.z1 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_match,
        1000000 * CAST(SUM(CASE WHEN v.vote = z.z1 THEN 1 ELSE 0 END)
          AS BIGINT) // COUNT(*) AS acc_micro
      FROM votes v JOIN z1 z ON z.doc_id = v.doc_id
      GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q520DawidSkene)
}
