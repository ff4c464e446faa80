package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Tokenizer-training and classifier-evaluation operators: BPE merge
  * candidates, learned-profile language ID with its confusion matrix,
  * centroid silhouette, and a PR-curve threshold sweep — the loop that
  * trains the tokenizer and then grades every classifier the pipeline
  * gates on.
  */
object TokenizerOps {

  /** BPE merge-candidate counting — the inner step of byte-pair-
    * encoding training: count adjacent character pairs across every
    * word occurrence in the corpus and surface the top merges. One
    * tokenize pass, one generator per word (length-1 pairs via a
    * transform over substrings), one hash agg; the top-30 cut is a
    * TakeOrdered, not a global sort. At 100 TB this is the job you run
    * once per merge round, and it is embarrassingly parallel.
    */
  val q190BpePairs: QueryDef = QueryDef(
    "q190_bpe_pairs",
    (s, dir) => {
      Tables(s, dir).documents
        .select(explode(TextOps.tokens(col("text"))).as("tok"))
        .filter(length(col("tok")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"))
          .as("pair"))
        .groupBy(col("pair"))
        .agg(count(lit(1)).as("n_occurrences"))
        .orderBy(col("n_occurrences").desc, col("pair").asc)
        .limit(30)
    },
    Some("""WITH toks AS (SELECT UNNEST(regexp_extract_all(lower(text), '\w+')) AS tok
          FROM documents),
      pairs AS (SELECT UNNEST(list_transform(range(1, length(tok)),
            i -> substring(tok, CAST(i AS INTEGER), 2))) AS pair
          FROM toks WHERE length(tok) >= 2)
      SELECT pair, COUNT(*) AS n_occurrences
      FROM pairs GROUP BY 1
      ORDER BY n_occurrences DESC, pair ASC LIMIT 30"""))

  /** Language-ID by learned token profiles, evaluated as a confusion
    * matrix: the top-20 tokens per labeled language become that
    * language's profile (model-sized, broadcast); each document is
    * classified to the profile it hits most (ties break
    * lexicographically) and the resubstitution confusion matrix falls
    * out of one hash agg — the Cavnar–Trenkle n-gram-profile classifier
    * at rank-1 token granularity, with its own honesty check attached.
    */
  val q191LangidConfusion: QueryDef = QueryDef(
    "q191_langid_confusion",
    (s, dir) => {
      val docTok = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .localCheckpoint() // one tokenize pass feeds profiles AND scoring
      val wLang = Window.partitionBy(col("lang"))
        .orderBy(col("c").desc, col("tok").asc)
      val profiles = docTok.groupBy(col("lang"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(wLang))
        .filter(col("rn") <= 20)
        .select(col("lang").as("lang_p"), col("tok"))
      val wDoc = Window.partitionBy(col("doc_id"))
        .orderBy(col("hits").desc, col("lang_p").asc)
      docTok.join(broadcast(profiles), Seq("tok"))
        .groupBy(col("doc_id"), col("lang"), col("lang_p"))
        .agg(count(lit(1)).as("hits"))
        .withColumn("rn", row_number().over(wDoc))
        .filter(col("rn") === 1)
        .groupBy(col("lang").as("actual"), col("lang_p").as("predicted"))
        .agg(count(lit(1)).as("n_docs"))
    },
    Some("""WITH dt AS (SELECT doc_id, lang,
          UNNEST(regexp_extract_all(lower(text), '\w+')) AS tok
        FROM documents),
      prof AS (SELECT lang AS lang_p, tok FROM (
          SELECT lang, tok, COUNT(*) AS c,
            ROW_NUMBER() OVER (PARTITION BY lang
              ORDER BY COUNT(*) DESC, tok ASC) AS rn
          FROM dt GROUP BY 1, 2) WHERE rn <= 20),
      hits AS (SELECT dt.doc_id, dt.lang, p.lang_p, COUNT(*) AS hits
        FROM dt JOIN prof p ON dt.tok = p.tok
        GROUP BY 1, 2, 3),
      best AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
          ORDER BY hits DESC, lang_p ASC) AS rn FROM hits)
      SELECT lang AS actual, lang_p AS predicted, COUNT(*) AS n_docs
      FROM best WHERE rn = 1 GROUP BY 1, 2"""))

  /** Centroid-based silhouette per embedding cluster: a = distance to
    * own label's centroid, b = distance to the nearest OTHER centroid,
    * s = (b−a)/max(a,b) — the cluster-quality score that says whether
    * the label structure is real before anyone trains on it. The q62
    * flat-triple idiom: centroids are a model-sized (|labels|×dims)
    * agg (rounded to 9 to pin cross-engine parity), distances ride the
    * dim equi-join, and the |labels|-way comparison is a conditional
    * agg per vector — never vectors × vectors.
    */
  val q192Silhouette: QueryDef = QueryDef(
    "q192_silhouette",
    (s, dir) => {
      val flat = Tables(s, dir).embeddings
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("dim"),
          col("col").cast("double").as("v"))
        .localCheckpoint() // one explode feeds centroids AND distances
      val cent = flat.groupBy(col("label").as("clabel"), col("dim"))
        .agg(round(avg(col("v")), 9).as("c"))
      val d2 = flat.join(cent, Seq("dim"))
        .groupBy(col("vec_id"), col("label"), col("clabel"))
        .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d2"))
      val sil = d2.groupBy(col("vec_id"), col("label"))
        .agg(max(when(col("label") === col("clabel"), col("d2"))).as("a2"),
             min(when(col("label") =!= col("clabel"), col("d2"))).as("b2"))
        .select(col("vec_id"), col("label"), sqrt(col("a2")).as("a"),
          sqrt(col("b2")).as("b"))
        .withColumn("s", (col("b") - col("a")) / greatest(col("a"), col("b")))
      sil.groupBy(col("label"))
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("a")), 6).as("mean_intra"),
          round(avg(col("b")), 6).as("mean_nearest_other"),
          round(avg(col("s")), 6).as("silhouette"))
    },
    Some("""WITH flat AS (SELECT vec_id, label, t.gs AS dim,
          CAST(embedding[t.gs] AS DOUBLE) AS v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)),
      cent AS (SELECT label AS clabel, dim, round(avg(v), 9) AS c
        FROM flat GROUP BY 1, 2),
      d2 AS (SELECT f.vec_id, f.label, c.clabel,
          SUM((f.v - c.c) * (f.v - c.c)) AS d2
        FROM flat f JOIN cent c ON f.dim = c.dim
        GROUP BY 1, 2, 3),
      sil AS (SELECT vec_id, label,
          sqrt(MAX(CASE WHEN label = clabel THEN d2 END)) AS a,
          sqrt(MIN(CASE WHEN label <> clabel THEN d2 END)) AS b
        FROM d2 GROUP BY 1, 2)
      SELECT label, COUNT(*) AS n_vecs,
        round(AVG(a), 6) AS mean_intra,
        round(AVG(b), 6) AS mean_nearest_other,
        round(AVG((b - a) / greatest(a, b)), 6) AS silhouette
      FROM sil GROUP BY 1"""))

  /** Precision/recall curve of the q183 quality score against the
    * is-English label, swept over ten thresholds in ONE scan: each
    * document fans out to the 10 thresholds it is scored against (a
    * bounded ×10 generator), TP/FP/FN reduce per threshold as exact
    * ints, and P/R/F1 are pure ratios — the operating-point table that
    * turns a score into a deployable gate.
    */
  val q193PrCurve: QueryDef = QueryDef(
    "q193_pr_curve",
    (s, dir) => {
      Tables(s, dir).documents
        .withColumn("p", least(greatest(
          (col("n_chars") - lit(100)).cast("double") / lit(900.0), lit(0.0)),
          lit(1.0)))
        .withColumn("y", (col("lang") === "en").cast("long"))
        .withColumn("i", explode(sequence(lit(0L), lit(9L))))
        .withColumn("thresh", lit(0.05) + col("i").cast("double") * lit(0.1))
        .withColumn("pred", (col("p") >= col("thresh")).cast("long"))
        .groupBy(col("thresh"))
        .agg(
          sum(col("pred") * col("y")).as("tp"),
          sum(col("pred") * (lit(1L) - col("y"))).as("fp"),
          sum((lit(1L) - col("pred")) * col("y")).as("fn"))
        .select(col("thresh"), col("tp"), col("fp"), col("fn"),
          round(col("tp").cast("double") /
            greatest(col("tp") + col("fp"), lit(1L)).cast("double"), 6)
            .as("precision"),
          round(col("tp").cast("double") /
            greatest(col("tp") + col("fn"), lit(1L)).cast("double"), 6)
            .as("recall"),
          round(lit(2.0) * col("tp").cast("double") /
            greatest(lit(2L) * col("tp") + col("fp") + col("fn"), lit(1L))
              .cast("double"), 6).as("f1"))
    },
    Some("""WITH sc AS (SELECT
          least(greatest(CAST(n_chars - 100 AS DOUBLE) / 900.0, 0.0), 1.0) AS p,
          CAST(lang = 'en' AS BIGINT) AS y
        FROM documents),
      fan AS (SELECT p, y, 0.05 + CAST(t.i AS DOUBLE) * 0.1 AS thresh,
          CAST(p >= 0.05 + CAST(t.i AS DOUBLE) * 0.1 AS BIGINT) AS pred
        FROM sc CROSS JOIN (SELECT UNNEST(range(0, 10)) AS i) t),
      agg AS (SELECT thresh,
          CAST(SUM(pred * y) AS BIGINT) AS tp,
          CAST(SUM(pred * (1 - y)) AS BIGINT) AS fp,
          CAST(SUM((1 - pred) * y) AS BIGINT) AS fn
        FROM fan GROUP BY 1)
      SELECT thresh, tp, fp, fn,
        round(CAST(tp AS DOUBLE) / CAST(greatest(tp + fp, 1) AS DOUBLE), 6)
          AS precision,
        round(CAST(tp AS DOUBLE) / CAST(greatest(tp + fn, 1) AS DOUBLE), 6)
          AS recall,
        round(2.0 * CAST(tp AS DOUBLE) /
          CAST(greatest(2 * tp + fp + fn, 1) AS DOUBLE), 6) AS f1
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(q190BpePairs, q191LangidConfusion,
    q192Silhouette, q193PrCurve)
}
