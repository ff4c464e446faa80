package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Corpus-mining wave: exact duplicated-SPAN detection (the
  * suffix-free core of Lee et al. 2022's "Deduplicating Training Data
  * Makes Language Models Better" — position-sliding k-gram dedup, not
  * q88's fixed chunks), a distributed logistic-regression quality
  * classifier trained by unrolled gradient descent (the fastText-style
  * quality gate every curation stack distills), and semi-hard negative
  * mining for embedding training (Schroff et al. 2015's margin band,
  * the contrastive-data step after q172's uniform negatives).
  *
  * Scale shapes: span mining is hash-agg + equi-join on gram hashes
  * (linear in token mass, never a pair join); logreg is three linear
  * passes with a 1-row broadcast weight frame (corpus never re-shuffles,
  * the model is the only state); negative mining is one broadcast
  * anchor×corpus pass + per-anchor windows over a margin-filtered
  * candidate set.
  */
object MineOps {

  /** md5-derived 64-bit gram hash, identical in both engines (the
    * q29/q31 family): hex chars 1–8 as the high word, 9–16 low. */
  private def gramHash(gram: Column): Column =
    graft.functions.VectorFunctions.md5Long(gram)

  private def gramHashSql(s: String): String =
    // the house two's-complement composition (q29/q74 oracles): sign-extend
    // the hi word before the *2^32 so the product stays inside int64 — a
    // plain << 32 overflows DuckDB's checked BIGINT shift for hi >= 2^31
    s"""(('0x' || substr(md5($s), 1, 8))::BIGINT
       - CASE WHEN ('0x' || substr(md5($s), 1, 8))::BIGINT >= 2147483648
              THEN 4294967296 ELSE 0 END) * 4294967296
       + ('0x' || substr(md5($s), 9, 8))::BIGINT"""

  /** Duplicated-span mining: for k ∈ {8, 16, 32}, a position's k-gram is
    * DUPLICATED when its hash occurs in ≥ 2 DISTINCT documents (same-doc
    * repeats don't count — that's q76's boilerplate signal). Reports per
    * doc: the duplicated-8-gram count, the exact token COVERAGE of
    * duplicated 8-grams (union of [pos, pos+7] intervals — the Lee et al.
    * duplicated-token-mass metric, computed exactly via position
    * explode + distinct), and the longest duplicated span bucket
    * (32 ≻ 16 ≻ 8 ≻ 0). Everything is gram-hash equi-joins: grams →
    * hash-agg (distinct-doc count ≥ 2) → semi join back — work is linear
    * in token mass at any corpus size, and the doubling ladder means a
    * 32-token shared span is found without ever materializing spans
    * longer than the probe sizes. */
  val q339DuplicateSpans: QueryDef = QueryDef(
    "q339_duplicate_spans",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 8)
        .localCheckpoint() // feeds three gram ladders + the report spine
      def grams(k: Int): DataFrame = docs
        .filter(size(col("toks")) >= k)
        .select(col("doc_id"), posexplode(expr(
          s"transform(sequence(0, size(toks) - $k), i -> concat_ws(' ', slice(toks, i + 1, $k)))")))
        .select(col("doc_id"), col("pos"), gramHash(col("col")).as("h"))
      def dupPositions(k: Int): DataFrame = {
        val g = grams(k).localCheckpoint()
        val dupH = g.groupBy(col("h"))
          .agg(countDistinct(col("doc_id")).as("nd"))
          .filter(col("nd") >= 2)
          .select(col("h"))
        g.join(dupH, Seq("h"), "left_semi").select(col("doc_id"), col("pos"))
      }
      val dup8 = dupPositions(8).localCheckpoint() // count + coverage + bucket
      val n8 = dup8.groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup8"))
      val cov8 = dup8
        .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + 7)).as("p"))
        .distinct()
        .groupBy(col("doc_id")).agg(count(lit(1)).as("covered_toks"))
      val has16 = dupPositions(16).groupBy(col("doc_id")).agg(count(lit(1)).as("n16"))
      val has32 = dupPositions(32).groupBy(col("doc_id")).agg(count(lit(1)).as("n32"))
      docs.select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"))
        .join(n8, Seq("doc_id"), "left")
        .join(cov8, Seq("doc_id"), "left")
        .join(has16, Seq("doc_id"), "left")
        .join(has32, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_toks"),
          coalesce(col("n_dup8"), lit(0L)).as("n_dup8"),
          coalesce(col("covered_toks"), lit(0L)).as("covered_toks"),
          round(coalesce(col("covered_toks"), lit(0L)).cast("double") /
            col("n_toks"), 6).as("dup_share"),
          when(col("n32").isNotNull, 32L).when(col("n16").isNotNull, 16L)
            .when(col("n_dup8").isNotNull, 8L).otherwise(0L).as("max_dup_k"))
    },
    Some(s"""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS toks
          FROM documents),
      d AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
        FROM t WHERE len(toks) >= 8),
      g8 AS (SELECT doc_id, r.i - 1 AS pos,
          ${gramHashSql("array_to_string(toks[r.i:r.i+7], ' ')")} AS h
        FROM d, UNNEST(range(1, CAST(n AS INT) - 6)) AS r(i)),
      dup8 AS (SELECT doc_id, pos FROM g8
        WHERE h IN (SELECT h FROM g8 GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)),
      n8 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup8 FROM dup8 GROUP BY 1),
      cov AS (SELECT DISTINCT doc_id, u.p
        FROM dup8, UNNEST(range(pos, pos + 8)) AS u(p)),
      covc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS covered_toks FROM cov GROUP BY 1),
      g16 AS (SELECT doc_id,
          ${gramHashSql("array_to_string(toks[r.i:r.i+15], ' ')")} AS h
        FROM d, UNNEST(range(1, CAST(n AS INT) - 14)) AS r(i)),
      d16 AS (SELECT doc_id, COUNT(*) AS n16 FROM g16
        WHERE h IN (SELECT h FROM g16 GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
        GROUP BY 1),
      g32 AS (SELECT doc_id,
          ${gramHashSql("array_to_string(toks[r.i:r.i+31], ' ')")} AS h
        FROM d, UNNEST(range(1, CAST(n AS INT) - 30)) AS r(i)),
      d32 AS (SELECT doc_id, COUNT(*) AS n32 FROM g32
        WHERE h IN (SELECT h FROM g32 GROUP BY h HAVING COUNT(DISTINCT doc_id) >= 2)
        GROUP BY 1)
      SELECT d.doc_id, d.n AS n_toks,
        COALESCE(n8.n_dup8, 0) AS n_dup8,
        COALESCE(covc.covered_toks, 0) AS covered_toks,
        round(CAST(COALESCE(covc.covered_toks, 0) AS DOUBLE) / d.n, 6) AS dup_share,
        CAST(CASE WHEN d32.n32 IS NOT NULL THEN 32
                  WHEN d16.n16 IS NOT NULL THEN 16
                  WHEN n8.n_dup8 IS NOT NULL THEN 8 ELSE 0 END AS BIGINT) AS max_dup_k
      FROM d LEFT JOIN n8 USING (doc_id)
             LEFT JOIN covc USING (doc_id)
             LEFT JOIN d16 USING (doc_id)
             LEFT JOIN d32 USING (doc_id)"""))

  /** Per-doc features + integer-exact label shared by q340: bounded
    * token count, type-token ratio, bounded mean word length; label =
    * the Gopher-ish gate (20 ≤ n_toks ≤ 400 ∧ TTR ≥ 0.4), evaluated as
    * pure int comparisons so both engines agree bit-for-bit. */
  private def logregFeats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir).documents
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_toks"),
        size(array_distinct(col("toks"))).cast("long").as("n_dist"),
        expr("aggregate(transform(toks, t -> length(t)), 0L, (a, x) -> a + x)")
          .as("sum_len"))
      .withColumn("x1", least(col("n_toks"), lit(200L)).cast("double") / 200.0)
      .withColumn("x2", col("n_dist").cast("double") / col("n_toks"))
      .withColumn("x3",
        least(col("sum_len").cast("double") / col("n_toks"), lit(8.0)) / 8.0)
      .withColumn("y",
        (col("n_toks") >= 20 && col("n_toks") <= 400 &&
         col("n_dist") * 10 >= col("n_toks") * 4).cast("int"))
      .select(col("x1"), col("x2"), col("x3"), col("y"))

  private val logregFeatsSql =
    """feats AS (SELECT
        CAST(LEAST(len(tk), 200) AS DOUBLE) / 200.0 AS x1,
        CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk) AS x2,
        LEAST(CAST(list_sum(list_transform(tk, t -> strlen(t))) AS DOUBLE)
          / len(tk), 8.0) / 8.0 AS x3,
        CASE WHEN len(tk) >= 20 AND len(tk) <= 400
              AND len(list_distinct(tk)) * 10 >= len(tk) * 4
          THEN 1 ELSE 0 END AS y
      FROM (SELECT regexp_extract_all(lower(text), '\w+') AS tk FROM documents)
      WHERE len(tk) > 0)"""

  /** Distributed logistic-regression training for a document quality
    * classifier: three unrolled batch-gradient-descent iterations
    * (η = 0.5) on (bias, bounded length, TTR, bounded mean word length),
    * predicting the integer-exact quality label. The weights live in a
    * 1-ROW frame that broadcast-joins onto the corpus each pass — the
    * corpus is touched in exactly three linear scans and never
    * re-shuffles; the model is the only cross-pass state (the q80 Lloyd
    * discipline). Determinism: per-row gradient/log-loss terms are
    * rounded at 12 dp into DECIMAL(28,14) sums (order-free), weight
    * updates rounded at 9 dp — so both engines walk the identical weight
    * trajectory through the exp/ln calls. Reports per iteration: the
    * weights the pass evaluated, its log-loss and accuracy, and the
    * updated weights. */
  val q340LogregQuality: QueryDef = QueryDef(
    "q340_logreg_quality",
    (s, dir) => {
      val decG = DecimalType(28, 14)
      val feats = logregFeats(s, dir).localCheckpoint() // three passes, one build
      var w: DataFrame = s.range(1).select(
        lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"), lit(0.0).as("w3"))
      val reports = (0 until 3).map { i =>
        val pass = feats.crossJoin(broadcast(w))
          .withColumn("z", col("w0") + col("w1") * col("x1") +
            col("w2") * col("x2") + col("w3") * col("x3"))
          .withColumn("p", lit(1.0) / (lit(1.0) + exp(-col("z"))))
          .withColumn("e", col("y").cast("double") - col("p"))
        def gterm(x: Column) = sum(round(x * col("e"), 12).cast(decG))
        val agg = pass.groupBy(col("w0"), col("w1"), col("w2"), col("w3"))
          .agg(count(lit(1)).as("n"),
            gterm(lit(1.0)).as("s0"), gterm(col("x1")).as("s1"),
            gterm(col("x2")).as("s2"), gterm(col("x3")).as("s3"),
            sum(round(-(col("y").cast("double") * log(col("p")) +
              (lit(1.0) - col("y").cast("double")) * log(lit(1.0) - col("p"))), 12)
              .cast(decG)).as("sll"),
            sum(when((col("p") >= 0.5) === (col("y") === 1), 1L).otherwise(0L))
              .as("hits"))
        def upd(wj: String, sj: String) =
          round(col(wj) + lit(0.5) * (col(sj).cast("double") / col("n")), 9)
        val rep = agg.select(lit(i.toLong).as("iter"),
          col("w0"), col("w1"), col("w2"), col("w3"),
          round(col("sll").cast("double") / col("n"), 6).as("logloss"),
          round(col("hits").cast("double") / col("n"), 6).as("accuracy"),
          upd("w0", "s0").as("nw0"), upd("w1", "s1").as("nw1"),
          upd("w2", "s2").as("nw2"), upd("w3", "s3").as("nw3"))
          .localCheckpoint() // pins this iteration; the next pass reads it
        w = rep.select(col("nw0").as("w0"), col("nw1").as("w1"),
          col("nw2").as("w2"), col("nw3").as("w3"))
        rep
      }
      reports.reduce(_.unionByName(_)).orderBy(col("iter"))
    },
    Some(s"""WITH $logregFeatsSql,
      it0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2, 0.0 AS w3),
      p1 AS (SELECT f.*, w.*,
          w0 + w1 * x1 + w2 * x2 + w3 * x3 AS z
        FROM feats f CROSS JOIN it0 w),
      q1 AS (SELECT *, 1.0 / (1.0 + exp(-z)) AS p FROM p1),
      a1 AS (SELECT w0, w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(round(1.0 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s0,
          SUM(CAST(round(x1 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s1,
          SUM(CAST(round(x2 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s2,
          SUM(CAST(round(x3 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s3,
          SUM(CAST(round(-(CAST(y AS DOUBLE) * ln(p)
            + (1.0 - CAST(y AS DOUBLE)) * ln(1.0 - p)), 12) AS DECIMAL(28,14))) AS sll,
          SUM(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END) AS hits
        FROM q1 GROUP BY 1, 2, 3, 4),
      r1 AS (SELECT CAST(0 AS BIGINT) AS iter, w0, w1, w2, w3,
          round(CAST(sll AS DOUBLE) / n, 6) AS logloss,
          round(CAST(hits AS DOUBLE) / n, 6) AS accuracy,
          round(w0 + 0.5 * (CAST(s0 AS DOUBLE) / n), 9) AS nw0,
          round(w1 + 0.5 * (CAST(s1 AS DOUBLE) / n), 9) AS nw1,
          round(w2 + 0.5 * (CAST(s2 AS DOUBLE) / n), 9) AS nw2,
          round(w3 + 0.5 * (CAST(s3 AS DOUBLE) / n), 9) AS nw3
        FROM a1),
      it1 AS (SELECT nw0 AS w0, nw1 AS w1, nw2 AS w2, nw3 AS w3 FROM r1),
      p2 AS (SELECT f.*, w.*,
          w0 + w1 * x1 + w2 * x2 + w3 * x3 AS z
        FROM feats f CROSS JOIN it1 w),
      q2 AS (SELECT *, 1.0 / (1.0 + exp(-z)) AS p FROM p2),
      a2 AS (SELECT w0, w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(round(1.0 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s0,
          SUM(CAST(round(x1 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s1,
          SUM(CAST(round(x2 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s2,
          SUM(CAST(round(x3 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s3,
          SUM(CAST(round(-(CAST(y AS DOUBLE) * ln(p)
            + (1.0 - CAST(y AS DOUBLE)) * ln(1.0 - p)), 12) AS DECIMAL(28,14))) AS sll,
          SUM(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END) AS hits
        FROM q2 GROUP BY 1, 2, 3, 4),
      r2 AS (SELECT CAST(1 AS BIGINT) AS iter, w0, w1, w2, w3,
          round(CAST(sll AS DOUBLE) / n, 6) AS logloss,
          round(CAST(hits AS DOUBLE) / n, 6) AS accuracy,
          round(w0 + 0.5 * (CAST(s0 AS DOUBLE) / n), 9) AS nw0,
          round(w1 + 0.5 * (CAST(s1 AS DOUBLE) / n), 9) AS nw1,
          round(w2 + 0.5 * (CAST(s2 AS DOUBLE) / n), 9) AS nw2,
          round(w3 + 0.5 * (CAST(s3 AS DOUBLE) / n), 9) AS nw3
        FROM a2),
      it2 AS (SELECT nw0 AS w0, nw1 AS w1, nw2 AS w2, nw3 AS w3 FROM r2),
      p3 AS (SELECT f.*, w.*,
          w0 + w1 * x1 + w2 * x2 + w3 * x3 AS z
        FROM feats f CROSS JOIN it2 w),
      q3 AS (SELECT *, 1.0 / (1.0 + exp(-z)) AS p FROM p3),
      a3 AS (SELECT w0, w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(CAST(round(1.0 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s0,
          SUM(CAST(round(x1 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s1,
          SUM(CAST(round(x2 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s2,
          SUM(CAST(round(x3 * (CAST(y AS DOUBLE) - p), 12) AS DECIMAL(28,14))) AS s3,
          SUM(CAST(round(-(CAST(y AS DOUBLE) * ln(p)
            + (1.0 - CAST(y AS DOUBLE)) * ln(1.0 - p)), 12) AS DECIMAL(28,14))) AS sll,
          SUM(CASE WHEN (p >= 0.5) = (y = 1) THEN 1 ELSE 0 END) AS hits
        FROM q3 GROUP BY 1, 2, 3, 4),
      r3 AS (SELECT CAST(2 AS BIGINT) AS iter, w0, w1, w2, w3,
          round(CAST(sll AS DOUBLE) / n, 6) AS logloss,
          round(CAST(hits AS DOUBLE) / n, 6) AS accuracy,
          round(w0 + 0.5 * (CAST(s0 AS DOUBLE) / n), 9) AS nw0,
          round(w1 + 0.5 * (CAST(s1 AS DOUBLE) / n), 9) AS nw1,
          round(w2 + 0.5 * (CAST(s2 AS DOUBLE) / n), 9) AS nw2,
          round(w3 + 0.5 * (CAST(s3 AS DOUBLE) / n), 9) AS nw3
        FROM a3)
      SELECT iter, w0, w1, w2, w3, logloss, accuracy, nw0, nw1, nw2, nw3
      FROM (SELECT * FROM r1 UNION ALL SELECT * FROM r2
            UNION ALL SELECT * FROM r3)
      ORDER BY iter"""))

  /** Semi-hard negative mining for contrastive embedding training
    * (Schroff et al. 2015, FaceNet §3.2): for each of 8 anchor vectors,
    * the positive ceiling is the best same-label cosine; negatives are
    * other-label vectors inside the semi-hard band
    * [cos_pos − 0.15, cos_pos) — close enough to teach, not closer than
    * the positive — and the top 3 per anchor are reported with their
    * margins. One broadcast(8-row anchors) × corpus pass computes every
    * cosine (linear in N at any scale); the band filter + per-anchor
    * ranking windows run on the candidate slice only. Cosines fold
    * sequentially in double in both engines, so band edges and tie
    * order are bit-identical with no tolerance. */
  val q341HardNegatives: QueryDef = QueryDef(
    "q341_hard_negatives",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
        .repartition(s.sparkContext.defaultParallelism)
      val anchors = broadcast(emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
          col("embedding").as("a_emb")))
      val scored = emb.select(col("vec_id"), col("label"), col("embedding"))
        .crossJoin(anchors)
        .filter(col("vec_id") =!= col("anchor_id"))
        .withColumn("cos", Similarity.cosine(col("a_emb"), col("embedding")))
        .localCheckpoint() // ceiling agg + band filter read the same scores
      val ceiling = scored.filter(col("label") === col("a_label"))
        .groupBy(col("anchor_id")).agg(max(col("cos")).as("cos_pos"))
      val w = Window.partitionBy(col("anchor_id"))
        .orderBy(col("cos").desc, col("vec_id").asc)
      scored.filter(col("label") =!= col("a_label"))
        .join(broadcast(ceiling), Seq("anchor_id"))
        .filter(col("cos") < col("cos_pos") && col("cos") >= col("cos_pos") - 0.15)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .select(col("anchor_id"), col("rank"), col("vec_id").as("neg_id"),
          round(col("cos"), 9).as("cos_neg"),
          round(col("cos_pos"), 9).as("cos_pos"),
          round(col("cos_pos") - col("cos"), 9).as("margin"))
        .orderBy(col("anchor_id"), col("rank"))
    },
    Some("""WITH anchors AS (SELECT vec_id AS anchor_id, label AS a_label,
          embedding AS a_emb FROM embeddings WHERE vec_id < 8),
      scored AS (SELECT e.vec_id, e.label, a.anchor_id, a.a_label,
          list_sum(list_transform(list_zip(a.a_emb, e.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.a_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
          AS cos
        FROM embeddings e CROSS JOIN anchors a
        WHERE e.vec_id <> a.anchor_id),
      ceiling AS (SELECT anchor_id, MAX(cos) AS cos_pos
        FROM scored WHERE label = a_label GROUP BY 1),
      band AS (SELECT s.anchor_id, s.vec_id, s.cos, c.cos_pos,
          ROW_NUMBER() OVER (PARTITION BY s.anchor_id
            ORDER BY s.cos DESC, s.vec_id) AS rk
        FROM scored s JOIN ceiling c USING (anchor_id)
        WHERE s.label <> s.a_label
          AND s.cos < c.cos_pos AND s.cos >= c.cos_pos - 0.15)
      SELECT anchor_id, CAST(rk AS BIGINT) AS rank, vec_id AS neg_id,
        round(cos, 9) AS cos_neg, round(cos_pos, 9) AS cos_pos,
        round(cos_pos - cos, 9) AS margin
      FROM band WHERE rk <= 3 ORDER BY anchor_id, rank"""))

  val all: Seq[QueryDef] = Seq(q339DuplicateSpans, q340LogregQuality,
    q341HardNegatives)
}
