package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Label & cluster-quality wave: B-cubed evaluation of a dedup
  * clustering against reference clusters, and per-label LOF density
  * outliers over the embedding table (the classic mislabeled-sample
  * miner).
  *
  * Scale shapes: q364 never materializes pairs — B-cubed's per-element
  * precision/recall reduce to three group-by sizes joined back on the
  * keys; q365's only quadratic stage is per-label kNN, an equi-join on
  * the label column (each label's block is |class| rows — the same
  * bounded-block contract as q135's sorted-neighborhood), with the
  * distance an all-codegen double dot-product identity both engines
  * fold in array order.
  */
object LabelQualityOps {

  /** B-cubed precision/recall (Bagga & Baldwin 1998 — the standard
    * dedup/coreference cluster metric, per-element so giant clusters
    * can't swamp the average). Reference clusters = 64-char-prefix
    * fingerprints (q25's near-dup truth); evaluated clustering = the
    * cheaper (first-8-tokens, length-bucket) blocking key. For element
    * i, P_i = |C(i) ∩ T(i)|/|C(i)| and R_i = |C(i) ∩ T(i)|/|T(i)|;
    * since the intersection containing i is exactly the (pred, truth)
    * key-pair group, all three set sizes are group-by counts joined
    * back per doc — no pair enumeration at any scale. Per-doc ratios
    * are rounded to 9 dp and DECIMAL-summed (q344's order-free
    * discipline); F1 is computed from the already-rounded averages
    * identically in both dialects. */
  val q364BcubedDedupEval: QueryDef = QueryDef(
    "q364_bcubed_dedup_eval",
    (s, dir) => {
      val dec = DecimalType(28, 10)
      val keyed = Tables(s, dir).documents
        .select(col("doc_id"),
          md5(substring(col("text"), 1, 64)).as("tkey"),
          concat(
            md5(concat_ws(" ", slice(TextOps.tokens(col("text")), 1, 8))),
            lit("|"), (col("n_chars") / 256).cast("long").cast("string"))
            .as("pkey"))
        .localCheckpoint() // feeds three group-bys + the per-doc join
      val nPt = keyed.groupBy(col("pkey"), col("tkey")).agg(count(lit(1)).as("n_pt"))
      val nP = keyed.groupBy(col("pkey")).agg(count(lit(1)).as("n_p"))
      val nT = keyed.groupBy(col("tkey")).agg(count(lit(1)).as("n_t"))
      val perDoc = keyed
        .join(nPt, Seq("pkey", "tkey")).join(nP, Seq("pkey")).join(nT, Seq("tkey"))
        .select(
          round(col("n_pt").cast("double") / col("n_p"), 9).cast(dec).as("p_i"),
          round(col("n_pt").cast("double") / col("n_t"), 9).cast(dec).as("r_i"))
      keyed.agg(
          count(lit(1)).as("n_docs"),
          countDistinct(col("pkey")).as("n_pred_clusters"),
          countDistinct(col("tkey")).as("n_truth_clusters"))
        .crossJoin(perDoc.agg(sum(col("p_i")).as("sp"), sum(col("r_i")).as("sr")))
        .withColumn("bcubed_precision", round(col("sp").cast("double") / col("n_docs"), 6))
        .withColumn("bcubed_recall", round(col("sr").cast("double") / col("n_docs"), 6))
        .select(col("n_docs"), col("n_pred_clusters"), col("n_truth_clusters"),
          col("bcubed_precision"), col("bcubed_recall"),
          round(lit(2.0) * col("bcubed_precision") * col("bcubed_recall") /
            (col("bcubed_precision") + col("bcubed_recall")), 6).as("bcubed_f1"))
    },
    Some("""WITH keyed AS (SELECT doc_id, md5(substr(text, 1, 64)) AS tkey,
          md5(array_to_string(regexp_extract_all(lower(text), '\w+')[1:8], ' '))
            || '|' || CAST(n_chars // 256 AS VARCHAR) AS pkey
        FROM documents),
      npt AS (SELECT pkey, tkey, COUNT(*) AS n_pt FROM keyed GROUP BY 1, 2),
      np AS (SELECT pkey, COUNT(*) AS n_p FROM keyed GROUP BY 1),
      nt AS (SELECT tkey, COUNT(*) AS n_t FROM keyed GROUP BY 1),
      per AS (SELECT
          CAST(round(CAST(n_pt AS DOUBLE) / n_p, 9) AS DECIMAL(28,10)) AS p_i,
          CAST(round(CAST(n_pt AS DOUBLE) / n_t, 9) AS DECIMAL(28,10)) AS r_i
        FROM keyed JOIN npt USING (pkey, tkey) JOIN np USING (pkey) JOIN nt USING (tkey)),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(DISTINCT pkey) AS BIGINT) AS n_pred_clusters,
          CAST(COUNT(DISTINCT tkey) AS BIGINT) AS n_truth_clusters
        FROM keyed),
      avgs AS (SELECT round(CAST(SUM(p_i) AS DOUBLE) / (SELECT n_docs FROM tot), 6) AS bcubed_precision,
          round(CAST(SUM(r_i) AS DOUBLE) / (SELECT n_docs FROM tot), 6) AS bcubed_recall
        FROM per)
      SELECT n_docs, n_pred_clusters, n_truth_clusters, bcubed_precision, bcubed_recall,
        round(2.0 * bcubed_precision * bcubed_recall
          / (bcubed_precision + bcubed_recall), 6) AS bcubed_f1
      FROM tot CROSS JOIN avgs"""))

  /** Per-label LOF (local outlier factor, Breunig et al. 2000) over the
    * embedding table — the standard mislabeled-sample miner: a vector
    * whose local density is far below its same-label neighbors' gets
    * LOF ≫ 1. k = 5; neighborhoods are tie-inclusive (all j with
    * d ≤ k-distance, the paper's definition, so ties can't make the
    * result order-dependent). The pair stage — the only O(|class|²)
    * work — runs entirely in codegen doubles: ‖a−b‖² = aa + bb − 2·ab
    * from one VectorDot per pair plus broadcast-joined self-dots,
    * rounded at 9 dp (every term is an array-order fold, so both
    * engines produce the identical double; a DecimalSqDist variant
    * measured 7× slower at sf0.1 for zero extra agreement). The
    * reach-dist/lrd aggregations are 5–6 terms per point and follow the
    * round→DECIMAL discipline there. Top 20 by LOF. The kNN is an
    * equi-join on label (blocks of |class| rows — at corpus scale the
    * label partitions the quadratic work exactly like LSH buckets
    * partition q74's). */
  val q365LofLabelOutliers: QueryDef = QueryDef(
    "q365_lof_label_outliers",
    (s, dir) => {
      val dec9 = DecimalType(28, 9)
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("label"), col("embedding").as("v"))
        .withColumn("sd", graft.functions.VectorFunctions
          .vector_dot(col("v"), col("v")))
      val d = e.select(col("vec_id").as("i"), col("label"),
          col("v").as("vi"), col("sd").as("sdi"))
        .join(e.select(col("vec_id").as("j"), col("label"),
          col("v").as("vj"), col("sd").as("sdj")), Seq("label"))
        .filter(col("i") =!= col("j"))
        .select(col("label"), col("i"), col("j"),
          round(col("sdi") + col("sdj") - lit(2.0) *
            graft.functions.VectorFunctions.vector_dot(col("vi"), col("vj")), 9)
            .as("dist"))
      // NOT checkpointed: the pair frame is |class|²-sized (250M rows at
      // sf1) and materializing it cost more than recomputing the codegen
      // dot join for its two consumers; the small frames below are the
      // ones worth pinning
      val kd = d
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("i")).orderBy(col("dist"), col("j"))))
        .filter(col("rn") === 5)
        .select(col("i"), col("dist").as("kdist"))
        .localCheckpoint() // n rows; reused three times
      // tie-inclusive neighborhood: every j with d(i,j) <= kdist(i)
      val nbr = d.join(kd, Seq("i")).filter(col("dist") <= col("kdist"))
        .select(col("i"), col("j"), col("dist"), col("label"))
        .localCheckpoint() // ~k·n rows; feeds lrd and the lof join
      val lrd = nbr
        .join(kd.select(col("i").as("j"), col("kdist").as("kdist_j")), Seq("j"))
        .groupBy(col("i"), col("label"))
        .agg(count(lit(1)).as("n_k"),
          // reach terms are 9-dp-rounded doubles → DECIMAL cast is exact
          // and the 5–6-term sum order-free
          sum(greatest(col("kdist_j"), col("dist")).cast(dec9)).as("sum_reach"))
        .filter(col("sum_reach") > 0)
        .select(col("i"), col("label"), col("n_k"),
          round(col("n_k").cast("double") / col("sum_reach").cast("double"), 9)
            .as("lrd"))
        .localCheckpoint() // reused as both sides of the neighbor-lrd join
      val lof = nbr
        .join(lrd.select(col("i").as("j"), col("lrd").as("lrd_j")), Seq("j"))
        .groupBy(col("i"))
        .agg(sum(col("lrd_j").cast(dec9)).as("sum_lrd_j"))
        .join(lrd, Seq("i"))
        .select(col("i").as("vec_id"), col("label"), col("n_k"),
          round(col("lrd"), 9).as("lrd"),
          round(col("sum_lrd_j").cast("double") /
            (col("n_k") * col("lrd")), 6).as("lof"))
      // top-20 via distributed TakeOrdered, not a corpus-frame window (r15)
      lof
        .orderBy(col("lof").desc, col("vec_id")).limit(20)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("lof").desc, col("vec_id"))))
        .select(col("vec_id"), col("label"), col("n_k"), col("lrd"), col("lof"))
        .orderBy(col("vec_id"))
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding,
          list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sd
        FROM embeddings),
      d AS (SELECT a.label, a.vec_id AS i, b.vec_id AS j,
          round(a.sd + b.sd - 2.0 * list_sum(list_transform(
            range(1, len(a.embedding) + 1),
            k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE))), 9) AS dist
        FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
      kd AS (SELECT i, dist AS kdist FROM (
          SELECT i, dist, ROW_NUMBER() OVER (PARTITION BY i ORDER BY dist, j) AS rn
          FROM d) WHERE rn = 5),
      nbr AS (SELECT d.i, d.j, d.dist, d.label
        FROM d JOIN kd USING (i) WHERE d.dist <= kd.kdist),
      lrd AS (SELECT n.i, n.label, CAST(COUNT(*) AS BIGINT) AS n_k,
          round(CAST(COUNT(*) AS DOUBLE)
            / CAST(SUM(CAST(greatest(kj.kdist, n.dist) AS DECIMAL(28,9))) AS DOUBLE), 9) AS lrd
        FROM nbr n JOIN kd kj ON kj.i = n.j
        GROUP BY 1, 2
        HAVING SUM(CAST(greatest(kj.kdist, n.dist) AS DECIMAL(28,9))) > 0),
      lof AS (SELECT s.i AS vec_id, l.label, l.n_k, round(l.lrd, 9) AS lrd,
          round(CAST(s.sum_lrd_j AS DOUBLE) / (l.n_k * l.lrd), 6) AS lof
        FROM (SELECT n.i, SUM(CAST(lj.lrd AS DECIMAL(28,9))) AS sum_lrd_j
            FROM nbr n JOIN lrd lj ON lj.i = n.j GROUP BY 1) s
        JOIN lrd l ON l.i = s.i)
      SELECT vec_id, label, n_k, lrd, lof FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY lof DESC, vec_id) AS rk FROM lof)
      WHERE rk <= 20 ORDER BY vec_id"""))

  val all: Seq[QueryDef] = Seq(q364BcubedDedupEval, q365LofLabelOutliers)
}
