package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** KMV (k-minimum-values) SET OPERATIONS — the theta-sketch workflow on
  * top of q358's KMV distinct sketch: estimate |A ∪ B| and |A ∩ B| for
  * every audience pair from two k-row sketches, never touching the full
  * sets. This is the sketch algebra a 100 TB audience platform uses for
  * interactive overlap queries (build sketches once per segment, answer
  * any pair from 2k values); q180 computes the same overlaps EXACTLY —
  * here it doubles as the error oracle.
  *
  * Estimators (Beyer et al. 2007 / theta-sketch): with U = the k
  * smallest of A ∪ B (merge of the two sketches, dedup, take k),
  * θ = max(U), est_union = (k−1)·2⁶⁰/θ, and
  * est_inter = |U ∩ A_sk ∩ B_sk| / k · est_union. Everything is
  * deterministic given the md5-derived 60-bit hash (q358's convention),
  * so the DuckDB oracle reproduces the ESTIMATES bit-for-bit and the
  * exact truths beside them — rel_err columns are data, not hopes.
  *
  * Scale shape: one distinct + one per-type rank window builds all
  * sketches (k rows per type survive); the pair stage joins the two
  * k-row sketch arrays over a |types|²-bounded frame
  * (PlanGuard-declared, 5 rows per side). Exact truths come from q180's
  * user-keyed equi-join, not a pair scan.
  */
object KmvSetOps {

  private val K = 32
  private val MaxHash = 1152921504606846976.0 // 2^60, q358's convention

  val q474KmvSetops: QueryDef = QueryDef(
    "q474_kmv_setops",
    (s, dir) => {
      val ut = EventOps.events(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .localCheckpoint() // feeds the sketches AND the exact truths
      val hashed = ut.withColumn("u",
        conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
          .cast("long"))
      val sk = hashed
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(col("u"))))
        .filter(col("rn") <= K)
        .groupBy(col("event_type"))
        .agg(sort_array(collect_list(col("u"))).as("hs"))
      // |types|²-bounded pair frame (5 types): sketch arrays both sides
      val pairs = sk.select(col("event_type").as("type_a"), col("hs").as("ha"))
        .join(sk.select(col("event_type").as("type_b"), col("hs").as("hb")),
          col("type_a") < col("type_b"))
        .withColumn("merged", slice(array_sort(array_union(col("ha"), col("hb"))), 1, K))
        .withColumn("m", size(col("merged")))
        .withColumn("n_common", size(array_intersect(
          array_intersect(col("merged"), col("ha")), col("hb"))))
        // below capacity the sketch IS the set (q358's exact branch);
        // at/over capacity the theta estimator applies
        .withColumn("est_union", round(
          when(col("m") < K, col("m").cast("double"))
            .otherwise(lit((K - 1).toDouble * MaxHash) /
              element_at(col("merged"), K).cast("double")), 4))
        .withColumn("est_inter", round(
          when(col("m") < K, col("n_common").cast("double"))
            .otherwise(col("n_common").cast("double") / K *
              (lit((K - 1).toDouble * MaxHash) /
                element_at(col("merged"), K).cast("double"))), 4))
      // exact truths via the user-keyed equi-join (q180's shape)
      val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      val inter = ut.join(
          ut.select(col("user_id"), col("event_type").as("type_b")),
          Seq("user_id"))
        .filter(col("event_type") < col("type_b"))
        .groupBy(col("event_type").as("type_a"), col("type_b"))
        .agg(count(lit(1)).as("n_inter"))
      pairs
        .join(inter, Seq("type_a", "type_b"))
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
          col("n").as("n_a"))), Seq("type_a"))
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
          col("n").as("n_b"))), Seq("type_b"))
        .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
        .select(col("type_a"), col("type_b"),
          col("n_union"), col("est_union"),
          round(abs(col("est_union") - col("n_union").cast("double")) /
            col("n_union").cast("double"), 6).as("union_rel_err"),
          col("n_inter"), col("est_inter"),
          col("n_common").cast("long").as("sketch_overlap"))
    },
    Some(s"""WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
      h AS (SELECT event_type,
          ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS u
        FROM d),
      r AS (SELECT event_type, u,
          ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY u) AS rn
        FROM h),
      sk AS (SELECT event_type, list_sort(list(u)) AS hs
        FROM r WHERE rn <= $K GROUP BY 1),
      pairs AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          a.hs AS ha, b.hs AS hb,
          list_sort(list_distinct(list_concat(a.hs, b.hs)))[1:$K] AS merged
        FROM sk a JOIN sk b ON a.event_type < b.event_type),
      est AS (SELECT type_a, type_b, len(merged) AS m,
          CASE WHEN len(merged) >= $K THEN merged[$K] END AS theta,
          len(list_filter(merged,
            x -> list_contains(ha, x) AND list_contains(hb, x))) AS n_common
        FROM pairs),
      sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
      inter AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
          CAST(COUNT(*) AS BIGINT) AS n_inter
        FROM d a JOIN d b ON a.user_id = b.user_id
          AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT e.type_a, e.type_b,
        sa.n + sb.n - i.n_inter AS n_union,
        round(CASE WHEN e.m < $K THEN CAST(e.m AS DOUBLE)
          ELSE ${K - 1}.0 * $MaxHash / CAST(e.theta AS DOUBLE) END, 4) AS est_union,
        round(abs(round(CASE WHEN e.m < $K THEN CAST(e.m AS DOUBLE)
            ELSE ${K - 1}.0 * $MaxHash / CAST(e.theta AS DOUBLE) END, 4)
            - CAST(sa.n + sb.n - i.n_inter AS DOUBLE))
          / CAST(sa.n + sb.n - i.n_inter AS DOUBLE), 6) AS union_rel_err,
        i.n_inter,
        round(CASE WHEN e.m < $K THEN CAST(e.n_common AS DOUBLE)
          ELSE CAST(e.n_common AS DOUBLE) / $K *
            (${K - 1}.0 * $MaxHash / CAST(e.theta AS DOUBLE)) END, 4) AS est_inter,
        CAST(e.n_common AS BIGINT) AS sketch_overlap
      FROM est e
      JOIN inter i ON i.type_a = e.type_a AND i.type_b = e.type_b
      JOIN sizes sa ON sa.event_type = e.type_a
      JOIN sizes sb ON sb.event_type = e.type_b"""))

  val all: Seq[QueryDef] = Seq(q474KmvSetops)
}
