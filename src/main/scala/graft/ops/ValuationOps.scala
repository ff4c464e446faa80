package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Data-valuation & graph-structure wave: exact KNN-Shapley values per
  * training vector (closed form, no coalition enumeration) and the
  * per-vertex local clustering coefficient on the capped graph.
  *
  * Scale shapes: q372's pair frame is |test-pool| × train — linear in
  * the corpus with the 16-point pool broadcast (the q30 yardstick
  * idiom), and the Shapley recurrence is ONE suffix-sum window per
  * test partition; q373 rides q338's capped adjacency, so wedges stay
  * ≤ N·cap² at any scale.
  */
object ValuationOps {

  private val dec = DecimalType(28, 9)

  /** Exact KNN-Shapley data valuation (Jia et al. 2019, Theorem 1 —
    * the only Shapley value with a polynomial closed form): for each
    * held-out test point, sort training points by distance; then
    * s_n = 1[y_n = y_t]/n and
    * s_j = s_{j+1} + (1[y_j = y_t] − 1[y_{j+1} = y_t])·min(K,j)/(K·j),
    * i.e. one lead() and one suffix-sum window — no 2^n coalitions.
    * A vector's value is its average s over the 16-point test pool
    * (vec_id < 16, the house seed idiom). Negative value = the point
    * HURTS k-NN accuracy on the pool — the mislabeled/poisoned-sample
    * signal, complementing q365's unsupervised LOF. Distances use the
    * q365 codegen dot identity; every recurrence term is
    * round→DECIMAL, so the suffix sums are order-free; the efficiency
    * law Σᵢ s_i(t) = utility(full set) is asserted in the spec. Output:
    * the 10 most valuable and 10 most harmful vectors. */
  val q372KnnShapley: QueryDef = QueryDef(
    "q372_knn_shapley",
    (s, dir) => {
      val k = 5
      val e = Tables(s, dir).embeddings
        .select(col("vec_id"), col("label"), col("embedding").as("v"))
        .withColumn("sd", graft.functions.VectorFunctions
          .vector_dot(col("v"), col("v")))
      val test = e.filter(col("vec_id") < 16)
        .select(col("vec_id").as("t"), col("label").as("yt"),
          col("v").as("vt"), col("sd").as("sdt"))
      val train = e.filter(col("vec_id") >= 16)
      val w = Window.partitionBy(col("t"))
      val wOrd = w.orderBy(col("dist"), col("vec_id"))
      val scored = train.crossJoin(broadcast(test))
        .select(col("vec_id"), col("label"), col("t"), col("yt"),
          round(col("sd") + col("sdt") - lit(2.0) *
            graft.functions.VectorFunctions.vector_dot(col("v"), col("vt")), 9)
            .as("dist"))
        .withColumn("m", when(col("label") === col("yt"), 1L).otherwise(0L))
        .withColumn("j", row_number().over(wOrd))
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("mnext", lead(col("m"), 1).over(wOrd))
        .withColumn("term", when(col("j") < col("n"),
          round((col("m") - col("mnext")).cast("double") *
            least(lit(k.toLong), col("j")).cast("double") /
            (lit(k.toDouble) * col("j")), 9))
          .otherwise(lit(0.0)).cast(dec))
        .withColumn("sn", max(when(col("j") === col("n"),
          round(col("m").cast("double") / col("n"), 9))).over(w))
        // suffix sum as total − prefix: Spark's UNBOUNDED FOLLOWING frame
        // recomputes the aggregate per row (O(partition²) — measured 184 s
        // at sf1); the prefix frame is incremental, and DECIMAL addition
        // makes the identity exact
        .withColumn("ttot", sum(col("term")).over(w))
        .withColumn("tprev", coalesce(sum(col("term")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0).cast(dec)))
        .withColumn("s", col("sn").cast(dec) + (col("ttot") - col("tprev")))
      val values = scored.groupBy(col("vec_id"), col("label"))
        .agg(count(lit(1)).as("n_tests"), sum(col("s")).as("sv"))
        .select(col("vec_id"), col("label"),
          round(col("sv").cast("double") / col("n_tests"), 6).as("shapley"))
        .localCheckpoint() // two rank passes share it
      // both ends via distributed TakeOrdered; the rank windows then run
      // over 10 rows, never the corpus-sized value frame (r15)
      val top = values.orderBy(col("shapley").desc, col("vec_id")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("shapley").desc, col("vec_id"))))
        .withColumn("side", lit("top"))
      val bottom = values.orderBy(col("shapley").asc, col("vec_id")).limit(10)
        .withColumn("rk", row_number().over(
          Window.orderBy(col("shapley").asc, col("vec_id"))))
        .withColumn("side", lit("bottom"))
      top.unionByName(bottom)
        .select(col("side"), col("rk"), col("vec_id"), col("label"), col("shapley"))
        .orderBy(col("side").desc, col("rk"))
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding,
          list_sum(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS sd
        FROM embeddings),
      test AS (SELECT vec_id AS t, label AS yt, embedding AS vt, sd AS sdt
        FROM e WHERE vec_id < 16),
      sc0 AS (SELECT tr.vec_id, tr.label, te.t, te.yt,
          round(tr.sd + te.sdt - 2.0 * list_sum(list_transform(
            range(1, len(tr.embedding) + 1),
            k -> CAST(tr.embedding[k] AS DOUBLE) * CAST(te.vt[k] AS DOUBLE))), 9) AS dist,
          CASE WHEN tr.label = te.yt THEN 1 ELSE 0 END AS m
        FROM e tr CROSS JOIN test te WHERE tr.vec_id >= 16),
      sc1 AS (SELECT *,
          ROW_NUMBER() OVER (PARTITION BY t ORDER BY dist, vec_id) AS j,
          COUNT(*) OVER (PARTITION BY t) AS n,
          LEAD(m, 1) OVER (PARTITION BY t ORDER BY dist, vec_id) AS mnext
        FROM sc0),
      sc2 AS (SELECT *,
          CAST(CASE WHEN j < n THEN round(CAST(m - mnext AS DOUBLE)
            * least(5, j) / (5.0 * j), 9) ELSE 0.0 END AS DECIMAL(28,9)) AS term,
          MAX(CASE WHEN j = n THEN round(CAST(m AS DOUBLE) / n, 9) END)
            OVER (PARTITION BY t) AS sn
        FROM sc1),
      sc3 AS (SELECT vec_id, label, t,
          CAST(sn AS DECIMAL(28,9)) + (SUM(term) OVER (PARTITION BY t)
            - COALESCE(SUM(term) OVER (PARTITION BY t ORDER BY dist, vec_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              CAST(0 AS DECIMAL(28,9)))) AS s
        FROM sc2),
      vals AS (SELECT vec_id, label,
          round(CAST(SUM(s) AS DOUBLE) / COUNT(*), 6) AS shapley
        FROM sc3 GROUP BY 1, 2),
      top AS (SELECT 'top' AS side,
          ROW_NUMBER() OVER (ORDER BY shapley DESC, vec_id) AS rk, vec_id, label, shapley
        FROM vals QUALIFY rk <= 10),
      bot AS (SELECT 'bottom' AS side,
          ROW_NUMBER() OVER (ORDER BY shapley ASC, vec_id) AS rk, vec_id, label, shapley
        FROM vals QUALIFY rk <= 10)
      SELECT * FROM top UNION ALL SELECT * FROM bot
      ORDER BY side DESC, rk"""))

  /** Per-vertex local clustering coefficient on q338's capped
    * co-purchase graph: LCC(v) = 2·tri(v)/(d(v)·(d(v)−1)) with both
    * triangle counts and degrees measured on the SAME degree-capped
    * graph, so the wedge frame stays ≤ N·cap² at any scale (the q338
    * contract). Reported as the degree-binned profile (the
    * transitivity-vs-degree curve every graph-health dashboard plots;
    * a flat-high curve = cliquey templates, power-law decay = organic
    * structure). LCC per vertex is an exact rational → round→DECIMAL
    * before the per-degree average. */
  val q373LocalClustering: QueryDef = QueryDef(
    "q373_local_clustering",
    (s, dir) => {
      val cap = 8
      // shared derived base table (GraphBase): capped co-purchase edges,
      // parquet-backed — feeds degrees, wedges, and the triangle probe
      val kept = GraphBase.cappedCoPurchase(s, dir, cap)
      val deg = kept.select(col("x").as("v")).unionAll(kept.select(col("y").as("v")))
        .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      val wedges = kept.select(col("x").as("a"), col("y").as("b"))
        .join(kept.select(col("x").as("a"), col("y").as("c")), "a")
        .filter(col("b") < col("c"))
      val tris = wedges.join(kept.select(col("x").as("b"), col("y").as("c")),
        Seq("b", "c"))
      val triPerV = tris.select(explode(array(col("a"), col("b"), col("c"))).as("v"))
        .groupBy(col("v")).agg(count(lit(1)).as("tri"))
      deg.join(triPerV, Seq("v"), "left")
        .withColumn("tri", coalesce(col("tri"), lit(0L)))
        .filter(col("deg") >= 2)
        .withColumn("lcc", round(lit(2.0) * col("tri") /
          (col("deg") * (col("deg") - 1)).cast("double"), 9).cast(dec))
        .groupBy(col("deg"))
        .agg(count(lit(1)).as("n_vertices"), sum(col("tri")).as("tri_sum"),
          round(sum(col("lcc")).cast("double") / count(lit(1)), 6).as("avg_lcc"))
        .orderBy(col("deg"))
    },
    Some("""WITH e0 AS (SELECT a.l_partkey AS x, b.l_partkey AS y
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      adj AS (SELECT x AS v, y AS n FROM e0 UNION ALL SELECT y, x FROM e0),
      rk AS (SELECT v, n, ROW_NUMBER() OVER (PARTITION BY v ORDER BY n) AS rk FROM adj),
      kd AS (SELECT v, n FROM rk WHERE rk <= 8),
      kept AS (SELECT lo.v AS x, lo.n AS y
        FROM (SELECT * FROM kd WHERE v < n) lo
        WHERE EXISTS (SELECT 1 FROM kd hi WHERE hi.v = lo.n AND hi.n = lo.v)),
      deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS deg FROM
        (SELECT x AS v FROM kept UNION ALL SELECT y FROM kept) GROUP BY 1),
      tri AS (SELECT u.v, CAST(COUNT(*) AS BIGINT) AS tri FROM (
          SELECT w1.a, w1.b, w1.c FROM
            (SELECT e1.x AS a, e1.y AS b, e2.y AS c
             FROM kept e1 JOIN kept e2 ON e1.x = e2.x AND e1.y < e2.y) w1
          JOIN kept e3 ON e3.x = w1.b AND e3.y = w1.c),
        UNNEST([a, b, c]) AS u(v) GROUP BY 1),
      lcc AS (SELECT d.v, d.deg,
          CAST(round(2.0 * COALESCE(t.tri, 0) / CAST(d.deg * (d.deg - 1) AS DOUBLE), 9)
            AS DECIMAL(28,9)) AS lcc,
          COALESCE(t.tri, 0) AS tri
        FROM deg d LEFT JOIN tri t USING (v) WHERE d.deg >= 2)
      SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_vertices,
        CAST(SUM(tri) AS BIGINT) AS tri_sum,
        round(CAST(SUM(lcc) AS DOUBLE) / COUNT(*), 6) AS avg_lcc
      FROM lcc GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(q372KnnShapley, q373LocalClustering)
}
