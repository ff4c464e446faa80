package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** CSLS retrieval re-ranking (cross-domain similarity local scaling,
  * Conneau et al. 2018) — the hubness correction for embedding search:
  * plain cosine top-k over-returns "hub" vectors that sit close to
  * EVERYTHING; CSLS discounts each candidate by its average similarity
  * to its nearest queries, csls(q,x) = 2·cos(q,x) − r(x) − r(q), so a
  * hub's inflated base similarity cancels out. The emitted report pairs
  * each query's CSLS top-5 with the plain-cosine rank it displaced —
  * rank_moved ≠ 0 rows are exactly the hubness corrections.
  *
  * Exactness across engines: every cosine rides the sequential-fold dot
  * convention (q30 — codegen `VectorDot`, identical left-to-right double
  * accumulation both engines), and both hub penalties are means of a
  * SORTED top slice (cos desc, id asc), so their 4- and 10-term double
  * sums accumulate in the same order everywhere.
  *
  * Scale shape: the 8-query pool broadcasts against the corpus exactly
  * once (the q30 idiom — few-queries × corpus is the right exact-scoring
  * plan; for query counts past broadcast range q31/q75's bucketed ANN is
  * the path) and the scored frame is checkpointed and reused by the r(x)
  * aggregation, the r(q) aggregation, and the final rerank — one corpus
  * pass, three model-sized reductions.
  */
object CslsOps {

  private val NQueries = 8
  private val KQ = 4  // queries averaged into a candidate's hub penalty
  private val KC = 10 // candidates averaged into a query's hub penalty
  private val TopK = 5

  val q489CslsRerank: QueryDef = QueryDef(
    "q489_csls_rerank",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
      val queries = emb.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
      val scored = emb
        .select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
        .crossJoin(broadcast(queries))
        .filter(col("neighbor_id") =!= col("query_id"))
        .withColumn("cos", Similarity.cosine(col("q_emb"), col("c_emb")))
        .select(col("query_id"), col("neighbor_id"), col("cos"))
        .localCheckpoint() // reused: r(x), r(q), and the rerank
      // r(x): mean of the candidate's KQ best query similarities. The
      // slice is summed in descending sorted order — the same add
      // sequence both engines; cos TIES need no break because equal
      // values sum identically whichever side of the cut they land on.
      val rx = scored
        .groupBy(col("neighbor_id"))
        .agg(expr(s"""aggregate(slice(reverse(array_sort(collect_list(cos))),
            1, $KQ), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / $KQ.0""")
          .as("r_x"))
      // r(q): mean of the query's KC best corpus similarities
      val rq = scored
        .groupBy(col("query_id"))
        .agg(expr(s"""aggregate(slice(reverse(array_sort(collect_list(cos))),
            1, $KC), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / $KC.0""")
          .as("r_q"))
      val wCos = Window.partitionBy(col("query_id"))
        .orderBy(col("cos").desc, col("neighbor_id"))
      val wCsls = Window.partitionBy(col("query_id"))
        .orderBy(col("csls").desc, col("neighbor_id"))
      scored
        .withColumn("cos_rank", row_number().over(wCos).cast("long"))
        .join(rx, Seq("neighbor_id"))
        .join(broadcast(rq), Seq("query_id"))
        .withColumn("csls", lit(2.0) * col("cos") - col("r_x") - col("r_q"))
        .withColumn("csls_rank", row_number().over(wCsls).cast("long"))
        .filter(col("csls_rank") <= TopK)
        .select(col("query_id"), col("neighbor_id"), col("csls_rank"),
          col("cos_rank"), col("csls"),
          (col("cos_rank") - col("csls_rank")).as("rank_moved"))
    },
    Some(s"""WITH q AS (
        SELECT vec_id AS query_id, embedding AS q_emb FROM embeddings
        WHERE vec_id < $NQueries),
      scored AS (
        SELECT q.query_id, e.vec_id AS neighbor_id,
          list_sum(list_transform(list_zip(q.q_emb, e.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(q.q_emb,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(e.embedding,
               v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
      rx AS (
        SELECT neighbor_id,
          list_sum(list_reverse_sort(list(cos))[1:$KQ])::DOUBLE / $KQ.0 AS r_x
        FROM scored GROUP BY 1),
      rq AS (
        SELECT query_id,
          list_sum(list_reverse_sort(list(cos))[1:$KC])::DOUBLE / $KC.0 AS r_q
        FROM scored GROUP BY 1),
      ranked AS (
        SELECT s.query_id, s.neighbor_id,
          ROW_NUMBER() OVER (PARTITION BY s.query_id
            ORDER BY s.cos DESC, s.neighbor_id) AS cos_rank,
          2.0 * s.cos - rx.r_x - rq.r_q AS csls
        FROM scored s
        JOIN rx ON rx.neighbor_id = s.neighbor_id
        JOIN rq ON rq.query_id = s.query_id),
      rr AS (
        SELECT query_id, neighbor_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY query_id
            ORDER BY csls DESC, neighbor_id) AS BIGINT) AS csls_rank,
          CAST(cos_rank AS BIGINT) AS cos_rank, csls
        FROM ranked)
      SELECT query_id, neighbor_id, csls_rank, cos_rank, csls,
        cos_rank - csls_rank AS rank_moved
      FROM rr WHERE csls_rank <= $TopK"""))

  val all: Seq[QueryDef] = Seq(q489CslsRerank)
}
