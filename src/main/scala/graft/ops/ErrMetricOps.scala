package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Expected Reciprocal Rank (Chapelle et al. 2009) — the cascade-model
  * ranking metric next to NDCG (q155): a simulated user scans the
  * ranked list top-down, stops at a document with probability
  * R(g) = (2^g − 1)/16, and ERR is the expected reciprocal stopping
  * rank: ERR = Σ_r (1/r)·R_r·Π_{i<r}(1 − R_i). Unlike NDCG, a highly
  * relevant early hit SHADOWS everything below it — exactly the
  * behavior retrieval evals want for navigational queries (reference:
  * overseer's arbitrary handler fns, src/overseer/executor.clj:12-39;
  * q155/q193's eval family).
  *
  * Fixture: for each of q527's four query terms, docs are ranked by
  * term frequency (desc, doc_id) top-10; grades are tf-thresholded
  * (g = 3 at tf ≥ 5, 2 at tf ≥ 3, 1 at tf ≥ 1).
  *
  * Scale shape: one token scan to the 4-term postings (hash-agg), one
  * per-term top-10 window over the postings, then the cascade product
  * folds inside a codegen `aggregate` HOF per term (the q514/q538
  * discipline — a sequential product has no reassociation freedom).
  *
  * Exactness: grades are integer-thresholded; R(g) ∈ {1/16, 3/16,
  * 7/16} are DYADIC, so the cascade probabilities are exact binary
  * fractions; the only rounding is the 1/r division, identical in both
  * engines' identical fold order. Output rounded for display.
  */
object ErrMetricOps {

  private val Terms = Seq("scan", "join", "window", "stream")

  val q540ErrMetric: QueryDef = QueryDef(
    "q540_err_metric",
    (s, dir) => {
      val qterms = s.createDataFrame(Terms.map(Tuple1(_))).toDF("term")
      val postings = Tables(s, dir).documents
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)")).as("term"))
        .join(broadcast(qterms), Seq("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
      val w = Window.partitionBy(col("term"))
        .orderBy(col("tf").desc, col("doc_id"))
      val top = postings.withColumn("rk", row_number().over(w))
        .where(col("rk") <= 10)
        .withColumn("g",
          when(col("tf") >= 5, 3L).when(col("tf") >= 3, 2L).otherwise(1L))
      top.groupBy(col("term"))
        .agg(count(lit(1)).as("n_ranked"),
          sort_array(collect_list(struct(col("rk"), col("g")))).as("lst"))
        .select(col("term"), col("n_ranked"),
          round(expr("""
            aggregate(
              lst,
              named_struct('p', CAST(1.0 AS DOUBLE), 'err', CAST(0.0 AS DOUBLE)),
              (acc, e) -> named_struct(
                'p', acc.p * (1.0 - (pow(2.0, e.g) - 1.0) / 16.0),
                'err', acc.err + acc.p * ((pow(2.0, e.g) - 1.0) / 16.0)
                  / CAST(e.rk AS DOUBLE)),
              acc -> acc.err)"""), 9).as("err"))
    },
    Some("""WITH RECURSIVE qterms AS (
        SELECT unnest(['scan', 'join', 'window', 'stream']) AS term),
      postings AS MATERIALIZED (
        SELECT t.term, t.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM (SELECT doc_id,
            unnest(regexp_extract_all(lower(text), '\w+')) AS term
          FROM documents) t
        JOIN qterms q ON q.term = t.term
        GROUP BY 1, 2),
      top AS MATERIALIZED (
        SELECT term, rk,
          CASE WHEN tf >= 5 THEN 3 WHEN tf >= 3 THEN 2 ELSE 1 END AS g
        FROM (SELECT term, tf, doc_id,
            row_number() OVER (PARTITION BY term
              ORDER BY tf DESC, doc_id) AS rk
          FROM postings)
        WHERE rk <= 10),
      cascade AS (
        SELECT term, rk,
          CAST(1.0 AS DOUBLE) * (1.0 - (pow(2.0, g) - 1.0) / 16.0) AS p,
          CAST(1.0 AS DOUBLE) * ((pow(2.0, g) - 1.0) / 16.0)
            / CAST(rk AS DOUBLE) AS err
        FROM top WHERE rk = 1
        UNION ALL
        SELECT t.term, t.rk,
          c.p * (1.0 - (pow(2.0, t.g) - 1.0) / 16.0),
          c.err + c.p * ((pow(2.0, t.g) - 1.0) / 16.0) / CAST(t.rk AS DOUBLE)
        FROM cascade c JOIN top t
          ON t.term = c.term AND t.rk = c.rk + 1),
      fin AS (
        SELECT term, MAX(rk) AS n_ranked FROM top GROUP BY 1)
      SELECT f.term, CAST(f.n_ranked AS BIGINT) AS n_ranked,
        round(c.err, 9) AS err
      FROM fin f JOIN cascade c ON c.term = f.term AND c.rk = f.n_ranked"""))

  val all: Seq[QueryDef] = Seq(q540ErrMetric)
}
