package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** MRR — mean reciprocal rank of the TRUE best neighbor inside the
  * system's top-5 cosine ranking (q147's item-item frame; q155's NDCG is
  * the graded sibling, this is the first-hit lens a recommender's
  * offline eval reports next to it). For each query item, the relevant
  * answer is the highest-co-purchase neighbor among the system's top-5
  * (q155's ideal-order convention, ties by id); RR = 1/rank where the
  * cosine order actually placed it — MRR@5 of the ideal hit.
  *
  * Scale shape: rides the already-bounded q147 top-5 frame (≤5 rows per
  * item) — two windows and one global agg, nothing corpus-sized beyond
  * what q147 already does.
  *
  * Exactness: RR as exact micro-ints (1e6 DIV rank, BIGINT); the mean
  * divides the exact sum once at the end, round 6.
  */
object MrrEvalOps {

  val q552MrrEval: QueryDef = QueryDef(
    "q552_mrr_eval",
    (s, dir) => {
      val ranked = RecsysOps.q147ItemItemCosine.fn(s, dir)
      val ideal = Window.partitionBy(col("x"))
        .orderBy(col("c_xy").desc, col("y").asc)
      val hits = ranked
        .withColumn("ideal_rk", row_number().over(ideal))
        .where(col("ideal_rk") === 1)
        .select(col("x"), expr("1000000 DIV rk").as("rr_micro"),
          when(col("rk") === 1, 1L).otherwise(0L).as("at1"))
      hits.agg(count(lit(1)).as("n_queries"),
          sum(col("rr_micro")).as("sum_rr_micro"),
          sum(col("at1")).as("n_top1"))
        .select(col("n_queries"), col("n_top1"), col("sum_rr_micro"),
          round(col("sum_rr_micro").cast("double") / col("n_queries") / 1e6, 6)
            .as("mrr"))
    },
    Some("""WITH o AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS part
          FROM lineitem),
        p AS (SELECT a.part AS x, b.part AS y, COUNT(*) AS c_xy
          FROM o a JOIN o b ON a.ok = b.ok AND a.part < b.part
          GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        m AS (SELECT part, COUNT(*) AS c FROM o GROUP BY 1),
        sc AS (SELECT p.x, p.y, p.c_xy,
            round(CAST(p.c_xy AS DOUBLE) /
              sqrt(CAST(mx.c AS DOUBLE) * CAST(my.c AS DOUBLE)), 6) AS cos
          FROM p JOIN m mx ON p.x = mx.part JOIN m my ON p.y = my.part),
        r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY x
            ORDER BY cos DESC, y ASC) AS rk FROM sc),
        top AS (SELECT * FROM r WHERE rk <= 5),
        hits AS (
          SELECT x, 1000000 // rk AS rr_micro,
            CASE WHEN rk = 1 THEN 1 ELSE 0 END AS at1
          FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY x
              ORDER BY c_xy DESC, y ASC) AS ideal_rk FROM top)
          WHERE ideal_rk = 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
        CAST(SUM(at1) AS BIGINT) AS n_top1,
        CAST(SUM(rr_micro) AS BIGINT) AS sum_rr_micro,
        round(CAST(SUM(rr_micro) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mrr
      FROM hits"""))

  val all: Seq[QueryDef] = Seq(q552MrrEval)
}
