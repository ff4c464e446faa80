package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Borda-count rank aggregation (Borda 1781; de Borda's election
  * method, the positional counterpart of q376/CompeteOps' Condorcet–
  * Copeland pairwise rules): each year's nation revenue leaderboard is
  * one "voter"; a nation earns (|candidates| − rank) points per year;
  * the aggregate ranking is by total points. The rank-fusion rule used
  * when combining leaderboards whose SCORES are incomparable but whose
  * ORDERINGS are trusted (reference: overseer's arbitrary handler fns,
  * src/overseer/executor.clj:12-39; q104's RRF is the retrieval cousin).
  *
  * Scale shape: one scan to the (year × nation) revenue census
  * (hash-agg on exact cents), per-year ranking windows over the
  * |years|×|nations| frame (model-sized at any SF), then one grouped
  * sum. Nothing data-sized after the first aggregate.
  *
  * Exactness: revenue is exact cents (BIGINT), ranks break ties by
  * nation key, Borda points are integers — every column deterministic
  * cross-engine.
  */
object RankAggOps {

  val q528Borda: QueryDef = QueryDef(
    "q528_borda",
    (s, dir) => {
      val t = Tables(s, dir)
      val yearly = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(year(col("o_orderdate")).as("yr"),
          col("c_nationkey").cast("long").as("nation"))
        .agg(sum(expr("CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"))
          .as("cents"))
      val wYr = Window.partitionBy(col("yr"))
        .orderBy(col("cents").desc, col("nation"))
      val nPerYear = Window.partitionBy(col("yr"))
      val pts = yearly
        .withColumn("rk", row_number().over(wYr).cast("long"))
        .withColumn("m", count(lit(1)).over(nPerYear))
        .select(col("yr"), col("nation"), (col("m") - col("rk")).as("pts"))
      pts.groupBy(col("nation"))
        .agg(sum(col("pts")).as("borda_score"),
          count(lit(1)).as("n_years"))
        .withColumn("final_rank", row_number().over(
          Window.orderBy(col("borda_score").desc, col("nation"))).cast("long"))
    },
    Some("""WITH yearly AS (
        SELECT EXTRACT(year FROM o_orderdate) AS yr,
          CAST(c_nationkey AS BIGINT) AS nation,
          CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
            AS cents
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1, 2),
      pts AS (
        SELECT yr, nation,
          COUNT(*) OVER (PARTITION BY yr)
            - row_number() OVER (PARTITION BY yr
                ORDER BY cents DESC, nation) AS pts
        FROM yearly)
      SELECT nation,
        CAST(SUM(pts) AS BIGINT) AS borda_score,
        CAST(COUNT(*) AS BIGINT) AS n_years,
        CAST(row_number() OVER (ORDER BY SUM(pts) DESC, nation) AS BIGINT)
          AS final_rank
      FROM pts GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q528Borda)
}
