package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Queueing wave: inventory/queue depth under the Lindley recursion
  * s_i = max(0, s_{i-1} + d_i) — the canonical "balance that cannot go
  * negative" (warehouse stock, queue backlog, token-bucket credit).
  * The recurrence looks inherently sequential, but it has a closed
  * window form: s_i = P_i − min(0, min_{j≤i} P_j) with P the plain
  * prefix sum — one ordered window pass instead of a per-row loop,
  * which is what makes it runnable on a 100 TB event stream.
  *
  * Scale shape: one partitioned window (two running aggregates over
  * the same sort) then a per-key collapse. No driver state, no UDAF.
  */
object QueueOps {

  /** Per-part inventory depth: shipments with returnflag R drain
    * quantity, others restock, in shipdate order. The Lindley identity
    * turns the floor-at-zero recursion into prefix − min(0, running
    * min(prefix)); stockouts (depth hitting zero on a drain) fall out
    * as rows where the running min strictly decreases below zero.
    * Output: per-part final/max depth, stockout count, drained volume
    * lost to stockouts — the fill-rate audit of an inventory system. */
  val q401LindleyDepth: QueryDef = QueryDef(
    "q401_lindley_depth",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
        .select(col("l_partkey").as("part"),
          col("l_orderkey").as("ok"), col("l_linenumber").as("ln"),
          unix_micros(col("l_shipdate").cast("timestamp")).as("t"),
          when(col("l_returnflag") === "R",
            -col("l_quantity").cast("long"))
            .otherwise(col("l_quantity").cast("long")).as("d"))
      val wOrd = Window.partitionBy(col("part"))
        .orderBy(col("t"), col("ok"), col("ln"))
        .rowsBetween(Window.unboundedPreceding, 0)
      val wPrev = Window.partitionBy(col("part"))
        .orderBy(col("t"), col("ok"), col("ln"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val depths = li
        .withColumn("p", sum(col("d")).over(wOrd))
        .withColumn("runmin", least(lit(0L), min(col("p")).over(wOrd)))
        .withColumn("runmin_prev",
          least(lit(0L), coalesce(min(col("p")).over(wPrev), lit(0L))))
        .withColumn("depth", col("p") - col("runmin"))
        // a stockout = this row pushed the running min strictly lower
        // (the drain exceeded available stock; depth floors at 0)
        .withColumn("stockout",
          when(col("runmin") < col("runmin_prev"), 1L).otherwise(0L))
        .withColumn("lost",
          when(col("runmin") < col("runmin_prev"),
            col("runmin_prev") - col("runmin")).otherwise(0L))
      depths.groupBy(col("part"))
        .agg(count(lit(1)).cast("long").as("n_moves"),
          max(col("depth")).as("max_depth"),
          expr("max_by(depth, struct(t, ok, ln))").as("final_depth"),
          sum(col("stockout")).as("n_stockouts"),
          sum(col("lost")).as("units_lost"))
        .where(col("n_stockouts") > 0)
        .select(col("part"), col("n_moves"), col("max_depth"),
          col("final_depth"), col("n_stockouts"), col("units_lost"))
        .orderBy(col("n_stockouts").desc, col("units_lost").desc, col("part"))
        .limit(100)
    },
    Some("""WITH li AS (SELECT l_partkey AS part, l_orderkey AS ok,
          l_linenumber AS ln, epoch_us(l_shipdate) AS t,
          CASE WHEN l_returnflag = 'R' THEN -CAST(l_quantity AS BIGINT)
            ELSE CAST(l_quantity AS BIGINT) END AS d
        FROM lineitem),
      pfx AS (SELECT *,
          SUM(d) OVER w AS p
        FROM li WINDOW w AS (PARTITION BY part ORDER BY t, ok, ln
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      mins AS (SELECT *,
          least(0, MIN(p) OVER w) AS runmin,
          least(0, COALESCE(MIN(p) OVER wp, 0)) AS runmin_prev
        FROM pfx
        WINDOW w AS (PARTITION BY part ORDER BY t, ok, ln
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wp AS (PARTITION BY part ORDER BY t, ok, ln
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
      st AS (SELECT *, p - runmin AS depth,
          CASE WHEN runmin < runmin_prev THEN 1 ELSE 0 END AS stockout,
          CASE WHEN runmin < runmin_prev THEN runmin_prev - runmin
            ELSE 0 END AS lost
        FROM mins),
      fd AS (SELECT part, depth AS final_depth FROM (
          SELECT part, depth, ROW_NUMBER() OVER (PARTITION BY part
            ORDER BY t DESC, ok DESC, ln DESC) AS rn
          FROM st) WHERE rn = 1),
      agg AS (SELECT s.part, CAST(COUNT(*) AS BIGINT) AS n_moves,
          CAST(MAX(s.depth) AS BIGINT) AS max_depth,
          CAST(MAX(f.final_depth) AS BIGINT) AS final_depth,
          CAST(SUM(s.stockout) AS BIGINT) AS n_stockouts,
          CAST(SUM(s.lost) AS BIGINT) AS units_lost
        FROM st s JOIN fd f ON f.part = s.part GROUP BY 1)
      SELECT part, n_moves, max_depth, final_depth, n_stockouts, units_lost
      FROM agg WHERE n_stockouts > 0
      ORDER BY n_stockouts DESC, units_lost DESC, part
      LIMIT 100"""))

  val all: Seq[QueryDef] = Seq(q401LindleyDepth)
}
