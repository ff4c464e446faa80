package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Aggregators.QuantileSketch

/** Exact distributed multi-quantile selection + mergeable-sketch audit.
  *
  * The exact path is the classic two-pass selection a 100 TB column
  * demands instead of a global sort: pass 1 builds a 1024-bucket
  * value-range histogram (one hash agg, map-side combined), the driver
  * locates each target rank's bucket and residual rank from the 1024-row
  * cumulative profile, pass 2 sorts ONLY the hit buckets (≤5 of 1024 —
  * each ~n/1024 rows, a per-bucket window, never a global order). This
  * is the same no-global-sort discipline as q481's encoding advisor.
  *
  * Riding along, the audit runs graft's derandomized KLL-style
  * mergeable quantile sketch ([[graft.functions.Aggregators.QuantileSketch]],
  * k=256, constant-size map-side partials where exact selection still
  * scans twice) over the same column and checks its self-reported error
  * budget: the sketch's estimate for each target must sit within
  * err + maxW TRUE ranks of the target (err is the buffer's exactly
  * tracked compaction drift; maxW the top-level weight granularity),
  * and the whole budget must stay under n/8 — generous versus the
  * ~n·log₂(n/k)/k analysis bound, but immune to merge-tree variation
  * across shuffle orders, so the emitted booleans are deterministic and
  * oracle-checkable even though the sketch contents are not.
  *
  * Exactness across engines: cents via floor(price·100 + 0.5) (q216's
  * convention), target ranks ceil(phi·n) computed with the identical
  * IEEE double product both sides, value-at-rank is tie-insensitive
  * (equal values), booleans are guaranteed-TRUE by the sketch's bound.
  */
object QuantileSelOps {

  private val Phis = Seq(0.01, 0.25, 0.50, 0.75, 0.99)
  private val B    = 1024 // range-histogram buckets

  val q490QuantileSelect: QueryDef = QueryDef(
    "q490_quantile_select",
    (s, dir) => {
      import s.implicits._
      // deliberately NOT checkpointed: each pass is a column-pruned
      // parquet scan of ONE column — rescanning is cheaper than
      // materializing |lineitem| longs (at sf10 the checkpoint alone
      // overflowed the block-manager store and cost more than every
      // downstream stage combined)
      val cents = Tables(s, dir).lineitem
        .select(floor(col("l_extendedprice") * 100 + lit(0.5))
          .cast("long").as("c"))

      val head = cents.agg(min(col("c")), max(col("c")), count(lit(1))).head()
      val (mn, mx, n) = (head.getLong(0), head.getLong(1), head.getLong(2))
      val width = (mx - mn) / B + 1

      // pass 1: bucket histogram -> driver-side cumulative rank profile
      val hist = cents
        .groupBy(((col("c") - mn) / width).cast("long").as("b"))
        .agg(count(lit(1)).as("cnt"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
      val cumBefore = { // bucket id -> #values in strictly smaller buckets
        var cum = 0L
        hist.map { case (b, cnt) => val at = cum; cum += cnt; b -> at }.toMap
      }
      val targets = Phis.map(phi => phi -> math.ceil(phi * n).toLong)
      val picks = targets.map { case (phi, t) =>
        val (b, before) = cumBefore.toSeq.sortBy(_._1)
          .takeWhile { case (bb, at) => at < t }.last
        (phi, b, t - before) // residual rank inside bucket b
      }
      val needed = picks.map(_._2).distinct

      // pass 2: per-bucket window over ONLY the hit buckets
      val wb = Window.partitionBy(col("b")).orderBy(col("c"))
      val exact = cents
        .withColumn("b", ((col("c") - mn) / width).cast("long"))
        .filter(col("b").isin(needed: _*))
        .withColumn("rk", row_number().over(wb).cast("long"))
        .join(picks.toDF("phi", "b", "rk"), Seq("b", "rk"))
        .select(col("phi"), col("c").as("exact_cents"))

      // sketch audit: estimates + the true rank of each estimate.
      // treeAggregate shape: one mutable fold per partition, log-depth
      // merge — the same algebra the Aggregator registers, minus the
      // per-row buffer encoding (24 s -> ~10 s at sf10 on this stage)
      val skBuf = cents.as[Long].rdd
        .mapPartitions(it =>
          Iterator.single(QuantileSketch.foldPartition(it, 256)))
        .treeReduce(QuantileSketch.k256.merge)
      val sk = QuantileSketch.k256.finish(skBuf)
      val ests = targets.map { case (phi, t) =>
        (phi, t, QuantileSketch.query(sk, t))
      }
      val budget = sk.err + sk.maxW
      // two-sided, duplicate-safe check: the target rank must fall inside
      // the estimate's true rank interval [count(<est), count(<=est)]
      // widened by the budget on each side
      val rankCols = ests.flatMap { case (phi, _, est) =>
        Seq(sum(when(col("c") <= lit(est), 1L).otherwise(0L)).as(s"le$phi"),
          sum(when(col("c") < lit(est), 1L).otherwise(0L)).as(s"lt$phi"))
      }
      val trueRanks = cents.agg(rankCols.head, rankCols.tail: _*).head()
      val audits = ests.zipWithIndex.map { case ((phi, t, _), i) =>
        val (le, lt) = (trueRanks.getLong(2 * i), trueRanks.getLong(2 * i + 1))
        (phi, le >= t - budget && lt <= t + budget, budget * 8 <= n)
      }

      exact
        .join(audits.toDF("phi", "sketch_ok", "bound_ok"), Seq("phi"))
        .withColumn("n", lit(n))
        .select(col("phi"), col("n"), col("exact_cents"),
          col("sketch_ok"), col("bound_ok"))
    },
    Some("""WITH v AS (
        SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS c
        FROM lineitem),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
      r AS (SELECT c, row_number() OVER (ORDER BY c) AS rk FROM v),
      t AS (
        -- CAST to DOUBLE first: a DECIMAL phi would ceil exact decimal
        -- products while Spark ceils the IEEE double product
        SELECT CAST(phi AS DOUBLE) AS phi,
          CAST(ceil(CAST(phi AS DOUBLE) * nn.n) AS BIGINT) AS tgt, nn.n
        FROM (VALUES (0.01), (0.25), (0.50), (0.75), (0.99)) p(phi), nn)
      SELECT t.phi, t.n, r.c AS exact_cents,
        TRUE AS sketch_ok, TRUE AS bound_ok
      FROM t JOIN r ON r.rk = t.tgt"""))

  val all: Seq[QueryDef] = Seq(q490QuantileSelect)
}
