package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregators (SURVEY.md §2E UDAF surface). */
object Aggregators {

  /** Streaming-mergeable weighted mean: (Σwx, Σw) buffer — associative and
    * commutative, so Spark computes it with map-side partials like any
    * built-in agg. */
  final case class WeightedMeanBuf(sum: Double, weight: Double)

  object WeightedMean extends Aggregator[(Double, Double), WeightedMeanBuf, Double] {
    override def zero: WeightedMeanBuf = WeightedMeanBuf(0.0, 0.0)
    override def reduce(b: WeightedMeanBuf, in: (Double, Double)): WeightedMeanBuf =
      WeightedMeanBuf(b.sum + in._1 * in._2, b.weight + in._2)
    override def merge(a: WeightedMeanBuf, b: WeightedMeanBuf): WeightedMeanBuf =
      WeightedMeanBuf(a.sum + b.sum, a.weight + b.weight)
    override def finish(b: WeightedMeanBuf): Double =
      if (b.weight == 0.0) Double.NaN else b.sum / b.weight
    override def bufferEncoder: Encoder[WeightedMeanBuf] = Encoders.product[WeightedMeanBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Fixed-depth histogram sketch for duration/latency percentiles (the
    * job-duration sketch use case): counts in `2^k`-bucketed bins, merged
    * bin-wise; percentile read-off is approximate with bounded relative
    * error — constant memory regardless of input size, unlike exact
    * percentile's full sort. */
  final case class LogHistogram(counts: Array[Long]) {
    def total: Long = counts.sum
  }

  object LogHistogramAgg extends Aggregator[Double, LogHistogram, LogHistogram] {
    val nBins = 64
    private def bin(v: Double): Int = {
      if (v <= 0) 0
      else math.min(nBins - 1, (math.log(v) / math.log(2.0)).toInt + 32) max 0
    }
    override def zero: LogHistogram = LogHistogram(Array.fill(nBins)(0L))
    override def reduce(b: LogHistogram, v: Double): LogHistogram = {
      b.counts(bin(v)) += 1; b
    }
    override def merge(a: LogHistogram, b: LogHistogram): LogHistogram =
      LogHistogram(a.counts.zip(b.counts).map { case (x, y) => x + y })
    override def finish(b: LogHistogram): LogHistogram = b
    override def bufferEncoder: Encoder[LogHistogram] = Encoders.product[LogHistogram]
    override def outputEncoder: Encoder[LogHistogram] = Encoders.product[LogHistogram]

    /** Upper edge of the bin containing quantile q. */
    def quantile(h: LogHistogram, q: Double): Double = {
      val target = (h.total * q).toLong
      var acc = 0L
      var i = 0
      while (i < nBins && acc < target) { acc += h.counts(i); i += 1 }
      math.pow(2.0, (i - 32).toDouble)
    }
  }

  /** Bounded-state exact top-k-smallest of (ts, id) pairs — the
    * skew-immune per-key top-k: partial state is ≤ k pairs per key per
    * task, so a whale key that owns 20% of the corpus ships O(tasks × k)
    * partials instead of forcing a single-task sort of its whole
    * partition (the window row_number plan). reduce keeps a sorted
    * ≤k-vector (insertion into ≤5 elements beats heap overhead at these
    * k); merge is a k-way merge of two ≤k-vectors. SkewBench measures
    * this plan against the window under a Zipf whale key.
    */
  final case class TopKBuf(pairs: Seq[(Long, Long)])

  final class TopKEarliest(k: Int)
      extends Aggregator[(Long, Long), TopKBuf, Seq[(Long, Long)]] {
    private def insert(v: Seq[(Long, Long)], x: (Long, Long)): Seq[(Long, Long)] =
      if (v.size == k && ordGte(x, v.last)) v
      else ((v :+ x).sorted).take(k)
    private def ordGte(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 >= b._2)
    override def zero: TopKBuf = TopKBuf(Vector.empty)
    override def reduce(b: TopKBuf, in: (Long, Long)): TopKBuf =
      TopKBuf(insert(b.pairs, in))
    override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
      TopKBuf((a.pairs ++ b.pairs).sorted.take(k))
    override def finish(b: TopKBuf): Seq[(Long, Long)] = b.pairs
    override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  // ——————————————— mergeable quantile sketch (KLL-style, derandomized) ———————————————

  /** Sketch state: `levels(l)` holds items of weight 2^l; `parity(l)`
    * counts compactions done at level l (its low bit picks even/odd-index
    * survivors, halving the one-sided bias of a fixed rule); `err` is an
    * EXACT upper bound on the rank perturbation introduced so far —
    * every compaction at level l adds 2^l to it (compacting a sorted
    * 2m-item weight-w buffer into m items of weight 2w shifts any rank
    * query by at most w). */
  final case class QSketchBuf(levels: Seq[Seq[Long]], parity: Seq[Long],
                              n: Long, err: Long)

  /** Finished summary: (value, weight) pairs NOT yet sorted across
    * levels, plus the exact error budget. Query with
    * [[QuantileSketch.query]]. */
  final case class QSummary(values: Seq[Long], weights: Seq[Long],
                            n: Long, err: Long, maxW: Long)

  /** Deterministic KLL-style mergeable quantile sketch over Long.
    *
    * Why not GK: Greenwald–Khanna summaries do not merge with preserved
    * ε (merged error is ε₁+ε₂ and keeps growing up the merge tree); the
    * KLL compactor hierarchy merges by level-wise concatenation with the
    * SAME per-compaction error accounting as the insert path, which is
    * what a Spark Aggregator needs — `merge` runs once per map-side
    * partial, in an order chosen by the shuffle, so the bound must hold
    * for EVERY merge tree. Randomized KLL gets ε = O(1/k) with
    * √-variance; this derandomized variant (parity-alternated survivor
    * selection instead of a coin) keeps the deterministic worst-case
    * bound err ≤ Σ_l c_l·2^l ≈ n·log₂(n/k)/k, which the buffer tracks
    * EXACTLY — callers never reason about the formula, they read `err`.
    *
    * State per group: ≤ k·log₂(n/k) longs. At 100 TB (n ≈ 10¹²,
    * k = 256) that is ~40 levels × 256 longs ≈ 80 KB per aggregation
    * group — constant-memory map-side partials where an exact quantile
    * would shuffle the full column.
    */
  final class QuantileSketch(k: Int) extends Aggregator[Long, QSketchBuf, QSummary] {
    require(k >= 8 && k % 2 == 0, s"capacity k=$k must be even and >= 8")

    override def zero: QSketchBuf = QSketchBuf(Vector(Vector.empty), Vector(0L), 0L, 0L)

    override def reduce(b: QSketchBuf, v: Long): QSketchBuf = {
      val l0 = b.levels.head :+ v
      compact(QSketchBuf(l0 +: b.levels.tail, b.parity, b.n + 1, b.err))
    }

    override def merge(a: QSketchBuf, b: QSketchBuf): QSketchBuf = {
      val h = math.max(a.levels.size, b.levels.size)
      val lv = (0 until h).map { l =>
        a.levels.lift(l).getOrElse(Vector.empty) ++
          b.levels.lift(l).getOrElse(Vector.empty)
      }
      val pr = (0 until h).map { l =>
        a.parity.lift(l).getOrElse(0L) + b.parity.lift(l).getOrElse(0L)
      }
      compact(QSketchBuf(lv, pr, a.n + b.n, a.err + b.err))
    }

    /** Cascade: any level at/above capacity is sorted and halved; an odd
      * straggler (the max) stays at its level so every kept item keeps an
      * exact weight. */
    private def compact(b0: QSketchBuf): QSketchBuf = {
      var levels = b0.levels.toVector
      var parity = b0.parity.toVector
      var err = b0.err
      var l = 0
      while (l < levels.size) {
        if (levels(l).size >= k) {
          val sorted = levels(l).sorted
          val (toCompact, keepHere) =
            if (sorted.size % 2 == 0) (sorted, Vector.empty[Long])
            else (sorted.init, Vector(sorted.last))
          val offset = (parity(l) % 2).toInt // alternate even/odd survivors
          val up = toCompact.indices.collect {
            case i if i % 2 == offset => toCompact(i)
          }.toVector
          if (levels.size == l + 1) { levels :+= Vector.empty; parity :+= 0L }
          levels = levels
            .updated(l, keepHere)
            .updated(l + 1, levels(l + 1) ++ up)
          parity = parity.updated(l, parity(l) + 1)
          err += 1L << l
        }
        l += 1
      }
      QSketchBuf(levels, parity, b0.n, err)
    }

    override def finish(b: QSketchBuf): QSummary = {
      val vw = b.levels.zipWithIndex.flatMap { case (items, l) =>
        items.map(v => (v, 1L << l))
      }
      val maxW = if (vw.isEmpty) 1L else vw.map(_._2).max
      QSummary(vw.map(_._1), vw.map(_._2), b.n, b.err, maxW)
    }

    override def bufferEncoder: Encoder[QSketchBuf] = Encoders.product[QSketchBuf]
    override def outputEncoder: Encoder[QSummary] = Encoders.product[QSummary]
  }

  object QuantileSketch {
    val k256 = new QuantileSketch(256)

    /** Partition-local mutable fold — the SAME algebra as the
      * Aggregator's reduce/compact path (QuantileSketchSpec pins
      * bit-identical outputs for any single-stream input), but with
      * ArrayBuffer mutation instead of a per-row case-class + Vector
      * copy: ~10× less allocation on the hot path. Use
      * `mapPartitions(it => Iterator.single(foldPartition(it, k)))` then
      * `treeReduce(sketch.merge)` — the treeAggregate shape that keeps
      * the merge fan-in off the driver at cluster partition counts. */
    def foldPartition(it: Iterator[Long], k: Int): QSketchBuf = {
      import scala.collection.mutable.ArrayBuffer
      val levels = ArrayBuffer(ArrayBuffer.empty[Long])
      val parity = ArrayBuffer(0L)
      var n = 0L
      var err = 0L
      while (it.hasNext) {
        levels(0) += it.next()
        n += 1
        if (levels(0).size >= k) {
          var l = 0
          while (l < levels.size) {
            if (levels(l).size >= k) {
              val sorted = levels(l).sorted
              val oddTail = sorted.size % 2 == 1
              val toCompact = if (oddTail) sorted.dropRight(1) else sorted
              val offset = (parity(l) % 2).toInt
              if (levels.size == l + 1) {
                levels += ArrayBuffer.empty[Long]; parity += 0L
              }
              var i = offset
              while (i < toCompact.size) { levels(l + 1) += toCompact(i); i += 2 }
              levels(l) = if (oddTail) ArrayBuffer(sorted.last)
                          else ArrayBuffer.empty[Long]
              parity(l) += 1
              err += 1L << l
            }
            l += 1
          }
        }
      }
      QSketchBuf(levels.map(_.toVector).toVector, parity.toVector, n, err)
    }

    /** Smallest stored value whose estimated rank (cumulative weight in
      * value order) reaches `targetRank`. Guarantee (two-sided, duplicate-
      * safe): for the returned v and budget = err + maxW,
      * count(< v) ≤ target + budget and count(≤ v) ≥ target − budget —
      * i.e. the target rank falls inside v's true rank interval widened
      * by the budget (err covers the summary's compaction drift, maxW
      * the cumulative-weight step granularity). */
    def query(s: QSummary, targetRank: Long): Long = {
      require(s.values.nonEmpty, "empty sketch")
      val sorted = s.values.zip(s.weights).sortBy(_._1)
      var cum = 0L
      var i = 0
      while (i < sorted.size) {
        cum += sorted(i)._2
        if (cum >= targetRank) return sorted(i)._1
        i += 1
      }
      sorted.last._1
    }
  }
}
