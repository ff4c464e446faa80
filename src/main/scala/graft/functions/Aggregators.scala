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
}
