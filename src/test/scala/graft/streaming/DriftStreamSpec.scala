package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Streaming Page–Hinkley ≡ batch q457: the baseline (μ, 5σ threshold)
  * is trained by the batch moment pass, the zero-filled daily series is
  * replayed in event-time order under TWO micro-batch slicings, and the
  * final (max_ph, argmax, first alarm, verdict) must equal q457's
  * committed batch row exactly. */
class DriftStreamSpec extends SparkTestBase {

  private val sf01 = "/root/testdata/sf0.01"

  private def series(): (Array[(Long, Long)], Double, Double) = {
    val counts = graft.ops.Tables(spark, sf01).orders
      .groupBy(datediff(col("o_orderdate"), lit("1992-01-01")).cast("long")
        .as("t"))
      .agg(count(lit(1)).as("c")).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    val (lo, hi) = (counts.keys.min, counts.keys.max)
    val xs = (lo to hi).map(t => t -> counts.getOrElse(t, 0L)).toArray
    val n = xs.length
    val mu = xs.map(_._2).sum.toDouble / n
    val sd = math.sqrt(xs.map(x => x._2.toDouble * x._2).sum / n - mu * mu)
    val thr = BigDecimal(5 * sd).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    (xs, mu, thr)
  }

  private def replay(xs: Array[(Long, Long)], mu: Double, thr: Double,
                     slices: Seq[Int], name: String) = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val q = DriftStream.monitor(
        input.toDF().toDF("key", "day", "x"), mu, 0.5, thr)
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Update).start()
    try {
      var rest = xs.toSeq
      var i = 0
      while (rest.nonEmpty) {
        val k = slices(i % slices.length)
        val (batch, tail) = rest.splitAt(k)
        input.addData(batch.map(x => ("global", x._1, x._2)))
        q.processAllAvailable()
        rest = tail; i += 1
      }
      val rows = spark.table(name).collect()
      rows.last
    } finally q.stop()
  }

  test("stream == batch q457 under two micro-batch slicings") {
    val batch = graft.ops.BayesAbOps.q457PageHinkley.fn(spark, sf01).head()
    val (xs, mu, thr) = series()
    assert(batch.getAs[Double]("threshold") == thr, "baseline matches")
    Seq((Seq(7), "ph_s7"), (Seq(1, 13, 40, 3), "ph_mixed")).foreach {
      case (slices, name) =>
        val last = replay(xs, mu, thr, slices, name)
        assert(last.getAs[Double]("max_ph") ==
          BigDecimal(batch.getAs[Double]("max_ph")).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble ||
          BigDecimal(last.getAs[Double]("max_ph")).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble ==
          batch.getAs[Double]("max_ph"),
          s"$name max_ph ${last.getAs[Double]("max_ph")} vs batch ${batch.getAs[Double]("max_ph")}")
        assert(last.getAs[Long]("argmax_day") ==
          batch.getAs[Long]("argmax_day"), s"$name argmax")
        assert(last.getAs[Boolean]("alarmed") ==
          batch.getAs[Boolean]("alarmed"), s"$name alarm verdict")
        if (batch.getAs[Boolean]("alarmed"))
          assert(last.getAs[Long]("first_alarm_day") ==
            batch.getAs[Long]("first_alarm_day"), s"$name alarm day")
    }
  }
}
