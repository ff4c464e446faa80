package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** Misra–Gries streaming heavy hitters: state stays bounded at k per
  * shard and the classic error guarantee is certified against exact
  * batch counts — under two different micro-batch slicings (the summary
  * CONTENT may differ by order; the BOUND may not). */
class HeavyHitterStreamSpec extends SparkTestBase {

  private def tokensSorted: Array[(Long, String)] =
    graft.ops.Tables(spark, sfDir).documents
      .select(col("doc_id"), explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)

  private def replay(toks: Array[String], batchSize: Int,
                     name: String): Map[Int, (Map[String, Long], Long, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[String]
    val q = HeavyHitterStream.track(input.toDF().toDF("token"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      toks.grouped(batchSize).foreach { slice =>
        input.addData(slice.toSeq)
        q.processAllAvailable()
      }
      // latest summary per shard = max-version rows (the explicit
      // recency key the operator emits; no reliance on sink order)
      spark.table(name).collect()
        .map(r => (r.getAs[Int]("shard"), r.getAs[String]("token"),
          r.getAs[Long]("estimate"), r.getAs[Long]("shardN"),
          r.getAs[Long]("shardDecremented"), r.getAs[Long]("version")))
        .groupBy(_._1).map { case (sh, rows) =>
          val maxV = rows.map(_._6).max
          val last = rows.filter(_._6 == maxV)
          sh -> (last.map(r => r._2 -> r._3).toMap, last.head._4, last.head._5)
        }.toMap
    } finally q.stop()
  }

  test("MG guarantee certified against exact counts under two slicings; state bounded") {
    val tk = tokensSorted.map(_._2)
    assert(tk.length > 10000, "fixture token stream too small to exercise MG")
    // exact per-shard counts with the SAME shard function
    val exact = graft.ops.Tables(spark, sfDir).documents
      .select(explode(graft.ops.TextOps.tokens(col("text"))).as("token"))
      .select(col("token"),
        pmod(xxhash64(col("token")), lit(HeavyHitterStream.Shards.toLong))
          .cast("int").as("shard"))
      .groupBy(col("shard"), col("token")).count().collect()
      .map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap

    for (slice <- Seq(7001, 1237)) {
      val summaries = replay(tk, slice, s"mg$slice")
      assert(summaries.nonEmpty)
      summaries.foreach { case (shard, (counters, n, dec)) =>
        assert(counters.size <= HeavyHitterStream.K, s"shard $shard state overflow")
        assert(dec <= n / (HeavyHitterStream.K + 1),
          s"shard $shard: $dec decrements exceed N/(k+1) = ${n / (HeavyHitterStream.K + 1)}")
        // shardN equals the exact token mass of the shard
        val shardTrue = exact.collect { case ((s, t), c) if s == shard => c }.sum
        assert(n == shardTrue, s"shard $shard mass $n vs exact $shardTrue")
        // the MG guarantee, token by token:
        //   estimate <= true, and true - dec <= estimate (0 if absent)
        exact.foreach { case ((s, t), c) =>
          if (s == shard) {
            val est = counters.getOrElse(t, 0L)
            assert(est <= c, s"shard $shard '$t': estimate $est exceeds true $c")
            assert(c - dec <= est,
              s"shard $shard '$t': true $c - dec $dec > estimate $est")
          }
        }
        // every token heavier than the decrement budget is present
        exact.foreach { case ((s, t), c) =>
          if (s == shard && c > dec)
            assert(counters.contains(t), s"heavy token '$t' ($c > $dec) missing")
        }
      }
    }
  }
}
