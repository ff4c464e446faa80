package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The keyed DGIM module (18th): per-key mapGroupsWithState state must
  * equal the SHARED `DgimOps.dgimFoldSql` fold run independently on
  * each key's bits (cross-implementation, not self-check), be
  * invariant to micro-batch slicing with keys interleaved, and carry
  * the unconditional half-oldest certificate per key. */
class KeyedDgimStreamSpec extends SparkTestBase {

  private val W = 256
  private var qSeq = 0

  private def bits(n: Int, salt: Long): Seq[Long] =
    (0 until n).map(i =>
      if (((i + salt) * 2654435761L >>> 7) % 7 < 2) 1L else 0L)

  private def sqlFold(bs: Seq[Long]): (Long, Vector[(Long, Long)]) = {
    import spark.implicits._
    val row = Seq(bs).toDF("bits")
      .select(expr(s"${graft.ops.DgimOps.dgimFoldSql(W)} AS st"))
      .select(col("st.t"), col("st.bk")).head()
    (row.getLong(0),
      row.getSeq[Row](1).map(r => (r.getLong(0), r.getLong(1))).toVector)
  }

  /** Run the keyed monitor over interleaved per-key streams; returns
    * per key (t, buckets, est, bound) from the final emit. */
  private def replay(streams: Map[String, Seq[Long]], batchSize: Int)
      : Map[String, (Long, Vector[(Long, Long)], Long, Long)] = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    qSeq += 1
    val name = s"kdgim_sink_$qSeq"
    val q = KeyedDgimStream
      .monitor(input.toDF().toDF("key", "seq", "bit"), W)
      .writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      // interleave keys position-by-position so every micro-batch mixes
      // keys — the per-key state separation is what's under test
      val rows = streams.toSeq.sortBy(_._1).flatMap { case (k, bs) =>
        bs.zipWithIndex.map { case (b, i) => (i, k, i.toLong, b) }
      }.sortBy(r => (r._1, r._2)).map(r => (r._2, r._3, r._4))
      rows.grouped(batchSize).foreach { slice =>
        input.addData(slice)
        q.processAllAvailable()
      }
      spark.table(name).collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) =>
          val last = rs.maxBy(_.getLong(1))
          k -> (last.getLong(1),
            last.getSeq[Long](4).zip(last.getSeq[Long](5)).toVector,
            last.getLong(2), last.getLong(3))
        }
    } finally q.stop()
  }

  test("per-key state == the shared SQL fold per key, two slicings, " +
       "interleaved keys") {
    val streams = Map(
      "a" -> bits(1500, 0), "b" -> bits(1500, 17), "c" -> bits(900, 99))
    val r1 = replay(streams, 300)
    val r2 = replay(streams, 23)
    assert(r1 == r2, "micro-batch slicing must not perturb any key's state")
    streams.foreach { case (k, bs) =>
      val (sqlT, sqlBk) = sqlFold(bs)
      val (t, bk, est, bound) = r1(k)
      assert(t == sqlT, s"key $k clock")
      assert(bk == sqlBk, s"key $k: keyed state $bk != SQL fold $sqlBk")
      val trueOnes = bs.takeRight(W).count(_ == 1L)
      assert(math.abs(est - trueOnes) <= bound,
        s"key $k: est=$est true=$trueOnes bound=$bound")
      // state invariant per key: powers of two, ≤2 per size, non-decreasing
      val sizes = bk.map(_._1)
      assert(sizes.forall(s => (s & (s - 1)) == 0L))
      assert(sizes.zip(sizes.drop(1)).forall { case (x, y) => x <= y })
      assert(sizes.groupBy(identity).values.forall(_.length <= 2))
    }
  }
}
