package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the Elo fold: day-ordered slicings replay
  * BIT-identically (the recurrence has no reassociation freedom —
  * KalmanStream's argument), the snapshot agrees with q547's batch fold
  * at the surfaced precision, and redelivered batch ids are skipped. */
class EloStreamSpec extends SparkTestBase {

  private type DayRow = (String, Long, Long, Long, Long, Long)

  private def dayRows(): Seq[DayRow] = {
    // q547's daily frame, read once in batch
    val brands = Seq("Brand#1", "Brand#2", "Brand#3", "Brand#4", "Brand#5")
    val t = graft.ops.Tables(spark, sfDir)
    val cents = t.lineitem
      .join(t.part.filter(col("p_brand").isin(brands: _*))
        .select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(to_date(col("o_orderdate")).as("day"), col("p_brand"))
      .agg(floor(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
        .cast(org.apache.spark.sql.types.DecimalType(22, 8))) * 100)
        .cast("long").as("cents"))
    val cols = brands.zipWithIndex.map { case (b, i) =>
      coalesce(sum(when(col("p_brand") === b, col("cents"))), lit(0L))
        .as(s"c$i")
    }
    cents.groupBy(col("day")).agg(cols.head, cols.tail: _*)
      .orderBy(col("day"))
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
  }

  private def replay(rows: Seq[DayRow], batchSize: Int): EloStream.EloStore = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[DayRow]
    val store = new EloStream.EloStore(5)
    val q = EloStream.maintain(
      input.toDF().toDF("day", "c0", "c1", "c2", "c3", "c4"), store, 5)
    try {
      rows.grouped(batchSize).foreach { slice =>
        input.addData(slice)
        q.processAllAvailable()
      }
    } finally q.stop()
    store
  }

  test("two day-ordered slicings replay bit-identically and match q547") {
    val rows = dayRows()
    val a = replay(rows, 7)
    val b = replay(rows, 50)
    assert(a.snapshot.toSeq == b.snapshot.toSeq,
      "slicing must not perturb the fold")
    assert(a.nDays == rows.size)
    val batch = graft.ops.RatingOps.q547EloRatings.fn(spark, sfDir)
      .orderBy(col("brand")).collect()
      .map(r => r.getAs[Double]("elo"))
    val streamed = a.snapshot.map(v =>
      BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(streamed.toSeq == batch.toSeq,
      s"stream ${streamed.toSeq} != batch ${batch.toSeq}")
  }

  test("redelivered batch ids are skipped (exactly-once contract)") {
    val rows = dayRows().take(20)
    val store = new EloStream.EloStore(5)
    val payload = rows.map(r =>
      (r._1, Array(r._2, r._3, r._4, r._5, r._6)))
    store.merge(0L, payload)
    val once = store.snapshot.toSeq
    store.merge(0L, payload) // replay must be a no-op
    assert(store.snapshot.toSeq == once)
  }
}
