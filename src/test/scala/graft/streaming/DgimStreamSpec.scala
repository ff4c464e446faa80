package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the DGIM fold, checked CROSS-IMPLEMENTATION: the
  * store's Scala transition must land on the exact bucket list the
  * `DgimOps.dgimFoldSql` SQL aggregate (q567's fold, shared verbatim)
  * produces on the same bits — plus slicing invariance, the replay
  * skip, and the unconditional half-oldest certificate against exact
  * sliding counts at several checkpoints. */
class DgimStreamSpec extends SparkTestBase {

  private val W = 256

  // deterministic pseudo-random bits, ~29% ones
  private def bits(n: Int): Seq[Long] =
    (0 until n).map(i => if ((i * 2654435761L >>> 7) % 7 < 2) 1L else 0L)

  private def sqlFold(bs: Seq[Long]): (Long, Vector[(Long, Long)]) = {
    import spark.implicits._
    val row = Seq(bs).toDF("bits")
      .select(expr(s"${graft.ops.DgimOps.dgimFoldSql(W)} AS st"))
      .select(col("st.t"), col("st.bk")).head()
    (row.getLong(0),
      row.getSeq[Row](1).map(r => (r.getLong(0), r.getLong(1))).toVector)
  }

  private def replay(bs: Seq[Long], batchSize: Int): DgimStream.DgimStore = {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val store = new DgimStream.DgimStore(W)
    val q = DgimStream.maintain(input.toDF().toDF("seq", "bit"), store)
    try {
      bs.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .grouped(batchSize).foreach { slice =>
        input.addData(slice)
        q.processAllAvailable()
      }
    } finally q.stop()
    store
  }

  test("store state == the q567 SQL fold on the same bits, under two slicings") {
    val bs = bits(3000)
    val (sqlT, sqlBk) = sqlFold(bs)
    val a = replay(bs, 100)
    val b = replay(bs, 7)
    assert(a.snapshot == b.snapshot, "slicing must not perturb the state")
    assert(a.time == b.time && a.time == 2999L)
    assert(a.snapshot == sqlBk,
      s"scala store ${a.snapshot} != SQL fold $sqlBk")
    assert(a.time == sqlT)
  }

  test("certificate holds at checkpoints: |est - true| <= ceil(oldest/2)") {
    val bs = bits(2000)
    val store = new DgimStream.DgimStore(W)
    var id = 0L
    bs.grouped(250).zipWithIndex.foreach { case (slice, i) =>
      store.merge(i.toLong, slice)
      id = i.toLong
      val seen = (i + 1) * 250 min bs.length
      val trueOnes = bs.slice(math.max(0, seen - W), seen).count(_ == 1L)
      assert(math.abs(store.estimate - trueOnes) <= store.bound,
        s"checkpoint $i: est=${store.estimate} true=$trueOnes bound=${store.bound}")
      // state invariant: powers of two, ≤2 per size, non-decreasing
      val sizes = store.snapshot.map(_._1)
      assert(sizes.forall(s => (s & (s - 1)) == 0L))
      assert(sizes.zip(sizes.drop(1)).forall { case (a, b) => a <= b })
      assert(sizes.groupBy(identity).values.forall(_.length <= 2))
    }
  }

  test("redelivered batch ids are skipped (exactly-once contract)") {
    val bs = bits(400)
    val store = new DgimStream.DgimStore(W)
    store.merge(0L, bs.take(200))
    store.merge(1L, bs.drop(200))
    val once = (store.time, store.snapshot)
    store.merge(1L, bs.drop(200)) // replay must be a no-op
    assert((store.time, store.snapshot) == once)
  }
}
