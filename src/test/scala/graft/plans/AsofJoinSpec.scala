package graft.plans

import graft.SparkTestBase
import graft.ops.EventOps
import org.apache.spark.sql.functions._

/** The native as-of operator must agree row-for-row with the
  * union+window formulation (q18), plan exactly one exchange per side,
  * and handle the edge cases (no prior match → null pad, ties → latest). */
class AsofJoinSpec extends SparkTestBase {

  test("native as-of join returns exactly the union+window result") {
    val native = EventOps.q118AsofNative.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    val window = EventOps.q18AsofJoin.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(window.nonEmpty)
    assert(native == window)
    // left-outer: some purchase must precede any click for the null pad
    // to be exercised — if not, the fixture can't catch a broken pad
    assert(native.exists(_._4.isEmpty))
  }

  test("plan: AsofJoinExec with one exchange per side, sorted on (key, time)") {
    val df = EventOps.q118AsofNative.fn(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"expected AsofJoinExec in:\n$plan")
    // exactly three: one for the clicks-side pre-aggregation (hash on
    // (user_id, ts), which cannot satisfy clustering on user_id alone),
    // plus the join's one exchange per side
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 3, s"expected exactly 3 exchanges, got $exchanges:\n$plan")
  }

  test("property: native operator matches a reference in-memory as-of on random tables") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260813L)
    (1 to 8).foreach { _ =>
      val nL = 1 + rnd.nextInt(60)
      val nR = rnd.nextInt(60)
      val keys = 1 + rnd.nextInt(6)
      // deliberately includes duplicate (key, time) pairs on both sides
      val lRows = (1 to nL).map(i =>
        (rnd.nextInt(keys).toLong, rnd.nextInt(20).toLong, i.toLong))
      // right (key, time) pairs are unique: among tied (key, time) rows the
      // operator's pick is sort-order-defined, so deterministic callers
      // dedupe first (exactly what q118 does per (user, ts))
      val rRows = (1 to nR).map(i =>
        (rnd.nextInt(keys).toLong, rnd.nextInt(20).toLong, (1000 + i).toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val out = AsofJoin(
          lRows.toDF("k", "t", "lv").repartition(3),
          rRows.toDF("k", "t", "rv").repartition(2),
          key = "k", leftTime = "t", rightTime = "t")
        .toDF("k", "t", "lv", "rk", "rt", "rv")
        .select(col("lv"), col("rv")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      // reference semantics: the right row with max (time, rv) among
      // those with the same key and time <= left time — rv is unique, so
      // the (time, rv) max IS the "latest, ties to the last sorted row"
      val expected = lRows.map { case (k, t, lv) =>
        val cand = rRows.filter(r => r._1 == k && r._2 <= t)
        lv -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toMap
      assert(out == expected, s"nL=$nL nR=$nR keys=$keys")
    }
  }

  test("property: string keys — stored key must be copied, not alias reused row memory") {
    import spark.implicits._
    // Non-primitive key type: eval on an UnsafeRow-backed sorted iterator
    // returns UTF8String views into a reused buffer. Before the copy fix,
    // the stored lastKey mutated as the left side advanced, so the
    // stale-key check could spuriously match and leak a previous key's
    // lastMatch onto a new key's rows (wrong match instead of null pad).
    // Variable-length keys + many per-key rows + multiple partitions make
    // that leak observable here if the copy is ever removed.
    val rnd = new scala.util.Random(7L)
    (1 to 6).foreach { _ =>
      val keyPool = Seq("a", "bb-long-key-value", "c3", "dddd", "e", "f-key")
      val nL = 40 + rnd.nextInt(40)
      val nR = rnd.nextInt(50)
      val lRows = (1 to nL).map(i =>
        (keyPool(rnd.nextInt(keyPool.size)), rnd.nextInt(15).toLong, i.toLong))
      val rRows = (1 to nR).map(i =>
        (keyPool(rnd.nextInt(keyPool.size)), rnd.nextInt(15).toLong, (1000 + i).toLong))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val out = AsofJoin(
          lRows.toDF("k", "t", "lv").repartition(3),
          rRows.toDF("k", "t", "rv").repartition(2),
          key = "k", leftTime = "t", rightTime = "t")
        .toDF("k", "t", "lv", "rk", "rt", "rv")
        .select(col("lv"), col("rv")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
        .toMap
      val expected = lRows.map { case (k, t, lv) =>
        val cand = rRows.filter(r => r._1 == k && r._2 <= t)
        lv -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toMap
      assert(out == expected, s"nL=$nL nR=$nR")
    }
  }

  test("self-join: right-side columns get fresh exprIds, unmatched rows read NULL not the left value") {
    import spark.implicits._
    // Both sides derive from the SAME DataFrame, so without the re-alias
    // the right k/t would share exprIds with the left k/t and binding the
    // right key after the join would silently read the LEFT ordinal —
    // non-null on unmatched rows instead of the null pad.
    val base = Seq((1L, 10L, 100L), (2L, 7L, 102L)).toDF("k", "t", "v")
    val right = base.where(col("k") === 1L) // key 2 has no right rows
    val out = AsofJoin(base, right, key = "k", leftTime = "t", rightTime = "t")
      .toDF("k", "t", "v", "rk", "rt", "rv")
      .select(col("v"), col("rk"), col("rt")).collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)),
         if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(100L) == (Some(1L), Some(10L))) // matched: right k/t real
    assert(out(102L) == (None, None))          // unmatched: NULL, not left k/t
  }

  test("synthetic edges: ties take the latest right row, equal times match, no-match pads null") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L), (1L, 5L, 101L), (2L, 7L, 102L))
      .toDF("k", "t", "lv")
    val right = Seq((1L, 5L, 200L), (1L, 9L, 202L), (3L, 1L, 203L))
      .toDF("k", "t", "rv")
    val out = AsofJoin(left, right, key = "k", leftTime = "t", rightTime = "t")
      .toDF("k", "t", "lv", "rk", "rt", "rv")
      .select(col("lv"), col("rv")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(out(100L) == Some(202L)) // latest at-or-before t=10
    assert(out(101L) == Some(200L)) // equal-time rows match (<=, not <)
    assert(out(102L) == None)       // key with no right rows → null pad
  }
}
