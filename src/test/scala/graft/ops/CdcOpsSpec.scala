package graft.ops

import graft.SparkTestBase
import java.security.MessageDigest

/** q505 semantics: last-writer-wins compaction replayed key by key —
  * including the update-then-delete keys that must vanish — and the
  * ledger identity n_final = n_base − deletes + inserts. */
class CdcOpsSpec extends SparkTestBase {

  private def coin(key: Long): Double = {
    val hex = MessageDigest.getInstance("MD5")
      .digest(s"cdc|$key".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 15)
    (java.lang.Long.parseLong(hex, 16) + 1.0) / 1152921504606846976.0
  }

  test("q505: apply == key-by-key replay; ledger identity holds") {
    val base = Tables(spark, sfDir).orders
      .selectExpr("o_orderkey",
        "CAST(floor(o_totalprice * 100 + 0.5) AS LONG) AS cents")
      .collect().map(r => (r.getLong(0), r.getLong(1)))

    val finalState = scala.collection.mutable.Map.empty[Long, Long]
    base.foreach { case (k, c) => finalState(k) = c }
    var (nDel, nUpd, nIns) = (0L, 0L, 0L)
    base.foreach { case (k, c) =>
      val u = coin(k)
      if (u < 0.05) { finalState.remove(k); nDel += 1 }
      else if (u < 0.15) {
        finalState(k) = c + 1000; nUpd += 1
        if (u < 0.06) { finalState.remove(k); nDel += 1 } // update then delete
      } else if (u < 0.18) { finalState(k + 1000000000L) = c; nIns += 1 }
    }

    val r = CdcOps.q505CdcUpsert.fn(spark, sfDir).collect().head
    assert(r.getAs[Long]("n_base") == base.length.toLong)
    assert(r.getAs[Long]("n_delete") == nDel)
    assert(r.getAs[Long]("n_update") == nUpd)
    assert(r.getAs[Long]("n_insert") == nIns)
    assert(r.getAs[Long]("n_final") == finalState.size.toLong)
    assert(r.getAs[Long]("final_cents") == finalState.values.sum)
    assert(r.getAs[Long]("final_checksum") ==
      finalState.map { case (k, c) => k * 31 + c }.sum)
    // ledger identity: survivors = base − removed keys + inserts, where
    // removed = straight deletes (coin < .05) ∪ update-then-delete
    // ([.05,.06) — those keys count in nDel too, but remove only once)
    val removedKeys = base.count(b => coin(b._1) < 0.06).toLong
    assert(r.getAs[Long]("n_final") == base.length.toLong - removedKeys + nIns)
  }
}
