package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contracts for the recsys wave beyond the oracle compare. */
class RecsysSpec extends SparkTestBase {

  test("q147: cosine bounded by (0,1], top-5 ranks contiguous per item") {
    val rows = graft.SparkEntry.queries("q147_item_item_cosine")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getDouble(3)
      assert(c > 0.0 && c <= 1.0, s"cos out of range: $c")
    }
    rows.groupBy(_.getLong(0)).foreach { case (x, rs) =>
      val ranks = rs.map(_.getLong(4)).sorted
      assert(ranks.head == 1L && ranks.length <= 5 &&
        ranks.sameElements(1L to ranks.length),
        s"item $x ranks not contiguous: ${ranks.mkString(",")}")
    }
  }

  test("q148: linear credit conserves each purchase's value to quantization") {
    val ev = EventOps.events(spark, sfDir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
              unix_micros(col("ts")).as("p_us"), col("value"))
    val touches = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), unix_micros(col("ts")).as("t_us"))
    val attributedTotal = purchases.join(touches, Seq("user_id"))
      .filter(col("t_us") < col("p_us") &&
              col("t_us") >= col("p_us") - lit(86400000000L))
      .select(col("purchase_id"), col("value")).distinct()
      .agg(sum(col("value"))).collect().head.getDouble(0)
    val credited = graft.SparkEntry.queries("q148_linear_attribution")(spark, sfDir)
      .agg(sum(col("attributed_revenue"))).collect().head.getDouble(0)
    // each touch quantizes to 1e-6: the sum can drift at most n_touches*1e-6
    assert(math.abs(credited - attributedTotal) < 1.0,
      s"credit $credited vs attributed purchase revenue $attributedTotal")
  }

  test("q155: NDCG in (0,1], equals 1 exactly when system order is ideal") {
    val rows = graft.SparkEntry.queries("q155_ndcg_eval")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getDouble(4)
      assert(n > 0.0 && n <= 1.0 + 1e-9, s"item ${r.getLong(0)}: ndcg $n")
      assert(r.getLong(1) <= 5)
    }
    // cosine order and relevance order agree for at least some items
    assert(rows.exists(_.getDouble(4) >= 0.999), "no item ranked ideally")
  }

  test("q154: pattern counts bounded by user count, all users pathed") {
    val r = graft.SparkEntry.queries("q154_sequence_patterns")(spark, sfDir)
      .collect().head
    val users = EventOps.events(spark, sfDir)
      .select(col("user_id")).distinct().count()
    assert(r.getLong(0) == users)
    (1 to 3).foreach(i => assert(r.getLong(i) <= r.getLong(0)))
  }

  test("q149: decayed score positive, at most n_events, monotone in recency") {
    val rows = graft.SparkEntry.queries("q149_decayed_popularity")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getLong(1), r.getDouble(2))
      assert(s > 0.0 && s <= n.toDouble, s"${r.getString(0)}: score $s of $n")
    }
  }
}
