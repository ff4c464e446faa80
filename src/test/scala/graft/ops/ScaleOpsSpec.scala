package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic checks for the scale-pattern operators (q105–q108). Exactness
  * vs the naive forms is the DuckDB oracle's job; these assert the
  * invariants the oracle can't express (salting is partition-invariant,
  * the diff accounts for every user, SCD2 intervals chain disjointly).
  */
class ScaleOpsSpec extends SparkTestBase {

  test("salted agg equals the unsalted aggregate under a different partitioning") {
    val salted = ScaleOps.q105SaltedSkewAgg.fn(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    val plain = EventOps.events(spark, sfDir)
      .repartition(7) // deliberately different partitioning than the query's
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,4)")).cast("double").as("total_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).sorted
    assert(salted.sameElements(plain))
  }

  test("snapshot diff partitions the full key population, with a live added/changed split") {
    val rows = ScaleOps.q106SnapshotDiff.fn(spark, sfDir).collect()
    val byType = rows.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    val totalKeys = EventOps.events(spark, sfDir)
      .select(col("user_id"), col("event_type")).distinct().count()
    assert(byType.keySet.subsetOf(Set("added", "changed", "unchanged")))
    assert(rows.length == totalKeys)
    // both interesting categories must actually occur on the fixture
    assert(byType.getOrElse("added", 0) > 0)
    assert(byType.getOrElse("changed", 0) > 0)
    // an 'added' key has no old state; 'changed' keys differ by construction
    rows.foreach { r =>
      r.getString(2) match {
        case "added"   => assert(r.isNullAt(4))
        case "changed" => assert(r.getLong(3) != r.getLong(4))
        case _         => assert(r.getLong(3) == r.getLong(4))
      }
    }
  }

  test("expectations report exactly the five named checks with true violation counts") {
    val rows = ScaleOps.q107Expectations.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.keySet == Set("lineitem_qty_range", "lineitem_pk_dupes",
      "orders_orphan_cust", "documents_empty_text", "events_bad_type"))
    // the fixture is clean on four checks — but its lineitem generator
    // draws l_linenumber at random, so (l_orderkey, l_linenumber) is NOT
    // unique; the uniqueness expectation must catch exactly that count
    val li = Tables(spark, sfDir).lineitem
    val expectedDupes =
      li.count() - li.select(col("l_orderkey"), col("l_linenumber")).distinct().count()
    assert(expectedDupes > 0) // the check is provably non-vacuous here
    assert(rows("lineitem_pk_dupes") == expectedDupes)
    assert((rows - "lineitem_pk_dupes").values.forall(_ == 0L))
  }

  test("incremental aggregate maintenance: any cutoff folds to the identical view") {
    // the registered query uses the 1999-01-01 cutoff; re-derive the same
    // view from two OTHER split points — partial-merge must be cutoff-invariant
    def viewAt(cutoff: String): Map[String, (Long, Double)] = {
      val o = Tables(spark, sfDir).orders
      def partials(df: org.apache.spark.sql.DataFrame) = df
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("pn"), sum(col("o_totalprice").cast("decimal(18,4)")).as("pv"))
      partials(o.filter(col("o_orderdate") < lit(cutoff).cast("timestamp")))
        .unionByName(partials(o.filter(col("o_orderdate") >= lit(cutoff).cast("timestamp"))))
        .groupBy(col("o_orderpriority"))
        .agg(sum(col("pn")).as("n"), sum(col("pv")).cast("double").as("rev"))
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    }
    val registered = ScaleOps.q113IncrementalAgg.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(registered == viewAt("1996-06-15"))
    assert(registered == viewAt("2000-12-31"))
  }

  test("chi2 keyness: non-negative, and per-source counts sum to the source totals") {
    val rows = TextOps.q114Chi2Keyness.fn(spark, sfDir).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getDouble(3) >= 0.0))
    val bySource = rows.groupBy(_.getString(0)).view
      .mapValues(_.map(_.getLong(2)).sum).toMap
    val truth = Tables(spark, sfDir).documents
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource == truth)
  }

  test("linear interpolation: full spine, bounded between neighbors, exact on observed days") {
    val rows = EventOps.q117LinearInterp.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    byUser.foreach { case (_, days) =>
      val sorted = days.sortBy(_._2)
      // spine completeness: consecutive days, no gaps
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(b._2 == a._2.plusDays(1))
        case _ => ()
      }
      // every interpolated day lies within [min, max] of the two nearest
      // observed values around it
      val obsIdx = sorted.zipWithIndex.filter(_._1._4 == 1L).map(_._2)
      sorted.zipWithIndex.filter(_._1._4 == 0L).foreach { case ((_, _, v, _), i) =>
        val prev = obsIdx.filter(_ < i).lastOption.map(sorted(_)._3)
        val next = obsIdx.find(_ > i).map(sorted(_)._3)
        val bounds = Seq(prev, next).flatten
        assert(bounds.nonEmpty && v >= bounds.min - 1e-9 && v <= bounds.max + 1e-9)
      }
      // boundaries are observed by construction (spine spans min..max day)
      assert(sorted.head._4 == 1L && sorted.last._4 == 1L)
    }
  }

  test("binned range join: identical to the unbinned containment join, and every event maps to at most one window") {
    val binned = EventOps.q119BinRangeJoin.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // brute-force containment (tiny interval side, crossJoin is fine in a test)
    val periods = spark.range(36)
      .select(col("id").as("period_id"),
        (lit(1704067200000000L) + col("id") * lit(72000000000L)).as("ws"))
      .withColumn("we", col("ws") + lit(21600000000L))
    val brute = EventOps.events(spark, sfDir)
      .select(col("value"), unix_micros(col("ts")).as("ts_us"))
      .crossJoin(periods)
      .filter(col("ts_us") >= col("ws") && col("ts_us") < col("we"))
      .groupBy(col("period_id"))
      .agg(count(lit(1)).as("n"),
           sum(col("value").cast("decimal(18,4)")).cast("double").as("tv"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(brute.nonEmpty && binned == brute)
    // windows are disjoint (6h long, 20h apart): totals never double-count
    val totalMatched = binned.values.map(_._1).sum
    val totalEvents = EventOps.events(spark, sfDir).count()
    assert(totalMatched <= totalEvents)
  }

  test("compliance delete: purged + kept conserves every table, cascade is FK-consistent") {
    val rows = ScaleOps.q123ComplianceDelete.fn(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val t = Tables(spark, sfDir)
    assert(rows("customer")._1 + rows("customer")._2 == t.customer.count())
    assert(rows("orders")._1 + rows("orders")._2 == t.orders.count())
    assert(rows("lineitem")._1 + rows("lineitem")._2 == t.lineitem.count())
    assert(rows("customer")._1 > 0, "the md5 gate must select a non-empty forget set")
    // every purged order belongs to a purged customer — no over-deletion
    val forget = t.customer
      .filter(substring(md5(col("c_custkey").cast("string")), 1, 1) === "7")
      .select(col("c_custkey")).collect().map(_.getLong(0)).toSet
    val purgedOrders = t.orders
      .filter(col("o_custkey").isin(forget.toSeq: _*)).count()
    assert(rows("orders")._1 == purgedOrders)
  }

  test("mad outliers: medians inside the value range, outliers a small robust tail") {
    val rows = Analytics.q124MadOutliers.fn(spark, sfDir).collect()
    assert(rows.length == 5)
    val (mn, mx) = {
      val r = EventOps.events(spark, sfDir).agg(min(col("value")), max(col("value"))).head()
      (r.getDouble(0), r.getDouble(1))
    }
    rows.foreach { r =>
      assert(r.getDouble(1) >= mn && r.getDouble(1) <= mx) // med in range
      assert(r.getDouble(2) >= 0.0)                        // MAD non-negative
      assert(r.getLong(3) >= 0)
    }
    // by construction at least half of each group is within 1 MAD, so the
    // 5-MAD tail can never reach half the group
    val sizes = EventOps.events(spark, sfDir).groupBy(col("event_type")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(r.getLong(3) < sizes(r.getString(0)) / 2))
  }

  test("scd2: per-user intervals chain exactly (each valid_to = next valid_from) with one open row") {
    val byUser = ScaleOps.q108Scd2Intervals.fn(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
      .groupBy(_._1)
    assert(byUser.nonEmpty)
    byUser.foreach { case (_, rows) =>
      val chain = rows.sortBy(_._2)
      // exactly one current (open-ended) row per user, and it is the last
      assert(chain.count(_._3.isEmpty) == 1)
      assert(chain.last._3.isEmpty)
      // consecutive intervals are adjacent, never overlapping or gapped
      chain.sliding(2).foreach {
        case Array((_, _, Some(to)), (_, from, _)) => assert(to == from)
        case _ => ()
      }
    }
  }
}
