package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Salted-join equivalence, bucketed-join shuffle elimination, and
  * plan-shape guards (pushdown / broadcast / partial-agg / top-k) — the
  * properties that make these operators survive a 100 TB scale-up. */
class JoinsSpec extends SparkTestBase {

  test("salted join returns exactly the plain join's rows under skew") {
    val t = Tables(spark, sfDir)
    // skew the fact side: nationkey is low-cardinality (25 values)
    val big = t.customer.select(col("c_nationkey").as("nationkey"), col("c_custkey"))
    val small = t.nation.select(col("n_nationkey").as("nationkey"), col("n_name"))
    val plain  = big.join(small, Seq("nationkey")).select("nationkey", "c_custkey", "n_name")
    val salted = Joins.saltedJoin(big, small, "nationkey", saltBuckets = 8)
      .select("nationkey", "c_custkey", "n_name")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("warehouse").toString
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    val t = Tables(s2, sfDir)
    t.orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/orders_b").mode("overwrite").saveAsTable("orders_b")
    t.lineitem.withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/lineitem_b").mode("overwrite").saveAsTable("lineitem_b")
    val joined = s2.table("orders_b").join(s2.table("lineitem_b"), Seq("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("filters and projections are pushed into the parquet scan") {
    val df = Tables(spark, sfDir).lineitem
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)]"),
      s"missing pushdown:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"column pruning failed:\n$scan")
  }

  test("dimension joins broadcast; top-k plans as TakeOrderedAndProject") {
    val q3 = Relational.q03RevenueByNation.fn(spark, sfDir)
    assert(q3.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"))
    val q2 = Relational.q02TopOrders.fn(spark, sfDir)
    assert(q2.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("aggregations run partial (map-side) before the shuffle") {
    val q1 = Relational.q01PricingSummary.fn(spark, sfDir)
    val plan = q1.queryExecution.executedPlan.toString
    // two HashAggregate levels around one Exchange = partial + final
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
  }

  test("repartitionByRange plans RangePartitioning (sorted layout for writes)") {
    val df = Tables(spark, sfDir).lineitem
      .repartitionByRange(8, col("l_shipdate"))
      .sortWithinPartitions(col("l_shipdate"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(l_shipdate"), plan)
    assert(df.count() > 0)
  }

  test("outer joins and arg-min/max queries return rows at sf0.001") {
    assert(Joins.q39OuterJoin.fn(spark, sfDir).count() > 0)
    val mm = Joins.q41MinMaxBy.fn(spark, sfDir).collect()
    assert(mm.nonEmpty)
    mm.foreach(r => assert(r.getDouble(3) >= r.getDouble(4))) // max_bal >= min_bal
  }

  test("corpus pipeline verifies candidates with the codegen merge-count over a banded join") {
    val df = Pipelines.q57CorpusPipeline.fn(spark, sfDir)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    // guards against silent regression to interpreted array_intersect or
    // back to an all-pairs per-language scan (band_hash is the high-
    // cardinality candidate key; its absence would mean the banding died)
    assert(plan.toLowerCase.contains("sortedintersectcount"), plan.take(2000))
    assert(plan.contains("band_hash"), plan.take(2000))
    assert(!plan.contains("sala"), plan.take(2000))
  }

  test("fuzzy join: bucket blocking finds the identical best match as the unblocked scan") {
    val fast = Joins.q115FuzzyJoin.fn(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val d = Tables(spark, sfDir).documents
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
              substring(col("text"), 1, 80).as("head"))
    val brute = d.filter(col("source") === "src0")
      .select(col("lang"), col("doc_id").as("id_a"), col("n_chars").as("la"),
              col("head").as("ha"))
      .join(d.filter(col("source") =!= "src0")
        .select(col("lang"), col("doc_id").as("id_b"), col("n_chars").as("lb"),
                col("head").as("hb")), Seq("lang"))
      .filter(abs(col("la") - col("lb")) <= 40) // the contract's band, NO buckets
      .withColumn("dist", levenshtein(col("ha"), col("hb")).cast("long"))
      .groupBy(col("id_a"))
      .agg(min(struct(col("dist"), col("id_b"))).as("m"))
      .select(col("id_a"), col("m.id_b"), col("m.dist"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(brute.nonEmpty)
    assert(fast == brute) // ±1 bucket explode covers the whole band
  }

  test("table stats: exact NDV/null/min-max agree with direct per-column queries") {
    val rows = Analytics.q116TableStats.fn(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(rows.size == 10)
    val o = Tables(spark, sfDir).orders
    val expected = (
      o.count(),
      o.select(col("o_custkey")).distinct().count(),
      0L,
      o.agg(min(col("o_custkey"))).head().getLong(0).toDouble,
      o.agg(max(col("o_custkey"))).head().getLong(0).toDouble)
    assert(rows(("orders", "o_custkey")) == expected)
    // invariants across every column: ndv ≤ n_values, nulls ≥ 0, min ≤ max
    rows.values.foreach { case (n, ndv, nulls, mn, mx) =>
      assert(ndv <= n && nulls >= 0 && mn <= mx)
    }
  }
}
