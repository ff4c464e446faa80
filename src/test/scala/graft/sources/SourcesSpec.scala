package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Source/sink surface (§2E rows 1-4): JSON-map decode, idempotent
  * overwrite, csv/json roundtrips. */
class SourcesSpec extends SparkTestBase {

  test("jsonMapColumn decodes the args JSON into a typed map view") {
    import spark.implicits._
    val df = Seq(
      ("j1", """{"email":"foo@example.com","age":"30"}"""),
      ("j2", """{"org/id":"123"}"""),
      ("j3", null)).toDF("id", "args")
    val out = Sources.jsonMapColumn(df, "args", "args_map")
      .select(col("id"), element_at(col("args_map"), "email").as("email"),
              map_keys(col("args_map")).as("ks"))
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("j1").contains("foo@example.com"))
    assert(out("j2").isEmpty && out("j3").isEmpty)
  }

  test("idempotent overwrite: retrying a write yields the same content, not duplicates") {
    val t = graft.ops.Tables(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("sink").toString + "/result"
    val df = t.nation.select(col("n_nationkey"), col("n_name"))
    Sources.idempotentWrite(df, out)
    val first = spark.read.parquet(out).count()
    Sources.idempotentWrite(df, out) // the fault-retry re-execution
    val second = spark.read.parquet(out).count()
    assert(first == second && second == t.nation.count())
  }

  test("partitioned idempotent write prunes partitions on read") {
    val t = graft.ops.Tables(spark, sfDir)
    val out = java.nio.file.Files.createTempDirectory("sinkp").toString + "/by_flag"
    Sources.idempotentWrite(t.lineitem.select(col("l_orderkey"), col("l_returnflag")),
      out, partitionBy = Seq("l_returnflag"))
    val one = spark.read.parquet(out).filter(col("l_returnflag") === "R")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"), plan)
    assert(one.count() > 0)
  }

  test("csv and json roundtrip through the generic reader surface") {
    val t = graft.ops.Tables(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("fmt").toString
    val df = t.region
    df.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    df.write.mode("overwrite").json(s"$base/json")
    val backCsv = spark.read.option("header", "true").option("inferSchema", "true").csv(s"$base/csv")
    val backJson = spark.read.json(s"$base/json")
    assert(backCsv.count() == df.count() && backJson.count() == df.count())
    assert(backJson.select("r_name").except(df.select("r_name")).isEmpty)
  }

  test("orc roundtrip preserves schema and pushes filters to the scan") {
    val t = graft.ops.Tables(spark, sfDir)
    val base = java.nio.file.Files.createTempDirectory("orc").toString
    val df = t.orders
    df.write.mode("overwrite").orc(s"$base/orc")
    val back = spark.read.orc(s"$base/orc")
    assert(back.schema == df.schema, "ORC did not preserve the schema")
    assert(back.count() == df.count())
    val filtered = back.filter(col("o_totalprice") > 100000.0)
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"),
      s"ORC scan did not push the price filter:\n${plan.take(1500)}")
    assert(filtered.count() ==
      t.orders.filter(col("o_totalprice") > 100000.0).count())
  }

  test("bucketed tables co-locate the join: no Exchange between bucketed sides") {
    // THE 100 TB join shape: pre-bucket both fact tables on the join key
    // so the shuffle happens once at write time and every subsequent join
    // is Exchange-free. Spark buckets via saveAsTable; assert the join of
    // the two bucketed tables plans with zero shuffle exchanges.
    val t = graft.ops.Tables(spark, sfDir)
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Sources.bucketedWrite(t.lineitem, "bkt_lineitem", "l_orderkey", 8)
      Sources.bucketedWrite(t.orders, "bkt_orders", "o_orderkey", 8)
      val joined = Sources.bucketedRead(spark, "bkt_lineitem")
        .join(Sources.bucketedRead(spark, "bkt_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(1200))
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n${joinSection.take(1500)}")
      // same answer as the plain (shuffled) join
      val plain = t.lineitem.join(t.orders,
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(
          org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("real JDBC roundtrip: jobs snapshot to an embedded Derby table and back") {
    import spark.implicits._
    // the reference's store IS a JDBC database (overseer_jobs); Derby is
    // the JDBC engine that ships with Spark, so the source/sink path gets
    // exercised end-to-end, not just at the API level
    val url = "jdbc:derby:memory:graftjdbc;create=true"
    val jobs = Seq(
      ("j1", "ingest", 0, 1700000000L),
      ("j2", "enrich", 1, 1700000060L),
      ("j3", "report", 2, 1700000120L)
    ).toDF("id", "job_type", "status", "heartbeat")
    Sources.jdbcWrite(jobs, url, "overseer_jobs")
    val back = Sources.jdbc(spark, url, "overseer_jobs")
    assert(back.count() == 3)
    assert(back.schema.fieldNames.map(_.toLowerCase).toSet ==
      Set("id", "job_type", "status", "heartbeat"))
    // predicate pushdown reaches the JDBC source: the filter appears in
    // the scan's pushed-filter list rather than a post-scan Filter-only plan
    val started = Sources.jdbc(spark, url, "overseer_jobs").filter(col("status") === 1)
    assert(started.count() == 1)
    val scanDesc = started.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PushedFilters") && scanDesc.contains("status"), scanDesc.take(800))
  }
}
