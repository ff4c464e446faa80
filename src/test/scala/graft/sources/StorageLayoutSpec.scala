package graft.sources

import graft.SparkTestBase
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** Storage-layout features a 1000-executor deployment leans on: bucketed
  * tables that co-locate join keys at WRITE time (the join then plans
  * with no exchange on either side), and hive-style partitioned layouts
  * whose directory predicates never reach the row scan. Local-mode tests
  * assert the PLAN shape — the property that transfers to the cluster.
  */
class StorageLayoutSpec extends SparkTestBase {

  private def fresh(name: String): String = {
    val dir = new java.io.File(s"/tmp/graft_layout/$name")
    org.apache.commons.io.FileUtils.deleteQuietly(dir)
    dir.getParentFile.mkdirs()
    dir.toString
  }

  test("bucketed tables join WITHOUT an exchange on either side") {
    val o = Tables(spark, sfDir).orders
    val l = Tables(spark, sfDir).lineitem
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", fresh("b_orders")).saveAsTable("b_orders")
    l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", fresh("b_lineitem")).saveAsTable("b_lineitem")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the shuffle path
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ in:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle either side:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), s"expected bucketed scan in:\n$plan")
      // and the co-located join is still CORRECT
      val expected = o.join(l, col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("hive-partitioned layout prunes partitions at planning time") {
    val dir = fresh("part_docs")
    Tables(spark, sfDir).documents.write.partitionBy("lang").parquet(dir)
    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    val formatted = en.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // the lang predicate must be a PartitionFilter (directory pruning),
    // never a data filter evaluated per row
    assert(formatted.contains("PartitionFilters") &&
      formatted.replaceAll("\\s+", " ").matches("(?s).*PartitionFilters: \\[[^\\]]*lang[^\\]]*\\].*"),
      s"expected lang in PartitionFilters:\n$formatted")
    val expected = Tables(spark, sfDir).documents.filter(col("lang") === "en").count()
    assert(en.count() == expected && expected > 0)
  }
}
