package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Build a larger scale factor from the driver-generated testdata by
  * replicating fact tables N× with disjoint key ranges (dimension tables
  * are carried over unchanged — TPC-H-style fact scaling). Used for the
  * sf1 scale experiment recorded in BASELINE.md: the point is to measure
  * how the registered plans behave at 10× the driver's largest SF, with
  * workload shape preserved:
  *
  *  - every fact key is offset by copy × (max_key + 1), so copies are
  *    disjoint but foreign keys into the unchanged dimensions still land
  *  - documents/embeddings copies keep their text/vectors, so each row
  *    gains 9 exact twins — dedup operators (q26/q28/q57/q74) see cluster
  *    sizes grow, candidate structure intact (a heavy-dup crawl corpus)
  *  - part's implicit binary tree (child → child div 2, q21) stays rooted
  *    at 1 and simply deepens — closure work scales with the key space
  *  - events keep timestamps; user_id/event_id are offset, so sessions and
  *    as-of structure replicate per copy
  *
  * Usage: runMain graft.ScaleGen <srcDir> <outDir> <copies>
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesStr) = args.take(3)
    val copies = copiesStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def write(df: DataFrame, name: String): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[scalegen] wrote $name")
    }

    /** N× the rows; each copy's `keys` shifted into a disjoint range. */
    def replicate(df: DataFrame, keys: Seq[String]): DataFrame = {
      val spans = keys.map { k =>
        k -> (df.agg(max(col(k))).head().getLong(0) + 1L)
      }
      val copied = df.crossJoin(
        broadcast(spark.range(copies).select(col("id").as("__copy"))))
      keys.foldLeft(copied) { case (d, k) =>
        d.withColumn(k, col(k) + col("__copy") * lit(spans.toMap.apply(k)))
      }.drop("__copy")
    }

    val t = graft.ops.Tables(spark, src)
    Seq("region" -> t.region, "nation" -> t.nation, "customer" -> t.customer,
        "supplier" -> t.supplier).foreach { case (n, df) => write(df, n) }

    write(replicate(t.part, Seq("p_partkey")), "part")
    write(replicate(t.orders, Seq("o_orderkey")), "orders")
    write(replicate(t.lineitem, Seq("l_orderkey")), "lineitem")
    write(replicate(t.documents, Seq("doc_id")), "documents")
    write(replicate(t.embeddings, Seq("vec_id")), "embeddings")

    // events.parquet stores TIMESTAMP(NANOS); read raw as long nanos and
    // write the BIGINT column straight back — EventOps.events handles both
    // physical types identically (ts div 1000 → µs)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$src/events.parquet")
    write(replicate(ev, Seq("event_id", "user_id")), "events")

    println(s"[scalegen] done: $out = $copies x $src")
    spark.stop()
  }
}
