package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{MapType, StringType}

/** Source/sink surface (SURVEY.md §2E rows 1-4). */
object Sources {

  /** Parquet scan — Catalyst pushes filters/projection into the scan. */
  def parquet(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)

  /** JDBC source — the reference's stores are MySQL/H2/SQLite (api.clj:25-33).
    * Partitioned reads: `partitionColumn`+bounds shard the table across
    * executors. (No JDBC driver ships in this container; exercised only at
    * the API level.) */
  def jdbc(spark: SparkSession, url: String, table: String,
           props: Map[String, String] = Map.empty): DataFrame = {
    val reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    props.foldLeft(reader) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  def jdbcWrite(df: DataFrame, url: String, table: String,
                props: Map[String, String] = Map.empty): Unit = {
    val writer = df.write.format("jdbc").option("url", url).option("dbtable", table)
    props.foldLeft(writer) { case (w, (k, v)) => w.option(k, v) }.mode("append").save()
  }

  /** JSON-string column → map view (the reference's EDN args/failure
    * columns, jdbc.clj:33-34; we standardize on JSON — SURVEY.md §1.3). */
  def jsonMapColumn(df: DataFrame, column: String, as: String): DataFrame =
    df.withColumn(as, from_json(col(column), MapType(StringType, StringType)))

  /** Idempotent overwrite sink: deterministic path + overwrite mode, so a
    * fault-retried handler rewrites the same result instead of duplicating
    * it (the reference's idempotency contract,
    * doc/guide/BasicGraphsHandlers.md "Important!"). */
  def idempotentWrite(df: DataFrame, path: String, partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Bucketed + sorted layout sink: the 100 TB co-location primitive.
    * Writing both sides of a recurring join bucketed (same column, same
    * count) lets every subsequent join or aggregation on that key run
    * WITHOUT a shuffle — the scan's output partitioning already satisfies
    * the join's distribution requirement, so Exchange disappears from the
    * plan (asserted in SourcesSpec). Bucketing requires the table catalog
    * (`saveAsTable`); plain `.parquet(path)` cannot carry bucket metadata. */
  def bucketedWrite(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Read a bucketed table back with its bucket spec intact. */
  def bucketedRead(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
