package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL source/sink leg — the interchange format every LLM corpus
  * actually ships as. The query materializes the documents table as
  * newline-delimited JSON (an idempotent overwrite sink), then reads it
  * back as a SCHEMA-ON-READ source (explicit StructType — never inferred:
  * schema inference is a full extra pass at 100 TB) and aggregates the
  * roundtripped rows; the oracle computes the same aggregate from the
  * parquet table, so the sink→source roundtrip itself is what is being
  * certified (reference: overseer's ETL/ingest family,
  * doc/guide/Introduction.md:3; sources/Sources.scala holds the
  * parquet/JDBC legs and the idempotent-sink contract).
  *
  * Scale shape: one distributed write + one distributed scan; the JSON
  * reader is given the schema AND only the projected columns survive —
  * Spark prunes JSON parsing per-field. Aggregation is one hash agg.
  *
  * Exactness: counts/sums BIGINT over lossless roundtripped longs;
  * strings roundtrip verbatim (min/max lang as the order-free probes).
  */
object JsonlSourceOps {

  val q554JsonlRoundtrip: QueryDef = QueryDef(
    "q554_jsonl_roundtrip",
    (s, dir) => {
      val path = s"/tmp/graft_jsonl_${dir.replaceAll("[^A-Za-z0-9]", "_")}"
      Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .write.mode("overwrite").json(path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("lang", StringType),
        StructField("source", StringType), StructField("n_chars", LongType)))
      s.read.schema(schema).json(path)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("sum_doc_id"),
          min(col("source")).as("min_source"),
          max(col("source")).as("max_source"))
        .orderBy(col("lang"))
    },
    Some("""SELECT lang,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
        MIN(source) AS min_source,
        MAX(source) AS max_source
      FROM documents GROUP BY 1 ORDER BY 1"""))

  val all: Seq[QueryDef] = Seq(q554JsonlRoundtrip)
}
