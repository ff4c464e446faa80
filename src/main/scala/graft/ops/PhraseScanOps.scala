package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.functions.ScanFunctions

/** Phrase-scan wave: the multi-pattern denylist audit, driven by the
  * new Aho–Corasick `multi_contains` expression — the production shape
  * for boilerplate/denylist phrase detection over a 100 TB text corpus,
  * where one automaton walk per document replaces N re-scans.
  *
  * Scale shape: one codegen'd pass over documents emits the per-doc
  * match set; everything downstream is a (pattern × source)-sized
  * frame. The DuckDB oracle deliberately runs the other algorithm — a
  * contains() theta-join of documents × patterns — so the automaton is
  * cross-checked against a naive scan, not against itself.
  */
object PhraseScanOps {

  /** The 24-phrase boilerplate list this corpus actually exhibits. */
  val phrases: Seq[String] = Seq(
    "hash join", "merge sort", "slow query", "fast scan", "table scan",
    "stream join", "key column", "row group", "sort merge", "window agg",
    "big table", "data stream", "scan filter", "vector batch",
    "small part", "order key", "query column", "spark table",
    "line customer", "filter row", "slow stream", "batch data",
    "group order", "column part")

  /** Per-phrase hit census: how many documents (and sources) contain
    * each denylist phrase, with the share of the corpus it taints and
    * a rank. Every match decision comes from the single-pass automaton;
    * the phrase string is recovered from the matched index via a
    * literal array lookup so the output is self-describing. */
  val q394PhraseScan: QueryDef = QueryDef(
    "q394_phrase_scan",
    (s, dir) => {
      val d = Tables(s, dir).documents
      val nDocs = d.count()
      val patArr = array(phrases.map(lit): _*)
      val hits = d
        .select(col("doc_id"), col("source"),
          explode(ScanFunctions.multi_contains(col("text"), phrases))
            .as("idx"))
        .withColumn("phrase", element_at(patArr, col("idx") + 1))
      hits.groupBy(col("phrase"))
        .agg(count(lit(1)).cast("long").as("n_docs"),
          countDistinct(col("source")).cast("long").as("n_sources"))
        .withColumn("doc_share",
          round(col("n_docs").cast("double") / lit(nDocs.toDouble), 6))
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n_docs").desc, col("phrase"))).cast("long"))
        .select(col("phrase"), col("n_docs"), col("n_sources"),
          col("doc_share"), col("rank"))
        .orderBy(col("rank"))
    },
    Some(s"""WITH pats(phrase) AS (VALUES
        ${phrases.map(p => s"('$p')").mkString(", ")}),
      hits AS (SELECT d.doc_id, d.source, p.phrase
        FROM documents d JOIN pats p ON contains(d.text, p.phrase)),
      agg AS (SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_docs,
          CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
        FROM hits GROUP BY 1)
      SELECT phrase, n_docs, n_sources,
        round(CAST(n_docs AS DOUBLE) /
          (SELECT COUNT(*) FROM documents), 6) AS doc_share,
        CAST(ROW_NUMBER() OVER (ORDER BY n_docs DESC, phrase) AS BIGINT)
          AS rank
      FROM agg ORDER BY rank"""))

  val all: Seq[QueryDef] = Seq(q394PhraseScan)
}
