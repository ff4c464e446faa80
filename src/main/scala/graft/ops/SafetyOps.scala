package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Safety-audit wave: prompt-injection and credential-leak scanning —
  * the contamination checks a 2025-era training corpus runs beside PII
  * redaction (q97): instruction-like text that poisons instruction
  * following, and high-entropy secrets that must never reach a model.
  *
  * Scale shape: one projection pass, three boolean columns, one
  * aggregation per source — entirely narrow until the final group-by.
  */
object SafetyOps {

  private val injectionPhrases = Seq(
    "ignore previous instructions", "disregard the above",
    "you are now", "system prompt")

  /** The per-doc rule projection, exposed so the spec can run it over
    * synthetic positives. LIKE/regexp classes are restricted to the
    * portable subset both engines match identically. */
  def injectionCol(text: Column): Column =
    injectionPhrases.map(p => lower(text).contains(p)).reduce(_ || _)
  def hexSecretCol(text: Column): Column = lower(text).rlike("[a-f0-9]{32}")
  def b64SecretCol(text: Column): Column = text.rlike("[A-Za-z0-9+/]{40}")

  /** Prompt-injection & secret-leak audit per source: how many docs
    * carry instruction-hijack phrasing, 32+-hex-digit runs (API keys,
    * auth digests), or 40+-char base64 runs (tokens, private keys) —
    * with the per-source clean rate. On this corpus the scan is a
    * NEGATIVE CONTROL (the spec proves the rules fire on synthetic
    * positives, the q356 pattern): the audit's value is the
    * all-clear certificate per shipped source. */
  val q379InjectionScan: QueryDef = QueryDef(
    "q379_injection_scan",
    (s, dir) => Tables(s, dir).documents
      .select(col("source"),
        injectionCol(col("text")).cast("long").as("inj"),
        hexSecretCol(col("text")).cast("long").as("hex"),
        b64SecretCol(col("text")).cast("long").as("b64"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("inj")).as("n_injection"),
        sum(col("hex")).as("n_hex_secret"),
        sum(col("b64")).as("n_b64_secret"))
      .withColumn("clean_rate", round(
        (col("n_docs") - greatest(col("n_injection"),
          col("n_hex_secret"), col("n_b64_secret"))).cast("double") /
          col("n_docs"), 6))
      .orderBy(col("source")),
    Some("""SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN lower(text) LIKE '%ignore previous instructions%'
          OR lower(text) LIKE '%disregard the above%'
          OR lower(text) LIKE '%you are now%'
          OR lower(text) LIKE '%system prompt%' THEN 1 ELSE 0 END) AS BIGINT) AS n_injection,
        CAST(SUM(CASE WHEN regexp_matches(lower(text), '[a-f0-9]{32}')
          THEN 1 ELSE 0 END) AS BIGINT) AS n_hex_secret,
        CAST(SUM(CASE WHEN regexp_matches(text, '[A-Za-z0-9+/]{40}')
          THEN 1 ELSE 0 END) AS BIGINT) AS n_b64_secret,
        round(CAST(COUNT(*) - greatest(
            SUM(CASE WHEN lower(text) LIKE '%ignore previous instructions%'
              OR lower(text) LIKE '%disregard the above%'
              OR lower(text) LIKE '%you are now%'
              OR lower(text) LIKE '%system prompt%' THEN 1 ELSE 0 END),
            SUM(CASE WHEN regexp_matches(lower(text), '[a-f0-9]{32}') THEN 1 ELSE 0 END),
            SUM(CASE WHEN regexp_matches(text, '[A-Za-z0-9+/]{40}') THEN 1 ELSE 0 END))
          AS DOUBLE) / COUNT(*), 6) AS clean_rate
      FROM documents GROUP BY source
      ORDER BY source"""))

  val all: Seq[QueryDef] = Seq(q379InjectionScan)
}
