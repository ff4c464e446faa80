package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Reshaping / sampling / string-distance operators. */
object Reshape {

  private val M = DecimalType(18, 4)

  /** Pivot: event counts per user × event-type. Oracle is written as
    * portable conditional aggregation (same result as PIVOT). */
  val q43Pivot: QueryDef = QueryDef(
    "q43_pivot",
    (s, dir) => EventOps.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("click"), col("view"), col("purchase"),
              col("signup"), col("error")),
    Some("""SELECT user_id,
      COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      COUNT(*) FILTER (WHERE event_type = 'view') AS "view",
      COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      COUNT(*) FILTER (WHERE event_type = 'error') AS "error"
      FROM events GROUP BY 1"""))

  /** Deterministic hash sampling: identical md5 digests mean identical
    * samples in every engine — reproducible splits for train/eval, unlike
    * rand()-based sampling. Keeps ~1/16 of orders (md5 prefix '0'). */
  val q44HashSample: QueryDef = QueryDef(
    "q44_hash_sample",
    (s, dir) => Tables(s, dir).orders
      .filter(substring(md5(col("o_orderkey").cast("string")), 1, 1) === "0")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'"""))

  /** Stratified training-mix sampling: per-language keep rates applied with
    * the same deterministic md5 gate as q44 — the standard rebalancing step
    * before corpus assembly (downsample the dominant language, keep the
    * tail). en keeps 4/16, zh/es 8/16, everything else all — and because
    * the gate is a pure hash of the row key, the sample is reproducible
    * across engines, runs, AND partitionings: a pure filter pushed at the
    * scan, no shuffle, no rand(). */
  val q77StratifiedSample: QueryDef = QueryDef(
    "q77_stratified_sample",
    (s, dir) => Tables(s, dir).documents
      .filter(
        conv(substring(md5(col("doc_id").cast("string")), 1, 1), 16, 10).cast("int") <
          when(col("lang") === "en", lit(4))
            .when(col("lang").isin("zh", "es"), lit(8))
            .otherwise(lit(16)))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
    Some("""SELECT doc_id, lang, source, n_chars FROM documents
      WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 1))::INT <
        CASE WHEN lang = 'en' THEN 4 WHEN lang IN ('zh', 'es') THEN 8 ELSE 16 END"""))

  /** Keep-latest-per-key dedup (window row_number): each user's most recent
    * event — the event-sourced "current state" view (SURVEY.md §7: FSM
    * snapshot = last transition per job id). */
  val q45LatestPerKey: QueryDef = QueryDef(
    "q45_latest_per_key",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      EventOps.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"),
                col("event_type"))
    },
    Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events) WHERE rn = 1"""))

  /** Edit distance (levenshtein) between short documents in one language
    * block — the character-level near-dup measure complementing token
    * Jaccard. */
  val q46EditDistance: QueryDef = QueryDef(
    "q46_edit_distance",
    (s, dir) => {
      val d = Tables(s, dir).documents
        .filter(col("doc_id") < 120 && col("n_chars") < 200)
        .select(col("doc_id"), col("lang"), substring(col("text"), 1, 80).as("head"))
      val a = d.select(col("lang"), col("doc_id").as("id_a"), col("head").as("head_a"))
      val b = d.select(col("lang"), col("doc_id").as("id_b"), col("head").as("head_b"))
      a.join(b, Seq("lang")).filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("head_a"), col("head_b")).cast("long"))
        .filter(col("dist") <= 55)
        .select(col("id_a"), col("id_b"), col("dist"))
    },
    Some("""WITH d AS (SELECT doc_id, lang, substr(text, 1, 80) AS head
        FROM documents WHERE doc_id < 120 AND n_chars < 200)
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
      FROM d a JOIN d b ON a.lang = b.lang AND a.doc_id < b.doc_id
      WHERE levenshtein(a.head, b.head) <= 55"""))

  /** Regex group extraction over semi-structured text. */
  val q47RegexExtract: QueryDef = QueryDef(
    "q47_regex_extract",
    (s, dir) => Tables(s, dir).part
      .select(
        col("p_partkey"),
        regexp_extract(col("p_type"), "^(\\w+)", 1).as("type_head"),
        regexp_extract(col("p_brand"), "(\\d+)", 1).as("brand_num"),
        (regexp_extract(col("p_name"), "(\\w+)$", 1)).as("name_tail")),
    Some("""SELECT p_partkey,
      regexp_extract(p_type, '^(\w+)', 1) AS type_head,
      regexp_extract(p_brand, '(\d+)', 1) AS brand_num,
      regexp_extract(p_name, '(\w+)$', 1) AS name_tail
      FROM part"""))

  /** Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    * each doc draws key = ln(u)/w from a DETERMINISTIC md5-derived uniform
    * u ∈ (0,1] and weight w = n_chars; the top-50 keys ARE a weighted
    * sample without replacement. Unlike rand()-based sampling this is
    * reproducible across engines, runs, and partitionings, and the plan
    * is one scan + TakeOrdered (no shuffle of the full table, no driver
    * loop) — the standard way to draw a size-capped weighted corpus
    * sample at 100 TB. u is built from the first 15 md5 hex digits (60
    * bits), +1 so ln never sees 0.
    */
  val q112WeightedSample: QueryDef = QueryDef(
    "q112_weighted_sample",
    (s, dir) => Tables(s, dir).documents
      .withColumn("u",
        (conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
          .cast("double") + 1.0) / 1152921504606846976.0)
      .withColumn("es_key", log(col("u")) / col("n_chars"))
      .orderBy(col("es_key").desc, col("doc_id").asc)
      .limit(50)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
    Some("""SELECT doc_id, lang, source, n_chars FROM (
        SELECT *, ln((('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                      + 1.0) / 1152921504606846976.0) / n_chars AS es_key
        FROM documents)
      ORDER BY es_key DESC, doc_id ASC LIMIT 50"""))

  /** Deterministic train/validation/test holdout split (90/5/5) keyed on
    * md5(doc_id) — the split every training pipeline needs to be STABLE
    * across reruns, engines, and partitionings (no rand(), no
    * row_number over arbitrary order). A document's split is a pure
    * function of its id, so incremental corpus additions never reshuffle
    * existing assignments. One linear pass + one hash agg; the q112/q44
    * md5-uniform idiom.
    */
  val q136HoldoutSplit: QueryDef = QueryDef(
    "q136_holdout_split",
    (s, dir) => Tables(s, dir).documents
      .withColumn("bucket",
        pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long"), lit(100)))
      .withColumn("split",
        when(col("bucket") < 90, "train")
          .when(col("bucket") < 95, "validation")
          .otherwise("test"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("n_chars")),
    Some("""WITH b AS (SELECT lang, n_chars,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100
            AS bucket
        FROM documents)
      SELECT CASE WHEN bucket < 90 THEN 'train'
                  WHEN bucket < 95 THEN 'validation'
                  ELSE 'test' END AS split,
        lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM b GROUP BY 1, 2"""))

  val all: Seq[QueryDef] = Seq(q43Pivot, q44HashSample, q45LatestPerKey,
    q46EditDistance, q47RegexExtract, q77StratifiedSample, q112WeightedSample,
    q136HoldoutSplit)
}
