package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Exact duplicated-span detection by sorted shingles — the
  * "suffix-array-lite" audit behind substring-level dedup (Lee et al.
  * 2022's exact-substring pass, done with relational operators): a
  * document position starts a duplicated span iff its w-token shingle
  * occurs elsewhere in the corpus, and a RUN of consecutive duplicated
  * positions of length L certifies a duplicated span of L + w − 1
  * tokens. Per doc the audit reports the longest such span — the number
  * an exact-substring deduper uses to decide cut points, and the
  * long-tail histogram a corpus owner reads before turning that deduper
  * on.
  *
  * Scale shape: the shingle explode is one projection of the token scan
  * (corpus-linear, no state); duplicate marking shuffles BY SHINGLE — the
  * same partitioning a distributed suffix sort uses, and the only
  * corpus-sized shuffle here (the window's count-over-shingle needs no
  * sort within groups beyond the hash partition). Runs are a per-doc
  * gaps-and-islands window (shuffle by doc), output is top-20 rows.
  * At 100 TB the shingle shuffle is the cost — exactly the cost
  * published exact-substring dedup pays (suffix-array construction),
  * with hash-partitioning standing in for the sort.
  *
  * Exactness: shingles are single-space token joins (split/string_split
  * agree on the single-space corpus); runs are offset-invariant
  * (pos − row_number), counts BIGINT; top-20 is (span DESC, doc_id ASC)
  * tie-broken.
  */
object SuffixDupOps {

  private val W = 8 // shingle width in tokens

  val q492DupSpans: QueryDef = QueryDef(
    "q492_dup_spans",
    (s, dir) => {
      val sh = Tables(s, dir).documents
        .withColumn("ts", split(col("text"), " "))
        .filter(size(col("ts")) >= W)
        .select(col("doc_id"), col("source"),
          posexplode(expr(
            s"transform(sequence(1, size(ts) - ${W - 1}), " +
              s"i -> concat_ws(' ', slice(ts, i, $W)))")))
        .select(col("doc_id"), col("source"), col("pos"), col("col").as("sh"))
      val wSh = Window.partitionBy(col("sh"))
      val marked = sh
        .withColumn("occ", count(lit(1)).over(wSh))
        .filter(col("occ") > 1)
        .select(col("doc_id"), col("source"), col("pos"))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      marked
        .withColumn("grp", col("pos") - row_number().over(wDoc))
        .groupBy(col("doc_id"), col("source"), col("grp"))
        .agg((count(lit(1)) + lit((W - 1).toLong)).as("span"))
        .groupBy(col("doc_id"), col("source"))
        .agg(max(col("span")).as("max_dup_span"),
          count(lit(1)).as("n_dup_runs"))
        .orderBy(col("max_dup_span").desc, col("doc_id").asc)
        .limit(20)
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, source, string_split(text, ' ') AS ts FROM documents),
      sh AS (
        SELECT doc_id, source, i AS pos,
          array_to_string(ts[i:i + ${W - 1}], ' ') AS s
        FROM toks, unnest(generate_series(1, len(ts) - ${W - 1})) AS u(i)
        WHERE len(ts) >= $W),
      marked AS (
        SELECT doc_id, source, pos
        FROM (SELECT doc_id, source, pos,
                COUNT(*) OVER (PARTITION BY s) AS occ
              FROM sh)
        WHERE occ > 1),
      runs AS (
        SELECT doc_id, source,
          pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
        FROM marked)
      SELECT doc_id, source,
        CAST(MAX(span) AS BIGINT) AS max_dup_span,
        CAST(COUNT(*) AS BIGINT) AS n_dup_runs
      FROM (SELECT doc_id, source, grp,
              COUNT(*) + ${W - 1} AS span
            FROM runs GROUP BY 1, 2, 3)
      GROUP BY 1, 2
      ORDER BY max_dup_span DESC, doc_id ASC
      LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(q492DupSpans)
}
