package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Jaro-Winkler blocked linkage — the string-similarity half of the
  * record-linkage family (q115's levenshtein join is the edit-distance
  * half, q296's Fellegi-Sunter the decision model; reference: overseer's
  * ETL/reports family, doc/guide/Introduction.md:3). For every distinct
  * part name, find its most CONFUSABLE catalog neighbor: the other name
  * with the highest Jaro-Winkler similarity inside its blocking bucket —
  * the data-quality audit a catalog keeps to catch near-identical
  * entries before they split demand histories.
  *
  * Scale shape: names are DISTINCT-deduped first (the name census is
  * orders of magnitude smaller than the row count), pairs exist only
  * WITHIN a block (first 2 chars — the standard linkage blocking key;
  * q353 audits exactly this recall/reduction tradeoff), and the
  * per-name argmax is a window over block-bounded candidates. The JW
  * call itself is a plain JVM function on blocked pairs — never
  * corpus × corpus.
  *
  * Exactness: DuckDB ships the same textbook jaro_winkler_similarity
  * (window, half-transpositions, 0.1·ℓ prefix boost over 0.7);
  * similarities surface rounded at 6 to absorb last-ulp division
  * ordering. Ties broken by candidate name ascending, both engines.
  */
object LinkageStringOps {

  val q546JaroWinklerLinkage: QueryDef = QueryDef(
    "q546_jaro_winkler_linkage",
    (s, dir) => {
      val jw = udf((a: String, b: String) =>
        graft.functions.StringSim.jaroWinkler(a, b))
      val names = Tables(s, dir).part
        .select(lower(col("p_name")).as("name"))
        .distinct()
        .withColumn("blk", substring(col("name"), 1, 2))
        .localCheckpoint() // both sides of the block self-join read this
      val pairs = names.alias("a")
        .join(names.alias("b"), Seq("blk"))
        .filter(col("a.name") =!= col("b.name"))
        .select(col("a.name").as("name"), col("b.name").as("cand"))
        .withColumn("jw", round(jw(col("name"), col("cand")), 6))
      val best = Window.partitionBy(col("name"))
        .orderBy(col("jw").desc, col("cand").asc)
      pairs
        .withColumn("rk", row_number().over(best))
        .filter(col("rk") === 1)
        .select(col("name"), col("cand").as("best_match"), col("jw"))
        .orderBy(col("name"))
    },
    Some("""WITH names AS (
        SELECT DISTINCT lower(p_name) AS name FROM part),
      blocked AS (
        SELECT name, substr(name, 1, 2) AS blk FROM names),
      pairs AS (
        SELECT a.name AS name, b.name AS cand,
          round(jaro_winkler_similarity(a.name, b.name), 6) AS jw
        FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name <> b.name),
      best AS (
        SELECT name, cand AS best_match, jw,
          ROW_NUMBER() OVER (PARTITION BY name
            ORDER BY jw DESC, cand ASC) AS rk
        FROM pairs)
      SELECT name, best_match, jw FROM best WHERE rk = 1 ORDER BY name"""))

  val all: Seq[QueryDef] = Seq(q546JaroWinklerLinkage)
}
