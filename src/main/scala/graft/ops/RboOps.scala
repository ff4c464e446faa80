package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rank-biased overlap (Webber, Moffat & Zobel 2010) between two
  * retrieval rankings — the top-weighted, length-tolerant similarity
  * of ranked lists that plain Kendall/Spearman (q337/q459) cannot
  * give: RBO@10 = Σ_d (1−p)·p^{d−1}·|A_{1..d} ∩ B_{1..d}|/d with
  * persistence p = 0.9. Compared rankers, per query term: raw term
  * frequency vs length-normalized frequency (tf·1000 DIV dl) — the
  * exact pair every ranker-change review diffing "did normalization
  * reshuffle my top-10?" looks at (reference: overseer's arbitrary
  * handler fns, src/overseer/executor.clj:12-39; q104/q155/q540's
  * ranking-eval family).
  *
  * Scale shape: one token scan to the 4-term postings; two top-10
  * windows per term; depth-overlap is a 10-row dimension fan-out over
  * the ≤10×10 joined pairs — model-sized after the scan.
  *
  * Exactness: overlaps are BIGINT counts; each depth's contribution is
  * quantized to integer micro-units (floor of the same double — the
  * only float is (1−p)·p^{d−1}/d, a fixed per-depth expression), so
  * the per-term RBO is an exact BIGINT sum.
  */
object RboOps {

  private val Terms = Seq("scan", "join", "window", "stream")

  val q543Rbo: QueryDef = QueryDef(
    "q543_rbo",
    (s, dir) => {
      val qterms = s.createDataFrame(Terms.map(Tuple1(_))).toDF("term")
      val toks = Tables(s, dir).documents
        .select(col("doc_id"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)")).as("term"))
      val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dlen"))
      val postings = toks.join(broadcast(qterms), Seq("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        .join(dl, Seq("doc_id"))
        .withColumn("ntf", expr("tf * 1000 DIV dlen"))
      val wA = Window.partitionBy(col("term"))
        .orderBy(col("tf").desc, col("doc_id"))
      val wB = Window.partitionBy(col("term"))
        .orderBy(col("ntf").desc, col("doc_id"))
      val ranked = postings
        .withColumn("rka", row_number().over(wA))
        .withColumn("rkb", row_number().over(wB))
        .where(col("rka") <= 10 || col("rkb") <= 10)
        .localCheckpoint()
      val depths = s.range(1, 11).select(col("id").as("d"))
      val ov = broadcast(depths).join(ranked,
          col("rka") <= col("d") && col("rkb") <= col("d"))
        .groupBy(col("term"), col("d")).agg(count(lit(1)).as("ov"))
      // complete (term × depth) spine: depths with zero overlap count too
      val spine = qterms.crossJoin(broadcast(depths))
        .join(ov, Seq("term", "d"), "left").na.fill(0L, Seq("ov"))
      spine.select(col("term"), col("d"), col("ov"),
          floor(lit(1e6) * lit(0.1) * pow(lit(0.9), col("d") - 1) *
            col("ov") / col("d")).cast("long").as("contrib_micro"))
        .groupBy(col("term"))
        .agg(sum(col("contrib_micro")).as("rbo_micro"),
          max(when(col("d") === 10, col("ov"))).as("overlap_at_10"))
    },
    Some("""WITH toks AS MATERIALIZED (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
        FROM documents),
      dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dlen
        FROM toks GROUP BY 1),
      qterms AS (SELECT unnest(['scan', 'join', 'window', 'stream']) AS term),
      postings AS (
        SELECT t.term, t.doc_id, CAST(COUNT(*) AS BIGINT) AS tf
        FROM toks t JOIN qterms q ON q.term = t.term
        GROUP BY 1, 2),
      scored AS (
        SELECT p.term, p.doc_id, p.tf, p.tf * 1000 // d.dlen AS ntf
        FROM postings p JOIN dl d ON d.doc_id = p.doc_id),
      ranked AS MATERIALIZED (
        SELECT term, doc_id,
          row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id)
            AS rka,
          row_number() OVER (PARTITION BY term ORDER BY ntf DESC, doc_id)
            AS rkb
        FROM scored
        QUALIFY rka <= 10 OR rkb <= 10),
      depths AS (SELECT unnest(range(1, 11)) AS d),
      ov AS (
        SELECT r.term, dp.d, CAST(COUNT(*) AS BIGINT) AS ov
        FROM depths dp JOIN ranked r ON r.rka <= dp.d AND r.rkb <= dp.d
        GROUP BY 1, 2),
      spine AS (
        SELECT q.term, dp.d, COALESCE(o.ov, 0) AS ov
        FROM qterms q CROSS JOIN depths dp
        LEFT JOIN ov o ON o.term = q.term AND o.d = dp.d)
      SELECT term,
        CAST(SUM(CAST(floor(1e6 * 0.1 * pow(0.9, d - 1) * ov / d)
          AS BIGINT)) AS BIGINT) AS rbo_micro,
        CAST(MAX(CASE WHEN d = 10 THEN ov END) AS BIGINT) AS overlap_at_10
      FROM spine GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q543Rbo)
}
