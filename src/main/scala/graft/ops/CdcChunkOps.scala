package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Content-defined chunking dedup (the Rabin/gear-hash boundary idea
  * behind LBFS, rsync and every dedup store — Muthitacharoen et al.
  * 2001): split each document at HASH-GATED tokens (a token whose
  * salted md5 ≡ 0 mod 64 closes a chunk), so insertions shift chunk
  * boundaries only locally — unlike q88's fixed 32-token grid, an
  * edit near the front does not re-key every later chunk. Then audit
  * cross-document duplicated chunk MASS per source: the byte-level
  * storage-dedup win CDC buys (reference: overseer's corpus family —
  * arbitrary handler fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: boundary decisions are STATELESS per token (the gear
  * gate needs no scan state), so chunk ids are one windowed cumulative
  * sum per document; chunk keying, cross-doc occurrence counting and
  * the per-source rollup are hash-aggs — token-mass linear end to end,
  * with the chunk digest as the natural downstream partition key.
  *
  * Exactness: chunk identity is the exact chunk text; all masses are
  * BIGINT token counts; the dup ratio is integer micro-units
  * (1e6·dup DIV total). Cross-engine deterministic.
  */
object CdcChunkOps {

  private val Gate = 64L // expected chunk length in tokens

  val q521CdcChunking: QueryDef = QueryDef(
    "q521_cdc_chunking",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(col("doc_id"), col("source"),
          posexplode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
            .as(Seq("pos", "tok")))
      val gated = toks.withColumn("cut",
        when(pmod(conv(substring(md5(concat(lit("cdc|"), col("tok"))), 1, 15),
          16, 10).cast("long"), lit(Gate)) === 0, 1L).otherwise(0L))
      val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val chunked = gated.withColumn("chunk",
        sum(col("cut")).over(wDoc) - col("cut")) // boundary token CLOSES its chunk
      // checkpoint: BOTH consumers below (occurrence census + per-source
      // rollup) would otherwise re-scan and re-window the whole corpus —
      // the dominant cost at scale (observed 2× in the sf10 plan audit)
      val chunks = chunked
        .groupBy(col("doc_id"), col("source"), col("chunk"))
        .agg(count(lit(1)).as("mass"),
          concat_ws(" ", expr("transform(sort_array(" +
            "collect_list(struct(pos, tok))), x -> x.tok)")).as("ctext"))
        .localCheckpoint()
      val occ = chunks.groupBy(col("ctext"))
        .agg(countDistinct(col("doc_id")).as("ndocs"))
      chunks.join(occ, Seq("ctext"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"),
          sum(col("mass")).as("n_tokens"),
          sum(when(col("ndocs") > 1, col("mass")).otherwise(0L)).as("dup_mass"))
        .select(col("source"), col("n_chunks"), col("n_tokens"), col("dup_mass"),
          expr("1000000 * dup_mass DIV n_tokens").as("dup_micro"))
    },
    Some(s"""WITH raw AS (
        SELECT doc_id, source,
          regexp_extract_all(lower(text), '\\w+') AS l
        FROM documents),
      toks AS MATERIALIZED (
        -- parallel unnests align row-wise (0-based pos, Spark's posexplode)
        SELECT doc_id, source, unnest(range(len(l))) AS pos,
          unnest(l) AS tok
        FROM raw),
      gated AS (
        SELECT doc_id, source, pos, tok,
          CASE WHEN ('0x' || substr(md5('cdc|' || tok), 1, 15))::BIGINT
            % $Gate = 0 THEN 1 ELSE 0 END AS cut
        FROM toks),
      chunked AS (
        SELECT doc_id, source, pos, tok,
          SUM(cut) OVER (PARTITION BY doc_id ORDER BY pos) - cut AS chunk
        FROM gated),
      chunks AS MATERIALIZED (
        SELECT doc_id, source, chunk,
          CAST(COUNT(*) AS BIGINT) AS mass,
          string_agg(tok, ' ' ORDER BY pos) AS ctext
        FROM chunked GROUP BY 1, 2, 3),
      occ AS (
        SELECT ctext, COUNT(DISTINCT doc_id) AS ndocs
        FROM chunks GROUP BY 1)
      SELECT c.source,
        CAST(COUNT(*) AS BIGINT) AS n_chunks,
        CAST(SUM(c.mass) AS BIGINT) AS n_tokens,
        CAST(SUM(CASE WHEN o.ndocs > 1 THEN c.mass ELSE 0 END) AS BIGINT)
          AS dup_mass,
        1000000 * CAST(SUM(CASE WHEN o.ndocs > 1 THEN c.mass ELSE 0 END)
          AS BIGINT) // CAST(SUM(c.mass) AS BIGINT) AS dup_micro
      FROM chunks c JOIN occ o ON o.ctext = c.ctext
      GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q521CdcChunking)
}
