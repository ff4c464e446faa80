package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Maximal Marginal Relevance result diversification (Carbonell &
  * Goldstein 1998): greedily re-rank a candidate pool so each pick
  * maximizes λ·relevance − (1−λ)·max-similarity-to-already-picked —
  * the anti-redundancy step retrieval and training-data selection both
  * run after scoring (a dedup-aware top-k: a near-copy of a selected
  * doc should not spend a second slot). λ = 0.7, k = 10 picks from the
  * 30 longest docs; similarity = word-trigram Jaccard (q27's measure)
  * quantized to micro-units (reference: overseer's arbitrary handler
  * fns, src/overseer/executor.clj:12-39).
  *
  * Scale shape: the corpus-sized stages are the relevance top-30
  * (TakeOrdered, no global sort) and the shingle scan; pairwise
  * similarity exists ONLY on the 30-candidate pool (435 pairs,
  * model-sized at any SF — the q337 dimension-bounded idiom), and the
  * 10-step greedy runs driver-side on that model-sized frame (the
  * q477 HRU precedent: corpus work in-plan, model-sized search on the
  * driver).
  *
  * Exactness: relevance is normalized to integer micro-units
  * (1e6·n_chars DIV max_chars), similarity to micro-Jaccard
  * (1e6·|∩| DIV |∪|), and the MMR objective is compared as the integer
  * 7·rel − 3·maxsim (same ordering as 0.7/0.3, no floats anywhere);
  * ties break to the lower doc_id. Cross-engine deterministic.
  */
object MmrOps {

  private val K    = 10 // picks
  private val Pool = 30 // candidate pool (top by relevance)

  val q518MmrDiversify: QueryDef = QueryDef(
    "q518_mmr_diversify",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .select(col("doc_id"), col("n_chars"),
          expr("regexp_extract_all(lower(text), '\\\\w+', 0)").as("toks"))
        .where(size(col("toks")) >= 3)
      val pool = docs
        .orderBy(col("n_chars").desc, col("doc_id"))
        .limit(Pool)
        .localCheckpoint()
      val maxChars = pool.agg(max(col("n_chars"))).head().getLong(0)
      val rel = pool.select(col("doc_id"),
        expr(s"1000000 * n_chars DIV $maxChars").as("rel"))
      val sh = pool.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 3), " +
            "i -> concat(toks[i], ' ', toks[i + 1], ' ', toks[i + 2]))"))
          .as("g"))
        .distinct()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val inter = sh.toDF("ida", "g")
        .join(sh.toDF("idb", "g"), Seq("g"))
        .where(col("ida") < col("idb"))
        .groupBy(col("ida"), col("idb")).agg(count(lit(1)).as("i"))
      val sims = inter
        .join(sizes.toDF("ida", "sza"), Seq("ida"))
        .join(sizes.toDF("idb", "szb"), Seq("idb"))
        .select(col("ida"), col("idb"),
          expr("1000000 * i DIV (sza + szb - i)").as("sim"))

      // model-sized greedy on the driver (≤30 rels + ≤435 sims)
      val relM = rel.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val simM = sims.collect().map(r =>
        (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      def simOf(a: Long, b: Long): Long =
        if (a == b) 1000000L
        else simM.getOrElse((math.min(a, b), math.max(a, b)), 0L)
      var selected = Vector.empty[(Long, Long)] // (doc_id, mmr at pick time)
      var remaining = relM.keySet
      for (_ <- 1 to K if remaining.nonEmpty) {
        val pick = remaining.map { d =>
          val maxSim = if (selected.isEmpty) 0L
            else selected.map(p => simOf(d, p._1)).max
          (d, 7L * relM(d) - 3L * maxSim)
        }.minBy { case (d, sc) => (-sc, d) }
        selected :+= pick
        remaining -= pick._1
      }
      val out = selected.zipWithIndex.map { case ((d, sc), i) =>
        (i + 1L, d, sc)
      }
      s.createDataFrame(out).toDF("rank", "doc_id", "mmr_score")
    },
    Some {
      // unrolled greedy: sel_k = sel_{k-1} + argmax over the remainder
      val steps = (2 to K).map { k =>
        s"""
      cand$k AS (
        -- inner join + COALESCE ≡ max over selected incl. absent pairs:
        -- micro-Jaccard is ≥ 0, so missing pairs (sim 0) never win the MAX
        SELECT r.doc_id,
          7 * r.rel - 3 * COALESCE((
            SELECT MAX(s.sim)
            FROM sims s JOIN sel${k - 1} p
              ON s.ida = LEAST(r.doc_id, p.doc_id)
             AND s.idb = GREATEST(r.doc_id, p.doc_id)), 0) AS score
        FROM rel r
        WHERE r.doc_id NOT IN (SELECT doc_id FROM sel${k - 1})),
      pick$k AS MATERIALIZED (
        SELECT $k AS rank, doc_id, score FROM cand$k
        ORDER BY score DESC, doc_id LIMIT 1),
      sel$k AS MATERIALIZED (SELECT doc_id FROM sel${k - 1}
        UNION ALL SELECT doc_id FROM pick$k)"""
      }.mkString(",")
      s"""WITH t AS MATERIALIZED (
        SELECT doc_id, n_chars,
          regexp_extract_all(lower(text), '\\w+') AS toks
        FROM documents),
      pool AS MATERIALIZED (
        SELECT doc_id, n_chars, toks FROM t WHERE len(toks) >= 3
        ORDER BY n_chars DESC, doc_id LIMIT $Pool),
      mc AS (SELECT MAX(n_chars) AS m FROM pool),
      rel AS MATERIALIZED (SELECT doc_id, 1000000 * n_chars // m AS rel
        FROM pool CROSS JOIN mc),
      sh AS MATERIALIZED (
        SELECT DISTINCT doc_id,
          unnest(list_transform(range(1, len(toks) - 1),
            i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
        FROM pool),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY 1),
      sims AS MATERIALIZED (
        SELECT a.doc_id AS ida, b.doc_id AS idb,
          1000000 * COUNT(*) // (sa.sz + sb.sz - COUNT(*)) AS sim
        FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
        JOIN sizes sa ON sa.doc_id = a.doc_id
        JOIN sizes sb ON sb.doc_id = b.doc_id
        GROUP BY a.doc_id, b.doc_id, sa.sz, sb.sz),
      pick1 AS MATERIALIZED (
        SELECT 1 AS rank, doc_id, 7 * rel AS score FROM rel
        ORDER BY score DESC, doc_id LIMIT 1),
      sel1 AS MATERIALIZED (SELECT doc_id FROM pick1),
      $steps
      SELECT CAST(rank AS BIGINT) AS rank, doc_id,
        CAST(score AS BIGINT) AS mmr_score
      FROM (${(1 to K).map(k => s"SELECT * FROM pick$k").mkString(" UNION ALL ")})"""
    })

  val all: Seq[QueryDef] = Seq(q518MmrDiversify)
}
