package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-refinement wave: composite quality gating (Gopher/MassiveText
  * rule family), semantic dedup over embedding cells (SemDeDup), k-core
  * extraction on the co-purchase graph, and iterative proportional fitting
  * of training-mix weights. All four are staples of large-scale
  * training-data curation that compose the primitives already in the
  * library (tokenizer, IVF cells, fixpoint loops, window sums).
  */
object RefineOps {

  private val stop = Seq("the", "a", "of", "and", "to", "in", "is", "value", "data", "table")

  /** Composite document quality gate, the Gopher/MassiveText rule family
    * (Rae et al. 2021 §A1.1): per-document token count, mean word length,
    * stopword evidence, and type-token-ratio rules evaluated in ONE scan
    * with no shuffle at all — every rule is a projection over the token
    * array, so at 100 TB this is embarrassingly parallel and the gate's
    * selectivity is visible per rule (each rule is its own column, so a
    * downstream mix audit can attribute removal mass to rules). Thresholds
    * are tuned to this corpus's measured distributions (p5/p95 token count
    * 16/94, mean word length 4.2-4.8, TTR 0.31-0.80) so each rule has
    * real selectivity rather than passing everything. Integer-exact
    * numerators over an exact BIGINT token count keep both engines
    * bit-identical through the DOUBLE divisions. */
  val q226GopherRules: QueryDef = QueryDef(
    "q226_gopher_rules",
    (s, dir) => {
      val d = Tables(s, dir).documents
        .withColumn("toks", TextOps.tokens(col("text")))
        .withColumn("n_tokens", size(col("toks")).cast("long"))
        .filter(col("n_tokens") > 0)
        .withColumn("mean_wlen",
          aggregate(col("toks"), lit(0L), (a, t) => a + length(t))
            .cast("double") / col("n_tokens"))
        .withColumn("stop_types",
          size(array_intersect(array_distinct(col("toks")),
            array(stop.map(lit): _*))).cast("long"))
        .withColumn("ttr",
          size(array_distinct(col("toks"))).cast("double") / col("n_tokens"))
      d.select(
          col("doc_id"), col("lang"), col("n_tokens"),
          round(col("mean_wlen"), 6).as("mean_wlen"),
          col("stop_types"),
          round(col("ttr"), 6).as("ttr"),
          col("n_tokens").between(20L, 400L).as("r_len"),
          (col("mean_wlen") >= 3.0 && col("mean_wlen") <= 4.7).as("r_wlen"),
          (col("stop_types") >= 3L).as("r_stop"),
          (col("ttr") >= 0.4).as("r_ttr"))
        .withColumn("passed",
          col("r_len") && col("r_wlen") && col("r_stop") && col("r_ttr"))
    },
    Some("""WITH t AS (SELECT doc_id, lang,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      m AS (SELECT doc_id, lang,
          CAST(len(toks) AS BIGINT) AS n_tokens,
          CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
            / len(toks) AS mean_wlen,
          CAST(len(list_intersect(list_distinct(toks),
            ['the','a','of','and','to','in','is','value','data','table'])) AS BIGINT) AS stop_types,
          CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
        FROM t WHERE len(toks) > 0)
      SELECT doc_id, lang, n_tokens,
        round(mean_wlen, 6) AS mean_wlen, stop_types, round(ttr, 6) AS ttr,
        n_tokens BETWEEN 20 AND 400 AS r_len,
        mean_wlen >= 3.0 AND mean_wlen <= 4.7 AS r_wlen,
        stop_types >= 3 AS r_stop,
        ttr >= 0.4 AS r_ttr,
        (n_tokens BETWEEN 20 AND 400) AND (mean_wlen >= 3.0 AND mean_wlen <= 4.7)
          AND stop_types >= 3 AND ttr >= 0.4 AS passed
      FROM m"""))

  /** Target within-cell population for SemDeDup: the seed count scales
    * as max(8, ceil(N / targetCellSize)), so the within-cell pairwise
    * stage is bounded by ~targetCellSize² per cell however large the
    * corpus — the quadratic term never sees N. 128 keeps the fixture
    * floors (8 cells at sf0.01) while sf0.1 already runs 16 cells and a
    * 100 TB corpus would run N/128. */
  val semdedupTargetCellSize = 128L

  /** Seed count for a corpus of `nVec` embeddings (shared by the query
    * and its occupancy spec). */
  def semdedupSeeds(nVec: Long): Int =
    math.max(8L, (nVec + semdedupTargetCellSize - 1) / semdedupTargetCellSize).toInt

  /** Cell assignment for SemDeDup. Two plans, one semantics (argmax
    * cosine over seeds, ties to the smaller seed id — the spec proves
    * them identical on the fixture):
    *  - nSeeds ≤ 64: seeds inlined as literals, assignment is a pure
    *    shuffle-free projection inside whole-stage codegen;
    *  - nSeeds > 64 (large corpora): seeds become a broadcast frame, the
    *    argmax is a max(struct(cos, -seed_id)) partial-aggregating
    *    hash-agg on vec_id — linear in N·nSeeds with no literal blowup,
    *    the plan a 1000-executor run needs. */
  def semdedupCells(s: SparkSession, dir: String, nSeeds: Int,
                    forceJoinPath: Boolean = false): DataFrame = {
    val emb = Tables(s, dir).embeddings
      .repartition(s.sparkContext.defaultParallelism)
    if (nSeeds <= 64 && !forceJoinPath) {
      val seeds = Tables.seedVectors(dir, nSeeds)
      def seedScores(v: Column): Column = array(seeds.map { case (sid, vec) =>
        struct(Similarity.cosine(v, typedlit(vec)).as("cos"), lit(-sid).as("nsid"))
      }: _*)
      emb.select(col("vec_id"), col("embedding"),
        (-array_max(seedScores(col("embedding"))).getField("nsid")).as("cell"))
    } else {
      val seedsDf = broadcast(Tables(s, dir).embeddings
        .filter(col("vec_id") < nSeeds)
        .select(col("vec_id").cast("int").as("seed_id"), col("embedding").as("s_emb")))
      val best = emb.crossJoin(seedsDf)
        .select(col("vec_id"),
          struct(Similarity.cosine(col("embedding"), col("s_emb")).as("cos"),
            (-col("seed_id")).as("nsid")).as("sc"))
        .groupBy(col("vec_id")).agg(max(col("sc")).as("best"))
        .select(col("vec_id"), (-col("best.nsid")).as("cell"))
      emb.join(best, Seq("vec_id"))
        .select(col("vec_id"), col("embedding"), col("cell"))
    }
  }

  /** SemDeDup (Abbas et al. 2023): semantic near-dup pruning inside
    * coarse embedding cells. Vectors are assigned to nearest-seed cells
    * by the [[semdedupCells]] argmax (the q75 IVF projection), then
    * pairwise cosine runs ONLY within a cell (a < b), and a vector is
    * dropped when any smaller-id cellmate scores >= tau — the
    * deterministic greedy keep-first rule. Output: every vector with its
    * cell, the count of shadowing smaller-id neighbors, and the kept
    * flag (never empty, unlike the dropped set alone). Within-cell
    * pairing is the whole scale design: cost is sum(cell²), and the cell
    * count GROWS WITH THE CORPUS — nSeeds = max(8, ceil(N/128)) from a
    * metadata-only count, so expected occupancy stays ~128 and the
    * quadratic term never sees the full corpus (SemdedupSpec asserts the
    * occupancy bound; the oracle derives the same seed count from
    * count(*)). Cosines fold sequentially in double on both engines
    * ([[Similarity.dot]] native expression vs DuckDB's list fold), so
    * the tau filter sees identical bits and needs no rounding tolerance.
    * tau = 0.35 is tuned to this corpus's within-cell cosine spread (max
    * pair ~0.47, median ~0). */
  val q227Semdedup: QueryDef = QueryDef(
    "q227_semdedup",
    (s, dir) => {
      val tau = 0.35
      // metadata-only parquet count — the one driver-side scalar that
      // sizes the cell grid
      val nVec = Tables(s, dir).embeddings.count()
      val nSeeds = semdedupSeeds(nVec)
      val cells = semdedupCells(s, dir, nSeeds)
      val shadows = cells.select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("e_a"))
        .join(cells.select(col("cell"), col("vec_id").as("id_b"), col("embedding").as("e_b")),
              Seq("cell"))
        .filter(col("id_a") < col("id_b"))
        .filter(Similarity.cosine(col("e_a"), col("e_b")) >= tau)
        .groupBy(col("id_b").as("vec_id"))
        .agg(count(lit(1)).as("n_shadows"))
      cells.join(shadows, Seq("vec_id"), "left")
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
                coalesce(col("n_shadows"), lit(0L)).as("n_shadows"))
        .withColumn("kept", col("n_shadows") === 0L)
    },
    Some("""WITH nseeds AS (
        SELECT GREATEST(8, CAST(ceil(COUNT(*) / 128.0) AS BIGINT)) AS k
        FROM embeddings),
      seeds AS (
        SELECT vec_id AS seed_id, embedding AS s_emb FROM embeddings
        WHERE vec_id < (SELECT k FROM nseeds)),
      cos_seed AS (
        SELECT e.vec_id, s.seed_id,
          list_sum(list_transform(list_zip(e.embedding, s.s_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(e.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(s.s_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) AS cos
        FROM embeddings e CROSS JOIN seeds s),
      cells AS (
        SELECT vec_id, seed_id AS cell FROM (
          SELECT vec_id, seed_id,
            ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cos DESC, seed_id) AS rn
          FROM cos_seed) t WHERE rn = 1),
      pairs AS (
        SELECT cb.vec_id,
          COUNT(*) AS n_shadows
        FROM cells ca JOIN cells cb ON ca.cell = cb.cell AND ca.vec_id < cb.vec_id
        JOIN embeddings ea ON ea.vec_id = ca.vec_id
        JOIN embeddings eb ON eb.vec_id = cb.vec_id
        WHERE list_sum(list_transform(list_zip(ea.embedding, eb.embedding),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(ea.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(eb.embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))) >= 0.35
        GROUP BY 1)
      SELECT c.vec_id, CAST(c.cell AS BIGINT) AS cell,
        CAST(COALESCE(p.n_shadows, 0) AS BIGINT) AS n_shadows,
        COALESCE(p.n_shadows, 0) = 0 AS kept
      FROM cells c LEFT JOIN pairs p ON p.vec_id = c.vec_id"""))

  /** k-core extraction (k = 3) on the co-purchase graph: parts are nodes,
    * an edge links two parts co-ordered in >= 2 distinct orders (the
    * support filter keeps the graph sparse — the raw co-occurrence graph
    * is near-complete and has no interesting core structure). Four fixed
    * peeling rounds — drop nodes with degree < k, recompute degrees on the
    * induced subgraph — exactly unrolled in the oracle; output is EVERY
    * node of the support graph with its initial degree, surviving flag,
    * and final-round degree (never empty even when the core is). Fixed
    * rounds rather than a fixpoint keep the oracle expressible and the
    * result is a certified UPPER BOUND on the 3-core (equal to it once a
    * round removes nothing). Edge building shuffles once on l_orderkey
    * (the natural co-partitioning key) and each peel round shuffles only
    * (node, degree) pairs — at 100 TB rounds cost O(|E|) each with no
    * driver-side state. */
  val q228Kcore: QueryDef = QueryDef(
    "q228_kcore",
    (s, dir) => {
      val k = 3
      val rounds = 4
      // shared derived base table (GraphBase, distinct-support variant):
      // peel rounds re-read the parquet-backed edge set, never lineitem
      val edges = GraphBase.coPurchaseEdgesDistinct(s, dir)
      val und = edges.select(col("pa").as("n"), col("pb").as("m"))
        .union(edges.select(col("pb").as("n"), col("pa").as("m")))
      val deg0 = und.groupBy(col("n")).agg(count(lit(1)).as("deg0"))
      var alive = deg0.select(col("n"))
      var degNow = deg0.withColumnRenamed("deg0", "deg")
      for (_ <- 1 to rounds) {
        val kept = degNow.filter(col("deg") >= k).select(col("n")).localCheckpoint()
        val sub = und.join(kept.withColumnRenamed("n", "m"), Seq("m"))
          .join(kept, Seq("n"))
        degNow = sub.groupBy(col("n")).agg(count(lit(1)).as("deg"))
        alive = kept
      }
      val fin = alive.join(degNow, Seq("n"), "left")
        .select(col("n"), coalesce(col("deg"), lit(0L)).as("final_deg"),
                lit(true).as("survived"))
      deg0.join(fin, Seq("n"), "left")
        .select(col("n").as("part"), col("deg0"),
                coalesce(col("survived"), lit(false)).as("survived"),
                coalesce(col("final_deg"), lit(0L)).as("final_deg"))
    },
    Some("""WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
      und AS (SELECT pa AS n, pb AS m FROM e UNION ALL SELECT pb, pa FROM e),
      d0 AS (SELECT n, COUNT(*) AS deg0 FROM und GROUP BY 1),
      k1 AS (SELECT n FROM d0 WHERE deg0 >= 3),
      d1 AS (SELECT u.n, COUNT(*) AS deg FROM und u
        JOIN k1 a ON u.n = a.n JOIN k1 b ON u.m = b.n GROUP BY 1),
      k2 AS (SELECT n FROM d1 WHERE deg >= 3),
      d2 AS (SELECT u.n, COUNT(*) AS deg FROM und u
        JOIN k2 a ON u.n = a.n JOIN k2 b ON u.m = b.n GROUP BY 1),
      k3 AS (SELECT n FROM d2 WHERE deg >= 3),
      d3 AS (SELECT u.n, COUNT(*) AS deg FROM und u
        JOIN k3 a ON u.n = a.n JOIN k3 b ON u.m = b.n GROUP BY 1),
      k4 AS (SELECT n FROM d3 WHERE deg >= 3),
      d4 AS (SELECT u.n, COUNT(*) AS deg FROM und u
        JOIN k4 a ON u.n = a.n JOIN k4 b ON u.m = b.n GROUP BY 1)
      SELECT d0.n AS part, d0.deg0,
        k4.n IS NOT NULL AS survived,
        CAST(COALESCE(d4.deg, 0) AS BIGINT) AS final_deg
      FROM d0 LEFT JOIN k4 ON d0.n = k4.n LEFT JOIN d4 ON d0.n = d4.n"""))

  /** Iterative proportional fitting (raking) of the training mix: start
    * from the observed (lang x source) document counts and alternately
    * rescale rows then columns so lang marginals approach UNIFORM while
    * source marginals stay at their observed totals — the standard way to
    * hit target language proportions without inventing per-cell weights.
    * Two full iterations, exactly unrolled in the oracle. Every scaling
    * factor divides by a group sum computed from already-exact values
    * (iteration-1 row sums are integer counts; later sums are rounded to
    * 9 dp before use, the q62 house defense against engine summation
    * order), and the published weights are rounded to 6 dp. The cell
    * matrix is languages x sources — model-sized — so at 100 TB the only
    * big-data stage is the first groupBy count; the IPF loop itself runs
    * on an aggregate that fits in one partition. */
  val q229IpfRaking: QueryDef = QueryDef(
    "q229_ipf_raking",
    (s, dir) => {
      val cells = Tables(s, dir).documents
        .groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val total = cells.agg(sum(col("n")).as("total"),
                            countDistinct(col("lang")).as("n_langs"))
      val c = cells.crossJoin(broadcast(total))
        .withColumn("lang_target", col("total").cast("double") / col("n_langs"))
      // iteration 1: rows (langs) to uniform target — row sums are exact ints
      val r1 = c
        .withColumn("rowsum0", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))).cast("double"))
        .withColumn("w1", col("n").cast("double") * col("lang_target") / col("rowsum0"))
      // iteration 1: columns (sources) back to observed totals
      val r2 = r1
        .withColumn("colsum1", round(sum(col("w1")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))), 9))
        .withColumn("coltarget", sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))).cast("double"))
        .withColumn("w2", col("w1") * col("coltarget") / col("colsum1"))
      // iteration 2: rows again, then columns again
      val r3 = r2
        .withColumn("rowsum2", round(sum(col("w2")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))), 9))
        .withColumn("w3", col("w2") * col("lang_target") / col("rowsum2"))
      val r4 = r3
        .withColumn("colsum3", round(sum(col("w3")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("source"))), 9))
        .withColumn("w4", col("w3") * col("coltarget") / col("colsum3"))
      r4.select(col("lang"), col("source"), col("n"),
                round(col("w4"), 6).as("weight"),
                round(col("w4") / col("n"), 6).as("per_doc_factor"))
    },
    Some("""WITH cells AS (
        SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
      t AS (SELECT CAST(SUM(n) AS DOUBLE) / COUNT(DISTINCT lang) AS lang_target
        FROM cells),
      r1 AS (SELECT lang, source, n, lang_target,
          CAST(n AS DOUBLE) * lang_target
            / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE) AS w1
        FROM cells CROSS JOIN t),
      r2 AS (SELECT *, w1 * CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE)
            / round(SUM(w1) OVER (PARTITION BY source), 9) AS w2
        FROM r1),
      r3 AS (SELECT *, w2 * lang_target
            / round(SUM(w2) OVER (PARTITION BY lang), 9) AS w3
        FROM r2),
      r4 AS (SELECT *, w3 * CAST(SUM(n) OVER (PARTITION BY source) AS DOUBLE)
            / round(SUM(w3) OVER (PARTITION BY source), 9) AS w4
        FROM r3)
      SELECT lang, source, n, round(w4, 6) AS weight,
        round(w4 / n, 6) AS per_doc_factor
      FROM r4"""))

  val all: Seq[QueryDef] =
    Seq(q226GopherRules, q227Semdedup, q228Kcore, q229IpfRaking)
}
