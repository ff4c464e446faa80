package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Second wave of LLM-training-corpus operators: chunking, n-gram language
  * model counts, calendar gap-filling, event-stream compaction, k-means-
  * style centroid assignment over embeddings, and value histograms. All
  * pure `functions._` column expressions (codegen'd, no UDFs), each with a
  * DuckDB oracle.
  */
object CorpusOps {

  /** Fixed-size token chunking with overlap (size 50, stride 40): the
    * standard pre-tokenization step that turns documents into training
    * windows. A generator op: sequence + explode + slice — one output row
    * per chunk, computed without materializing any intermediate arrays
    * beyond the token list. */
  val q58DocChunking: QueryDef = QueryDef(
    "q58_doc_chunking",
    (s, dir) => Tables(s, dir).documents
      .withColumn("toks", TextOps.tokens(col("text")))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0), expr("(size(toks) - 1) div 40"))).as("chunk_id"))
      .withColumn("chunk", slice(col("toks"), col("chunk_id") * 40 + 1, lit(50)))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        array_join(col("chunk"), " ").as("chunk_text"),
        size(col("chunk")).cast("long").as("n_chunk_tokens")),
    Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      c AS (SELECT doc_id, toks,
          UNNEST(range(0, (len(toks)-1)//40 + 1)) AS chunk_id
        FROM t WHERE len(toks) > 0)
      SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
        array_to_string(toks[chunk_id*40+1 : chunk_id*40+50], ' ') AS chunk_text,
        CAST(len(toks[chunk_id*40+1 : chunk_id*40+50]) AS BIGINT) AS n_chunk_tokens
      FROM c"""))

  /** Per-language top-10 bigram counts — the n-gram LM statistics pass.
    * Bigrams come from the raw token sequence (adjacency-dependent), are
    * counted with one hash aggregate, and ranked with a per-language
    * window top-k. */
  val q60BigramTopk: QueryDef = QueryDef(
    "q60_bigram_topk",
    (s, dir) => {
      val bi = Tables(s, dir).documents
        .withColumn("toks", TextOps.tokens(col("text")))
        .filter(size(col("toks")) >= 2)
        .select(col("lang"), explode(expr(
          "transform(sequence(0, size(toks)-2), i -> concat(toks[i], ' ', toks[i+1]))")).as("bigram"))
        .groupBy(col("lang"), col("bigram")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("bigram").asc)
      bi.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("lang"), col("bigram"), col("n"), col("rank"))
    },
    Some("""WITH t AS (SELECT lang, regexp_extract_all(lower(text), '\w+') AS toks
        FROM documents),
      b AS (SELECT lang,
          UNNEST(list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram
        FROM t WHERE len(toks) >= 2),
      c AS (SELECT lang, bigram, COUNT(*) AS n FROM b GROUP BY 1, 2),
      r AS (SELECT *, CAST(ROW_NUMBER() OVER (
          PARTITION BY lang ORDER BY n DESC, bigram) AS BIGINT) AS rank FROM c)
      SELECT lang, bigram, n, rank FROM r WHERE rank <= 10"""))

  /** Calendar spine with gap filling: generate every day in the order
    * date range, left-join daily aggregates, zero-fill the holes — the
    * canonical reporting/backfill shape (a sequence generator instead of a
    * stored calendar table). */
  val q59DateSpine: QueryDef = QueryDef(
    "q59_date_spine",
    (s, dir) => {
      val o = Tables(s, dir).orders.withColumn("day", col("o_orderdate").cast("date"))
      val daily = o.groupBy(col("day"))
        .agg(count(lit(1)).as("n_orders"),
             sum(col("o_totalprice").cast(DecimalType(18, 4))).cast("double").as("revenue"))
      val spine = o.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("day"))
      spine.join(daily, Seq("day"), "left")
        .select(col("day"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("revenue"), lit(0.0)).as("revenue"))
    },
    Some("""WITH b AS (SELECT CAST(min(o_orderdate) AS DATE) AS lo,
          CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
      spine AS (SELECT CAST(UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      daily AS (SELECT CAST(o_orderdate AS DATE) AS day, COUNT(*) AS n_orders,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        FROM orders GROUP BY 1)
      SELECT s.day, COALESCE(d.n_orders, 0) AS n_orders,
        COALESCE(d.revenue, 0.0) AS revenue
      FROM spine s LEFT JOIN daily d USING (day)"""))

  /** Event-stream compaction: drop events whose type equals the previous
    * event's type for the same user (consecutive-duplicate elimination via
    * lag — the state-compaction pass run before sessionization). */
  val q61EventCompaction: QueryDef = QueryDef(
    "q61_event_compaction",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      EventOps.events(s, dir)
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_kept"))
    },
    Some("""WITH o AS (SELECT user_id, event_type,
          LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        FROM events)
      SELECT user_id, COUNT(*) AS n_kept FROM o
      WHERE prev_type IS NULL OR prev_type <> event_type
      GROUP BY 1"""))

  /** Nearest-centroid assignment over embeddings — the E-step of k-means /
    * the probe step of IVF ANN: per-label centroids from a posexplode +
    * per-dimension mean, then every vector scored against every centroid
    * and assigned by best cosine. Centroid means and cosines are rounded
    * (9/6 dp) because double summation order differs across partitionings
    * and engines. */
  val q62CentroidAssign: QueryDef = QueryDef(
    "q62_centroid_assign",
    (s, dir) => {
      val flat = Tables(s, dir).embeddings
        .select(col("vec_id"), col("label"), posexplode(col("embedding")))
        .select(col("vec_id"), col("label"), col("pos").as("dim"),
                col("col").cast("double").as("v"))
      val cent = flat.groupBy(col("label").as("clabel"), col("dim"))
        .agg(round(avg(col("v")), 9).as("c"))
      val scored = flat.join(cent, Seq("dim"))
        .groupBy(col("vec_id"), col("label"), col("clabel"))
        .agg(sum(col("v") * col("c")).as("dot"),
             sum(col("v") * col("v")).as("v2"),
             sum(col("c") * col("c")).as("c2"))
        .select(col("vec_id"), col("label"), col("clabel"),
          round(col("dot") / (sqrt(col("v2")) * sqrt(col("c2"))), 6).as("cos"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("clabel").asc)
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label").as("true_label"),
                col("clabel").as("assigned_label"), col("cos").as("best_cos"))
    },
    Some("""WITH flat AS (SELECT vec_id, label, t.gs AS dim,
          CAST(embedding[t.gs] AS DOUBLE) AS v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)),
      cent AS (SELECT label AS clabel, dim, round(avg(v), 9) AS c
        FROM flat GROUP BY 1, 2),
      scored AS (SELECT f.vec_id, f.label, c.clabel,
          round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6) AS cos
        FROM flat f JOIN cent c ON f.dim = c.dim
        GROUP BY 1, 2, 3),
      ranked AS (SELECT *, ROW_NUMBER() OVER (
          PARTITION BY vec_id ORDER BY cos DESC, clabel) AS rn FROM scored)
      SELECT vec_id, label AS true_label, clabel AS assigned_label,
        cos AS best_cos
      FROM ranked WHERE rn = 1"""))

  /** Equi-width histogram of order values: floor-bucketing plus each
    * bucket's share of the total (a windowed grand total, not a driver
    * round trip). */
  val q63PriceHistogram: QueryDef = QueryDef(
    "q63_price_histogram",
    (s, dir) => Tables(s, dir).orders
      .groupBy((floor(col("o_totalprice") / 50000) * 50000L).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .withColumn("pct", round(col("n") * 100.0 / sum(col("n")).over(Window.partitionBy()), 6))
      .select(col("bucket_lo"), col("n"), col("pct")),
    Some("""WITH h AS (SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket_lo,
          COUNT(*) AS n
        FROM orders GROUP BY 1)
      SELECT bucket_lo, n, round(n * 100.0 / SUM(n) OVER (), 6) AS pct FROM h"""))

  /** Forward-fill imputation: per-user event values below a threshold are
    * treated as missing and repaired with the most recent valid value
    * (`last(..., ignoreNulls)` over an ordered running frame) — the
    * standard gap-repair pass before feature extraction. Missingness is
    * derived deterministically so the oracle can reproduce it. */
  val q73ForwardFill: QueryDef = QueryDef(
    "q73_forward_fill",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      EventOps.events(s, dir)
        .withColumn("v", when(col("value") >= 1.0, col("value")))
        .withColumn("v_filled", last(col("v"), ignoreNulls = true).over(w))
        .groupBy(col("user_id"))
        .agg(count(col("v")).as("n_valid"),
             count(col("v_filled")).as("n_after_fill"),
             count(lit(1)).as("n_events"))
    },
    Some("""WITH e AS (SELECT user_id, event_id, ts,
          CASE WHEN value >= 1.0 THEN value END AS v
        FROM events),
      f AS (SELECT user_id, v,
          LAST_VALUE(v IGNORE NULLS) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
        FROM e)
      SELECT user_id, COUNT(v) AS n_valid, COUNT(v_filled) AS n_after_fill,
        COUNT(*) AS n_events
      FROM f GROUP BY 1"""))

  /** Per-source token-distribution divergence: Shannon entropy of each
    * source's unigram distribution and its KL divergence from the whole
    * corpus — the drift signal that flags a source whose text stops
    * looking like the rest of the mix. All counts are exact int64 hash
    * aggs keyed by token (vocab-bounded state); the p·ln(p/q) terms are
    * double with the identical expression tree in the oracle, summed
    * under round(…, 6) (q94's proven parity discipline). The 1-row
    * corpus-total broadcast is the q56 scalar idiom.
    */
  val q133SourceDivergence: QueryDef = QueryDef(
    "q133_source_divergence",
    (s, dir) => {
      val tok = Tables(s, dir).documents
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
      val bySrc = tok.groupBy(col("source"), col("t"))
        .agg(count(lit(1)).as("c_st"))
      val srcTot = bySrc.groupBy(col("source"))
        .agg(sum(col("c_st")).as("n_s"), count(lit(1)).as("vocab_s"))
      val glob = tok.groupBy(col("t")).agg(count(lit(1)).as("c_t"))
      val globTot = glob.agg(sum(col("c_t")).as("n_g"))
      bySrc.join(glob, Seq("t"))
        .join(broadcast(srcTot), Seq("source"))
        .crossJoin(broadcast(globTot))
        .withColumn("p", col("c_st").cast("double") / col("n_s"))
        .withColumn("q", col("c_t").cast("double") / col("n_g"))
        .groupBy(col("source"))
        .agg(first(col("n_s")).as("n_tokens"),
             first(col("vocab_s")).as("vocab"),
             round(-sum(col("p") * log(col("p"))), 6).as("entropy"),
             round(sum(col("p") * log(col("p") / col("q"))), 6).as("kl_vs_corpus"))
    },
    Some("""WITH tok AS (SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS t
          FROM documents),
        bysrc AS (SELECT source, t, COUNT(*) AS c_st FROM tok GROUP BY 1, 2),
        srctot AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s,
            COUNT(*) AS vocab_s FROM bysrc GROUP BY 1),
        gtok AS (SELECT t, COUNT(*) AS c_t FROM tok GROUP BY 1),
        globtot AS (SELECT CAST(SUM(c_t) AS BIGINT) AS n_g FROM gtok)
      SELECT b.source, st.n_s AS n_tokens, st.vocab_s AS vocab,
        round(-SUM((CAST(b.c_st AS DOUBLE)/st.n_s)
          * ln(CAST(b.c_st AS DOUBLE)/st.n_s)), 6) AS entropy,
        round(SUM((CAST(b.c_st AS DOUBLE)/st.n_s)
          * ln((CAST(b.c_st AS DOUBLE)/st.n_s)
              / (CAST(g.c_t AS DOUBLE)/gt.n_g))), 6) AS kl_vs_corpus
      FROM bysrc b JOIN gtok g USING (t) JOIN srctot st USING (source)
        CROSS JOIN globtot gt
      GROUP BY 1, 2, 3"""))

  /** Top-p (nucleus) vocabulary truncation per source: rank tokens by
    * frequency, keep the smallest prefix covering ≥95% of the token
    * mass — the tokenizer-design question "how small a vocabulary still
    * covers the corpus". The keep predicate is EXACT int64 arithmetic
    * (prior_cum·100 < 95·total — no doubles anywhere), so parity is
    * structural. Per-source ordered window over a vocab-bounded frame;
    * ties broken lexicographically.
    */
  val q134NucleusVocab: QueryDef = QueryDef(
    "q134_nucleus_vocab",
    (s, dir) => {
      val counts = Tables(s, dir).documents
        .select(col("source"), explode(TextOps.tokens(col("text"))).as("t"))
        .groupBy(col("source"), col("t")).agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("c").desc, col("t").asc)
      val tot = Window.partitionBy(col("source"))
      counts
        .withColumn("cum", sum(col("c")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total", sum(col("c")).over(tot))
        .filter((col("cum") - col("c")) * 100 < col("total") * 95)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"),
             sum(col("c")).as("kept_mass"),
             first(col("total")).as("total_mass"))
    },
    Some("""WITH c AS (SELECT source, t, COUNT(*) AS c FROM
          (SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS t
           FROM documents) GROUP BY 1, 2),
        r AS (SELECT source, t, c,
            SUM(c) OVER (PARTITION BY source ORDER BY c DESC, t ASC
              ROWS UNBOUNDED PRECEDING) AS cum,
            SUM(c) OVER (PARTITION BY source) AS total
          FROM c)
      SELECT source, COUNT(*) AS n_kept,
        CAST(SUM(c) AS BIGINT) AS kept_mass,
        CAST(ANY_VALUE(total) AS BIGINT) AS total_mass
      FROM r WHERE (cum - c) * 100 < total * 95
      GROUP BY 1"""))

  /** Positional phrase search over an inverted index: exact-phrase
    * matching ("table hash") via the positional-index join — two
    * postings lists equi-joined on (doc, position+1). This is how a
    * search engine answers phrase queries without rescanning text; the
    * join keys on doc_id and the postings for a term are |occurrences|
    * rows, so the work is proportional to the phrase terms' frequency,
    * not the corpus.
    */
  val q150PhraseSearch: QueryDef = QueryDef(
    "q150_phrase_search",
    (s, dir) => {
      val pos = Tables(s, dir).documents
        .select(col("doc_id"), posexplode(TextOps.tokens(col("text"))))
        .select(col("doc_id"), col("pos"), col("col").as("tok"))
      val a = pos.filter(col("tok") === "table")
        .select(col("doc_id"), col("pos").as("pos_a"))
      val b = pos.filter(col("tok") === "hash")
        .select(col("doc_id"), col("pos").as("pos_b"))
      a.join(b, a("doc_id") === b("doc_id") && col("pos_b") === col("pos_a") + 1)
        .groupBy(a("doc_id").as("doc_id"))
        .agg(count(lit(1)).as("n_occurrences"),
             min(col("pos_a")).cast("long").as("first_pos"))
    },
    Some("""WITH t AS (SELECT doc_id,
            regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
        pos AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS tok
          FROM t, UNNEST(range(1, len(toks) + 1)) AS r(i))
      SELECT a.doc_id, COUNT(*) AS n_occurrences,
        CAST(MIN(a.pos) AS BIGINT) AS first_pos
      FROM pos a JOIN pos b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.tok = 'table' AND b.tok = 'hash'
      GROUP BY 1"""))

  /** Equi-depth histogram of order prices: exact decile boundaries from
    * one percentile aggregate, broadcast as an array, bucket assignment
    * as `size(filter(bounds, b -> price > b))` — a pure projection over
    * one linear pass (contrast q63's equi-width floor-bucketing). The
    * boundary row is 9 doubles at any scale; at 100 TB the exact
    * percentile step swaps for q132's GK sketch with the same downstream
    * plan.
    */
  val q152EquiDepthHistogram: QueryDef = QueryDef(
    "q152_equidepth_histogram",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val bounds = o.agg(expr(
        """percentile(o_totalprice,
          |  array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"""
          .stripMargin).as("bounds"))
      o.crossJoin(broadcast(bounds))
        .withColumn("bucket",
          expr("size(filter(bounds, b -> o_totalprice > b))").cast("long"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n"),
             min(col("o_totalprice")).as("lo"),
             max(col("o_totalprice")).as("hi"),
             sum(col("o_totalprice").cast(DecimalType(18, 4)))
               .cast("double").as("total"))
    },
    Some("""WITH b AS (SELECT quantile_cont(o_totalprice,
            [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bounds
          FROM orders),
        x AS (SELECT o_totalprice,
            CAST(len(list_filter(b.bounds, y -> o_totalprice > y)) AS BIGINT)
              AS bucket
          FROM orders CROSS JOIN b)
      SELECT bucket, COUNT(*) AS n,
        MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM x GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q58DocChunking, q59DateSpine, q60BigramTopk,
    q61EventCompaction, q62CentroidAssign, q63PriceHistogram, q73ForwardFill,
    q133SourceDivergence, q134NucleusVocab, q150PhraseSearch,
    q152EquiDepthHistogram)
}
