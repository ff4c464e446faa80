package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Governance & storage-planning wave: the k-anonymity generalization
  * LATTICE audit (Incognito/Datafly's search space, evaluated exhaustively
  * — released-data governance beyond q261's fixed-grid audit),
  * leave-one-source-out ablation (data valuation by complement
  * arithmetic — influence without refanning the corpus), and
  * posting-list compression planning (Elias-Fano vs delta-varint vs
  * bitmap, the index-layout decision under every inverted index).
  *
  * Scale shapes: the lattice audit does ONE corpus pass to the finest
  * quasi-identifier grid and evaluates all 27 lattice nodes by rollup of
  * that model-sized frame; LOSO is one per-source aggregation + a 1-row
  * total broadcast (ablation = subtraction, never a re-scan per source);
  * compression planning is postings-linear with integer-exact cost
  * formulas.
  */
object GovernOps {

  /** k-anonymity generalization lattice over (nation, order year, price
    * band): 3 levels per quasi-identifier — identity, one generalization
    * step (region / 2-year bucket / 50k band), full suppression ('*') —
    * giving 27 lattice nodes. For each node: equivalence-class count,
    * minimum class size, rows needing suppression for k = 10, and the
    * k-met flag; the single `is_best` node is the k-meeting node with
    * minimal generalization (level sum, then lexicographic) — the
    * Incognito answer. The corpus is touched ONCE (the finest
    * nation×year×band grid, model-sized: ≤ 25×7×|bands| rows); every
    * lattice node is a rollup of that frame because each generalization
    * is a function of the finer value (floor(p/50k) = floor(floor(p/10k)/5)). */
  val q345KanonLattice: QueryDef = QueryDef(
    "q345_kanon_lattice",
    (s, dir) => {
      val t = Tables(s, dir)
      val finest = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"),
          year(col("o_orderdate")).cast("long").as("yr"),
          floor(col("o_totalprice") / 10000).cast("long").as("p10"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // one corpus pass; 27 rollups read this frame
      val combos = s.range(27).select(
        expr("int(id div 9)").as("l_nation"),
        expr("int((id div 3) % 3)").as("l_year"),
        expr("int(id % 3)").as("l_price"))
      val classes = finest.crossJoin(broadcast(combos))
        .withColumn("g_nat", when(col("l_nation") === 0, col("n_name"))
          .when(col("l_nation") === 1, col("r_name")).otherwise(lit("*")))
        .withColumn("g_yr", when(col("l_year") === 0, col("yr").cast("string"))
          .when(col("l_year") === 1, (col("yr") - pmod(col("yr"), lit(2L))).cast("string"))
          .otherwise(lit("*")))
        .withColumn("g_pr", when(col("l_price") === 0, col("p10").cast("string"))
          .when(col("l_price") === 1, floor(col("p10") / 5).cast("string"))
          .otherwise(lit("*")))
        .groupBy(col("l_nation"), col("l_year"), col("l_price"),
          col("g_nat"), col("g_yr"), col("g_pr"))
        .agg(sum(col("cnt")).as("cls"))
      val nodes = classes.groupBy(col("l_nation"), col("l_year"), col("l_price"))
        .agg(count(lit(1)).as("n_classes"),
          min(col("cls")).as("min_class"),
          sum(when(col("cls") < 10, col("cls")).otherwise(lit(0L))).as("n_suppressed"))
        .withColumn("meets_k10", col("min_class") >= 10)
      val wBest = Window.orderBy(
        (col("l_nation") + col("l_year") + col("l_price")).asc,
        col("l_nation").asc, col("l_year").asc, col("l_price").asc)
      nodes
        .withColumn("rk", when(col("meets_k10"), row_number().over(
          Window.partitionBy(col("meets_k10")).orderBy(
            (col("l_nation") + col("l_year") + col("l_price")).asc,
            col("l_nation").asc, col("l_year").asc, col("l_price").asc))))
        .withColumn("is_best", coalesce(col("rk") === 1 && col("meets_k10"), lit(false)))
        .select(col("l_nation").cast("long").as("l_nation"),
          col("l_year").cast("long").as("l_year"),
          col("l_price").cast("long").as("l_price"),
          col("n_classes"), col("min_class"), col("n_suppressed"),
          col("meets_k10"), col("is_best"))
        .orderBy(col("l_nation"), col("l_year"), col("l_price"))
    },
    Some("""WITH finest AS (SELECT n.n_name, r.r_name,
          CAST(year(o.o_orderdate) AS BIGINT) AS yr,
          CAST(floor(o.o_totalprice / 10000) AS BIGINT) AS p10,
          CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY 1, 2, 3, 4),
      combos AS (SELECT CAST(i // 9 AS INT) AS l_nation,
          CAST((i // 3) % 3 AS INT) AS l_year, CAST(i % 3 AS INT) AS l_price
        FROM UNNEST(range(0, 27)) AS t(i)),
      classes AS (SELECT l_nation, l_year, l_price,
          CASE l_nation WHEN 0 THEN n_name WHEN 1 THEN r_name ELSE '*' END AS g_nat,
          CASE l_year WHEN 0 THEN CAST(yr AS VARCHAR)
            WHEN 1 THEN CAST(yr - yr % 2 AS VARCHAR) ELSE '*' END AS g_yr,
          CASE l_price WHEN 0 THEN CAST(p10 AS VARCHAR)
            WHEN 1 THEN CAST(p10 // 5 AS VARCHAR) ELSE '*' END AS g_pr,
          CAST(SUM(cnt) AS BIGINT) AS cls
        FROM finest CROSS JOIN combos
        GROUP BY 1, 2, 3, 4, 5, 6),
      nodes AS (SELECT l_nation, l_year, l_price,
          CAST(COUNT(*) AS BIGINT) AS n_classes,
          MIN(cls) AS min_class,
          CAST(SUM(CASE WHEN cls < 10 THEN cls ELSE 0 END) AS BIGINT) AS n_suppressed,
          MIN(cls) >= 10 AS meets_k10
        FROM classes GROUP BY 1, 2, 3),
      best AS (SELECT l_nation, l_year, l_price,
          ROW_NUMBER() OVER (ORDER BY l_nation + l_year + l_price,
            l_nation, l_year, l_price) AS rk
        FROM nodes WHERE meets_k10)
      SELECT CAST(n.l_nation AS BIGINT) AS l_nation,
        CAST(n.l_year AS BIGINT) AS l_year,
        CAST(n.l_price AS BIGINT) AS l_price,
        n.n_classes, n.min_class, n.n_suppressed, n.meets_k10,
        COALESCE(b.rk = 1, FALSE) AS is_best
      FROM nodes n LEFT JOIN best b
        ON b.l_nation = n.l_nation AND b.l_year = n.l_year AND b.l_price = n.l_price
      ORDER BY l_nation, l_year, l_price"""))

  /** Leave-one-source-out ablation (the data-valuation pattern): the
    * corpus-level quality metrics recomputed with each source EXCLUDED —
    * by complement arithmetic on per-source DECIMAL-exact partial sums
    * (loso_mean(s) = (Σ − Σ_s)/(N − n_s)), so the whole ablation is one
    * per-source aggregation + a 1-row total broadcast. The O(|sources|)
    * alternative of re-scanning the corpus per source never happens —
    * the shape that makes ablation viable at 100 TB. Reports per source:
    * its size, the full-corpus and leave-it-out means of the quality
    * score and gate pass rate, deltas, and the influence rank by
    * absolute score delta. */
  val q346LosoAblation: QueryDef = QueryDef(
    "q346_loso_ablation",
    (s, dir) => {
      val dec = DecimalType(24, 6)
      val scored = Tables(s, dir).documents
        .select(col("source"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("source"),
          round(size(array_distinct(col("toks"))).cast("double") /
            size(col("toks")), 6).cast(dec).as("score"),
          (size(col("toks")) >= 20 && size(col("toks")) <= 400).cast("long").as("pass"))
      val perSource = scored.groupBy(col("source"))
        .agg(count(lit(1)).as("n"), sum(col("score")).as("ssum"),
          sum(col("pass")).as("psum"))
        .localCheckpoint() // feeds both the totals and the per-source report
      val totals = broadcast(perSource.agg(
        sum(col("n")).as("tn"), sum(col("ssum")).as("tssum"),
        sum(col("psum")).as("tpsum")))
      perSource.crossJoin(totals)
        .withColumn("mean_full", round(col("tssum").cast("double") / col("tn"), 9))
        .withColumn("mean_loso", round((col("tssum") - col("ssum")).cast("double") /
          (col("tn") - col("n")), 9))
        .withColumn("pass_full", round(col("tpsum").cast("double") / col("tn"), 9))
        .withColumn("pass_loso", round((col("tpsum") - col("psum")).cast("double") /
          (col("tn") - col("n")), 9))
        .withColumn("delta_score", round(col("mean_loso") - col("mean_full"), 9))
        .withColumn("delta_pass", round(col("pass_loso") - col("pass_full"), 9))
        .withColumn("influence_rank", row_number().over(Window.orderBy(
          abs(col("delta_score")).desc, col("source").asc)).cast("long"))
        .select(col("source"), col("n").as("n_docs"), col("mean_full"),
          col("mean_loso"), col("delta_score"), col("pass_full"),
          col("pass_loso"), col("delta_pass"), col("influence_rank"))
        .orderBy(col("influence_rank"))
    },
    Some("""WITH scored AS (SELECT source,
          CAST(round(CAST(len(list_distinct(tk)) AS DOUBLE) / len(tk), 6)
            AS DECIMAL(24,6)) AS score,
          CASE WHEN len(tk) >= 20 AND len(tk) <= 400 THEN 1 ELSE 0 END AS pass
        FROM (SELECT source, regexp_extract_all(lower(text), '\w+') AS tk
              FROM documents)
        WHERE len(tk) > 0),
      per AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
          SUM(score) AS ssum, CAST(SUM(pass) AS BIGINT) AS psum
        FROM scored GROUP BY 1),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, SUM(ssum) AS tssum,
          CAST(SUM(psum) AS BIGINT) AS tpsum FROM per),
      rep AS (SELECT p.source, p.n AS n_docs,
          round(CAST(t.tssum AS DOUBLE) / t.tn, 9) AS mean_full,
          round(CAST(t.tssum - p.ssum AS DOUBLE) / (t.tn - p.n), 9) AS mean_loso,
          round(CAST(t.tpsum AS DOUBLE) / t.tn, 9) AS pass_full,
          round(CAST(t.tpsum - p.psum AS DOUBLE) / (t.tn - p.n), 9) AS pass_loso
        FROM per p CROSS JOIN tot t),
      d AS (SELECT *, round(mean_loso - mean_full, 9) AS delta_score,
          round(pass_loso - pass_full, 9) AS delta_pass FROM rep)
      SELECT source, n_docs, mean_full, mean_loso, delta_score,
        pass_full, pass_loso, delta_pass,
        CAST(ROW_NUMBER() OVER (ORDER BY abs(delta_score) DESC, source)
          AS BIGINT) AS influence_rank
      FROM d ORDER BY influence_rank"""))

  /** Posting-list compression planning: for every term with df ≥ 5, the
    * exact storage cost in bits under three layouts — bitmap (N bits),
    * Elias-Fano (df·(2 + ⌈log₂(N/df)⌉) — the EF upper bound with the
    * standard low-bit width ⌈log₂(u/n)⌉), and delta-varint (7-bit
    * continuation bytes over doc-id gaps, priced by an exact integer
    * threshold ladder, no floating log) — and the winning layout
    * (ties: ef ≺ varint ≺ bitmap). The postings build is
    * posexplode + distinct + a lag window per term — linear in posting
    * mass; the cost arithmetic is integer-exact so the oracle ties
    * bit-for-bit. The classic outcome shows up in the data: dense terms
    * → bitmap, mid terms → EF, sparse/clustered → varint. */
  val q347PostingCompression: QueryDef = QueryDef(
    "q347_posting_compression",
    (s, dir) => {
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      val nDocs = broadcast(docs.agg(count(lit(1)).as("n_docs")))
      val postings = docs
        .select(col("doc_id"), explode(array_distinct(col("toks"))).as("term"))
        .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("one"))
        .select(col("term"), col("doc_id"))
      val wTerm = Window.partitionBy(col("term")).orderBy(col("doc_id"))
      def varintBytes(gap: org.apache.spark.sql.Column) =
        when(gap < 128L, 1L).when(gap < 16384L, 2L)
          .when(gap < 2097152L, 3L).when(gap < 268435456L, 4L).otherwise(5L)
      val gaps = postings
        .withColumn("gap", col("doc_id") - coalesce(lag(col("doc_id"), 1).over(wTerm),
          lit(-1L)))
        .groupBy(col("term"))
        .agg(count(lit(1)).as("df"), sum(varintBytes(col("gap")) * 8L).as("varint_bits"))
        .filter(col("df") >= 5)
      gaps.crossJoin(nDocs)
        .withColumn("bitmap_bits", col("n_docs"))
        // ceil-log2 via integer bit length (length of bin(c-1), c = ceil
        // division) — a floating log2 would flip at exact powers of two
        // where Spark's ln-ratio rounds below the integer
        .withColumn("c", expr("(n_docs + df - 1) div df"))
        .withColumn("ef_bits", col("df") * (lit(2L) +
          when(col("c") <= 1, 0L)
            .otherwise(length(bin(col("c") - 1)).cast("long"))))
        .withColumn("best", when(col("ef_bits") <= col("varint_bits") &&
            col("ef_bits") <= col("bitmap_bits"), "ef")
          .when(col("varint_bits") <= col("bitmap_bits"), "varint")
          .otherwise("bitmap"))
        .select(col("term"), col("df"), col("bitmap_bits"), col("ef_bits"),
          col("varint_bits"), col("best"))
        .orderBy(col("df").desc, col("term"))
        .limit(200)
    },
    Some("""WITH d AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks
          FROM documents),
      nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM d),
      postings AS (SELECT DISTINCT t.term, d.doc_id
        FROM d, UNNEST(list_distinct(toks)) AS t(term)),
      gaps AS (SELECT term, doc_id,
          doc_id - COALESCE(lag(doc_id) OVER (PARTITION BY term ORDER BY doc_id), -1)
            AS gap
        FROM postings),
      agg AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
          CAST(SUM(8 * CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
            WHEN gap < 2097152 THEN 3 WHEN gap < 268435456 THEN 4
            ELSE 5 END) AS BIGINT) AS varint_bits
        FROM gaps GROUP BY 1 HAVING COUNT(*) >= 5),
      cost AS (SELECT a.term, a.df, n.n_docs AS bitmap_bits,
          a.df * (2 + CASE WHEN (n.n_docs + a.df - 1) // a.df <= 1 THEN 0
            ELSE CAST(strlen(bin((n.n_docs + a.df - 1) // a.df - 1)) AS BIGINT)
            END) AS ef_bits,
          a.varint_bits
        FROM agg a CROSS JOIN nd n)
      SELECT term, df, bitmap_bits, ef_bits, varint_bits,
        CASE WHEN ef_bits <= varint_bits AND ef_bits <= bitmap_bits THEN 'ef'
             WHEN varint_bits <= bitmap_bits THEN 'varint'
             ELSE 'bitmap' END AS best
      FROM cost ORDER BY df DESC, term LIMIT 200"""))

  val all: Seq[QueryDef] = Seq(q345KanonLattice, q346LosoAblation,
    q347PostingCompression)
}
