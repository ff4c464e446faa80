package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Entropy-rate wave: the Shannon conditional-entropy ladder per
  * source — token-level H₁, H(X₂|X₁), H(X₃|X₁X₂) and the implied
  * redundancy, the corpus-level cousin of q314's char entropy and the
  * quantity a compression-based quality filter is estimating.
  *
  * Scale shape: three n-gram aggregations (all partial-agg friendly);
  * conditional entropies are computed as H(joint) − H(context) from
  * the same count frames — no per-row probability joins.
  */
object EntropyOps {

  private val dec = DecimalType(28, 10)

  /** Conditional-entropy ladder (Shannon 1951's entropy-of-English
    * experiment, run on the corpus): per source, the plug-in estimates
    * H₁ = H(unigram), H(X₂|X₁) = H(bigram) − H(unigram over bigram
    * contexts), H(X₃|X₁X₂) = H(trigram) − H(bigram contexts), in bits,
    * plus redundancy 1 − H(X₃|·)/log₂V. Conditioning can only lower
    * entropy — a law that holds for ANY empirical joint, so the spec
    * asserts the full ladder ordering. Each H is Σ −(c/N)·log₂(c/N)
    * with the per-term round→DECIMAL discipline; context frames reuse
    * the same counts, so the whole ladder is six hash aggregations. */
  val q386EntropyRate: QueryDef = QueryDef(
    "q386_entropy_rate",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("source"), TextOps.tokens(col("text")).as("tk"))
        .localCheckpoint() // feeds the three n-gram passes
      def grams(n: Int) = toks
        .filter(size(col("tk")) >= n)
        .select(col("source"), explode(expr(
          s"""transform(sequence(0, size(tk) - $n),
               i -> concat_ws(' ', slice(tk, i + 1, $n)))""")).as("g"))
        .groupBy(col("source"), col("g")).agg(count(lit(1)).as("c"))
      // plug-in entropy in bits over an n-gram count frame
      def entropy(df: org.apache.spark.sql.DataFrame, out: String) = df
        .withColumn("n", sum(col("c")).over(Window.partitionBy(col("source"))))
        .withColumn("term", round(
          -(col("c").cast("double") / col("n")) *
            (log(col("c").cast("double") / col("n")) / log(lit(2.0))), 9).cast(dec))
        .groupBy(col("source")).agg(sum(col("term")).cast("double").as(out))
      val h1 = entropy(grams(1), "h_uni")
      val h2 = entropy(grams(2), "h_bi")
      val h3 = entropy(grams(3), "h_tri")
      // context entropies: unigram/bigram distributions restricted to
      // positions that HAVE a continuation (= the n-gram prefixes)
      val ctx1 = entropy(grams(2)
        .select(col("source"), expr("split(g, ' ')[0]").as("g"), col("c"))
        .groupBy(col("source"), col("g")).agg(sum(col("c")).as("c")), "h_ctx1")
      val ctx2 = entropy(grams(3)
        .select(col("source"),
          expr("concat_ws(' ', slice(split(g, ' '), 1, 2))").as("g"), col("c"))
        .groupBy(col("source"), col("g")).agg(sum(col("c")).as("c")), "h_ctx2")
      val vocab = grams(1).groupBy(col("source")).agg(count(lit(1)).as("v"))
      h1.join(h2, Seq("source")).join(h3, Seq("source"))
        .join(ctx1, Seq("source")).join(ctx2, Seq("source"))
        .join(vocab, Seq("source"))
        .select(col("source"), col("v").as("vocab"),
          round(col("h_uni"), 6).as("h1_bits"),
          round(col("h_bi") - col("h_ctx1"), 6).as("h2_cond_bits"),
          round(col("h_tri") - col("h_ctx2"), 6).as("h3_cond_bits"),
          round(lit(1.0) - (col("h_tri") - col("h_ctx2")) /
            (log(col("v").cast("double")) / log(lit(2.0))), 6).as("redundancy"))
        .orderBy(col("source"))
    },
    Some("""WITH t AS (SELECT source, regexp_extract_all(lower(text), '\w+') AS tk
        FROM documents),
      g1 AS (SELECT source, u.g, CAST(COUNT(*) AS BIGINT) AS c
        FROM t, UNNEST(tk) AS u(g) GROUP BY 1, 2),
      g2 AS (SELECT source, u.g, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, tk FROM t WHERE len(tk) >= 2),
          UNNEST(list_transform(range(1, len(tk)),
            i -> tk[i] || ' ' || tk[i + 1])) AS u(g)
        GROUP BY 1, 2),
      g3 AS (SELECT source, u.g, CAST(COUNT(*) AS BIGINT) AS c
        FROM (SELECT source, tk FROM t WHERE len(tk) >= 3),
          UNNEST(list_transform(range(1, len(tk) - 1),
            i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS u(g)
        GROUP BY 1, 2),
      c1 AS (SELECT source, string_split(g, ' ')[1] AS g, CAST(SUM(c) AS BIGINT) AS c
        FROM g2 GROUP BY 1, 2),
      c2 AS (SELECT source, string_split(g, ' ')[1] || ' ' || string_split(g, ' ')[2] AS g,
          CAST(SUM(c) AS BIGINT) AS c
        FROM g3 GROUP BY 1, 2),
      eh AS (SELECT 'h_uni' AS k, source, c FROM g1
        UNION ALL SELECT 'h_bi', source, c FROM g2
        UNION ALL SELECT 'h_tri', source, c FROM g3
        UNION ALL SELECT 'h_ctx1', source, c FROM c1
        UNION ALL SELECT 'h_ctx2', source, c FROM c2),
      ew AS (SELECT k, source, c, SUM(c) OVER (PARTITION BY k, source) AS n FROM eh),
      ent AS (SELECT k, source, CAST(SUM(CAST(round(
          -(CAST(c AS DOUBLE) / n) * (ln(CAST(c AS DOUBLE) / n) / ln(2.0)), 9)
          AS DECIMAL(28,10))) AS DOUBLE) AS h
        FROM ew GROUP BY 1, 2),
      piv AS (SELECT source,
          MAX(CASE WHEN k = 'h_uni' THEN h END) AS h_uni,
          MAX(CASE WHEN k = 'h_bi' THEN h END) AS h_bi,
          MAX(CASE WHEN k = 'h_tri' THEN h END) AS h_tri,
          MAX(CASE WHEN k = 'h_ctx1' THEN h END) AS h_ctx1,
          MAX(CASE WHEN k = 'h_ctx2' THEN h END) AS h_ctx2
        FROM ent GROUP BY 1),
      vv AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v FROM g1 GROUP BY 1)
      SELECT piv.source, vv.v AS vocab,
        round(h_uni, 6) AS h1_bits,
        round(h_bi - h_ctx1, 6) AS h2_cond_bits,
        round(h_tri - h_ctx2, 6) AS h3_cond_bits,
        round(1.0 - (h_tri - h_ctx2) / (ln(CAST(vv.v AS DOUBLE)) / ln(2.0)), 6) AS redundancy
      FROM piv JOIN vv USING (source)
      ORDER BY piv.source"""))

  val all: Seq[QueryDef] = Seq(q386EntropyRate)
}
