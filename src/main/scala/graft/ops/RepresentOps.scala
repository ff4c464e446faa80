package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Representation & release wave: linear CKA between two embedding
  * views, distinct-n generation diversity, and the exponential-
  * mechanism median release audit.
  *
  * Scale shapes: q369's only non-linear stage is the per-item
  * 32×32 dim-pair fan-out (a bounded model-sized blow-up, like q272's
  * MI matrix); q370 is n-gram explodes + distinct aggregations; q371
  * reduces the scan to a 32-row candidate frame before the utility
  * ladder.
  */
object RepresentOps {

  private val dec = DecimalType(28, 9)

  /** Linear CKA (centered-kernel alignment, Kornblith et al. 2019 —
    * THE representation-similarity metric) between the first and
    * second halves of the embedding, i.e. "does the tail of the vector
    * encode anything the head doesn't": CKA = ‖X̄ᵀȲ‖²_F /
    * (‖X̄ᵀX̄‖_F·‖ȲᵀȲ‖_F) over column-centered views. Every Gram entry
    * c_pq = Σᵢ x̄ᵢₚ·ȳᵢᵩ is a round→DECIMAL sum over items; the three
    * Frobenius masses are 32×32-term DECIMAL sums of rounded squares;
    * the final ratio is one double expression. The dim-pair fan-out is
    * 1024 rows per item — model-sized, the same bounded blow-up
    * contract as q272 — and every join is an equi-join on vec_id or a
    * 64-row means broadcast. Near-1 CKA here = the matryoshka-style
    * redundancy q253 measures by recall, certified representationally. */
  val q369CkaRedundancy: QueryDef = QueryDef(
    "q369_cka_redundancy",
    (s, dir) => {
      val dims = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").cast("long").as("k"),
          col("col").cast("double").as("v"))
        .localCheckpoint() // feeds means + both centered views
      val means = broadcast(dims.groupBy(col("k"))
        .agg((sum(round(col("v"), 9).cast(dec)).cast("double") /
          count(lit(1))).as("mu")))
      val centered = dims.join(means, Seq("k"))
        .select(col("vec_id"), col("k"), round(col("v") - col("mu"), 9).as("c"))
      val x = centered.filter(col("k") < 32)
        .select(col("vec_id"), col("k").as("p"), col("c").as("xc"))
      val y = centered.filter(col("k") >= 32)
        .select(col("vec_id"), (col("k") - 32).as("q"), col("c").as("yc"))
      val sxy = x.join(y, Seq("vec_id"))
        .groupBy(col("p"), col("q"))
        .agg(sum(round(col("xc") * col("yc"), 9).cast(dec)).as("cpq"))
        .agg(sum(round(pow(col("cpq").cast("double"), 2), 6).cast(dec)).as("sxy"))
      val n = Tables(s, dir).embeddings.agg(count(lit(1)).as("n"))
      // self-masses: the same gram pipeline with both sides = the view
      def selfMass(v: org.apache.spark.sql.DataFrame, out: String) =
        v.select(col("vec_id"), col("p"), col("xc"))
          .join(v.select(col("vec_id"), col("p").as("q"), col("xc").as("yc")),
            Seq("vec_id"))
          .groupBy(col("p"), col("q"))
          .agg(sum(round(col("xc") * col("yc"), 9).cast(dec)).as("cpq"))
          .agg(sum(round(pow(col("cpq").cast("double"), 2), 6).cast(dec))
            .as(out))
      val mxx = selfMass(x, "sxx")
      val myy = selfMass(y.withColumnRenamed("q", "p")
        .withColumnRenamed("yc", "xc"), "syy")
      n.crossJoin(sxy).crossJoin(mxx).crossJoin(myy)
        .select(col("n"),
          round(col("sxy").cast("double"), 2).as("cross_mass"),
          round(col("sxx").cast("double"), 2).as("head_mass"),
          round(col("syy").cast("double"), 2).as("tail_mass"),
          round(col("sxy").cast("double") /
            sqrt(col("sxx").cast("double") * col("syy").cast("double")), 6)
            .as("cka"))
    },
    Some("""WITH dims AS (SELECT vec_id, r.k - 1 AS k,
          CAST(embedding[r.k] AS DOUBLE) AS v
        FROM embeddings, (SELECT UNNEST(range(1, 65)) AS k) r),
      means AS (SELECT k,
          CAST(SUM(CAST(round(v, 9) AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS mu
        FROM dims GROUP BY 1),
      c AS (SELECT vec_id, dims.k, round(v - mu, 9) AS c
        FROM dims JOIN means USING (k)),
      x AS (SELECT vec_id, k AS p, c AS xc FROM c WHERE k < 32),
      y AS (SELECT vec_id, k - 32 AS q, c AS yc FROM c WHERE k >= 32),
      gxy AS (SELECT p, q, SUM(CAST(round(xc * yc, 9) AS DECIMAL(28,9))) AS cpq
        FROM x JOIN y USING (vec_id) GROUP BY 1, 2),
      gxx AS (SELECT a.p, b.p AS q, SUM(CAST(round(a.xc * b.xc, 9) AS DECIMAL(28,9))) AS cpq
        FROM x a JOIN x b USING (vec_id) GROUP BY 1, 2),
      gyy AS (SELECT a.q AS p, b.q, SUM(CAST(round(a.yc * b.yc, 9) AS DECIMAL(28,9))) AS cpq
        FROM y a JOIN y b USING (vec_id) GROUP BY 1, 2),
      sxy AS (SELECT SUM(CAST(round(pow(CAST(cpq AS DOUBLE), 2), 6) AS DECIMAL(28,9))) AS sxy FROM gxy),
      sxx AS (SELECT SUM(CAST(round(pow(CAST(cpq AS DOUBLE), 2), 6) AS DECIMAL(28,9))) AS sxx FROM gxx),
      syy AS (SELECT SUM(CAST(round(pow(CAST(cpq AS DOUBLE), 2), 6) AS DECIMAL(28,9))) AS syy FROM gyy),
      nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings)
      SELECT n, round(CAST(sxy AS DOUBLE), 2) AS cross_mass,
        round(CAST(sxx AS DOUBLE), 2) AS head_mass,
        round(CAST(syy AS DOUBLE), 2) AS tail_mass,
        round(CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)), 6) AS cka
      FROM nn CROSS JOIN sxy CROSS JOIN sxx CROSS JOIN syy"""))

  /** Distinct-n generation diversity (Li et al. 2016's distinct-1/2/3 —
    * the standard repetitiveness audit for generated corpora, the
    * aggregate cousin of q76's per-doc repetition): per source, the
    * ratio of unique n-grams to total n-grams for n = 1, 2, 3. A
    * template-heavy or decode-degenerate source shows collapsing
    * distinct-2/3. One explode per n, all shuffles partial-agg
    * friendly; ratios are single divisions over exact counts. */
  val q370DistinctN: QueryDef = QueryDef(
    "q370_distinct_n",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("source"), TextOps.tokens(col("text")).as("tk"))
        .localCheckpoint() // three n-gram passes share the tokenization
      def dn(n: Int) = toks
        .filter(size(col("tk")) >= n)
        .select(col("source"), explode(expr(
          s"""transform(sequence(0, size(tk) - $n),
               i -> concat_ws(' ', slice(tk, i + 1, $n)))""")).as("g"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as(s"total_$n"), countDistinct(col("g")).as(s"uniq_$n"))
        .withColumn(s"distinct_$n", round(
          col(s"uniq_$n").cast("double") / col(s"total_$n"), 6))
      dn(1).join(dn(2), Seq("source")).join(dn(3), Seq("source"))
        .select(col("source"), col("total_1").as("n_tokens"),
          col("distinct_1"), col("distinct_2"), col("distinct_3"))
        .orderBy(col("source"))
    },
    Some("""WITH t AS (SELECT source, regexp_extract_all(lower(text), '\w+') AS tk
        FROM documents),
      g1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS total_1,
          round(CAST(COUNT(DISTINCT u.g) AS DOUBLE) / COUNT(*), 6) AS distinct_1
        FROM t, UNNEST(tk) AS u(g) WHERE len(tk) >= 1 GROUP BY 1),
      g2 AS (SELECT source,
          round(CAST(COUNT(DISTINCT u.g) AS DOUBLE) / COUNT(*), 6) AS distinct_2
        FROM t, UNNEST(list_transform(range(1, len(tk)),
          i -> tk[i] || ' ' || tk[i + 1])) AS u(g) GROUP BY 1),
      g3 AS (SELECT source,
          round(CAST(COUNT(DISTINCT u.g) AS DOUBLE) / COUNT(*), 6) AS distinct_3
        FROM t, UNNEST(list_transform(range(1, len(tk) - 1),
          i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS u(g) GROUP BY 1)
      SELECT source, total_1 AS n_tokens, distinct_1, distinct_2, distinct_3
      FROM g1 JOIN g2 USING (source) JOIN g3 USING (source)
      ORDER BY source"""))

  /** Exponential-mechanism median release audit (McSherry & Talwar
    * 2007): the DP way to publish a median without touching the raw
    * value. Candidates are 32 price buckets; utility u(c) =
    * −|rank_below(c)/n − 1/2| (how far the bucket boundary sits from
    * the true median, in rank fraction), and each bucket's selection
    * weight is exp(10·u) (rank utility normalized by n, so the scale is
    * SF-free; ε absorbs the n factor), normalized into a distribution.
    * The audit publishes the full weight profile — the release IS a
    * sample from it, and an auditor needs the profile to check the
    * privacy/utility trade (how much mass sits within ±1 bucket of
    * truth; the spec asserts unimodality at the true median). The scan
    * collapses to a 32-row candidate frame; weights follow the
    * round→DECIMAL discipline. */
  val q371DpExpMedian: QueryDef = QueryDef(
    "q371_dp_exp_median",
    (s, dir) => {
      val bucketed = Tables(s, dir).orders
        .select(least(lit(31L), floor(col("o_totalprice") / 20000)).as("bkt"))
        .groupBy(col("bkt")).agg(count(lit(1)).as("cnt"))
      val spine = broadcast(s.range(0, 32).toDF("bkt"))
      val cum = spine.join(bucketed, Seq("bkt"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .withColumn("below", sum(col("cnt")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("below", coalesce(col("below"), lit(0L)))
        .localCheckpoint()
      val tot = cum.agg(sum(col("cnt")).as("n"))
      val scored = cum.crossJoin(tot)
        .withColumn("utility",
          -abs(col("below").cast("double") / col("n") - 0.5))
        .withColumn("w", round(exp(lit(10.0) * col("utility")), 9))
      val z = scored.agg(sum(col("w").cast(dec)).as("z"))
      scored.crossJoin(z)
        .select(col("bkt"), col("cnt"), col("below"), col("n"),
          round(col("utility"), 6).as("utility"),
          round(col("w").cast("double") / col("z").cast("double"), 9)
            .as("p_select"))
        .orderBy(col("bkt"))
    },
    Some("""WITH b AS (SELECT least(31, CAST(floor(o_totalprice / 20000) AS BIGINT)) AS bkt
        FROM orders),
      cnts AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS cnt FROM b GROUP BY 1),
      spine AS (SELECT UNNEST(range(0, 32)) AS bkt),
      cum AS (SELECT s.bkt, COALESCE(c.cnt, 0) AS cnt,
          COALESCE(CAST(SUM(COALESCE(c.cnt, 0)) OVER (ORDER BY s.bkt
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS below
        FROM spine s LEFT JOIN cnts c USING (bkt)),
      tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM cum),
      sc AS (SELECT cum.*, tot.n,
          -abs(CAST(below AS DOUBLE) / n - 0.5) AS utility,
          round(exp(10.0 * (-abs(CAST(below AS DOUBLE) / n - 0.5))), 9) AS w
        FROM cum CROSS JOIN tot),
      z AS (SELECT SUM(CAST(w AS DECIMAL(28,9))) AS z FROM sc)
      SELECT bkt, cnt, below, n, round(utility, 6) AS utility,
        round(CAST(w AS DOUBLE) / CAST(z.z AS DOUBLE), 9) AS p_select
      FROM sc CROSS JOIN z
      ORDER BY bkt"""))

  val all: Seq[QueryDef] = Seq(q369CkaRedundancy, q370DistinctN, q371DpExpMedian)
}
