package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Network & allocation wave II: HITS hubs/authorities on the part tree,
  * modularity of the brand partition on the co-purchase graph, entropic
  * optimal transport (Sinkhorn) between the lang and source marginals,
  * and a sensitivity-sampled coreset over the embedding corpus.
  *
  * Iterative pieces are exactly unrolled (2 HITS rounds, 3 Sinkhorn
  * sweeps) with 9 dp rounding at every normalization — the q93/q62
  * defenses — so both engines walk the identical float path.
  */
object NetworkOps {

  /** HITS (Kleinberg) hubs & authorities, 2 unrolled rounds with L2
    * normalization, on the part-hierarchy tree (child → parent =
    * partkey/2 — q21's edge set). Each round is one equi-join per
    * direction; every per-node sum has ≤ 2 terms (a node has one parent,
    * ≤ 2 children), so IEEE addition order cannot vary; the L2 norms are
    * 1-row DECIMAL power-sum broadcasts (the q93 idiom, allowlisted with
    * bound 1). O(|V|) per round at any scale — no global windows. */
  val q246Hits: QueryDef = QueryDef(
    "q246_hits",
    (s, dir) => {
      val decN = DecimalType(28, 14)
      val part = Tables(s, dir).part
      val e = part.filter(col("p_partkey") >= 2)
        .select(col("p_partkey").as("u"), floor(col("p_partkey") / 2).as("v"))
        .localCheckpoint() // feeds every round in both directions
      // round 1: auth = in-degree (h0 = 1), L2-normalized
      val a1 = e.groupBy(col("v")).agg(count(lit(1)).as("ar"))
      val na1 = a1.agg(round(sqrt(sum(col("ar") * col("ar"))), 9).as("na"))
      val a1n = a1.crossJoin(broadcast(na1))
        .select(col("v"), round(col("ar") / col("na"), 9).as("a"))
      // h1(u) = a1n(parent(u)) — exactly one term per node
      val h1 = e.join(a1n, Seq("v")).select(col("u"), col("a").as("hr"))
      val nh1 = h1.agg(round(sqrt(
        sum(round(col("hr") * col("hr"), 12).cast(decN)).cast("double")), 9).as("nh"))
      val h1n = h1.crossJoin(broadcast(nh1))
        .select(col("u"), round(col("hr") / col("nh"), 9).as("h"))
      // round 2: auth from hubs (≤ 2 children per parent), hubs from auth
      val a2 = e.join(h1n, Seq("u")).groupBy(col("v")).agg(sum(col("h")).as("ar"))
      val na2 = a2.agg(round(sqrt(
        sum(round(col("ar") * col("ar"), 12).cast(decN)).cast("double")), 9).as("na"))
      val a2n = a2.crossJoin(broadcast(na2))
        .select(col("v"), round(col("ar") / col("na"), 9).as("a"))
      val h2 = e.join(a2n, Seq("v")).select(col("u"), col("a").as("hr"))
      val nh2 = h2.agg(round(sqrt(
        sum(round(col("hr") * col("hr"), 12).cast(decN)).cast("double")), 9).as("nh"))
      val h2n = h2.crossJoin(broadcast(nh2))
        .select(col("u"), round(col("hr") / col("nh"), 9).as("h"))
      part.select(col("p_partkey").as("part"))
        .join(a2n.withColumnRenamed("v", "part"), Seq("part"), "left")
        .join(h2n.withColumnRenamed("u", "part"), Seq("part"), "left")
        .select(col("part"),
          round(coalesce(col("h"), lit(0.0)), 6).as("hub"),
          round(coalesce(col("a"), lit(0.0)), 6).as("authority"))
    },
    Some("""WITH e AS (SELECT p_partkey AS u, p_partkey // 2 AS v FROM part WHERE p_partkey >= 2),
      a1 AS (SELECT v, COUNT(*) AS ar FROM e GROUP BY 1),
      na1 AS (SELECT round(sqrt(SUM(ar * ar)), 9) AS na FROM a1),
      a1n AS (SELECT v, round(CAST(ar AS DOUBLE) / na, 9) AS a FROM a1, na1),
      h1 AS (SELECT e.u, a1n.a AS hr FROM e JOIN a1n USING (v)),
      nh1 AS (SELECT round(sqrt(CAST(SUM(CAST(round(hr * hr, 12) AS DECIMAL(28,14))) AS DOUBLE)), 9) AS nh FROM h1),
      h1n AS (SELECT u, round(hr / nh, 9) AS h FROM h1, nh1),
      a2 AS (SELECT e.v, SUM(h1n.h) AS ar FROM e JOIN h1n USING (u) GROUP BY 1),
      na2 AS (SELECT round(sqrt(CAST(SUM(CAST(round(ar * ar, 12) AS DECIMAL(28,14))) AS DOUBLE)), 9) AS na FROM a2),
      a2n AS (SELECT v, round(ar / na, 9) AS a FROM a2, na2),
      h2 AS (SELECT e.u, a2n.a AS hr FROM e JOIN a2n USING (v)),
      nh2 AS (SELECT round(sqrt(CAST(SUM(CAST(round(hr * hr, 12) AS DECIMAL(28,14))) AS DOUBLE)), 9) AS nh FROM h2),
      h2n AS (SELECT u, round(hr / nh, 9) AS h FROM h2, nh2)
      SELECT p.p_partkey AS part,
        round(COALESCE(h2n.h, 0.0), 6) AS hub,
        round(COALESCE(a2n.a, 0.0), 6) AS authority
      FROM part p LEFT JOIN a2n ON a2n.v = p.p_partkey
        LEFT JOIN h2n ON h2n.u = p.p_partkey"""))

  /** Newman modularity of the brand partition on the support-2
    * co-purchase graph (q239's edge build): Q_c = L_c/m − (d_c/2m)² per
    * community. Degrees and within-community edges reduce to brand-sized
    * frames; 2m = Σ_c d_c, so the total comes from a global window over
    * the ~|brands| rows — no scalar broadcast, nothing driver-side. A
    * positive Σ Q_c says brands really do structure co-purchases. */
  val q247Modularity: QueryDef = QueryDef(
    "q247_modularity",
    (s, dir) => {
      // shared derived base table (GraphBase, distinct-support variant):
      // feeds degrees and the within-community count
      val edges = GraphBase.coPurchaseEdgesDistinct(s, dir)
      val brands = Tables(s, dir).part
        .select(col("p_partkey"), col("p_brand"))
      val deg = edges.select(col("pa").as("n")).union(edges.select(col("pb").as("n")))
        .join(brands.withColumnRenamed("p_partkey", "n"), Seq("n"))
        .groupBy(col("p_brand")).agg(count(lit(1)).as("d_sum"),
          countDistinct(col("n")).as("n_nodes"))
      val lin = edges
        .join(brands.select(col("p_partkey").as("pa"), col("p_brand").as("ba")), Seq("pa"))
        .join(brands.select(col("p_partkey").as("pb"), col("p_brand").as("bb")), Seq("pb"))
        .filter(col("ba") === col("bb"))
        .groupBy(col("ba").as("p_brand")).agg(count(lit(1)).as("l_in"))
      val wAll = Window.partitionBy()
      deg.join(lin, Seq("p_brand"), "left")
        .withColumn("l_in", coalesce(col("l_in"), lit(0L)))
        .withColumn("m", sum(col("d_sum")).over(wAll) / 2)
        .select(col("p_brand"), col("n_nodes"), col("d_sum"), col("l_in"),
          round(col("l_in").cast("double") / col("m") -
            pow(col("d_sum").cast("double") / (col("m") * 2), 2), 6).as("q_contrib"))
    },
    Some("""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      ends AS (SELECT pa AS n FROM e UNION ALL SELECT pb FROM e),
      deg AS (SELECT p.p_brand, CAST(COUNT(*) AS BIGINT) AS d_sum,
          CAST(COUNT(DISTINCT ends.n) AS BIGINT) AS n_nodes
        FROM ends JOIN part p ON p.p_partkey = ends.n GROUP BY 1),
      lin AS (SELECT pa_b.p_brand, CAST(COUNT(*) AS BIGINT) AS l_in
        FROM e JOIN part pa_b ON pa_b.p_partkey = e.pa
          JOIN part pb_b ON pb_b.p_partkey = e.pb
        WHERE pa_b.p_brand = pb_b.p_brand GROUP BY 1),
      j AS (SELECT deg.p_brand, deg.n_nodes, deg.d_sum,
          COALESCE(lin.l_in, 0) AS l_in,
          SUM(deg.d_sum) OVER () / 2 AS m
        FROM deg LEFT JOIN lin USING (p_brand))
      SELECT p_brand, n_nodes, d_sum, CAST(l_in AS BIGINT) AS l_in,
        round(CAST(l_in AS DOUBLE) / m - pow(CAST(d_sum AS DOUBLE) / (m * 2), 2), 6) AS q_contrib
      FROM j"""))

  /** Entropic optimal transport (Sinkhorn-Knopp, 3 unrolled sweeps,
    * ε = 0.5) between the corpus's language marginal and source marginal,
    * with an add-one NLL cost on the observed (lang, source) cell. The
    * whole problem lives on the |langs|×|sources| cell grid — model-sized
    * at any corpus scale — built by one count aggregation; the grid
    * completion is a langs×sources broadcast pairing (allowlisted, both
    * sides model-sized by contract). The transport plan says how to
    * re-allocate mass between the two taxonomies at minimal surprise —
    * the mixture-rebalancing primitive under q89/q229/q237. */
  val q248Sinkhorn: QueryDef = QueryDef(
    "q248_sinkhorn",
    (s, dir) => {
      val docs = Tables(s, dir).documents
      val cells = docs.groupBy(col("lang"), col("source"))
        .agg(count(lit(1)).as("n"))
      val langs = docs.groupBy(col("lang")).agg(count(lit(1)).as("nl"))
      val sources = docs.groupBy(col("source")).agg(count(lit(1)).as("ns"))
      val wAll = Window.partitionBy()
      val wL = Window.partitionBy(col("lang"))
      val wS = Window.partitionBy(col("source"))
      val grid = langs.crossJoin(broadcast(sources))
        .join(cells, Seq("lang", "source"), "left")
        .withColumn("n", coalesce(col("n"), lit(0L)))
        .withColumn("nn", sum(col("n")).over(wAll))
        .withColumn("n_cells", count(lit(1)).over(wAll))
        .withColumn("p", round(col("nl").cast("double") / col("nn"), 9))
        .withColumn("q", round(col("ns").cast("double") / col("nn"), 9))
        .withColumn("k", round(exp(
          log((col("n").cast("double") + 1.0) /
              (col("nn").cast("double") + col("n_cells"))) / lit(0.5)), 9))
      // 3 Sinkhorn sweeps, u then v, each rounded at 9 dp
      val it1v = grid.withColumn("v", round(col("q") / sum(round(col("k"), 9)).over(wS), 9))
      val it1u = it1v.withColumn("u",
        round(col("p") / sum(round(col("k") * col("v"), 12)).over(wL), 9))
      val it2v = it1u.withColumn("v",
        round(col("q") / sum(round(col("k") * col("u"), 12)).over(wS), 9))
      val it2u = it2v.withColumn("u",
        round(col("p") / sum(round(col("k") * col("v"), 12)).over(wL), 9))
      val it3v = it2u.withColumn("v",
        round(col("q") / sum(round(col("k") * col("u"), 12)).over(wS), 9))
      val it3u = it3v.withColumn("u",
        round(col("p") / sum(round(col("k") * col("v"), 12)).over(wL), 9))
      it3u
        .withColumn("plan", round(col("u") * col("k") * col("v"), 6))
        .withColumn("row_mass", round(sum(round(col("u") * col("k") * col("v"), 12)).over(wL), 6))
        .select(col("lang"), col("source"), col("n"), col("plan"), col("row_mass"))
    },
    Some("""WITH cells AS (SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2),
      langs AS (SELECT lang, COUNT(*) AS nl FROM documents GROUP BY 1),
      sources AS (SELECT source, COUNT(*) AS ns FROM documents GROUP BY 1),
      grid0 AS (SELECT l.lang, s.source, l.nl, s.ns, COALESCE(c.n, 0) AS n
        FROM langs l CROSS JOIN sources s
        LEFT JOIN cells c ON c.lang = l.lang AND c.source = s.source),
      grid AS (SELECT lang, source, n,
          round(CAST(nl AS DOUBLE) / SUM(n) OVER (), 9) AS p,
          round(CAST(ns AS DOUBLE) / SUM(n) OVER (), 9) AS q,
          round(exp(ln((CAST(n AS DOUBLE) + 1.0)
            / (CAST(SUM(n) OVER () AS DOUBLE) + COUNT(*) OVER ())) / 0.5), 9) AS k
        FROM grid0),
      i1v AS (SELECT *, round(q / SUM(round(k, 9)) OVER (PARTITION BY source), 9) AS v FROM grid),
      i1u AS (SELECT *, round(p / SUM(round(k * v, 12)) OVER (PARTITION BY lang), 9) AS u FROM i1v),
      i2v AS (SELECT lang, source, n, p, q, k, u,
          round(q / SUM(round(k * u, 12)) OVER (PARTITION BY source), 9) AS v FROM i1u),
      i2u AS (SELECT lang, source, n, p, q, k, v,
          round(p / SUM(round(k * v, 12)) OVER (PARTITION BY lang), 9) AS u FROM i2v),
      i3v AS (SELECT lang, source, n, p, q, k, u,
          round(q / SUM(round(k * u, 12)) OVER (PARTITION BY source), 9) AS v FROM i2u),
      i3u AS (SELECT lang, source, n, p, q, k, v,
          round(p / SUM(round(k * v, 12)) OVER (PARTITION BY lang), 9) AS u FROM i3v)
      SELECT lang, source, CAST(n AS BIGINT) AS n,
        round(u * k * v, 6) AS plan,
        round(SUM(round(u * k * v, 12)) OVER (PARTITION BY lang), 6) AS row_mass
      FROM i3u"""))

  /** Sensitivity-sampled coreset over the embedding corpus: distance to
    * the nearest of 8 fixed seed vectors (vec_id < 8 — q30's fixed-set
    * idiom) defines each point's sensitivity, the keep probability blends
    * sensitivity with uniform mass (½·d/Σd + ½/n), an md5-uniform gate
    * draws ~64 expected picks, and kept points carry weight 1/(m·p) so
    * the coreset is an unbiased estimator of corpus totals. One
    * broadcast-8-seeds pass + one 1-row totals broadcast — the
    * k-means/GMM pre-pass that makes iterative fitting viable at 100 TB
    * by shrinking the corpus to a weighted kernel first. */
  val q249SensitivityCoreset: QueryDef = QueryDef(
    "q249_sensitivity_coreset",
    (s, dir) => {
      val m = 64
      val decS = DecimalType(28, 12)
      val emb = Tables(s, dir).embeddings
      val seeds = emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("seed_id"), col("embedding").as("s_emb"))
      val d = emb.select(col("vec_id"), col("embedding"))
        .crossJoin(broadcast(seeds))
        .withColumn("dist", lit(1.0) - Similarity.cosine(col("embedding"), col("s_emb")))
        .groupBy(col("vec_id"))
        .agg(round(min(col("dist")), 9).as("d"))
      val totals = d.agg(count(lit(1)).as("n"),
        sum(col("d").cast(decS)).as("sd"))
      d.crossJoin(broadcast(totals))
        .withColumn("p", round(
          lit(0.5) * col("d") / col("sd").cast("double") +
          lit(0.5) / col("n"), 12))
        .withColumn("u",
          conv(substring(md5(col("vec_id").cast("string")), 1, 8), 16, 10)
            .cast("double") / lit(4294967296.0))
        .filter(col("u") < lit(m) * col("p"))
        .select(col("vec_id"), col("d"),
          round(lit(1.0) / (lit(m) * col("p")), 6).as("weight"))
    },
    Some("""WITH seeds AS (SELECT vec_id AS seed_id, embedding AS s_emb
          FROM embeddings WHERE vec_id < 8),
      d AS (SELECT e.vec_id, round(MIN(1.0 -
          list_sum(list_transform(list_zip(e.embedding, s.s_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(e.embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))))
           * sqrt(list_sum(list_transform(s.s_emb, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE)))))), 9) AS d
        FROM embeddings e CROSS JOIN seeds s GROUP BY 1),
      totals AS (SELECT COUNT(*) AS n, SUM(CAST(d AS DECIMAL(28,12))) AS sd FROM d),
      sc AS (SELECT d.vec_id, d.d,
          round(0.5 * d.d / CAST(t.sd AS DOUBLE) + 0.5 / t.n, 12) AS p,
          CAST(('0x' || substr(md5(CAST(d.vec_id AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 AS u
        FROM d, totals t)
      SELECT vec_id, d, round(1.0 / (64 * p), 6) AS weight
      FROM sc WHERE u < 64 * p"""))

  val all: Seq[QueryDef] =
    Seq(q246Hits, q247Modularity, q248Sinkhorn, q249SensitivityCoreset)
}
