package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Seeding & uncertainty wave: deterministic k-center seeding
  * (Gonzalez 1985 farthest-first traversal — the k-means++ alternative
  * whose argmax form needs no random draws, so both engines replay the
  * identical trajectory), Poisson-bootstrap confidence intervals (the
  * resampling scheme that actually works on sharded data, because each
  * row's replicate weights are independent — no global multinomial), and
  * an InfoNCE embedding-space audit (the contrastive-training loss
  * evaluated as data quality, after q341 mined the negatives).
  *
  * Scale shapes: k-center is k linear passes with a ≤k-row broadcast
  * seed frame; the bootstrap is one scan with a constant replicate
  * fan-out and order-free DECIMAL replicate sums; InfoNCE is a
  * model-sized anchor×candidate grid.
  */
object SeedOps {

  /** Sequential-fold squared L2 between two float-vector columns in
    * double — same fold order as DuckDB's list_sum(list_transform(...)),
    * the cosine-oracle precedent, so argmax comparisons are bit-exact. */
  private def sqL2(a: String, b: String): Column = expr(
    s"""aggregate(zip_with($a, $b, (x, y) ->
          (cast(x as double) - cast(y as double)) * (cast(x as double) - cast(y as double))),
        0D, (acc, t) -> acc + t)""")

  private def sqL2Sql(a: String, b: String): String =
    s"""list_sum(list_transform(list_zip($a, $b),
         x -> (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))
            * (CAST(x[1] AS DOUBLE) - CAST(x[2] AS DOUBLE))))"""

  /** k-center farthest-first seeding (Gonzalez): seed 0 is the smallest
    * vec_id; each of 5 further rounds picks the vector FARTHEST from the
    * current seed set (max over vectors of min over seeds of squared L2,
    * ties to the smaller id) — a 2-approximation to the k-center optimum
    * and the deterministic stand-in for k-means++ D² sampling. Each round
    * is one linear pass against a ≤6-row broadcast seed frame + a 1-row
    * argmax aggregate; the corpus never re-shuffles (the q80/q340
    * discipline). Reports every seed with the covering radius at its
    * selection (seed 0: 0) and the final cell occupancy — the cell
    * balance k-means inherits from its seeding. */
  val q342KcenterSeeding: QueryDef = QueryDef(
    "q342_kcenter_seeding",
    (s, dir) => {
      val emb = Tables(s, dir).embeddings
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("vec_id"), col("embedding"))
        .localCheckpoint() // 6 passes, one build
      var seeds: DataFrame = emb.filter(col("vec_id") === 0)
        .select(col("vec_id").as("seed_id"), col("embedding").as("s_emb"),
          lit(0L).as("round"), lit(0.0).as("sel_radius"))
        .localCheckpoint()
      // r15-opt: carry each point's running min-distance instead of
      // recomputing it against the WHOLE seed set every round — round r
      // evaluates |emb| distances to the ONE new seed and folds them
      // with least(), not r·|emb| distances (15 corpus passes of sqL2
      // down to 5; min over a set ≡ the incremental fold exactly, so
      // every dmin, argmax and radius is bit-identical — oracle-pinned)
      var cur = emb
        .crossJoin(broadcast(seeds.select(col("s_emb"))))
        .withColumn("dmin", sqL2("embedding", "s_emb"))
        .select(col("vec_id"), col("embedding"), col("dmin"))
        .localCheckpoint()
      for (r <- 1 to 5) {
        val next = cur
          .select(max(struct(col("dmin"), (-col("vec_id")).as("nid"),
            col("embedding"))).as("m"))
          .select((-col("m.nid")).as("seed_id"), col("m.embedding").as("s_emb"),
            lit(r.toLong).as("round"), round(col("m.dmin"), 9).as("sel_radius"))
        seeds = seeds.unionByName(next).localCheckpoint()
        if (r < 5) {
          val newSeed = seeds.filter(col("round") === r.toLong)
            .select(col("s_emb"))
          val prev = cur
          cur = cur.crossJoin(broadcast(newSeed))
            .withColumn("d2", sqL2("embedding", "s_emb"))
            .select(col("vec_id"), col("embedding"),
              least(col("dmin"), col("d2")).as("dmin"))
            .localCheckpoint()
          // the new eager checkpoint supersedes the old one — release it
          // instead of pinning ~5 corpus-sized (vec_id, embedding, dmin)
          // frames in executor storage across the loop (r15 advice)
          prev.unpersist()
        }
      }
      cur.unpersist() // seeds carries everything the result reads
      val assign = emb.crossJoin(broadcast(seeds.select(col("seed_id"), col("s_emb"))))
        .withColumn("d", sqL2("embedding", "s_emb"))
        .groupBy(col("vec_id"))
        .agg(min(struct(col("d"), col("seed_id"))).as("m"))
        .groupBy(col("m.seed_id").as("seed_id"))
        .agg(count(lit(1)).as("n_assigned"))
      seeds.select(col("round"), col("seed_id"), col("sel_radius"))
        .join(assign, Seq("seed_id"))
        .select(col("round"), col("seed_id"), col("sel_radius"), col("n_assigned"))
        .orderBy(col("round"))
    },
    Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
      s0 AS (SELECT vec_id AS seed_id, embedding AS s_emb FROM e WHERE vec_id = 0),
      d1 AS (SELECT e.vec_id, e.embedding,
          MIN(${sqL2Sql("e.embedding", "s.s_emb")}) AS dmin
        FROM e CROSS JOIN s0 s GROUP BY 1, 2),
      n1 AS (SELECT vec_id AS seed_id, embedding AS s_emb, round(dmin, 9) AS sel_radius
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY dmin DESC, vec_id) AS rk FROM d1)
        WHERE rk = 1),
      s1 AS (SELECT seed_id, s_emb FROM s0 UNION ALL SELECT seed_id, s_emb FROM n1),
      d2 AS (SELECT e.vec_id, e.embedding,
          MIN(${sqL2Sql("e.embedding", "s.s_emb")}) AS dmin
        FROM e CROSS JOIN s1 s GROUP BY 1, 2),
      n2 AS (SELECT vec_id AS seed_id, embedding AS s_emb, round(dmin, 9) AS sel_radius
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY dmin DESC, vec_id) AS rk FROM d2)
        WHERE rk = 1),
      s2 AS (SELECT seed_id, s_emb FROM s1 UNION ALL SELECT seed_id, s_emb FROM n2),
      d3 AS (SELECT e.vec_id, e.embedding,
          MIN(${sqL2Sql("e.embedding", "s.s_emb")}) AS dmin
        FROM e CROSS JOIN s2 s GROUP BY 1, 2),
      n3 AS (SELECT vec_id AS seed_id, embedding AS s_emb, round(dmin, 9) AS sel_radius
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY dmin DESC, vec_id) AS rk FROM d3)
        WHERE rk = 1),
      s3 AS (SELECT seed_id, s_emb FROM s2 UNION ALL SELECT seed_id, s_emb FROM n3),
      d4 AS (SELECT e.vec_id, e.embedding,
          MIN(${sqL2Sql("e.embedding", "s.s_emb")}) AS dmin
        FROM e CROSS JOIN s3 s GROUP BY 1, 2),
      n4 AS (SELECT vec_id AS seed_id, embedding AS s_emb, round(dmin, 9) AS sel_radius
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY dmin DESC, vec_id) AS rk FROM d4)
        WHERE rk = 1),
      s4 AS (SELECT seed_id, s_emb FROM s3 UNION ALL SELECT seed_id, s_emb FROM n4),
      d5 AS (SELECT e.vec_id, e.embedding,
          MIN(${sqL2Sql("e.embedding", "s.s_emb")}) AS dmin
        FROM e CROSS JOIN s4 s GROUP BY 1, 2),
      n5 AS (SELECT vec_id AS seed_id, embedding AS s_emb, round(dmin, 9) AS sel_radius
        FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY dmin DESC, vec_id) AS rk FROM d5)
        WHERE rk = 1),
      s5 AS (SELECT seed_id, s_emb FROM s4 UNION ALL SELECT seed_id, s_emb FROM n5),
      trace AS (SELECT 0 AS round, seed_id, 0.0 AS sel_radius FROM s0
        UNION ALL SELECT 1, seed_id, sel_radius FROM n1
        UNION ALL SELECT 2, seed_id, sel_radius FROM n2
        UNION ALL SELECT 3, seed_id, sel_radius FROM n3
        UNION ALL SELECT 4, seed_id, sel_radius FROM n4
        UNION ALL SELECT 5, seed_id, sel_radius FROM n5),
      afin AS (SELECT e.vec_id, s.seed_id,
          ROW_NUMBER() OVER (PARTITION BY e.vec_id
            ORDER BY ${sqL2Sql("e.embedding", "s.s_emb")}, s.seed_id) AS rk
        FROM e CROSS JOIN s5 s),
      occ AS (SELECT seed_id, CAST(COUNT(*) AS BIGINT) AS n_assigned
        FROM afin WHERE rk = 1 GROUP BY 1)
      SELECT CAST(t.round AS BIGINT) AS round, t.seed_id, t.sel_radius, o.n_assigned
      FROM trace t JOIN occ o USING (seed_id) ORDER BY round"""))

  /** Poisson bootstrap (Chamandy et al. 2012, "Estimating uncertainty
    * for massive data streams" — the Google-scale resampling scheme):
    * classical bootstrap needs a global multinomial draw (impossible on
    * sharded data); replacing replicate counts with independent
    * Poisson(1) weights makes every row's 50 replicate weights a pure
    * function of (doc_id, rep) — embarrassingly parallel at any scale,
    * one scan with a constant ×50 fan-out. Weights are md5-uniform
    * inverse-CDF draws (k = 0..6 CASE ladder on exact 2^-48 dyadic
    * thresholds, identical in both engines); replicate means use
    * DECIMAL-exact weighted sums. Reports the replicate-distribution
    * summary of mean tokens/doc: point estimate, bootstrap SE, and the
    * exact p05/p95 replicate order statistics. */
  val q343PoissonBootstrap: QueryDef = QueryDef(
    "q343_poisson_bootstrap",
    (s, dir) => {
      val reps = 50
      val docs = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), size(TextOps.tokens(col("text"))).cast("long").as("n_toks"))
        .filter(col("n_toks") > 0)
      // u ~ U[0,1) as a 48-bit dyadic rational from md5(doc_id|rep) —
      // exact in double, identical in both engines (the lshPlanes trick)
      val fan = docs.select(col("doc_id"), col("n_toks"),
          explode(sequence(lit(0), lit(reps - 1))).as("rep"))
        .withColumn("u",
          conv(substring(md5(concat_ws("|", col("doc_id"), col("rep"))), 1, 12), 16, 10)
            .cast("double") / 281474976710656.0)
        // inverse CDF of Poisson(1): P(X<=k) thresholds as doubles; the
        // same literal ladder on both sides keeps every draw identical
        .withColumn("w",
          when(col("u") < 0.36787944117144233, 0L)
            .when(col("u") < 0.7357588823428847, 1L)
            .when(col("u") < 0.9196986029286058, 2L)
            .when(col("u") < 0.9810118431238462, 3L)
            .when(col("u") < 0.9963401531726563, 4L)
            .when(col("u") < 0.9994058151824183, 5L).otherwise(6L))
      val repMeans = fan.groupBy(col("rep"))
        .agg(sum(col("w") * col("n_toks")).as("wsum"), sum(col("w")).as("wn"))
        .filter(col("wn") > 0)
        .withColumn("rep_mean", round(col("wsum").cast("double") / col("wn"), 9))
      // order-free summary: DECIMAL replicate sums (a raw double AVG /
      // stddev would be partition-order dependent) + ceil-rank order
      // statistics instead of interpolated percentiles (the q83/q212
      // discipline) — every reported digit is engine-independent
      val ranked = repMeans
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rep_mean"), col("rep"))))
        .withColumn("nr", count(lit(1)).over(Window.partitionBy()))
      val stats = ranked.agg(
        count(lit(1)).as("n_reps"),
        round(sum(col("rep_mean").cast(DecimalType(24, 9))).cast("double") /
          count(lit(1)), 6).as("boot_mean"),
        round(sqrt(
          (sum((col("rep_mean").cast(DecimalType(24, 9)) *
                col("rep_mean").cast(DecimalType(24, 9))).cast(DecimalType(38, 18)))
            .cast("double") -
           count(lit(1)) * pow(sum(col("rep_mean").cast(DecimalType(24, 9)))
             .cast("double") / count(lit(1)), 2)) /
          (count(lit(1)) - 1)), 6).as("boot_se"),
        max(when(col("rk") === ceil(col("nr") * 0.05), col("rep_mean"))).as("ci_lo"),
        max(when(col("rk") === ceil(col("nr") * 0.95), col("rep_mean"))).as("ci_hi"))
      val point = docs.agg(
        round(sum(col("n_toks")).cast("double") / count(lit(1)), 6).as("point_mean"))
      broadcast(point).crossJoin(broadcast(stats))
    },
    Some("""WITH d AS (SELECT doc_id,
          CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS n_toks
        FROM documents WHERE len(regexp_extract_all(lower(text), '\w+')) > 0),
      fan AS (SELECT doc_id, n_toks, r.rep,
          ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(r.rep AS VARCHAR)), 1, 12))::BIGINT
            / 281474976710656.0 AS u
        FROM d, UNNEST(range(0, 50)) AS r(rep)),
      w AS (SELECT doc_id, n_toks, rep,
          CASE WHEN u < 0.36787944117144233 THEN 0
               WHEN u < 0.7357588823428847 THEN 1
               WHEN u < 0.9196986029286058 THEN 2
               WHEN u < 0.9810118431238462 THEN 3
               WHEN u < 0.9963401531726563 THEN 4
               WHEN u < 0.9994058151824183 THEN 5 ELSE 6 END AS w
        FROM fan),
      rm AS (SELECT rep,
          round(CAST(SUM(w * n_toks) AS DOUBLE) / SUM(w), 9) AS rep_mean
        FROM w GROUP BY 1 HAVING SUM(w) > 0),
      rk AS (SELECT rep_mean,
          ROW_NUMBER() OVER (ORDER BY rep_mean, rep) AS rk,
          COUNT(*) OVER () AS nr
        FROM rm),
      stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
          round(CAST(SUM(CAST(rep_mean AS DECIMAL(24,9))) AS DOUBLE) / COUNT(*), 6) AS boot_mean,
          round(sqrt(
            (CAST(SUM(CAST(CAST(rep_mean AS DECIMAL(24,9))
                 * CAST(rep_mean AS DECIMAL(24,9)) AS DECIMAL(38,18))) AS DOUBLE)
             - COUNT(*) * pow(CAST(SUM(CAST(rep_mean AS DECIMAL(24,9))) AS DOUBLE)
                 / COUNT(*), 2))
            / (COUNT(*) - 1)), 6) AS boot_se,
          MAX(CASE WHEN rk = ceil(nr * 0.05) THEN rep_mean END) AS ci_lo,
          MAX(CASE WHEN rk = ceil(nr * 0.95) THEN rep_mean END) AS ci_hi
        FROM rk),
      pt AS (SELECT round(CAST(SUM(n_toks) AS DOUBLE) / COUNT(*), 6) AS point_mean FROM d)
      SELECT point_mean, n_reps, boot_mean, boot_se, ci_lo, ci_hi
      FROM pt CROSS JOIN stats"""))

  /** InfoNCE embedding-space audit (Oord et al. 2018): for each of 8
    * anchors, the positive is its best same-label candidate among
    * vec_id < 64 and the loss is −ln(exp(cos⁺/τ) / Σ exp(cosᵢ/τ)) at
    * τ = 0.1 over all 63 candidates — evaluated as a DATA metric: low
    * loss ⟺ the label structure is recoverable from the embedding
    * geometry. Per-exp terms are rounded at 12 dp into DECIMAL sums
    * (order-free — a raw double Σexp would be partition-order
    * dependent), so the softmax denominators are bit-identical in both
    * engines. Model-sized grid (8×63); the corpus is untouched beyond
    * the candidate scan. */
  val q344InfonceAudit: QueryDef = QueryDef(
    "q344_infonce_audit",
    (s, dir) => {
      val decS = DecimalType(28, 14)
      val emb = Tables(s, dir).embeddings
      val anchors = broadcast(emb.filter(col("vec_id") < 8)
        .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
          col("embedding").as("a_emb")))
      val cands = broadcast(emb.filter(col("vec_id") < 64)
        .select(col("vec_id").as("cand_id"), col("label").as("c_label"),
          col("embedding").as("c_emb")))
      val grid = anchors.crossJoin(cands)
        .filter(col("cand_id") =!= col("anchor_id"))
        .withColumn("cos", Similarity.cosine(col("a_emb"), col("c_emb")))
        .withColumn("e", round(exp(col("cos") / 0.1), 12).cast(decS))
        .localCheckpoint() // denominator agg + positive pick share the grid
      val agg = grid.groupBy(col("anchor_id"), col("a_label"))
        .agg(sum(col("e")).as("denom"),
          max(when(col("c_label") === col("a_label"),
            struct(col("cos"), (-col("cand_id")).as("nid")))).as("p"),
          count(lit(1)).as("n_cands"))
      agg
        .select(col("anchor_id"), col("n_cands"),
          (-col("p.nid")).as("pos_id"),
          round(col("p.cos"), 9).as("cos_pos"),
          round(-(log(round(exp(col("p.cos") / 0.1), 12).cast(decS)
            .cast("double") / col("denom").cast("double"))), 6).as("infonce_loss"))
        .orderBy(col("anchor_id"))
    },
    Some("""WITH anchors AS (SELECT vec_id AS anchor_id, label AS a_label,
          embedding AS a_emb FROM embeddings WHERE vec_id < 8),
      cands AS (SELECT vec_id AS cand_id, label AS c_label, embedding AS c_emb
        FROM embeddings WHERE vec_id < 64),
      grid AS (SELECT a.anchor_id, a.a_label, c.cand_id, c.c_label,
          list_sum(list_transform(list_zip(a.a_emb, c.c_emb),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)))
          / (sqrt(list_sum(list_transform(a.a_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE))))
           * sqrt(list_sum(list_transform(c.c_emb, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))))
          AS cos
        FROM anchors a CROSS JOIN cands c WHERE c.cand_id <> a.anchor_id),
      g2 AS (SELECT *, CAST(round(exp(cos / 0.1), 12) AS DECIMAL(28,14)) AS e FROM grid),
      agg AS (SELECT anchor_id, a_label,
          SUM(e) AS denom, CAST(COUNT(*) AS BIGINT) AS n_cands
        FROM g2 GROUP BY 1, 2),
      pos AS (SELECT anchor_id, cand_id AS pos_id, cos AS pcos
        FROM (SELECT g.anchor_id, g.cand_id, g.cos,
            ROW_NUMBER() OVER (PARTITION BY g.anchor_id
              ORDER BY g.cos DESC, g.cand_id) AS rk
          FROM g2 g WHERE g.c_label = g.a_label)
        WHERE rk = 1)
      SELECT a.anchor_id, a.n_cands, p.pos_id,
        round(p.pcos, 9) AS cos_pos,
        round(-(ln(CAST(CAST(round(exp(p.pcos / 0.1), 12) AS DECIMAL(28,14)) AS DOUBLE)
          / CAST(a.denom AS DOUBLE))), 6) AS infonce_loss
      FROM agg a JOIN pos p USING (anchor_id) ORDER BY anchor_id"""))

  val all: Seq[QueryDef] = Seq(q342KcenterSeeding, q343PoissonBootstrap,
    q344InfonceAudit)
}
