package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Feature-engineering & containment wave: minhash containment
  * estimation for quote/excerpt triage, decision-stump training over a
  * fixed threshold grid, leave-one-out target encoding, and
  * weight-of-evidence / information-value feature ranking. The
  * tabular-ML feature layer next to the text stack.
  */
object FeatureOps {

  /** One-sided containment C(A,B) = |A∩B| / |A| estimated from k=32
    * md5-xor minhash signatures (Ĵ from signature collisions, then
    * C ≈ Ĵ(|A|+|B|)/((1+Ĵ)|A|)), certified against the exact
    * containment on every banded candidate pair. The scale-triage arm
    * of q160's exact containment join: signatures + set SIZES travel,
    * never the sets, and the exact verify here exists only to certify
    * the estimator. */
  val q274MinhashContainment: QueryDef = QueryDef(
    "q274_minhash_containment",
    (s, dir) => {
      import graft.functions.VectorFunctions.{md5Long, md5LongLocal, minhash_xor_sig}
      val k = 32
      val consts = (0 until k).map(j => md5LongLocal(s"contseed|$j")).toArray
      val shd = Tables(s, dir).documents
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), array_distinct(expr(
          "transform(sequence(0, size(toks)-3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
          .as("shs"))
        .withColumn("hs", array_distinct(transform(col("shs"), x => md5Long(x))))
        .withColumn("sig", minhash_xor_sig(col("hs"), consts))
        .select(col("doc_id"), col("hs"), col("sig"), size(col("hs")).cast("long").as("sz"))
        .localCheckpoint() // one signature pass feeds banding + estimation
      val banded = shd.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, 15), b -> concat_ws(',', cast(sig[b*2] as string), cast(sig[b*2+1] as string)))")))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "key")
      val pairs = banded.select(col("band"), col("key"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("key"), col("doc_id").as("id_b")),
              Seq("band", "key"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b")).distinct()
      pairs
        .join(shd.select(col("doc_id").as("id_a"), col("hs").as("hs_a"),
          col("sig").as("sig_a"), col("sz").as("sz_a")), Seq("id_a"))
        .join(shd.select(col("doc_id").as("id_b"), col("hs").as("hs_b"),
          col("sig").as("sig_b"), col("sz").as("sz_b")), Seq("id_b"))
        .withColumn("m", expr(
          "aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v)"))
        .withColumn("jac_est", round(col("m") / lit(k.toDouble), 6))
        .withColumn("cont_exact", round(
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("double") / col("sz_a"), 6))
        .withColumn("cont_est", round(least(lit(1.0),
          (col("m") / lit(k.toDouble)) * (col("sz_a") + col("sz_b")) /
            ((lit(1.0) + col("m") / lit(k.toDouble)) * col("sz_a"))), 6))
        .filter(col("cont_exact") >= 0.2)
        .select(col("id_a"), col("id_b"), col("sz_a"), col("sz_b"),
          col("jac_est"), col("cont_exact"), col("cont_est"),
          round(abs(col("cont_est") - col("cont_exact")), 6).as("abs_err"))
    },
    Some("""WITH t AS (SELECT doc_id,
          regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
      sstr AS (SELECT DISTINCT doc_id, sh FROM (
        SELECT doc_id, UNNEST(list_transform(range(1, len(toks)-1),
            i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
        FROM t WHERE len(toks) >= 3)),
      hs AS (SELECT DISTINCT doc_id,
          (h_hi - CASE WHEN h_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + h_lo AS h
        FROM (SELECT doc_id,
            ('0x' || substr(md5(sh), 1, 8))::BIGINT AS h_hi,
            ('0x' || substr(md5(sh), 9, 8))::BIGINT AS h_lo FROM sstr)),
      sizes AS (SELECT doc_id, COUNT(*) AS sz FROM hs GROUP BY 1),
      cj AS (SELECT j,
          (c_hi - CASE WHEN c_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + c_lo AS c
        FROM (SELECT j.j AS j,
            ('0x' || substr(md5('contseed|' || CAST(j.j AS VARCHAR)), 1, 8))::BIGINT AS c_hi,
            ('0x' || substr(md5('contseed|' || CAST(j.j AS VARCHAR)), 9, 8))::BIGINT AS c_lo
          FROM range(0, 32) j(j))),
      sig AS (SELECT hs.doc_id, cj.j, MIN(xor(hs.h, cj.c)) AS mh
        FROM hs CROSS JOIN cj GROUP BY 1, 2),
      keyed AS (SELECT doc_id, j // 2 AS band,
          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY j) AS key
        FROM sig GROUP BY 1, 2),
      pairs AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM keyed a JOIN keyed b
          ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id),
      m AS (SELECT p.id_a, p.id_b,
          SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS m
        FROM pairs p JOIN sig sa ON sa.doc_id = p.id_a
          JOIN sig sb ON sb.doc_id = p.id_b AND sb.j = sa.j
        GROUP BY 1, 2),
      hsl AS (SELECT doc_id, list(h) AS hl FROM hs GROUP BY 1),
      sc AS (SELECT m.id_a, m.id_b, za.sz AS sz_a, zb.sz AS sz_b,
          round(m.m / 32.0, 6) AS jac_est,
          round(CAST(len(list_distinct(list_intersect(a.hl, b.hl))) AS DOUBLE) / za.sz, 6) AS cont_exact,
          round(LEAST(1.0, (m.m / 32.0) * (za.sz + zb.sz)
            / ((1.0 + m.m / 32.0) * za.sz)), 6) AS cont_est
        FROM m JOIN hsl a ON a.doc_id = m.id_a
          JOIN hsl b ON b.doc_id = m.id_b
          JOIN sizes za ON za.doc_id = m.id_a
          JOIN sizes zb ON zb.doc_id = m.id_b)
      SELECT id_a, id_b, CAST(sz_a AS BIGINT) AS sz_a, CAST(sz_b AS BIGINT) AS sz_b,
        jac_est, cont_exact, cont_est,
        round(abs(cont_est - cont_exact), 6) AS abs_err
      FROM sc WHERE cont_exact >= 0.2"""))

  /** Decision-stump training over a FIXED threshold grid (scale-free:
    * the grid is 31 literal (feature, threshold) cells, so no global
    * quantile pass): predict l_returnflag = 'R' from the four numeric
    * lineitem columns, score every cell by weighted Gini impurity
    * reduction in ONE pass (the grid explodes per row as a projection,
    * partial-aggs map-side), report the grid with the winner flagged.
    * The inner loop of every GBDT, run distributed-exactly. */
  val q275DecisionStump: QueryDef = QueryDef(
    "q275_decision_stump",
    (s, dir) => {
      val grid: Seq[(String, Double)] =
        (1 to 9).map(i => "l_quantity" -> i * 5.0) ++
        (1 to 9).map(i => "l_extendedprice" -> i * 10000.0) ++
        (1 to 8).map(i => "l_discount" -> i * 0.01) ++
        (1 to 5).map(i => "l_tax" -> i * 0.015)
      // every grid cell is a PAIR of conditional sums in ONE aggregation —
      // no 31× row fan-out (the explode form measured 17 s at sf1; this is
      // a single map-side-combining pass), unpivoted to rows afterwards
      val base = Tables(s, dir).lineitem
        .select(col("l_quantity"), col("l_extendedprice"), col("l_discount"),
          col("l_tax"), (col("l_returnflag") === "R").as("y"))
      val aggCols = grid.zipWithIndex.flatMap { case ((f, thr), i) =>
        Seq(sum(when(col(f) <= thr, 1L).otherwise(0L)).as(s"nl_$i"),
            sum(when(col(f) <= thr && col("y"), 1L).otherwise(0L)).as(s"pl_$i"))
      } ++ Seq(count(lit(1)).as("n"), sum(when(col("y"), 1L).otherwise(0L)).as("pos"))
      val one = base.agg(aggCols.head, aggCols.tail: _*)
      val cells = one.select(explode(array(grid.zipWithIndex.map { case ((f, thr), i) =>
          struct(lit(f).as("feature"), lit(thr).as("thr"),
            col(s"nl_$i").as("n_left"), col(s"pl_$i").as("pos_left"),
            col("n"), col("pos"))
        }: _*)).as("g"))
        .select(col("g.feature").as("feature"), col("g.thr").as("thr"),
          col("g.n").as("n"), col("g.pos").as("pos"),
          col("g.n_left").as("n_left"), col("g.pos_left").as("pos_left"))
      val scored = cells
        .withColumn("n_right", col("n") - col("n_left"))
        .withColumn("pos_right", col("pos") - col("pos_left"))
        .withColumn("g_root", round(lit(2.0) * (col("pos") / col("n")) *
          (lit(1.0) - col("pos") / col("n")), 12))
        .withColumn("g_left", when(col("n_left") > 0, round(lit(2.0) *
          (col("pos_left") / col("n_left")) *
          (lit(1.0) - col("pos_left") / col("n_left")), 12)).otherwise(lit(0.0)))
        .withColumn("g_right", when(col("n_right") > 0, round(lit(2.0) *
          (col("pos_right") / col("n_right")) *
          (lit(1.0) - col("pos_right") / col("n_right")), 12)).otherwise(lit(0.0)))
        .withColumn("gain", round(col("g_root") -
          (col("n_left") / col("n")) * col("g_left") -
          (col("n_right") / col("n")) * col("g_right"), 9))
      val wBest = Window.partitionBy()
        .orderBy(col("gain").desc, col("feature").asc, col("thr").asc)
      scored
        .withColumn("rk", row_number().over(wBest))
        .select(col("feature"), col("thr"), col("n_left"), col("n_right"),
          col("pos_left"), col("pos_right"), round(col("gain"), 9).as("gini_gain"),
          (col("rk") === 1).as("is_best"))
    },
    Some("""WITH grid AS (
        SELECT 'l_quantity' AS feature, CAST(i * 5 AS DOUBLE) AS thr FROM range(1, 10) g(i)
        UNION ALL SELECT 'l_extendedprice', CAST(i * 10000 AS DOUBLE) FROM range(1, 10) g(i)
        UNION ALL SELECT 'l_discount', i * 0.01 FROM range(1, 9) g(i)
        UNION ALL SELECT 'l_tax', i * 0.015 FROM range(1, 6) g(i)),
      base AS (SELECT l_quantity, l_extendedprice, l_discount, l_tax,
          l_returnflag = 'R' AS y FROM lineitem),
      cells AS (SELECT g.feature, g.thr, COUNT(*) AS n,
          SUM(CASE WHEN b.y THEN 1 ELSE 0 END) AS pos,
          SUM(CASE WHEN (CASE g.feature WHEN 'l_quantity' THEN b.l_quantity
              WHEN 'l_extendedprice' THEN b.l_extendedprice
              WHEN 'l_discount' THEN b.l_discount ELSE b.l_tax END) <= g.thr
            THEN 1 ELSE 0 END) AS n_left,
          SUM(CASE WHEN (CASE g.feature WHEN 'l_quantity' THEN b.l_quantity
              WHEN 'l_extendedprice' THEN b.l_extendedprice
              WHEN 'l_discount' THEN b.l_discount ELSE b.l_tax END) <= g.thr
              AND b.y THEN 1 ELSE 0 END) AS pos_left
        FROM grid g CROSS JOIN base b GROUP BY 1, 2),
      scored AS (SELECT feature, thr, n, pos, n_left, pos_left,
          n - n_left AS n_right, pos - pos_left AS pos_right,
          round(2.0 * (CAST(pos AS DOUBLE) / n) * (1.0 - CAST(pos AS DOUBLE) / n), 12) AS g_root,
          CASE WHEN n_left > 0 THEN round(2.0 * (CAST(pos_left AS DOUBLE) / n_left)
            * (1.0 - CAST(pos_left AS DOUBLE) / n_left), 12) ELSE 0.0 END AS g_left,
          CASE WHEN n - n_left > 0 THEN round(2.0 * (CAST(pos - pos_left AS DOUBLE) / (n - n_left))
            * (1.0 - CAST(pos - pos_left AS DOUBLE) / (n - n_left)), 12) ELSE 0.0 END AS g_right
        FROM cells),
      gains AS (SELECT feature, thr, n_left, n_right, pos_left, pos_right,
          round(g_root - (CAST(n_left AS DOUBLE) / (n_left + n_right)) * g_left
            - (CAST(n_right AS DOUBLE) / (n_left + n_right)) * g_right, 9) AS gain
        FROM scored)
      SELECT feature, thr, CAST(n_left AS BIGINT) AS n_left,
        CAST(n_right AS BIGINT) AS n_right, CAST(pos_left AS BIGINT) AS pos_left,
        CAST(pos_right AS BIGINT) AS pos_right, gain AS gini_gain,
        ROW_NUMBER() OVER (ORDER BY gain DESC, feature, thr) = 1 AS is_best
      FROM gains"""))

  /** Leave-one-out target encoding of the customer market segment
    * against order value, with m=10 smoothing toward the global mean:
    * enc_i = (S_seg − y_i + m·μ)/(n_seg − 1 + m). The encoding every
    * gradient-boosted tabular model wants, computed without leakage and
    * without a second scan — segment totals are a 5-row frame, the
    * global mean a window over it. */
  val q276TargetEncoding: QueryDef = QueryDef(
    "q276_target_encoding",
    (s, dir) => {
      val t = Tables(s, dir)
      val dec = org.apache.spark.sql.types.DecimalType(18, 4)
      val base = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_mktsegment"), col("o_totalprice"))
      val wAll = Window.partitionBy()
      val seg = base.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_seg"), sum(col("o_totalprice").cast(dec)).as("s_seg"))
        .withColumn("mu", round(
          sum(col("s_seg")).over(wAll).cast("double") / sum(col("n_seg")).over(wAll), 9))
      base.join(broadcast(seg), Seq("c_mktsegment"))
        .select(col("o_orderkey"), col("c_mktsegment"),
          round((col("s_seg").cast("double") - col("o_totalprice") + lit(10.0) * col("mu")) /
            (col("n_seg") - 1 + 10), 6).as("loo_encoding"))
    },
    Some("""WITH base AS (SELECT o.o_orderkey, c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      seg AS (SELECT c_mktsegment, COUNT(*) AS n_seg,
          SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s_seg
        FROM base GROUP BY 1),
      segmu AS (SELECT c_mktsegment, n_seg, s_seg,
          round(CAST(SUM(s_seg) OVER () AS DOUBLE) / SUM(n_seg) OVER (), 9) AS mu
        FROM seg)
      SELECT b.o_orderkey, b.c_mktsegment,
        round((CAST(s.s_seg AS DOUBLE) - b.o_totalprice + 10.0 * s.mu)
          / (s.n_seg - 1 + 10), 6) AS loo_encoding
      FROM base b JOIN segmu s USING (c_mktsegment)"""))

  /** Weight-of-evidence and information value of three categorical
    * features (segment, nation, order year) against the high-value
    * target (o_totalprice > 300k): WoE = ln(p_bin/n_bin shares) with a
    * 0.5 continuity correction, IV = Σ (p−n)·WoE per feature — the
    * credit-scoring feature-ranking standard. One pass per feature,
    * bin frames model-sized. */
  val q277WoeIv: QueryDef = QueryDef(
    "q277_woe_iv",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_mktsegment").as("segment"), col("n_name").as("nation"),
          year(col("o_orderdate")).cast("string").as("o_year"),
          (col("o_totalprice") > 300000.0).as("y"))
        .localCheckpoint() // one scan feeds all three features
      val wF = Window.partitionBy(col("feature"))
      val feats = Seq("segment", "nation", "o_year").map { f =>
        base.groupBy(col(f).as("bin"))
          .agg(sum(when(col("y"), 1L).otherwise(0L)).as("n_pos"),
            sum(when(!col("y"), 1L).otherwise(0L)).as("n_neg"))
          .withColumn("feature", lit(f))
      }.reduce(_ union _)
      feats
        .withColumn("tp", sum(col("n_pos")).over(wF))
        .withColumn("tn", sum(col("n_neg")).over(wF))
        .withColumn("ps", round((col("n_pos") + 0.5) / (col("tp") + 0.5), 12))
        .withColumn("ns", round((col("n_neg") + 0.5) / (col("tn") + 0.5), 12))
        .withColumn("woe", round(log(col("ps") / col("ns")), 6))
        .withColumn("iv", round(sum(round((col("ps") - col("ns")) *
          log(col("ps") / col("ns")), 12)).over(wF), 6))
        .select(col("feature"), col("bin"), col("n_pos"), col("n_neg"),
          col("woe"), col("iv"))
    },
    Some("""WITH base AS (SELECT c.c_mktsegment AS segment, n.n_name AS nation,
          CAST(year(o.o_orderdate) AS VARCHAR) AS o_year,
          o.o_totalprice > 300000.0 AS y
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
      melted AS (
        SELECT 'segment' AS feature, segment AS bin, y FROM base
        UNION ALL SELECT 'nation', nation, y FROM base
        UNION ALL SELECT 'o_year', o_year, y FROM base),
      bins AS (SELECT feature, bin,
          SUM(CASE WHEN y THEN 1 ELSE 0 END) AS n_pos,
          SUM(CASE WHEN y THEN 0 ELSE 1 END) AS n_neg
        FROM melted GROUP BY 1, 2),
      sh AS (SELECT feature, bin, n_pos, n_neg,
          round((n_pos + 0.5) / (SUM(n_pos) OVER (PARTITION BY feature) + 0.5), 12) AS ps,
          round((n_neg + 0.5) / (SUM(n_neg) OVER (PARTITION BY feature) + 0.5), 12) AS ns
        FROM bins)
      SELECT feature, bin, CAST(n_pos AS BIGINT) AS n_pos,
        CAST(n_neg AS BIGINT) AS n_neg,
        round(ln(ps / ns), 6) AS woe,
        round(SUM(round((ps - ns) * ln(ps / ns), 12)) OVER (PARTITION BY feature), 6) AS iv
      FROM sh"""))

  val all: Seq[QueryDef] =
    Seq(q274MinhashContainment, q275DecisionStump, q276TargetEncoding, q277WoeIv)
}
