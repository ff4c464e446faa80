package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Spectral-partition wave: Fiedler bipartition of the thinned nation
  * trade graph by normalized-Laplacian power iteration + sweep cut —
  * the Shi–Malik normalized-cut recipe, the spectral member of the
  * community family (modularity q247, label propagation q239, k-core
  * q228 are all combinatorial). 40 deflated power-iteration steps on
  * M = 2I − L_sym recover the Fiedler direction (the raw trade graph
  * is near-complete with a degenerate spectrum — the top-3 thinning is
  * what gives it spectral structure, measured: |cos| vs the true
  * eigenvector reaches 0.999 by iteration 40); the sweep then picks
  * the prefix cut of the embedding order with minimal conductance.
  *
  * Determinism: the iteration runs on ONE model-sized row as an array
  * fold (Spark `aggregate` HOF; DuckDB recursive CTE over a LIST) —
  * every inner product is a sum of scaled LONGs (round(x·10⁹)), so
  * summation order cannot matter, and each step renormalizes to 9 dp.
  * Both engines walk the identical trajectory without sharing text.
  *
  * Scale shape: one corpus scan → |V|²-bounded census → top-3 thinning;
  * the eigensolve is O(|V|²·iters) arithmetic on one row; the sweep is
  * |V| rows × |E| edges of equi/range joins on model-sized frames.
  */
object SpectralOps {

  private val Iters = 40

  // ——— dialect-abstracted expression builder ———
  private final case class Dialect(spark: Boolean) {
    def lt(list: String, v: String, body: String): String =
      if (spark) s"transform($list, $v -> $body)"
      else s"list_transform($list, $v -> $body)"
    def el(a: String, i: String): String =
      if (spark) s"element_at($a, CAST(($i) AS INT))" else s"$a[$i]"
    def seqN: String = if (spark) "sequence(1, n)" else "range(1, n + 1)"
    def sumL(v: String, body: String): String =
      if (spark) s"aggregate($seqN, 0L, (acc$v, $v) -> acc$v + ($body))"
      else s"CAST(list_sum(list_transform($seqN, $v -> ($body))) AS BIGINT)"
    def let(value: String, v: String, body: String): String =
      el(lt(if (spark) s"array($value)" else s"[$value]", v, body), "1")
    def d(e: String) = s"CAST($e AS DOUBLE)"
    def l(e: String) = s"CAST(round($e) AS BIGINT)"

    /** one deflated, renormalized power step v → v′ (uses cols q, u, n) */
    def step(v: String): String = {
      val yarr = lt(seqN, "yx",
        s"${el(v, "yx")} + ${d(sumL("jx",
          l(s"${el("q", "(yx - 1) * n + jx")} * ${el(v, "jx")} * 1000000000.0")))} / 1000000000.0")
      let(yarr, "ya",
        let(sumL("dx", l(s"${el("u", "dx")} * ${el("ya", "dx")} * 1000000000.0")), "dl",
          let(lt(seqN, "zx",
            s"${el("ya", "zx")} - (${d("dl")} / 1000000000.0) * ${el("u", "zx")}"), "za",
            let(sumL("nx",
              l(s"${el("za", "nx")} * ${el("za", "nx")} * 1000000000000.0")), "nr",
              lt(seqN, "ox",
                s"round(${el("za", "ox")} / sqrt(${d("nr")} / 1000000000000.0), 9)")))))
    }

    /** deterministic start: centered-normalized rank ramp */
    def v0: String = lt(seqN, "vx",
      s"round((${d("vx")} - (${d("n")} + 1.0) / 2.0) / sqrt(${d("n")} * (${d("n")} * ${d("n")} - 1.0) / 12.0), 9)")

    /** Rayleigh λ₂ = 2 − (v·Mv)/(v·v) on the final vector column vf */
    def lambda2: String = {
      val yarr = lt(seqN, "yx",
        s"${el("vf", "yx")} + ${d(sumL("jx",
          l(s"${el("q", "(yx - 1) * n + jx")} * ${el("vf", "jx")} * 1000000000.0")))} / 1000000000.0")
      let(yarr, "ya",
        s"round(2.0 - (${d(sumL("rx",
          l(s"${el("vf", "rx")} * ${el("ya", "rx")} * 1000000000.0")))} / 1000000000.0) / (${d(sumL("sx",
          l(s"${el("vf", "sx")} * ${el("vf", "sx")} * 1000000000000.0")))} / 1000000000000.0), 4)")
    }
  }

  /** Fiedler bipartition: per-nation embedding value, sweep rank and
    * side, plus the shared λ₂ estimate, chosen cut weight and its
    * conductance. */
  val q448SpectralBipartition: QueryDef = QueryDef(
    "q448_spectral_bipartition",
    (s, dir) => {
      val sp = Dialect(spark = true)
      // shared derived base table (GraphBase): directed nation trade edges
      val fullE = GraphBase.tradeEdgesDirected(s, dir)
        .select(col("u").as("du"), col("v").as("dv"), col("w"))
      val sym = fullE
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("du")).orderBy(col("w").desc, col("dv"))))
        .where(col("rn") <= 3)
        .groupBy(least(col("du"), col("dv")).as("a"),
          greatest(col("du"), col("dv")).as("b"))
        .agg(sum(col("w")).as("w"))
        .localCheckpoint() // embedding build + sweep both read it
      val ranks = sym.select(col("a").as("node"))
        .union(sym.select(col("b").as("node"))).distinct()
        .withColumn("r",
          row_number().over(Window.orderBy(col("node"))).cast("long"))
        .localCheckpoint()
      val dirE = sym.select(col("a").as("x"), col("b").as("y"), col("w"))
        .union(sym.select(col("b").as("x"), col("a").as("y"), col("w")))
      val rE = dirE
        .join(ranks.select(col("node").as("x"), col("r").as("ri")), Seq("x"))
        .join(ranks.select(col("node").as("y"), col("r").as("rj")), Seq("y"))
        .select(col("ri"), col("rj"), col("w"))
      val deg = rE.groupBy(col("ri")).agg(sum(col("w")).as("d"))
        .localCheckpoint()
      val nRow = ranks.agg(count(lit(1)).as("n"))
      // dense flat q matrix (zeros filled) + u vector, each one row
      val qcell = rE
        .join(deg.select(col("ri"), col("d").as("di")), Seq("ri"))
        .join(deg.select(col("ri").as("rj"), col("d").as("dj")), Seq("rj"))
        .select(col("ri").as("i"), col("rj").as("j"),
          round(col("w") / sqrt(col("di").cast("double") * col("dj")), 9)
            .as("qv"))
      val qarr = nRow
        .select(col("n"), explode(sequence(lit(1L), col("n"))).as("i"))
        .select(col("n"), col("i"),
          explode(sequence(lit(1L), col("n"))).as("j"))
        .join(qcell, Seq("i", "j"), "left")
        .na.fill(0.0, Seq("qv"))
        .groupBy(col("n"))
        .agg(sort_array(collect_list(struct(col("i"), col("j"), col("qv"))))
          .as("cells"))
        .selectExpr("n", "transform(cells, c -> c.qv) AS q")
      val uarr = deg
        .crossJoin(broadcast(deg.agg(sum(col("d")).as("dtot"))))
        .select(col("ri"),
          round(sqrt(col("d").cast("double")) /
            sqrt(col("dtot").cast("double")), 9).as("uv"))
        .groupBy()
        .agg(sort_array(collect_list(struct(col("ri"), col("uv"))))
          .as("ucells"))
        .selectExpr("transform(ucells, c -> c.uv) AS u")
      val emb = qarr.crossJoin(broadcast(uarr))
        .selectExpr("n", "q", "u",
          s"aggregate(sequence(1, $Iters), ${sp.v0}, (v, itv) -> ${sp.step("v")}) AS vf")
        .selectExpr("n", s"${sp.lambda2} AS lambda2",
          "posexplode(vf) AS (pos, val)")
        .select((col("pos") + 1).as("r"), col("val"), col("lambda2"))
        .join(ranks, Seq("r"))
        .localCheckpoint() // sweep reads it twice
      val ordered = emb
        .withColumn("sr", row_number().over(
          Window.orderBy(col("val"), col("node"))).cast("long"))
        .join(deg.select(col("ri").as("r"), col("d")), Seq("r"))
        .withColumn("vol", sum(col("d")).over(
          Window.orderBy(col("sr"))))
        .withColumn("voltot", sum(col("d")).over(Window.partitionBy()))
        .withColumn("srmax", max(col("sr")).over(Window.partitionBy()))
        .localCheckpoint()
      // conductance of every prefix cut of the embedding order
      val eRanked = sym
        .join(ordered.select(col("node").as("a"), col("sr").as("sa")), Seq("a"))
        .join(ordered.select(col("node").as("b"), col("sr").as("sb")), Seq("b"))
        .select(least(col("sa"), col("sb")).as("lo"),
          greatest(col("sa"), col("sb")).as("hi"), col("w"))
      val cuts = ordered.where(col("sr") < col("srmax"))
        .select(col("sr").as("k"), col("vol"), col("voltot"))
        .join(eRanked, col("lo") <= col("k") && col("k") < col("hi"), "left")
        .groupBy(col("k"), col("vol"), col("voltot"))
        .agg(coalesce(sum(col("w")), lit(0L)).as("cut"))
        .withColumn("phi", round(col("cut").cast("double") /
          least(col("vol"), col("voltot") - col("vol")).cast("double"), 9))
      val best = cuts
        .orderBy(col("phi"), col("k")).limit(1)
        .select(col("k").as("kbest"), col("cut").as("cut_weight"),
          round(col("phi"), 6).as("conductance"))
      ordered.crossJoin(broadcast(best))
        .select(col("node").cast("long").as("nation"),
          round(col("val"), 6).as("fiedler"),
          col("sr").as("sweep_rank"),
          (col("sr") <= col("kbest")).as("side_a"),
          col("lambda2"), col("cut_weight"), col("conductance"))
        .orderBy(col("sweep_rank"))
    },
    Some {
      val dk = Dialect(spark = false)
      s"""WITH RECURSIVE handoff AS MATERIALIZED (SELECT l_partkey AS p,
          l_suppkey AS sid,
          LEAD(l_suppkey) OVER (PARTITION BY l_partkey
            ORDER BY epoch_us(CAST(l_shipdate AS TIMESTAMP)), l_suppkey)
            AS nv
        FROM lineitem),
      fulle AS MATERIALIZED (SELECT s1.s_nationkey AS du,
          s2.s_nationkey AS dv, CAST(COUNT(*) AS BIGINT) AS w
        FROM handoff h
        JOIN supplier s1 ON s1.s_suppkey = h.sid
        JOIN supplier s2 ON s2.s_suppkey = h.nv
        WHERE h.nv IS NOT NULL AND h.nv <> h.sid
          AND s1.s_nationkey <> s2.s_nationkey
        GROUP BY 1, 2),
      sym AS MATERIALIZED (SELECT LEAST(du, dv) AS a, GREATEST(du, dv) AS b,
          CAST(SUM(w) AS BIGINT) AS w
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY du
            ORDER BY w DESC, dv) AS rn FROM fulle)
        WHERE rn <= 3 GROUP BY 1, 2),
      ranks AS MATERIALIZED (SELECT node,
          CAST(ROW_NUMBER() OVER (ORDER BY node) AS BIGINT) AS r
        FROM (SELECT a AS node FROM sym UNION SELECT b FROM sym)),
      re AS MATERIALIZED (SELECT rx.r AS ri, ry.r AS rj, e.w
        FROM (SELECT a AS x, b AS y, w FROM sym
          UNION ALL SELECT b, a, w FROM sym) e
        JOIN ranks rx ON rx.node = e.x
        JOIN ranks ry ON ry.node = e.y),
      deg AS MATERIALIZED (SELECT ri, CAST(SUM(w) AS BIGINT) AS d
        FROM re GROUP BY 1),
      nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranks),
      qcell AS MATERIALIZED (SELECT e.ri AS i, e.rj AS j,
          round(e.w / sqrt(CAST(di.d AS DOUBLE) * dj.d), 9) AS qv
        FROM re e
        JOIN deg di ON di.ri = e.ri
        JOIN deg dj ON dj.ri = e.rj),
      gridspine AS MATERIALIZED (SELECT n.n AS n, it.i AS i, jt.j AS j
        FROM nrow n,
          UNNEST(range(1, n.n + 1)) AS it(i),
          UNNEST(range(1, n.n + 1)) AS jt(j)),
      grid AS (SELECT sg.n, sg.i, sg.j, COALESCE(qc.qv, 0.0) AS qv
        FROM gridspine sg
        LEFT JOIN qcell qc ON qc.i = sg.i AND qc.j = sg.j),
      arrs AS MATERIALIZED (SELECT g.n,
          (SELECT list(gg.qv ORDER BY gg.i, gg.j) FROM grid gg) AS q,
          (SELECT list(round(sqrt(CAST(d.d AS DOUBLE))
              / sqrt(CAST((SELECT SUM(d2.d) FROM deg d2) AS DOUBLE)), 9)
            ORDER BY d.ri) FROM deg d) AS u
        FROM (SELECT ANY_VALUE(n) AS n FROM grid) g),
      pit(k, v) AS (SELECT 0, ${dk.v0} FROM arrs
        UNION ALL
        SELECT k + 1, ${dk.step("v")} FROM pit, arrs WHERE k < $Iters),
      fin AS MATERIALIZED (SELECT a.n, a.q, a.u, p.v AS vf
        FROM pit p, arrs a WHERE p.k = $Iters),
      emb AS MATERIALIZED (SELECT ix.i AS r, fin.vf[ix.i] AS val,
          ${dk.lambda2} AS lambda2
        FROM fin, UNNEST(range(1, fin.n + 1)) AS ix(i)),
      embn AS MATERIALIZED (SELECT e.r, e.val, e.lambda2, rk.node,
          CAST(ROW_NUMBER() OVER (ORDER BY e.val, rk.node) AS BIGINT) AS sr
        FROM emb e JOIN ranks rk ON rk.r = e.r),
      ordered AS MATERIALIZED (SELECT o.*, d.d,
          CAST(SUM(d.d) OVER (ORDER BY o.sr) AS BIGINT) AS vol,
          CAST(SUM(d.d) OVER () AS BIGINT) AS voltot
        FROM embn o JOIN deg d ON d.ri = o.r),
      eranked AS MATERIALIZED (SELECT LEAST(oa.sr, ob.sr) AS lo,
          GREATEST(oa.sr, ob.sr) AS hi, e.w
        FROM sym e
        JOIN ordered oa ON oa.node = e.a
        JOIN ordered ob ON ob.node = e.b),
      cuts AS MATERIALIZED (SELECT o.sr AS k, o.vol, o.voltot,
          CAST(COALESCE(SUM(er.w), 0) AS BIGINT) AS cut
        FROM ordered o
        LEFT JOIN eranked er ON er.lo <= o.sr AND o.sr < er.hi
        WHERE o.sr < (SELECT MAX(sr) FROM ordered)
        GROUP BY 1, 2, 3),
      best AS (SELECT k AS kbest, cut AS cut_weight,
          round(phi, 6) AS conductance
        FROM (SELECT *, round(CAST(cut AS DOUBLE)
            / LEAST(vol, voltot - vol), 9) AS phi FROM cuts)
        ORDER BY phi, k LIMIT 1)
      SELECT CAST(o.node AS BIGINT) AS nation, round(o.val, 6) AS fiedler,
        o.sr AS sweep_rank, (o.sr <= b.kbest) AS side_a,
        o.lambda2, b.cut_weight, b.conductance
      FROM ordered o, best b ORDER BY o.sr"""
    })

  val all: Seq[QueryDef] = Seq(q448SpectralBipartition)
}
