package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Journey & coverage wave: character-level conditional entropy per
  * language, absorbing-Markov removal-effect attribution (the
  * data-driven successor to rule-based attribution), exact Shapley
  * attribution over channel presence masks, and embedding-space
  * coverage divergence between train and eval splits.
  *
  * Scale shapes: q314 is one linear character-trigram pass folded into
  * per-language type frames; q315/q316 reduce journeys to a ≤6-state
  * transition matrix / 16-row mask frame and do all the math there;
  * q317 is the q62 centroid-assignment shape with a 10-cell histogram
  * comparison. Every cross-engine float sum folds pre-rounded DECIMAL
  * terms.
  */
object JourneyOps {

  private val D12 = DecimalType(24, 12)

  /** Character-level conditional entropy per language: H(c₃ | c₁c₂) =
    * −Σ p(xyz)·log2(n_xyz / n_xy·) over character trigrams — the
    * bits-per-character compressibility floor a char-level tokenizer
    * would see (the char-grain companion to q94's token bigram LM).
    * One trigram explosion (linear in characters), then all math on the
    * per-language type frame. */
  val q314CharEntropy: QueryDef = QueryDef(
    "q314_char_entropy",
    (s, dir) => {
      // H(c3|c1c2) = H(tri) − H(prefix): two independent entropy folds
      // whose only join is a 5-row per-language total broadcast. The
      // naive form (prefix counts joined back onto the trigram-type
      // frame) re-shuffles the ~|types| frame and measured 47× on 10×
      // data; this chain-rule form is two hash aggregations, linear in
      // characters.
      // trigrams index a pre-split chars array (O(1) per gram) — the
      // positional form substring(text, i, 3) is O(i) on UTF8String, so
      // the per-document loop goes quadratic in document length
      // (measured 135 s vs 38 s for this form on the 40M-char sf1 corpus)
      val tris = Tables(s, dir).documents
        .select(col("lang"), col("text"))
        .filter(length(col("text")) >= 3)
        .withColumn("t", split(col("text"), ""))
        .select(col("lang"), explode(expr(
          "transform(sequence(1, size(t) - 2), i -> concat(element_at(t, i), element_at(t, i+1), element_at(t, i+2)))"))
          .as("g"))
        .groupBy(col("lang"), col("g")).agg(count(lit(1)).as("n3"))
        .localCheckpoint() // feeds the totals, the tri fold, and the pfx fold
      val byLang = broadcast(tris.groupBy(col("lang")).agg(sum(col("n3")).as("nn")))
      val hTri = tris.join(byLang, Seq("lang"))
        .withColumn("t", round((col("n3").cast("double") / col("nn")) *
          -log2(col("n3").cast("double") / col("nn")), 12).cast(D12))
        .groupBy(col("lang"))
        .agg(max(col("nn")).as("n_trigrams"), count(lit(1)).as("n_types"),
          sum(col("t")).as("h_tri"))
      val hPfx = tris.groupBy(col("lang"), substring(col("g"), 1, 2).as("pfx"))
        .agg(sum(col("n3")).as("n2"))
        .join(byLang, Seq("lang"))
        .withColumn("t", round((col("n2").cast("double") / col("nn")) *
          -log2(col("n2").cast("double") / col("nn")), 12).cast(D12))
        .groupBy(col("lang")).agg(sum(col("t")).as("h_pfx"))
      hTri.join(hPfx, Seq("lang"))
        .select(col("lang"), col("n_trigrams"), col("n_types"),
          round((col("h_tri") - col("h_pfx")).cast("double"), 6).as("h_cond_bits"),
          round(col("h_tri").cast("double"), 6).as("h_tri_bits"))
        .orderBy(col("lang"))
    },
    Some("""WITH tris AS (SELECT lang, g, CAST(COUNT(*) AS BIGINT) AS n3
        FROM (SELECT lang, UNNEST(list_transform(range(1, length(text) - 1),
            i -> substr(text, CAST(i AS INT), 3))) AS g
          FROM documents WHERE length(text) >= 3)
        GROUP BY 1, 2),
      bylang AS (SELECT lang, CAST(SUM(n3) AS BIGINT) AS nn
        FROM tris GROUP BY 1),
      htri AS (SELECT t.lang, CAST(MAX(l.nn) AS BIGINT) AS n_trigrams,
          CAST(COUNT(*) AS BIGINT) AS n_types,
          SUM(CAST(round((CAST(t.n3 AS DOUBLE) / l.nn)
            * -log2(CAST(t.n3 AS DOUBLE) / l.nn), 12) AS DECIMAL(24,12))) AS h_tri
        FROM tris t JOIN bylang l ON l.lang = t.lang
        GROUP BY 1),
      bypfx AS (SELECT lang, substr(g, 1, 2) AS pfx,
          CAST(SUM(n3) AS BIGINT) AS n2 FROM tris GROUP BY 1, 2),
      hpfx AS (SELECT p.lang,
          SUM(CAST(round((CAST(p.n2 AS DOUBLE) / l.nn)
            * -log2(CAST(p.n2 AS DOUBLE) / l.nn), 12) AS DECIMAL(24,12))) AS h_pfx
        FROM bypfx p JOIN bylang l ON l.lang = p.lang
        GROUP BY 1)
      SELECT t.lang, t.n_trigrams, t.n_types,
        round(CAST(t.h_tri - p.h_pfx AS DOUBLE), 6) AS h_cond_bits,
        round(CAST(t.h_tri AS DOUBLE), 6) AS h_tri_bits
      FROM htri t JOIN hpfx p ON p.lang = t.lang ORDER BY t.lang"""))

  /** Per-user journeys truncated at the first purchase: the shared
    * event sequence both attribution operators consume. */
  private def journeys(s: SparkSession, dir: String): DataFrame = {
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    EventOps.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("purchases_before",
        sum((col("event_type") === "purchase").cast("long")).over(
          wUser.rowsBetween(Window.unboundedPreceding, -1)))
      .filter(coalesce(col("purchases_before"), lit(0L)) === 0L)
  }

  private val journeysSql =
    """journeys AS (SELECT user_id, event_id, ts, event_type
        FROM (SELECT user_id, event_id, ts, event_type,
            COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS purchases_before
          FROM events)
        WHERE purchases_before = 0)"""

  /** Absorbing-Markov removal-effect attribution: per-user journeys
    * truncated at first purchase become a transition matrix over the 4
    * touch states (+ purchase / end absorbing); conversion probability
    * is 6 unrolled value-iteration steps; each channel's removal effect
    * is the conversion drop when its node is deleted (edges into it
    * become drops, starts at it are lost — no renormalization, the
    * standard Markov-attribution semantics). The matrix, start
    * distribution, and every iteration live on ≤(5 variants × 6 states)
    * frames. */
  val q315MarkovRemoval: QueryDef = QueryDef(
    "q315_markov_removal",
    (s, dir) => {
      val wUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val seq = journeys(s, dir)
        .withColumn("nxt", coalesce(lead(col("event_type"), 1).over(wUser),
          lit("end")))
        .localCheckpoint(false) // feeds transitions AND the start
                                 // distribution; lazy (r16): materializes
                                 // inside the first consumer's job, one
                                 // less driver action, same one-pass math
      val trans = seq.filter(col("event_type") =!= "purchase")
        .groupBy(col("event_type").as("s"), col("nxt").as("t"))
        .agg(count(lit(1)).as("n"))
        .withColumn("tot", sum(col("n")).over(Window.partitionBy(col("s"))))
        .withColumn("p", round(col("n").cast("double") / col("tot"), 9))
      val nUsers = seq.groupBy(col("user_id"))
        .agg(min_by(col("event_type"), struct(col("ts"), col("event_id")))
          .as("first_ev"))
        .groupBy(col("first_ev")).agg(count(lit(1)).as("nf"))
        .withColumn("n_users", sum(col("nf")).over(Window.partitionBy()))
        .withColumn("w", round(col("nf").cast("double") / col("n_users"), 9))
        .localCheckpoint(false)
      val channels = Seq("view", "click", "signup", "error")
      val variants = broadcast(Tables(s, dir).region.limit(1)
        .select(explode(array((lit("base") +: channels.map(lit)): _*))
          .as("removed")))
      val mat = trans.crossJoin(variants)
        .filter(col("removed") === "base" ||
          (col("s") =!= col("removed") && col("t") =!= col("removed")))
        .select(col("removed"), col("s"), col("t"), col("p"))
        .localCheckpoint(false) // tiny: ≤ 5 variants × 24 edges
      val pconv = mat.filter(col("t") === "purchase")
        .select(col("removed"), col("s"), col("p").as("pp"))
      val matT = mat.filter(!col("t").isin("purchase", "end"))
        .select(col("removed"), col("s"), col("t"), col("p"))
      // 6 unrolled value-iteration steps on the (variant, state) frame;
      // each step's cross-product terms are rounded into DECIMAL before
      // the fold so both engines sum identical numbers
      def step(v: DataFrame): DataFrame =
        matT.join(v.select(col("removed"), col("s").as("t"), col("v")),
            Seq("removed", "t"))
          .withColumn("term", round(col("p") * col("v"), 12).cast(D12))
          .groupBy(col("removed"), col("s"))
          .agg(sum(col("term")).cast("double").as("carry"))
          .join(pconv, Seq("removed", "s"), "full")
          .select(col("removed"), col("s"),
            (coalesce(col("carry"), lit(0.0)) +
              coalesce(col("pp"), lit(0.0))).as("v"))
      val v1 = pconv.select(col("removed"), col("s"), col("pp").as("v"))
      val v6 = (1 to 5).foldLeft(v1)((v, _) => step(v))
      val conv = nUsers.select(col("first_ev"), col("w"))
        .crossJoin(variants)
        .filter(col("removed") === "base" || col("first_ev") =!= col("removed"))
        .join(v6.select(col("removed"), col("s").as("first_ev"), col("v")),
          Seq("removed", "first_ev"), "left")
        .withColumn("vv", when(col("first_ev") === "purchase", lit(1.0))
          .otherwise(coalesce(col("v"), lit(0.0))))
        .withColumn("contrib", round(col("w") * col("vv"), 12).cast(D12))
        .groupBy(col("removed"))
        .agg(sum(col("contrib")).cast("double").as("conv"))
        .localCheckpoint(false) // 5 rows; joined against its own base row
      val base = conv.filter(col("removed") === "base")
        .select(col("conv").as("conv_base"))
      conv.crossJoin(broadcast(base))
        .select(col("removed"), round(col("conv"), 6).as("conv"),
          round(col("conv_base"), 6).as("conv_base"),
          round(when(col("removed") === "base", lit(0.0))
            .otherwise((col("conv_base") - col("conv")) / col("conv_base")), 6)
            .as("removal_effect"))
        .orderBy(col("removed"))
    },
    Some(s"""WITH $journeysSql,
      seq AS (SELECT user_id, event_type, ts, event_id,
          COALESCE(LEAD(event_type) OVER (PARTITION BY user_id
            ORDER BY ts, event_id), 'end') AS nxt
        FROM journeys),
      trans AS (SELECT s, t, round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY s), 9) AS p
        FROM (SELECT event_type AS s, nxt AS t, CAST(COUNT(*) AS BIGINT) AS n
          FROM seq WHERE event_type <> 'purchase' GROUP BY 1, 2)),
      firsts AS (SELECT first_ev,
          round(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER (), 9) AS w
        FROM (SELECT user_id, first(event_type ORDER BY ts, event_id) AS first_ev
          FROM seq GROUP BY 1)
        GROUP BY 1),
      variants AS (SELECT UNNEST(['base', 'view', 'click', 'signup', 'error'])
          AS removed),
      mat AS (SELECT v.removed, t.s, t.t, t.p
        FROM trans t CROSS JOIN variants v
        WHERE v.removed = 'base' OR (t.s <> v.removed AND t.t <> v.removed)),
      pconv AS (SELECT removed, s, p AS pp FROM mat WHERE t = 'purchase'),
      matt AS (SELECT removed, s, t, p FROM mat
        WHERE t NOT IN ('purchase', 'end')),
      v1 AS (SELECT removed, s, pp AS v FROM pconv),
      v2 AS (SELECT COALESCE(c.removed, p.removed) AS removed,
          COALESCE(c.s, p.s) AS s,
          COALESCE(c.carry, 0) + COALESCE(p.pp, 0) AS v
        FROM (SELECT m.removed, m.s, CAST(SUM(CAST(round(m.p * v1.v, 12)
              AS DECIMAL(24,12))) AS DOUBLE) AS carry
          FROM matt m JOIN v1 ON v1.removed = m.removed AND v1.s = m.t
          GROUP BY 1, 2) c
        FULL JOIN pconv p ON p.removed = c.removed AND p.s = c.s),
      v3(removed, s, v) AS (SELECT COALESCE(c.removed, p.removed), COALESCE(c.s, p.s),
          COALESCE(c.carry, 0) + COALESCE(p.pp, 0)
        FROM (SELECT m.removed, m.s, CAST(SUM(CAST(round(m.p * v2.v, 12)
              AS DECIMAL(24,12))) AS DOUBLE) AS carry
          FROM matt m JOIN v2 ON v2.removed = m.removed AND v2.s = m.t
          GROUP BY 1, 2) c
        FULL JOIN pconv p ON p.removed = c.removed AND p.s = c.s),
      v4(removed, s, v) AS (SELECT COALESCE(c.removed, p.removed), COALESCE(c.s, p.s),
          COALESCE(c.carry, 0) + COALESCE(p.pp, 0)
        FROM (SELECT m.removed, m.s, CAST(SUM(CAST(round(m.p * v3.v, 12)
              AS DECIMAL(24,12))) AS DOUBLE) AS carry
          FROM matt m JOIN v3 ON v3.removed = m.removed AND v3.s = m.t
          GROUP BY 1, 2) c
        FULL JOIN pconv p ON p.removed = c.removed AND p.s = c.s),
      v5(removed, s, v) AS (SELECT COALESCE(c.removed, p.removed), COALESCE(c.s, p.s),
          COALESCE(c.carry, 0) + COALESCE(p.pp, 0)
        FROM (SELECT m.removed, m.s, CAST(SUM(CAST(round(m.p * v4.v, 12)
              AS DECIMAL(24,12))) AS DOUBLE) AS carry
          FROM matt m JOIN v4 ON v4.removed = m.removed AND v4.s = m.t
          GROUP BY 1, 2) c
        FULL JOIN pconv p ON p.removed = c.removed AND p.s = c.s),
      v6(removed, s, v) AS (SELECT COALESCE(c.removed, p.removed), COALESCE(c.s, p.s),
          COALESCE(c.carry, 0) + COALESCE(p.pp, 0)
        FROM (SELECT m.removed, m.s, CAST(SUM(CAST(round(m.p * v5.v, 12)
              AS DECIMAL(24,12))) AS DOUBLE) AS carry
          FROM matt m JOIN v5 ON v5.removed = m.removed AND v5.s = m.t
          GROUP BY 1, 2) c
        FULL JOIN pconv p ON p.removed = c.removed AND p.s = c.s),
      conv AS (SELECT v.removed,
          CAST(SUM(CAST(round(f.w * (CASE WHEN f.first_ev = 'purchase' THEN 1.0
            ELSE COALESCE(v6.v, 0) END), 12) AS DECIMAL(24,12))) AS DOUBLE) AS conv
        FROM firsts f CROSS JOIN variants v
        LEFT JOIN v6 ON v6.removed = v.removed AND v6.s = f.first_ev
        WHERE v.removed = 'base' OR f.first_ev <> v.removed
        GROUP BY 1),
      base AS (SELECT conv AS conv_base FROM conv WHERE removed = 'base')
      SELECT removed, round(conv, 6) AS conv, round(conv_base, 6) AS conv_base,
        round(CASE WHEN removed = 'base' THEN 0.0
          ELSE (conv_base - conv) / conv_base END, 6) AS removal_effect
      FROM conv, base ORDER BY removed"""))

  /** Exact Shapley attribution over channel presence masks: each user's
    * pre-purchase journey collapses to a 4-bit mask (view/click/signup/
    * error), v(mask) = that mask's conversion rate (0 for unobserved
    * masks), and every channel gets its exact Shapley value over the
    * 16-mask lattice — 4 channels × 8 subsets, closed-form factorial
    * weights. Efficiency (Σφ = v(full) − v(∅)) is asserted in the spec.
    * The journey pass is linear; all Shapley math runs on the 16-row
    * mask frame. */
  val q316ShapleyAttribution: QueryDef = QueryDef(
    "q316_shapley_attribution",
    (s, dir) => {
      val masks = journeys(s, dir)
        .groupBy(col("user_id"))
        .agg(
          (max((col("event_type") === "view").cast("long")) +
            max((col("event_type") === "click").cast("long")) * 2 +
            max((col("event_type") === "signup").cast("long")) * 4 +
            max((col("event_type") === "error").cast("long")) * 8).as("mask"),
          max((col("event_type") === "purchase").cast("long")).as("conv"))
        .groupBy(col("mask"))
        .agg(count(lit(1)).as("n_users"), sum(col("conv")).as("n_conv"))
        .withColumn("v", round(col("n_conv").cast("double") / col("n_users"), 9))
        .localCheckpoint() // ≤ 16 rows; feeds both v-lookups
      val lattice = Tables(s, dir).region.limit(1)
        .select(explode(sequence(lit(0L), lit(15L))).as("m"))
        .crossJoin(broadcast(Tables(s, dir).region.limit(1)
          .select(explode(array(
            struct(lit("view").as("channel"), lit(1L).as("bit")),
            struct(lit("click").as("channel"), lit(2L).as("bit")),
            struct(lit("signup").as("channel"), lit(4L).as("bit")),
            struct(lit("error").as("channel"), lit(8L).as("bit")))).as("c"))
          .select(col("c.channel"), col("c.bit"))))
        .filter(col("m").bitwiseAND(col("bit")) === 0L)
        .withColumn("sz", bit_count(col("m")).cast("long"))
        .withColumn("weight",
          when(col("sz") === 0L, 0.25).when(col("sz") === 3L, 0.25)
            .otherwise(lit(1.0) / 12.0))
      val vS = masks.select(col("mask").as("m"), col("v").as("v_s"))
      val vSc = masks.select(col("mask").as("m_c"), col("v").as("v_sc"))
      lattice
        .withColumn("m_c", col("m").bitwiseOR(col("bit")))
        .join(broadcast(vS), Seq("m"), "left")
        .join(broadcast(vSc), Seq("m_c"), "left")
        .withColumn("term", round(col("weight") *
          (coalesce(col("v_sc"), lit(0.0)) - coalesce(col("v_s"), lit(0.0))), 12)
          .cast(D12))
        .groupBy(col("channel"))
        .agg(round(sum(col("term")).cast("double"), 6).as("shapley"))
        .join(broadcast(masks.select(col("mask"), col("v"))),
          col("mask") === when(col("channel") === "view", 1L)
            .when(col("channel") === "click", 2L)
            .when(col("channel") === "signup", 4L).otherwise(8L), "left")
        .select(col("channel"), col("shapley"),
          round(coalesce(col("v"), lit(0.0)), 6).as("v_solo"))
        .orderBy(col("channel"))
    },
    Some(s"""WITH $journeysSql,
      masks AS (SELECT mask, CAST(COUNT(*) AS BIGINT) AS n_users,
          round(CAST(SUM(conv) AS DOUBLE) / COUNT(*), 9) AS v
        FROM (SELECT user_id,
            MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            + MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) * 2
            + MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) * 4
            + MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) * 8 AS mask,
            MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
          FROM journeys GROUP BY 1)
        GROUP BY 1),
      chans AS (SELECT * FROM (VALUES ('view', 1), ('click', 2),
          ('signup', 4), ('error', 8)) c(channel, bit)),
      lattice AS (SELECT m.m, c.channel, c.bit,
          CASE WHEN bit_count(m.m) IN (0, 3) THEN 0.25 ELSE 1.0 / 12.0 END AS weight
        FROM (SELECT UNNEST(range(0, 16)) AS m) m CROSS JOIN chans c
        WHERE (m.m & c.bit) = 0),
      terms AS (SELECT l.channel,
          CAST(round(l.weight * (COALESCE(vc.v, 0) - COALESCE(vs.v, 0)), 12)
            AS DECIMAL(24,12)) AS term
        FROM lattice l
        LEFT JOIN masks vs ON vs.mask = l.m
        LEFT JOIN masks vc ON vc.mask = (l.m | l.bit)),
      shap AS (SELECT channel, round(CAST(SUM(term) AS DOUBLE), 6) AS shapley
        FROM terms GROUP BY 1)
      SELECT s.channel, s.shapley,
        round(COALESCE(m.v, 0), 6) AS v_solo
      FROM shap s
      LEFT JOIN masks m ON m.mask = (SELECT bit FROM chans WHERE channel = s.channel)
      ORDER BY s.channel"""))

  /** Embedding-space coverage: assign every vector to its
    * nearest-by-cosine label centroid computed on the TRAIN split
    * (vec_id % 5 ≠ 0, the q62 shape), then compare the train vs eval
    * cell occupancy with Jensen–Shannon divergence — "does the eval set
    * live where the train set lives?" in 10 cells. Output per cell plus
    * the global JS constant. */
  val q317EmbeddingCoverage: QueryDef = QueryDef(
    "q317_embedding_coverage",
    (s, dir) => {
      val flat = Tables(s, dir).embeddings
        .select(col("vec_id"), posexplode(col("embedding")))
        .select(col("vec_id"), col("pos").as("dim"),
          col("col").cast("double").as("v"))
        .localCheckpoint() // feeds centroid build AND assignment
      val cent = flat.filter(col("vec_id") % 5 =!= 0)
        .join(Tables(s, dir).embeddings.select(col("vec_id"), col("label")),
          Seq("vec_id"))
        .groupBy(col("label").as("cell"), col("dim"))
        .agg(round(avg(col("v")), 9).as("c"))
      val assigned = flat.join(broadcast(cent), Seq("dim"))
        .groupBy(col("vec_id"), col("cell"))
        .agg(sum(col("v") * col("c")).as("dot"),
          sum(col("v") * col("v")).as("v2"), sum(col("c") * col("c")).as("c2"))
        .withColumn("cos", round(col("dot") /
          (sqrt(col("v2")) * sqrt(col("c2"))), 6))
        .withColumn("rn", row_number().over(Window.partitionBy(col("vec_id"))
          .orderBy(col("cos").desc, col("cell").asc)))
        .filter(col("rn") === 1)
        .withColumn("split", when(col("vec_id") % 5 === 0, "eval")
          .otherwise("train"))
      val w = Window.partitionBy()
      val cells = assigned.groupBy(col("cell"))
        .agg(sum((col("split") === "train").cast("long")).as("n_train"),
          sum((col("split") === "eval").cast("long")).as("n_eval"))
        .withColumn("p", col("n_train").cast("double") /
          sum(col("n_train")).over(w))
        .withColumn("q", col("n_eval").cast("double") /
          sum(col("n_eval")).over(w))
        .withColumn("mgl", (col("p") + col("q")) / 2.0)
        .withColumn("contrib", round(
          when(col("p") > 0, col("p") * log2(col("p") / col("mgl")) / 2.0)
            .otherwise(0.0) +
          when(col("q") > 0, col("q") * log2(col("q") / col("mgl")) / 2.0)
            .otherwise(0.0), 12).cast(D12))
      cells
        .withColumn("js", round(sum(col("contrib")).over(w).cast("double"), 6))
        .select(col("cell"), col("n_train"), col("n_eval"),
          round(col("p"), 6).as("p_train"), round(col("q"), 6).as("p_eval"),
          round(col("contrib").cast("double"), 6).as("js_contrib"), col("js"))
        .orderBy(col("cell"))
    },
    Some("""WITH flat AS (SELECT vec_id, t.gs AS dim,
          CAST(embedding[t.gs] AS DOUBLE) AS v
        FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(gs)),
      cent AS (SELECT e.label AS cell, f.dim, round(avg(f.v), 9) AS c
        FROM flat f JOIN embeddings e USING (vec_id)
        WHERE f.vec_id % 5 <> 0 GROUP BY 1, 2),
      scored AS (SELECT f.vec_id, c.cell,
          round(SUM(f.v * c.c) / (sqrt(SUM(f.v * f.v)) * sqrt(SUM(c.c * c.c))), 6)
            AS cos
        FROM flat f JOIN cent c USING (dim) GROUP BY 1, 2),
      assigned AS (SELECT vec_id, cell,
          CASE WHEN vec_id % 5 = 0 THEN 'eval' ELSE 'train' END AS split
        FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY cos DESC, cell) AS rn FROM scored)
        WHERE rn = 1),
      cells AS (SELECT cell,
          CAST(SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
          CAST(SUM(CASE WHEN split = 'eval' THEN 1 ELSE 0 END) AS BIGINT) AS n_eval
        FROM assigned GROUP BY 1),
      shares AS (SELECT *, CAST(n_train AS DOUBLE) / SUM(n_train) OVER () AS p,
          CAST(n_eval AS DOUBLE) / SUM(n_eval) OVER () AS q
        FROM cells),
      contribs AS (SELECT *, CAST(round(
          (CASE WHEN p > 0 THEN p * log2(p / ((p + q) / 2.0)) / 2.0 ELSE 0 END) +
          (CASE WHEN q > 0 THEN q * log2(q / ((p + q) / 2.0)) / 2.0 ELSE 0 END), 12)
            AS DECIMAL(24,12)) AS contrib
        FROM shares)
      SELECT cell, n_train, n_eval, round(p, 6) AS p_train,
        round(q, 6) AS p_eval, round(CAST(contrib AS DOUBLE), 6) AS js_contrib,
        round(CAST(SUM(contrib) OVER () AS DOUBLE), 6) AS js
      FROM contribs ORDER BY cell"""))

  val all: Seq[QueryDef] = Seq(q314CharEntropy, q315MarkovRemoval,
    q316ShapleyAttribution, q317EmbeddingCoverage)
}
