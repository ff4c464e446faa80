package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Data-discovery & weak-supervision wave: functional-dependency
  * discovery across the categorical surface, a feature-hashing collision
  * audit, the pairwise mutual-information matrix, and one Dawid-Skene
  * EM step over noisy labeling functions. The profile-before-you-model
  * layer: FDs and MI describe the schema's real structure, the hashing
  * audit prices the feature-hashing trick, and the label model turns
  * noisy heuristic votes into calibrated labels.
  */
object DiscoveryOps {

  /** Functional-dependency discovery over the order-analysis categorical
    * surface (nation, region, segment, priority, year): for every
    * ordered column pair A→B, the violation share is the fraction of
    * rows whose A-value maps to more than one B-value. Exact FDs
    * (region ← nation) surface at 0; near-FDs rank by violation. One
    * melt + one (pair, a-value) aggregation — pairs are model-sized, the
    * data is scanned once. */
  val q270FdDiscovery: QueryDef = QueryDef(
    "q270_fd_discovery",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_name").as("nation"), col("r_name").as("region"),
          col("c_mktsegment").as("segment"), col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).cast("string").as("o_year"))
        .localCheckpoint() // one scan feeds all 20 ordered pairs
      val cols = Seq("nation", "region", "segment", "priority", "o_year")
      // for each ordered pair (A,B): group by A-value, count rows and
      // rows in a-groups with >1 distinct B
      val pairs = for {
        a <- cols; b <- cols if a != b
      } yield {
        base.groupBy(col(a).as("av"))
          .agg(count(lit(1)).as("rows_a"), countDistinct(col(b)).as("ndv_b"))
          .agg(sum(col("rows_a")).as("n_rows"),
            sum(when(col("ndv_b") > 1, col("rows_a")).otherwise(0L)).as("viol_rows"),
            count(lit(1)).as("n_groups"))
          .select(lit(a).as("lhs"), lit(b).as("rhs"), col("n_rows"),
            col("viol_rows"), col("n_groups"),
            round(col("viol_rows").cast("double") / col("n_rows"), 6).as("violation_share"),
            (col("viol_rows") === 0L).as("holds"))
      }
      pairs.reduce(_ union _)
    },
    Some("""WITH base AS (SELECT n.n_name AS nation, r.r_name AS region,
          c.c_mktsegment AS segment, o.o_orderpriority AS priority,
          CAST(year(o.o_orderdate) AS VARCHAR) AS o_year
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey
          JOIN region r ON n.n_regionkey = r.r_regionkey),
      cols AS (SELECT UNNEST(['nation', 'region', 'segment', 'priority', 'o_year']) AS cname),
      pair AS (
        SELECT l.cname AS lhs, r.cname AS rhs FROM cols l, cols r WHERE l.cname <> r.cname),
      vals AS (SELECT p.lhs, p.rhs,
          CASE p.lhs WHEN 'nation' THEN b.nation WHEN 'region' THEN b.region
            WHEN 'segment' THEN b.segment WHEN 'priority' THEN b.priority
            ELSE b.o_year END AS av,
          CASE p.rhs WHEN 'nation' THEN b.nation WHEN 'region' THEN b.region
            WHEN 'segment' THEN b.segment WHEN 'priority' THEN b.priority
            ELSE b.o_year END AS bv
        FROM pair p CROSS JOIN base b),
      grp AS (SELECT lhs, rhs, av, COUNT(*) AS rows_a,
          COUNT(DISTINCT bv) AS ndv_b
        FROM vals GROUP BY 1, 2, 3)
      SELECT lhs, rhs, CAST(SUM(rows_a) AS BIGINT) AS n_rows,
        CAST(SUM(CASE WHEN ndv_b > 1 THEN rows_a ELSE 0 END) AS BIGINT) AS viol_rows,
        CAST(COUNT(*) AS BIGINT) AS n_groups,
        round(CAST(SUM(CASE WHEN ndv_b > 1 THEN rows_a ELSE 0 END) AS DOUBLE)
          / SUM(rows_a), 6) AS violation_share,
        SUM(CASE WHEN ndv_b > 1 THEN rows_a ELSE 0 END) = 0 AS holds
      FROM grp GROUP BY 1, 2"""))

  /** Feature-hashing collision audit: the corpus vocabulary hashed into
    * 2^10 buckets (md5 mod — the hashing trick's table), scored by
    * occupancy, collision mass (token occurrences sharing a bucket with
    * a different token), and the max bucket load vs the Poisson balance
    * a random hash promises. Decides whether 1024 hashed features can
    * stand in for the real vocabulary. Vocab-sized frames only. */
  val q271FeatureHashAudit: QueryDef = QueryDef(
    "q271_feature_hash_audit",
    (s, dir) => {
      import graft.functions.VectorFunctions.md5Long
      val vocab = Tables(s, dir).documents
        .select(explode(TextOps.tokens(col("text"))).as("t"))
        .groupBy(col("t")).agg(count(lit(1)).as("c"))
        .withColumn("bucket", pmod(md5Long(col("t")), lit(1024L)))
      val buckets = vocab.groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("c")).as("occ"),
          max(col("c")).as("max_occ"))
      buckets.agg(
        count(lit(1)).as("n_buckets_used"),
        sum(col("n_tokens")).as("vocab_size"),
        sum(col("occ")).as("total_occ"),
        sum(when(col("n_tokens") > 1, col("occ") - col("max_occ")).otherwise(0L))
          .as("collision_mass"),
        max(col("n_tokens")).as("max_bucket_tokens"))
        .withColumn("collision_share",
          round(col("collision_mass").cast("double") / col("total_occ"), 6))
        .withColumn("load_factor",
          round(col("vocab_size").cast("double") / 1024.0, 6))
    },
    Some("""WITH vocab AS (SELECT t.t AS t, COUNT(*) AS c
        FROM (SELECT regexp_extract_all(lower(text), '\w+') AS toks FROM documents),
          UNNEST(toks) AS t(t)
        GROUP BY 1),
      hashed AS (SELECT t, c,
          ((h_hi - CASE WHEN h_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
            * 4294967296 + h_lo) % 1024 AS bucket0
        FROM (SELECT t, c,
            ('0x' || substr(md5(t), 1, 8))::BIGINT AS h_hi,
            ('0x' || substr(md5(t), 9, 8))::BIGINT AS h_lo FROM vocab)),
      bk AS (SELECT CASE WHEN bucket0 < 0 THEN bucket0 + 1024 ELSE bucket0 END AS bucket,
          COUNT(*) AS n_tokens, SUM(c) AS occ, MAX(c) AS max_occ
        FROM hashed GROUP BY 1)
      SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
        CAST(SUM(n_tokens) AS BIGINT) AS vocab_size,
        CAST(SUM(occ) AS BIGINT) AS total_occ,
        CAST(SUM(CASE WHEN n_tokens > 1 THEN occ - max_occ ELSE 0 END) AS BIGINT) AS collision_mass,
        CAST(MAX(n_tokens) AS BIGINT) AS max_bucket_tokens,
        round(CAST(SUM(CASE WHEN n_tokens > 1 THEN occ - max_occ ELSE 0 END) AS DOUBLE)
          / SUM(occ), 6) AS collision_share,
        round(CAST(SUM(n_tokens) AS DOUBLE) / 1024.0, 6) AS load_factor
      FROM bk"""))

  /** Pairwise mutual information between the categorical columns of the
    * order surface: I(A;B) = Σ p(a,b)·ln(p(a,b)/(p(a)p(b))) in nats,
    * with the normalized variant I/min(H(A),H(B)). The redundancy map a
    * feature pipeline reads before one-hot-encoding everything; all
    * probability frames are model-sized after one joint-count pass per
    * pair. */
  val q272MiMatrix: QueryDef = QueryDef(
    "q272_mi_matrix",
    (s, dir) => {
      val t = Tables(s, dir)
      val base = t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_nationkey"),
          col("c_mktsegment"))), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name").as("nation"), col("c_mktsegment").as("segment"),
          col("o_orderpriority").as("priority"),
          year(col("o_orderdate")).cast("string").as("o_year"))
        .localCheckpoint() // one scan feeds every pair's joint counts
      val cols = Seq("nation", "segment", "priority", "o_year")
      val wAll = Window.partitionBy()
      val wA = Window.partitionBy(col("a"))
      val wB = Window.partitionBy(col("b"))
      val pairs = for { a <- cols; b <- cols if a < b } yield {
        base.groupBy(col(a).as("a"), col(b).as("b"))
          .agg(count(lit(1)).as("nab"))
          .withColumn("n", sum(col("nab")).over(wAll))
          .withColumn("na", sum(col("nab")).over(wA))
          .withColumn("nb", sum(col("nab")).over(wB))
          .withColumn("term", round(col("nab").cast("double") / col("n") *
            log((col("nab").cast("double") * col("n")) / (col("na") * col("nb"))), 12))
          .withColumn("ha_term", round(col("nab").cast("double") / col("n") *
            -log(col("na").cast("double") / col("n")), 12))
          .withColumn("hb_term", round(col("nab").cast("double") / col("n") *
            -log(col("nb").cast("double") / col("n")), 12))
          .agg(round(sum(col("term")), 6).as("mi_nats"),
            round(sum(col("ha_term")), 9).as("h_a"),
            round(sum(col("hb_term")), 9).as("h_b"))
          .select(lit(a).as("col_a"), lit(b).as("col_b"), col("mi_nats"),
            round(col("mi_nats") / least(col("h_a"), col("h_b")), 6).as("mi_normalized"))
      }
      pairs.reduce(_ union _)
    },
    Some("""WITH base AS (SELECT n.n_name AS nation, c.c_mktsegment AS segment,
          o.o_orderpriority AS priority, CAST(year(o.o_orderdate) AS VARCHAR) AS o_year
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation n ON c.c_nationkey = n.n_nationkey),
      pairlist AS (SELECT l.c AS ca, r.c AS cb
        FROM (SELECT UNNEST(['nation', 'segment', 'priority', 'o_year']) AS c) l,
             (SELECT UNNEST(['nation', 'segment', 'priority', 'o_year']) AS c) r
        WHERE l.c < r.c),
      vals AS (SELECT p.ca, p.cb,
          CASE p.ca WHEN 'nation' THEN b.nation WHEN 'segment' THEN b.segment
            WHEN 'priority' THEN b.priority ELSE b.o_year END AS a,
          CASE p.cb WHEN 'nation' THEN b.nation WHEN 'segment' THEN b.segment
            WHEN 'priority' THEN b.priority ELSE b.o_year END AS b
        FROM pairlist p CROSS JOIN base b),
      joint AS (SELECT ca, cb, a, b, COUNT(*) AS nab FROM vals GROUP BY 1, 2, 3, 4),
      probs AS (SELECT ca, cb, a, b, nab,
          SUM(nab) OVER (PARTITION BY ca, cb) AS n,
          SUM(nab) OVER (PARTITION BY ca, cb, a) AS na,
          SUM(nab) OVER (PARTITION BY ca, cb, b) AS nb
        FROM joint),
      terms AS (SELECT ca, cb,
          round(CAST(nab AS DOUBLE) / n
            * ln((CAST(nab AS DOUBLE) * n) / (CAST(na AS DOUBLE) * nb)), 12) AS term,
          round(CAST(nab AS DOUBLE) / n * -ln(CAST(na AS DOUBLE) / n), 12) AS ha_term,
          round(CAST(nab AS DOUBLE) / n * -ln(CAST(nb AS DOUBLE) / n), 12) AS hb_term
        FROM probs)
      SELECT ca AS col_a, cb AS col_b,
        round(SUM(term), 6) AS mi_nats,
        round(round(SUM(term), 6) / LEAST(round(SUM(ha_term), 9), round(SUM(hb_term), 9)), 6) AS mi_normalized
      FROM terms GROUP BY 1, 2"""))

  /** One Dawid-Skene EM step over three md5-noise labeling functions
    * voting on each document's language: initialize with majority vote
    * (ties → lexicographic), estimate each labeler's accuracy against
    * the consensus, then re-score documents by accuracy-weighted
    * log-odds votes. The weak-supervision label model (Snorkel's core
    * move): the labeler-quality frame is labelers×1 — model-sized — and
    * each step is one join + aggregation over the vote matrix. */
  val q273DawidSkene: QueryDef = QueryDef(
    "q273_dawid_skene",
    (s, dir) => {
      val wAll = Window.partitionBy()
      val docs = Tables(s, dir).documents.select(col("doc_id"), col("lang"))
      val langs = docs.select(col("lang")).distinct()
      // 3 labeling functions: LF k flips the true lang to the
      // lexicographically next lang with probability p_k (md5 gate)
      val flipP = Seq(0.1, 0.25, 0.4)
      val wNext = Window.partitionBy().orderBy(col("lang").asc)
      val nextLang = langs
        .withColumn("next_lang",
          coalesce(lead(col("lang"), 1).over(wNext),
            first(col("lang")).over(wNext)))
      val votes = flipP.zipWithIndex.map { case (p, k) =>
        docs.join(broadcast(nextLang), Seq("lang"))
          .withColumn("u",
            conv(substring(md5(concat_ws("|", col("doc_id"), lit(k))), 1, 8), 16, 10)
              .cast("double") / lit(4294967296.0))
          .select(col("doc_id"), lit(k.toLong).as("lf"),
            when(col("u") < p, col("next_lang")).otherwise(col("lang")).as("vote"))
      }.reduce(_ union _).localCheckpoint() // feeds consensus + accuracy + rescore
      val wPick = Window.partitionBy(col("doc_id"))
        .orderBy(col("n_votes").desc, col("vote").asc)
      val consensus = votes.groupBy(col("doc_id"), col("vote"))
        .agg(count(lit(1)).as("n_votes"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("vote").as("y0"))
      val acc = votes.join(consensus, Seq("doc_id"))
        .groupBy(col("lf"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("vote") === col("y0"), 1L).otherwise(0L)).as("n_agree"))
        .withColumn("a", round(col("n_agree").cast("double") / col("n"), 9))
      // weighted re-vote: weight = ln(a/(1-a)), clipped into (0.01, 0.99)
      val wRe = Window.partitionBy(col("doc_id"))
        .orderBy(col("w_sum").desc, col("vote").asc)
      val relabeled = votes.join(broadcast(acc.select(col("lf"),
          round(log(least(greatest(col("a"), lit(0.01)), lit(0.99)) /
            (lit(1.0) - least(greatest(col("a"), lit(0.01)), lit(0.99)))), 9).as("w"))),
          Seq("lf"))
        .groupBy(col("doc_id"), col("vote"))
        .agg(round(sum(col("w")), 9).as("w_sum"))
        .withColumn("rn", row_number().over(wRe))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("vote").as("y1"), col("w_sum"))
      relabeled.join(docs, Seq("doc_id"))
        .groupBy(col("y1").as("label"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("y1") === col("lang"), 1L).otherwise(0L)).as("n_correct"))
        .withColumn("precision",
          round(col("n_correct").cast("double") / col("n_docs"), 6))
    },
    Some("""WITH docs AS (SELECT doc_id, lang FROM documents),
      langs AS (SELECT DISTINCT lang FROM docs),
      nl AS (SELECT lang, COALESCE(LEAD(lang) OVER (ORDER BY lang),
          FIRST_VALUE(lang) OVER (ORDER BY lang ROWS BETWEEN UNBOUNDED PRECEDING
            AND UNBOUNDED FOLLOWING)) AS next_lang
        FROM langs),
      lfs AS (SELECT * FROM (VALUES (0, 0.1), (1, 0.25), (2, 0.4)) l(lf, p)),
      votes AS (SELECT d.doc_id, l.lf,
          CASE WHEN CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || '|' || CAST(l.lf AS VARCHAR)), 1, 8))::BIGINT AS DOUBLE)
            / 4294967296.0 < l.p THEN nl.next_lang ELSE d.lang END AS vote
        FROM docs d JOIN nl ON nl.lang = d.lang CROSS JOIN lfs l),
      consensus AS (SELECT doc_id, vote AS y0 FROM (
          SELECT doc_id, vote, ROW_NUMBER() OVER (PARTITION BY doc_id
            ORDER BY COUNT(*) DESC, vote) AS rn
          FROM votes GROUP BY doc_id, vote) WHERE rn = 1),
      acc AS (SELECT v.lf, round(CAST(SUM(CASE WHEN v.vote = c.y0 THEN 1 ELSE 0 END) AS DOUBLE)
            / COUNT(*), 9) AS a
        FROM votes v JOIN consensus c USING (doc_id) GROUP BY 1),
      wts AS (SELECT lf, round(ln(LEAST(GREATEST(a, 0.01), 0.99)
          / (1.0 - LEAST(GREATEST(a, 0.01), 0.99))), 9) AS w FROM acc),
      rescored AS (SELECT doc_id, vote AS y1 FROM (
          SELECT v.doc_id, v.vote,
            ROW_NUMBER() OVER (PARTITION BY v.doc_id
              ORDER BY round(SUM(w.w), 9) DESC, v.vote) AS rn
          FROM votes v JOIN wts w USING (lf)
          GROUP BY v.doc_id, v.vote) WHERE rn = 1)
      SELECT r.y1 AS label, CAST(COUNT(*) AS BIGINT) AS n_docs,
        CAST(SUM(CASE WHEN r.y1 = d.lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
        round(CAST(SUM(CASE WHEN r.y1 = d.lang THEN 1 ELSE 0 END) AS DOUBLE)
          / COUNT(*), 6) AS precision
      FROM rescored r JOIN docs d USING (doc_id) GROUP BY 1"""))

  val all: Seq[QueryDef] =
    Seq(q270FdDiscovery, q271FeatureHashAudit, q272MiMatrix, q273DawidSkene)
}
