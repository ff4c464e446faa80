package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Movement, risk, and balance operators: era-over-era rank movers,
  * peak-to-trough drawdown, the A/B sample-ratio-mismatch guardrail,
  * and hash-shard balance — the "what changed / what broke / is the
  * layout fair" audits.
  */
object StructureOps {

  /** Era-over-era rank movers: rank every part by revenue WITHIN its
    * brand for the pre-/post-1999 eras and surface each brand's three
    * biggest climbers — the assortment-shift report. Ranks are
    * per-(era, brand) windows (never a global sort); eras meet on the
    * part equi-join; movers are one more bounded ranking window.
    */
  val q206RankMovers: QueryDef = QueryDef(
    "q206_rank_movers",
    (s, dir) => {
      val t = Tables(s, dir)
      val wRank = Window.partitionBy(col("era"), col("p_brand"))
        .orderBy(col("rev").desc, col("l_partkey").asc)
      val ranked = t.lineitem
        .join(t.orders.select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t.part.select(col("p_partkey"), col("p_brand"))),
          col("l_partkey") === col("p_partkey"))
        .withColumn("era",
          when(col("o_orderdate") < lit("1999-01-01").cast("timestamp"), "old")
            .otherwise("new"))
        .groupBy(col("era"), col("p_brand"), col("l_partkey"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).as("rev"))
        .withColumn("rnk", rank().over(wRank))
        .localCheckpoint() // both era sides come from this one frame
      val old = ranked.filter(col("era") === "old")
        .select(col("p_brand"), col("l_partkey"), col("rnk").as("rank_old"))
      val nw = ranked.filter(col("era") === "new")
        .select(col("p_brand"), col("l_partkey"), col("rnk").as("rank_new"))
      val wTop = Window.partitionBy(col("p_brand"))
        .orderBy((col("rank_old") - col("rank_new")).desc,
          col("l_partkey").asc)
      old.join(nw, Seq("p_brand", "l_partkey"))
        .withColumn("climb", (col("rank_old") - col("rank_new")).cast("long"))
        .withColumn("mover_rn", row_number().over(wTop))
        .filter(col("mover_rn") <= 3 && col("climb") > 0)
        .select(col("p_brand"), col("l_partkey"), col("rank_old"),
          col("rank_new"), col("climb"))
    },
    Some("""WITH base AS (SELECT
          CASE WHEN o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
            THEN 'old' ELSE 'new' END AS era,
          p.p_brand, l.l_partkey,
          SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(18,4)))
            AS rev
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY 1, 2, 3),
      ranked AS (SELECT *, RANK() OVER (PARTITION BY era, p_brand
          ORDER BY rev DESC, l_partkey ASC) AS rnk FROM base),
      j AS (SELECT o.p_brand, o.l_partkey,
          o.rnk AS rank_old, n.rnk AS rank_new,
          CAST(o.rnk - n.rnk AS BIGINT) AS climb
        FROM (SELECT * FROM ranked WHERE era = 'old') o
        JOIN (SELECT * FROM ranked WHERE era = 'new') n
          USING (p_brand, l_partkey)),
      top AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY p_brand
          ORDER BY climb DESC, l_partkey ASC) AS mover_rn FROM j)
      SELECT p_brand, l_partkey, rank_old, rank_new, climb
      FROM top WHERE mover_rn <= 3 AND climb > 0"""))

  /** Maximum drawdown of each nation's daily revenue: the worst
    * peak-to-date decline — "demand fell 60 % from its high before
    * recovering" — the risk lens a forecaster stress-tests against.
    * Daily DECIMAL totals per nation; the running peak is one
    * cumulative-max window; the answer is one more agg. No self-join
    * against history.
    */
  val q207MaxDrawdown: QueryDef = QueryDef(
    "q207_max_drawdown",
    (s, dir) => {
      val t = Tables(s, dir)
      val wPeak = Window.partitionBy(col("n_name")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t.orders
        .join(t.customer.select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation.select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"), to_date(col("o_orderdate")).as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 4))).as("rev"))
        .withColumn("peak", max(col("rev")).over(wPeak))
        .withColumn("dd",
          lit(1.0) - col("rev").cast("double") / col("peak").cast("double"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_days"),
          round(max(col("rev")).cast("double"), 4).as("peak_daily_rev"),
          round(max(col("dd")), 6).as("max_drawdown"))
    },
    Some("""WITH daily AS (SELECT n.n_name, CAST(o.o_orderdate AS DATE) AS day,
          SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2),
      dd AS (SELECT *,
          MAX(rev) OVER (PARTITION BY n_name ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
        FROM daily)
      SELECT n_name, COUNT(*) AS n_days,
        round(CAST(MAX(rev) AS DOUBLE), 4) AS peak_daily_rev,
        round(MAX(1.0 - CAST(rev AS DOUBLE) / CAST(peak AS DOUBLE)), 6)
          AS max_drawdown
      FROM dd GROUP BY 1"""))

  /** Sample-ratio-mismatch (SRM) guardrail: users hash into A/B arms
    * by md5 parity (deterministic, engine-independent) and each
    * event-type segment's arm split is tested against 50/50 — the
    * first check every experimentation platform runs, because a
    * mismatched denominator invalidates the whole experiment. One
    * distinct (user, type) reduction; χ² per segment from exact ints.
    */
  val q208SrmCheck: QueryDef = QueryDef(
    "q208_srm_check",
    (s, dir) => {
      EventOps.events(s, dir)
        .select(col("event_type"), col("user_id")).distinct()
        .withColumn("arm",
          when(conv(substring(md5(col("user_id").cast("string")), 1, 4), 16, 10)
            .cast("long") % 2 === 0, "A").otherwise("B"))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("arm") === "A", 1L).otherwise(0L)).as("n_a"),
          sum(when(col("arm") === "B", 1L).otherwise(0L)).as("n_b"))
        .withColumn("expected",
          (col("n_a") + col("n_b")).cast("double") / lit(2.0))
        .select(col("event_type"), col("n_a"), col("n_b"),
          round((col("n_a").cast("double") - col("expected")) *
                (col("n_a").cast("double") - col("expected")) / col("expected") +
                (col("n_b").cast("double") - col("expected")) *
                (col("n_b").cast("double") - col("expected")) / col("expected"), 6)
            .as("chi2"),
          (abs(col("n_a") - col("n_b")).cast("double") >
            lit(3.0) * sqrt((col("n_a") + col("n_b")).cast("double")))
            .as("srm_flag"))
    },
    Some("""WITH ut AS (SELECT DISTINCT event_type, user_id FROM events),
      armed AS (SELECT event_type,
          CASE WHEN CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
              AS BIGINT) % 2 = 0
            THEN 'A' ELSE 'B' END AS arm
        FROM ut),
      agg AS (SELECT event_type,
          CAST(SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
          CAST(SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM armed GROUP BY 1)
      SELECT event_type, n_a, n_b,
        round((CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0) *
              (CAST(n_a AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0) /
              (CAST(n_a + n_b AS DOUBLE) / 2.0) +
              (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0) *
              (CAST(n_b AS DOUBLE) - CAST(n_a + n_b AS DOUBLE) / 2.0) /
              (CAST(n_a + n_b AS DOUBLE) / 2.0), 6) AS chi2,
        abs(n_a - n_b) > 3.0 * sqrt(CAST(n_a + n_b AS DOUBLE)) AS srm_flag
      FROM agg"""))

  /** Hash-shard balance audit: documents hash into 32 shards (md5 mod,
    * deterministic across engines and runs) and each shard reports its
    * doc/token/char load and skew against the mean — the layout
    * pre-flight that tells you whether hash partitioning will keep
    * 1000 executors evenly busy, BEFORE the 100 TB write. One scan, one
    * hash agg, mean as a window over 32 rows.
    */
  val q209ShardBalance: QueryDef = QueryDef(
    "q209_shard_balance",
    (s, dir) => {
      val wAll = Window.partitionBy()
      Tables(s, dir).documents
        .select(
          (conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("long") % 32).as("shard"),
          col("n_chars"), size(TextOps.tokens(col("text"))).cast("long").as("toks"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("toks")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars"))
        .withColumn("mean_tokens",
          avg(col("n_tokens")).over(wAll))
        .select(col("shard"), col("n_docs"), col("n_tokens"), col("n_chars"),
          round(col("n_tokens").cast("double") / col("mean_tokens") - lit(1.0), 6)
            .as("token_skew"))
    },
    Some("""WITH sh AS (SELECT
          CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
            % 32 AS shard,
          n_chars,
          CAST(len(regexp_extract_all(lower(text), '\w+')) AS BIGINT) AS toks
        FROM documents),
      agg AS (SELECT shard, COUNT(*) AS n_docs,
          CAST(SUM(toks) AS BIGINT) AS n_tokens,
          CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM sh GROUP BY 1)
      SELECT shard, n_docs, n_tokens, n_chars,
        round(CAST(n_tokens AS DOUBLE) / AVG(CAST(n_tokens AS DOUBLE)) OVER ()
          - 1.0, 6) AS token_skew
      FROM agg"""))

  val all: Seq[QueryDef] = Seq(q206RankMovers, q207MaxDrawdown,
    q208SrmCheck, q209ShardBalance)
}
