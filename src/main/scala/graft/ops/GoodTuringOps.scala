package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Good-Turing frequency smoothing (Good 1953) over the corpus token
  * census — the estimator behind every held-out LM mass calculation:
  * the adjusted count r* = (r+1)·N_{r+1}/N_r and the unseen-mass
  * estimate P₀ = N₁/N, where N_r is the frequency-of-frequencies
  * (reference: overseer's report pipelines over aggregate censuses,
  * doc/guide/Introduction.md:3; the LM-smoothing sibling of q527's
  * Dirichlet and the r13 min-K% audit).
  *
  * Scale shape: one token census (map-side combinable), one
  * frequency-of-frequencies re-aggregation (|distinct counts| rows —
  * vocabulary-bounded), a self-join on r+1 over the ≤10-row report
  * frame. Nothing bigger than the vocabulary ever shuffles twice.
  *
  * Exactness: N_r and N are exact BIGINTs; r* and P₀ are one double
  * division each (identical IEEE op both engines), round 6/9.
  */
object GoodTuringOps {

  val q562GoodTuring: QueryDef = QueryDef(
    "q562_good_turing",
    (s, dir) => {
      val toks = Tables(s, dir).documents
        .select(explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
          .as("tok"))
      val census = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        .localCheckpoint() // fof and the total both read it
      val fof = census.groupBy(col("c").as("r"))
        .agg(count(lit(1)).as("n_r"))
      val total = census.agg(sum(col("c")).as("n_tokens"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n1"))
      val next = fof.select((col("r") - 1).as("r"), col("n_r").as("n_next"))
      // the 10 SMALLEST observed counts (not r ≤ 10): a small corpus has
      // no singletons at all and a literal cut would report nothing
      fof.orderBy(col("r")).limit(10)
        .join(next, Seq("r"), "left")
        .crossJoin(broadcast(total))
        .select(col("r"), col("n_r"),
          coalesce(col("n_next"), lit(0L)).as("n_r_plus_1"),
          round((col("r") + 1).cast("double")
            * coalesce(col("n_next"), lit(0L)).cast("double")
            / col("n_r").cast("double"), 6).as("r_star"),
          round(col("n1").cast("double") / col("n_tokens").cast("double"), 9)
            .as("p0"))
        .orderBy(col("r"))
    },
    Some("""WITH toks AS (
        SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS tok
        FROM documents),
      census AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
      fof AS (
        SELECT c AS r, CAST(COUNT(*) AS BIGINT) AS n_r FROM census GROUP BY 1),
      total AS (
        SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
          CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
        FROM census)
      SELECT f.r, f.n_r,
        CAST(COALESCE(nx.n_r, 0) AS BIGINT) AS n_r_plus_1,
        round(CAST(f.r + 1 AS DOUBLE) * CAST(COALESCE(nx.n_r, 0) AS DOUBLE)
          / CAST(f.n_r AS DOUBLE), 6) AS r_star,
        round(CAST(t.n1 AS DOUBLE) / CAST(t.n_tokens AS DOUBLE), 9) AS p0
      FROM (SELECT * FROM fof ORDER BY r LIMIT 10) f
      LEFT JOIN fof nx ON nx.r = f.r + 1
      CROSS JOIN total t
      ORDER BY f.r"""))

  val all: Seq[QueryDef] = Seq(q562GoodTuring)
}
