package graft.ops

import org.apache.spark.sql.functions._

/** Dunning log-likelihood-ratio (G²) keyness: which terms distinguish
  * the src0 sub-corpus from the rest — the likelihood-ratio keyness
  * test (Dunning 1993) beside q114's chi-square version; G² is the
  * standard choice for sparse counts where χ²'s normal approximation
  * breaks (reference: overseer's report family over aggregate censuses,
  * doc/guide/Introduction.md:3).
  *
  * Scale shape: ONE token census with conditional sums (a and b per
  * term in the same hash agg — the corpus never shuffles twice), 1-row
  * totals broadcast, TakeOrdered top-20. Vocabulary-bounded after the
  * census.
  *
  * Exactness: a, b, and the totals are exact BIGINTs; G² is a fixed
  * chain of identical IEEE doubles both engines (0·ln0 handled as 0 by
  * the CASE gates), surfaced round 6 with the (g2, term) tiebreak.
  */
object KeynessG2Ops {

  val q570KeynessG2: QueryDef = QueryDef(
    "q570_keyness_g2",
    (s, dir) => {
      val counts = Tables(s, dir).documents
        .select(col("source"),
          explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
            .as("tok"))
        .groupBy(col("tok"))
        .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("a"),
          sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("b"))
        .localCheckpoint() // totals and the scored frame both read it
      val totals = counts.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
      counts.crossJoin(broadcast(totals))
        .select(col("tok"), col("a"), col("b"),
          round(lit(2.0) * (
            when(col("a") > 0,
              col("a").cast("double") * log(
                col("a").cast("double") * (col("na") + col("nb")).cast("double")
                  / ((col("a") + col("b")).cast("double")
                    * col("na").cast("double")))).otherwise(lit(0.0))
            + when(col("b") > 0,
              col("b").cast("double") * log(
                col("b").cast("double") * (col("na") + col("nb")).cast("double")
                  / ((col("a") + col("b")).cast("double")
                    * col("nb").cast("double")))).otherwise(lit(0.0))), 6)
            .as("g2"))
        .orderBy(col("g2").desc, col("tok"))
        .limit(20)
    },
    Some("""WITH counts AS (
        SELECT tok,
          CAST(SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS a,
          CAST(SUM(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS b
        FROM (SELECT source,
                unnest(regexp_extract_all(lower(text), '\w+')) AS tok
              FROM documents)
        GROUP BY 1),
      totals AS (
        SELECT CAST(SUM(a) AS BIGINT) AS na, CAST(SUM(b) AS BIGINT) AS nb
        FROM counts)
      SELECT c.tok, c.a, c.b,
        round(2.0 * (
          CASE WHEN c.a > 0 THEN CAST(c.a AS DOUBLE) * ln(
            CAST(c.a AS DOUBLE) * CAST(t.na + t.nb AS DOUBLE)
              / (CAST(c.a + c.b AS DOUBLE) * CAST(t.na AS DOUBLE)))
            ELSE 0.0 END
          + CASE WHEN c.b > 0 THEN CAST(c.b AS DOUBLE) * ln(
            CAST(c.b AS DOUBLE) * CAST(t.na + t.nb AS DOUBLE)
              / (CAST(c.a + c.b AS DOUBLE) * CAST(t.nb AS DOUBLE)))
            ELSE 0.0 END), 6) AS g2
      FROM counts c CROSS JOIN totals t
      ORDER BY g2 DESC, c.tok
      LIMIT 20"""))

  val all: Seq[QueryDef] = Seq(q570KeynessG2)
}
