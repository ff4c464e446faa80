package graft.ops

import org.apache.spark.sql.functions._

/** Capture-recapture wave: Lincoln–Petersen / Chapman estimation of a
  * population's true size from two independent "captures" — the crawl
  * question ("two overlapping crawls saw n₁ and n₂ docs with m in
  * common; how big is the web corpus we're sampling?") answered without
  * ever seeing the whole population. Chao1 (q414) extrapolates from
  * frequency-of-frequencies within one sample; this triangulates from
  * the OVERLAP between two samples, and the fixture knows the true N so
  * the CI is auditable.
  *
  * Scale shape: the two captures are deterministic md5 gates (the q44
  * idiom), the overlap is one hash aggregation — one scan, three
  * counters, closed-form estimators on a 1-row frame.
  */
object CaptureOps {

  /** Two md5-gated document crawls (30% and 40%): capture counts,
    * overlap, Lincoln–Petersen and Chapman estimates, Chapman SE and
    * 95% CI, the true N, and whether the CI covers it. */
  val q416CaptureRecapture: QueryDef = QueryDef(
    "q416_capture_recapture",
    (s, dir) => {
      def gate(salt: String) =
        conv(substring(md5(concat(lit(salt), col("doc_id").cast("string"))),
          1, 4), 16, 10).cast("long") % 100
      val caps = Tables(s, dir).documents
        .select(col("doc_id"),
          (gate("crawlA|") < 30).cast("long").as("in_a"),
          (gate("crawlB|") < 40).cast("long").as("in_b"))
      caps.agg(count(lit(1)).as("true_n"),
        sum(col("in_a")).as("n1"),
        sum(col("in_b")).as("n2"),
        sum(col("in_a") * col("in_b")).as("m"))
        .withColumn("lp_est",
          round(col("n1").cast("double") * col("n2") / col("m"), 2))
        .withColumn("chapman_est",
          round((col("n1") + 1).cast("double") * (col("n2") + 1) /
            (col("m") + 1) - 1, 2))
        .withColumn("se", round(sqrt(
          (col("n1") + 1).cast("double") * (col("n2") + 1) *
            (col("n1") - col("m")) * (col("n2") - col("m")) /
            ((col("m") + 1).cast("double") * (col("m") + 1) * (col("m") + 2))),
          2))
        .withColumn("ci_lo", round(col("chapman_est") - lit(1.96) * col("se"), 2))
        .withColumn("ci_hi", round(col("chapman_est") + lit(1.96) * col("se"), 2))
        .withColumn("ci_covers",
          (col("ci_lo") <= col("true_n") && col("true_n") <= col("ci_hi"))
            .cast("boolean"))
        .select(col("n1"), col("n2"), col("m"), col("lp_est"),
          col("chapman_est"), col("se"), col("ci_lo"), col("ci_hi"),
          col("true_n"), col("ci_covers"))
    },
    Some("""WITH caps AS (SELECT doc_id,
          CASE WHEN ('0x' || substr(md5('crawlA|' || CAST(doc_id AS VARCHAR)),
            1, 4))::BIGINT % 100 < 30 THEN 1 ELSE 0 END AS in_a,
          CASE WHEN ('0x' || substr(md5('crawlB|' || CAST(doc_id AS VARCHAR)),
            1, 4))::BIGINT % 100 < 40 THEN 1 ELSE 0 END AS in_b
        FROM documents),
      agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS true_n,
          CAST(SUM(in_a) AS BIGINT) AS n1,
          CAST(SUM(in_b) AS BIGINT) AS n2,
          CAST(SUM(in_a * in_b) AS BIGINT) AS m
        FROM caps),
      est AS (SELECT *,
          round(CAST(n1 AS DOUBLE) * n2 / m, 2) AS lp_est,
          round(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) / (m + 1) - 1, 2)
            AS chapman_est,
          round(sqrt(CAST(n1 + 1 AS DOUBLE) * (n2 + 1) * (n1 - m) * (n2 - m)
            / (CAST(m + 1 AS DOUBLE) * (m + 1) * (m + 2))), 2) AS se
        FROM agg),
      ci AS (SELECT *, round(chapman_est - 1.96 * se, 2) AS ci_lo,
          round(chapman_est + 1.96 * se, 2) AS ci_hi
        FROM est)
      SELECT n1, n2, m, lp_est, chapman_est, se, ci_lo, ci_hi, true_n,
        (ci_lo <= true_n AND true_n <= ci_hi) AS ci_covers
      FROM ci"""))

  val all: Seq[QueryDef] = Seq(q416CaptureRecapture)
}
