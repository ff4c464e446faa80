package graft.ops

import org.apache.spark.sql.functions._

/** Rejection resampling to a target length distribution — the
  * "balance the corpus" curation step (reference: overseer's curation
  * family, doc/guide/Introduction.md:3; q89 rebalances ACROSS
  * sources by temperature — this balances WITHIN a marginal, the
  * length histogram, by per-bin rejection). Bins are 100-char buckets;
  * the target is UNIFORM over observed bins; each bin keeps documents
  * with the deterministic md5 coin u < c/n_b where c = min_b n_b — the
  * exact "downsample every bin to the rarest bin's size in
  * expectation" rule. The report shows, per bin, the acceptance rate,
  * what survived, and the achieved-vs-target share gap — the curve a
  * curation pipeline publishes to prove the resample worked.
  *
  * Scale shape: ONE 6-row count aggregate (broadcast back onto the
  * scan) + one coin filter — the corpus itself never shuffles; at
  * 100 TB this is a metadata pass plus a filtered write. The md5 coin
  * makes the "random" subset a pure function of doc_id, so reruns and
  * engines agree row-for-row (the q112/q495 discipline).
  *
  * Exactness: counts BIGINT; acceptance and shares are single
  * BIGINT→DOUBLE division chains rounded at 6; the coin comparison is
  * the same IEEE expression both engines.
  */
object ResampleOps {

  private val MaxHash = 1152921504606846976.0 // 2^60

  val q506RejectionResample: QueryDef = QueryDef(
    "q506_rejection_resample",
    (s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), (col("n_chars") / 100).cast("long").as("bin"))
        .withColumn("u",
          (conv(substring(md5(concat(lit("rr|"),
            col("doc_id").cast("string"))), 1, 15), 16, 10)
            .cast("double") + 1.0) / MaxHash)
      val bins = d.groupBy(col("bin")).agg(count(lit(1)).as("n_docs"))
      val cmin = bins.agg(min(col("n_docs")).as("c"))
      val nbins = bins.agg(count(lit(1)).as("n_bins"),
        sum(col("n_docs")).as("n_total"))
      val accepted = d
        .join(broadcast(bins), Seq("bin"))
        .crossJoin(broadcast(cmin))
        .where(col("u") < col("c").cast("double") / col("n_docs").cast("double"))
        .groupBy(col("bin")).agg(count(lit(1)).as("n_accepted"))
      val accTot = accepted.agg(sum(col("n_accepted")).as("n_acc_total"))
      bins.join(accepted, Seq("bin"), "left")
        .na.fill(0L, Seq("n_accepted"))
        .crossJoin(broadcast(cmin))
        .crossJoin(broadcast(nbins))
        .crossJoin(broadcast(accTot))
        .select(col("bin"), col("n_docs"),
          round(col("c").cast("double") / col("n_docs").cast("double"), 6)
            .as("accept_p"),
          col("n_accepted"),
          round(col("n_accepted").cast("double") /
            col("n_acc_total").cast("double"), 6).as("achieved_share"),
          round(lit(1.0) / col("n_bins").cast("double"), 6)
            .as("target_share"))
        .orderBy(col("bin"))
    },
    Some(s"""WITH d AS (
        SELECT doc_id, CAST(n_chars // 100 AS BIGINT) AS bin,
          (('0x' || substr(md5('rr|' || CAST(doc_id AS VARCHAR)), 1, 15))
            ::BIGINT + 1.0) / $MaxHash AS u
        FROM documents),
      bins AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM d GROUP BY 1),
      cmin AS (SELECT CAST(MIN(n_docs) AS BIGINT) AS c FROM bins),
      nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bins,
        CAST(SUM(n_docs) AS BIGINT) AS n_total FROM bins),
      accepted AS (
        SELECT d.bin, CAST(COUNT(*) AS BIGINT) AS n_accepted
        FROM d JOIN bins b ON b.bin = d.bin CROSS JOIN cmin
        WHERE d.u < CAST(cmin.c AS DOUBLE) / CAST(b.n_docs AS DOUBLE)
        GROUP BY 1),
      acctot AS (SELECT CAST(SUM(n_accepted) AS BIGINT) AS n_acc_total
        FROM accepted)
      SELECT b.bin, b.n_docs,
        round(CAST(c.c AS DOUBLE) / CAST(b.n_docs AS DOUBLE), 6) AS accept_p,
        COALESCE(a.n_accepted, 0) AS n_accepted,
        round(CAST(COALESCE(a.n_accepted, 0) AS DOUBLE) /
          CAST(t.n_acc_total AS DOUBLE), 6) AS achieved_share,
        round(CAST(1.0 AS DOUBLE) / CAST(nb.n_bins AS DOUBLE), 6)
          AS target_share
      FROM bins b LEFT JOIN accepted a ON a.bin = b.bin
      CROSS JOIN cmin c CROSS JOIN nb CROSS JOIN acctot t
      ORDER BY b.bin"""))

  val all: Seq[QueryDef] = Seq(q506RejectionResample)
}
