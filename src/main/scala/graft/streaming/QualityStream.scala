package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming corpus-quality monitor — the online form of q226's
  * Gopher-rule gate, extending the streaming surface from events/dedup to
  * the TEXT side of the pipeline: documents arrive as micro-batches and
  * the monitor maintains, per language, the running corpus-quality
  * ledger (docs seen, docs passing each rule, token mass) that a crawl
  * ingestion dashboard tails.
  *
  * Shape: the per-doc rule evaluation is STATELESS (the q226 projection,
  * narrow ops only — it runs identically on a batch or streaming frame);
  * the per-lang ledger is a `mapGroupsWithState` fold whose state is one
  * fixed-size row of counters per language. State size = O(|langs|),
  * independent of stream length — the bounded-state contract FsmStream
  * and DedupStream follow.
  *
  * Determinism: counter addition is commutative, so unlike DedupStream's
  * owner race there is no arrival-order sensitivity at all — stream ≡
  * batch holds under ANY slicing AND any within-batch order. The spec
  * replays the corpus under two slicings and checks the final ledger
  * equals the batch aggregation.
  */
object QualityStream {

  /** One per-language ledger row. */
  final case class LangLedger(lang: String, nDocs: Long, nPass: Long,
    nFailLen: Long, nFailTtr: Long, tokMass: Long)

  /** q226's rule projection, stateless — usable on batch or stream. */
  def ruleFrame(docs: DataFrame): DataFrame = {
    val toks = graft.ops.TextOps.tokens(col("text"))
    docs.select(col("doc_id"), col("lang"), toks.as("toks"))
      .withColumn("n_toks", size(col("toks")).cast("long"))
      .filter(col("n_toks") > 0)
      .withColumn("n_dist", size(array_distinct(col("toks"))).cast("long"))
      .withColumn("r_len", col("n_toks") >= 20 && col("n_toks") <= 400)
      .withColumn("r_ttr", col("n_dist") * 10 >= col("n_toks") * 4)
      .select(col("doc_id"), col("lang"), col("n_toks"),
        col("r_len"), col("r_ttr"), (col("r_len") && col("r_ttr")).as("passed"))
  }

  /** The stateful per-lang ledger over a streaming documents frame
    * (doc_id, lang, text). Emits the updated ledger row each batch
    * (OutputMode.Update semantics via flatMap + update sink pattern:
    * use `.writeStream.outputMode("update")` with a memory sink and read
    * the LAST row per lang, or foreachBatch). */
  def ledger(docs: DataFrame): Dataset[LangLedger] = {
    val spark = docs.sparkSession
    import spark.implicits._
    ruleFrame(docs)
      .select(col("lang"), col("n_toks"), col("r_len"), col("r_ttr"), col("passed"))
      .as[(String, Long, Boolean, Boolean, Boolean)]
      .groupByKey(_._1)
      .mapGroupsWithState[LangLedger, LangLedger](GroupStateTimeout.NoTimeout) {
        case (lang, rows, state: GroupState[LangLedger]) =>
          var l = state.getOption.getOrElse(LangLedger(lang, 0L, 0L, 0L, 0L, 0L))
          rows.foreach { case (_, n, rLen, rTtr, passed) =>
            l = l.copy(
              nDocs = l.nDocs + 1,
              nPass = l.nPass + (if (passed) 1 else 0),
              nFailLen = l.nFailLen + (if (!rLen) 1 else 0),
              nFailTtr = l.nFailTtr + (if (!rTtr) 1 else 0),
              tokMass = l.tokMass + n)
          }
          state.update(l)
          l
      }
  }

  /** The batch twin: the same ledger as one aggregation — what the
    * stream's state converges to after a full replay. */
  def ledgerBatch(docs: DataFrame): DataFrame =
    ruleFrame(docs).groupBy(col("lang"))
      .agg(count(lit(1)).as("nDocs"),
        sum(when(col("passed"), 1L).otherwise(0L)).as("nPass"),
        sum(when(!col("r_len"), 1L).otherwise(0L)).as("nFailLen"),
        sum(when(!col("r_ttr"), 1L).otherwise(0L)).as("nFailTtr"),
        sum(col("n_toks")).as("tokMass"))
}
