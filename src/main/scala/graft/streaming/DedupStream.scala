package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming MinHash near-dup gate — the online form of q28's MinHash-LSH
  * candidate generation (`ops/Dedup.q28MinhashLsh`), completing the
  * streaming story for the LLM-pipeline surface: documents arrive as
  * micro-batches, and each doc is gated against everything that arrived
  * before it.
  *
  * Shape: tokenize → 3-shingle → k=32 minhash signature → 16 band keys
  * (identical constants and hashing to the batch operator, so the gate
  * admits exactly q28's candidate pairs), then `flatMapGroupsWithState`
  * keyed by (band, band_hash) holding ONE long of state per distinct band
  * key — the id of the earliest doc that claimed the key. An arriving doc
  * is a near-dup CANDIDATE iff some band key was already claimed by an
  * earlier doc; like batch LSH banding, a production pipeline follows the
  * gate with the exact-Jaccard verify against the claiming doc (a
  * stream-static join against the owner's shingle set), which q28 proves
  * out in batch.
  *
  * Scale: state is one (key → long) entry per distinct band key, i.e.
  * O(16 × distinct signatures), not O(stream) — and band keys of true
  * near-dups COLLIDE, so the state grows with corpus novelty, the same
  * quantity q131 measures. For an unbounded deployment, bound it with a
  * processing-time TTL exactly like [[FsmStream.transitions]] does
  * (dedup horizon instead of forever), or snapshot-compact the state to a
  * static bloom side input.
  *
  * Determinism: replayed in arrival order (doc_id order here), the gate's
  * final owner for every key equals the batch `min(doc_id) over
  * (band, band_hash)` — so stream ≡ batch decisions hold under ANY
  * micro-batch slicing. Within one micro-batch a group's rows are folded
  * in doc_id order explicitly (Spark does not guarantee group-iterator
  * order after the shuffle).
  */
object DedupStream {

  /** One gate decision row: `ownerId` is the earliest doc id that had
    * claimed this band key as of this doc's arrival (itself if first). */
  final case class GateRow(docId: Long, band: Int, bandHash: Long, ownerId: Long)

  /** q28's banding projection, usable on a batch OR streaming frame
    * (stateless narrow ops only): (doc_id, band, band_hash). */
  def bandKeys(docs: DataFrame, k: Int = 32, bands: Int = 16): DataFrame = {
    val toks = graft.ops.TextOps.tokens(col("text"))
    val shingled = docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("hsh",
        expr("transform(sequence(0, size(toks)-3), i -> xxhash64(toks[i], toks[i+1], toks[i+2]))"))
      .withColumn("sig", graft.ops.Dedup.minhashSig(col("hsh"), k))
    shingled.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(element_at(col("sig"), b * 2 + 1),
                        element_at(col("sig"), b * 2 + 2)))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
  }

  /** The stateful gate over a streaming documents frame (doc_id, text).
    * Emits one [[GateRow]] per (doc, band); roll up per doc with
    * [[decisions]] (in `foreachBatch` or on the collected sink). */
  def nearDupGate(docs: DataFrame, k: Int = 32, bands: Int = 16): Dataset[GateRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    bandKeys(docs, k, bands)
      .select(col("band"), col("band_hash"), col("doc_id"))
      .as[(Int, Long, Long)]
      .groupByKey { case (b, h, _) => (b, h) }
      .flatMapGroupsWithState[Long, GateRow](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state: GroupState[Long]) =>
          var owner = state.getOption.getOrElse(Long.MaxValue)
          val out = rows.toSeq.sortBy(_._3).map { case (b, h, d) =>
            owner = math.min(owner, d)
            GateRow(d, b, h, owner)
          }
          state.update(owner)
          out.iterator
      }
  }

  /** Per-doc rollup of gate rows: near-dup candidate iff ANY band key was
    * claimed by an earlier doc. */
  def decisions(gateRows: DataFrame): DataFrame =
    gateRows.groupBy(col("docId").as("doc_id"))
      .agg(max(when(col("ownerId") < col("docId"), 1).otherwise(0)).as("is_near_dup"),
           min(when(col("ownerId") < col("docId"), col("ownerId"))).as("first_owner"))

  /** The batch twin: same banding, owner = min doc_id per band key over the
    * WHOLE corpus — what the stream's final state converges to after a full
    * in-order replay. */
  def nearDupGateBatch(docs: DataFrame, k: Int = 32, bands: Int = 16): DataFrame =
    decisions(
      bandKeys(docs, k, bands)
        .withColumn("owner_id",
          min(col("doc_id")).over(Window.partitionBy(col("band"), col("band_hash"))))
        .select(col("doc_id").as("docId"), col("band"),
                col("band_hash").as("bandHash"), col("owner_id").as("ownerId")))
}
