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

  // ———— incremental (standing corpus + arrival batch) gate — q332's shape ————

  /** Owner encoding that makes MIN respect arrival precedence: every
    * standing-corpus doc precedes every streamed arrival regardless of id,
    * so standing owners are stored as `id − 2⁴⁰` (ids are far below 2⁴⁰).
    * min() then prefers any standing claimant, and among standing (or
    * among batch) claimants the smallest id — exactly q332's contract. */
  val StandingOffset: Long = 1L << 40

  /** q332's incremental near-dup maintenance as a stream: the STANDING
    * corpus's band index is built once (one batch aggregation — the
    * checkpointed signature build of `ops/PrefOps.q332IncrementalDedup`)
    * and loaded as the gate's INITIAL STATE; arrival docs stream through
    * `flatMapGroupsWithState` probing and extending that index. The
    * standing corpus never re-shuffles — precisely the incremental
    * invariant q332 verifies in batch (FULL = STANDING ∪ BATCH-TOUCHING).
    * Emitted `ownerId`s are encoded (see [[StandingOffset]]); roll up
    * with [[incrementalDecisions]]. */
  def incrementalGate(batchDocs: DataFrame, standingDocs: DataFrame,
                      k: Int = 32, bands: Int = 16): Dataset[GateRow] = {
    val spark = batchDocs.sparkSession
    import spark.implicits._
    val init = bandKeys(standingDocs, k, bands)
      .groupBy(col("band"), col("band_hash"))
      .agg((min(col("doc_id")) - StandingOffset).as("enc"))
      .as[(Int, Long, Long)]
      .groupByKey { case (b, h, _) => (b, h) }
      .mapValues { case (_, _, enc) => enc }
    bandKeys(batchDocs, k, bands)
      .select(col("band"), col("band_hash"), col("doc_id"))
      .as[(Int, Long, Long)]
      .groupByKey { case (b, h, _) => (b, h) }
      .flatMapGroupsWithState[Long, GateRow](
          OutputMode.Append, GroupStateTimeout.NoTimeout, init) {
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

  /** Per-doc rollup of [[incrementalGate]] rows: a batch doc is a near-dup
    * candidate iff any of its band keys was already claimed — by the
    * standing index or an earlier arrival. Decodes the owner encoding into
    * (first_owner, owner_is_standing). */
  def incrementalDecisions(gateRows: DataFrame): DataFrame =
    gateRows.groupBy(col("docId").as("doc_id"))
      .agg(max(when(col("ownerId") < col("docId"), 1).otherwise(0)).as("is_near_dup"),
           min(when(col("ownerId") < col("docId"), col("ownerId"))).as("enc"))
      .withColumn("owner_is_standing", when(col("enc").isNull, lit(null))
        .otherwise(col("enc") < 0))
      .withColumn("first_owner", when(col("enc").isNull, lit(null))
        .otherwise(when(col("enc") < 0, col("enc") + StandingOffset).otherwise(col("enc"))))
      .drop("enc")

  /** Batch twin of [[incrementalGate]]: owner per band key = min encoded
    * claimant over standing ∪ batch; a batch doc's at-arrival owner equals
    * the final owner whenever that owner precedes it (min never rises), so
    * final-owner decisions equal the stream's under in-id-order replay. */
  def incrementalGateBatch(batchDocs: DataFrame, standingDocs: DataFrame,
                           k: Int = 32, bands: Int = 16): DataFrame = {
    val standing = bandKeys(standingDocs, k, bands)
      .select(col("band"), col("band_hash"), lit(null).cast("long").as("doc_id"),
        (col("doc_id") - StandingOffset).as("enc"))
    val arriving = bandKeys(batchDocs, k, bands)
      .select(col("band"), col("band_hash"), col("doc_id"),
        col("doc_id").as("enc"))
    incrementalDecisions(standing.unionByName(arriving)
      .withColumn("owner_enc",
        min(col("enc")).over(Window.partitionBy(col("band"), col("band_hash"))))
      .filter(col("doc_id").isNotNull)
      .select(col("doc_id").as("docId"), col("band"),
              col("band_hash").as("bandHash"), col("owner_enc").as("ownerId")))
  }
}
