package graft.ops

import org.apache.spark.sql.functions._

/** Table-integrity operators: sequence-gap/duplicate audit and
  * order-independent segment checksums — what a 100 TB pipeline runs to
  * prove two copies of a table (or two runs of a job) produced the same
  * rows without sorting either side.
  */
object IntegrityOps {

  /** Sequence-gap audit: line numbers within an order should be the
    * contiguous run 1..max exactly once; report every order where they
    * are not, split into duplicate and missing counts. One hash-agg by
    * the natural key — the generalization of q107's PK expectation that
    * says WHERE the violation is (this fixture really does carry
    * duplicated (orderkey, linenumber) pairs, so the audit has true
    * positives by construction). Linear, keyed, output bounded by the
    * violation count.
    */
  val q167SequenceGaps: QueryDef = QueryDef(
    "q167_sequence_gaps",
    (s, dir) => Tables(s, dir).lineitem
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_lines"),
           countDistinct(col("l_linenumber")).as("n_distinct"),
           max(col("l_linenumber")).as("max_line"))
      .withColumn("n_dupes", col("n_lines") - col("n_distinct"))
      .withColumn("n_missing", col("max_line") - col("n_distinct"))
      .filter(col("n_dupes") > 0 || col("n_missing") > 0)
      .select(col("l_orderkey"), col("n_lines"), col("max_line"),
              col("n_dupes"), col("n_missing")),
    Some("""SELECT l_orderkey, COUNT(*) AS n_lines,
        MAX(l_linenumber) AS max_line,
        COUNT(*) - COUNT(DISTINCT l_linenumber) AS n_dupes,
        MAX(l_linenumber) - COUNT(DISTINCT l_linenumber) AS n_missing
      FROM lineitem GROUP BY 1
      HAVING COUNT(*) - COUNT(DISTINCT l_linenumber) > 0
          OR MAX(l_linenumber) - COUNT(DISTINCT l_linenumber) > 0"""))

  /** Order-independent segment checksum: each row canonicalizes to a
    * 60-bit fingerprint (md5 of a '|'-joined canonical string — money
    * as exact cents, dates as ISO strings, so float FORMATTING
    * never enters the hash), and a segment's checksum is the bit_xor of
    * its row fingerprints. XOR is commutative: the checksum is identical
    * under any partitioning/ordering, so two 100 TB copies compare by
    * exchanging one row per segment — and a mismatch names the segment
    * (here: order-year) to re-sync, not just "tables differ". Caveat
    * shared with all XOR checksums: a row appearing an even number of
    * times cancels out, which is why n_rows rides alongside.
    */
  val q169TableChecksum: QueryDef = QueryDef(
    "q169_table_checksum",
    (s, dir) => Tables(s, dir).orders
      .withColumn("fp", expr(
        """CAST(conv(substring(md5(concat_ws('|',
           CAST(o_orderkey AS STRING), CAST(o_custkey AS STRING),
           o_orderstatus,
           CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS STRING),
           CAST(CAST(o_orderdate AS DATE) AS STRING),
           o_orderpriority)), 1, 15), 16, 10) AS BIGINT)"""))
      .groupBy(year(col("o_orderdate")).as("segment_year"))
      .agg(count(lit(1)).as("n_rows"),
           expr("bit_xor(fp)").as("checksum")),
    Some("""WITH fp AS (SELECT EXTRACT(year FROM o_orderdate) AS segment_year,
          CAST(concat('0x', substr(md5(concat_ws('|',
            CAST(o_orderkey AS VARCHAR), CAST(o_custkey AS VARCHAR),
            o_orderstatus,
            CAST(CAST(floor(o_totalprice * 100) AS BIGINT) AS VARCHAR),
            CAST(CAST(o_orderdate AS DATE) AS VARCHAR),
            o_orderpriority)), 1, 15)) AS BIGINT) AS fp
        FROM orders)
      SELECT segment_year, COUNT(*) AS n_rows, bit_xor(fp) AS checksum
      FROM fp GROUP BY 1"""))

  val all: Seq[QueryDef] = Seq(q167SequenceGaps, q169TableChecksum)
}
