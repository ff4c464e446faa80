package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Join-family completion (outer joins, arg-min/max aggregation, array
  * functions) + the skew-handling salted join. */
object Joins {

  private val M = DecimalType(18, 4)

  /** Full outer join: per-nation customer vs supplier account totals —
    * nations can be missing on either side (filtered subsets), exercising
    * null-fill semantics. */
  val q39OuterJoin: QueryDef = QueryDef(
    "q39_outer_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val c = t.customer.filter(col("c_acctbal") > 8000)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_cust"),
             sum(col("c_acctbal").cast(M)).cast("double").as("cust_bal"))
      val p = t.supplier.filter(col("s_acctbal") > 8000)
        .groupBy(col("s_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("n_supp"),
             sum(col("s_acctbal").cast(M)).cast("double").as("supp_bal"))
      c.join(p, Seq("nationkey"), "full_outer")
        .select(col("nationkey"), col("n_cust"), col("cust_bal"),
                col("n_supp"), col("supp_bal"))
    },
    Some("""WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS cust_bal
        FROM customer WHERE c_acctbal > 8000 GROUP BY 1),
      p AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp,
          CAST(SUM(CAST(s_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS supp_bal
        FROM supplier WHERE s_acctbal > 8000 GROUP BY 1)
      SELECT COALESCE(c.nationkey, p.nationkey) AS nationkey,
             c.n_cust, c.cust_bal, p.n_supp, p.supp_bal
      FROM c FULL OUTER JOIN p ON c.nationkey = p.nationkey"""))

  /** Left outer join with null-producing right side. */
  val q40LeftJoin: QueryDef = QueryDef(
    "q40_left_join",
    (s, dir) => {
      val t = Tables(s, dir)
      val big = t.orders.filter(col("o_totalprice") > 400000)
        .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
      t.customer.select(col("c_custkey"), col("c_name"))
        .join(big, Seq("c_custkey"), "left")
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"), col("o_totalprice"))
    },
    Some("""SELECT c_custkey, c_name, o_orderkey, o_totalprice
      FROM customer LEFT JOIN (
        SELECT o_custkey, o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > 400000) o ON o.o_custkey = c_custkey"""))

  /** arg-min/arg-max aggregation: each nation's highest-balance customer
    * (Spark max_by == DuckDB arg_max; keys are unique in the data, and the
    * orderless tie case is avoided by maxing on a unique-ized pair). */
  val q41MinMaxBy: QueryDef = QueryDef(
    "q41_minmax_by",
    (s, dir) => Tables(s, dir).customer
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(
        expr("max_by(c_custkey, struct(c_acctbal, c_custkey))").as("richest_cust"),
        expr("min_by(c_custkey, struct(c_acctbal, c_custkey))").as("poorest_cust"),
        max(col("c_acctbal")).as("max_bal"),
        min(col("c_acctbal")).as("min_bal")),
    Some("""WITH r AS (SELECT c_nationkey AS nationkey, c_custkey, c_acctbal,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey DESC) AS rn_max,
        ROW_NUMBER() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal ASC, c_custkey ASC) AS rn_min
        FROM customer)
      SELECT nationkey,
        MAX(CASE WHEN rn_max = 1 THEN c_custkey END) AS richest_cust,
        MAX(CASE WHEN rn_min = 1 THEN c_custkey END) AS poorest_cust,
        MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal
      FROM r GROUP BY 1"""))

  /** Array/higher-order-function surface: split, transform, filter, slice,
    * sort_array, array_contains — over document tokens. */
  val q42ArrayFuncs: QueryDef = QueryDef(
    "q42_array_funcs",
    (s, dir) => Tables(s, dir).documents
      .withColumn("toks", TextOps.tokens(col("text")))
      .select(
        col("doc_id"),
        // arrays are stringified: the driver's pandas compare cannot sort
        // or hash list cells (unhashable ndarray), so surface scalar text
        array_join(slice(array_sort(array_distinct(col("toks"))), 1, 5), "|").as("first5"),
        array_join(transform(slice(col("toks"), 1, 3), t => concat(t, lit("!"))), "|").as("bang3"),
        size(filter(col("toks"), t => length(t) > 5)).cast("long").as("n_long"),
        array_contains(col("toks"), "data").as("has_data")),
    Some("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS toks FROM documents)
      SELECT doc_id,
        array_to_string(list_sort(list_distinct(toks))[1:5], '|') AS first5,
        array_to_string(list_transform(toks[1:3], t -> t || '!'), '|') AS bang3,
        CAST(len(list_filter(toks, t -> length(t) > 5)) AS BIGINT) AS n_long,
        list_contains(toks, 'data') AS has_data
      FROM t"""))

  /** Skew-handling equi-join: the hot side's keys are salted into
    * `saltBuckets` sub-keys and the build side replicated per salt, so one
    * hot key fans across `saltBuckets` tasks instead of one straggler.
    * Result is identical to a plain join — asserted in JoinsSpec. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltBuckets: Int): DataFrame = {
    val salted = big.withColumn("__salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1)).cast("array<int>")))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Blocked fuzzy best-match join (record linkage): every src0 document
    * is matched to its closest same-language document from any OTHER
    * source — closest by edit distance over the 80-char head, searched
    * only among docs within 40 chars of its length. The length band is
    * part of the CONTRACT (a true match differing by more than the band
    * isn't a near-duplicate), and it is what makes the join scale: the
    * blocking key (lang, n_chars div 40) is an EQUI key once the probe
    * side explodes its ±1 buckets, so |b_a − b_b| ≤ 1 covers the whole
    * band and the quadratic work is confined to (lang × bucket) blocks.
    * Best match per left row is one max_by struct agg — no window sort.
    */
  val q115FuzzyJoin: QueryDef = QueryDef(
    "q115_fuzzy_join",
    (s, dir) => {
      val d = Tables(s, dir).documents
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
                substring(col("text"), 1, 80).as("head"))
      val left = d.filter(col("source") === "src0")
        .withColumn("b0", floor(col("n_chars") / 40).cast("long"))
        .select(col("lang"), col("doc_id").as("id_a"), col("n_chars").as("len_a"),
                col("head").as("head_a"),
                explode(array(col("b0") - 1, col("b0"), col("b0") + 1)).as("b"))
      val right = d.filter(col("source") =!= "src0")
        .select(col("lang"), col("doc_id").as("id_b"), col("n_chars").as("len_b"),
                col("head").as("head_b"),
                floor(col("n_chars") / 40).cast("long").as("b"))
      left.join(right, Seq("lang", "b"))
        .filter(abs(col("len_a") - col("len_b")) <= 40)
        .withColumn("dist", levenshtein(col("head_a"), col("head_b")).cast("long"))
        .groupBy(col("id_a"))
        .agg(min(struct(col("dist"), col("id_b"))).as("m"))
        .select(col("id_a"), col("m.id_b").as("best_id"),
                col("m.dist").as("dist"))
    },
    Some("""WITH d AS (SELECT doc_id, lang, source, n_chars,
          substr(text, 1, 80) AS head FROM documents),
      pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
          CAST(levenshtein(a.head, b.head) AS BIGINT) AS dist
        FROM d a JOIN d b ON a.lang = b.lang AND b.source <> 'src0'
          AND abs(a.n_chars - b.n_chars) <= 40
        WHERE a.source = 'src0')
      SELECT id_a, id_b AS best_id, dist FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY id_a ORDER BY dist, id_b) AS rn
        FROM pairs) WHERE rn = 1"""))

  val all: Seq[QueryDef] = Seq(q39OuterJoin, q40LeftJoin, q41MinMaxBy, q42ArrayFuncs,
    q115FuzzyJoin)
}
