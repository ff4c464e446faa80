package graft.ops

import org.apache.spark.sql.functions._

/** Feature-engineering audits for a supervised pipeline over the orders
  * label "urgent" (priority 1-URGENT/2-HIGH) — three classics every
  * tabular-ML stack runs before training:
  *
  *  - q529 leave-one-out target encoding (Micci-Barreca 2001): the
  *    category → mean-label feature, audited for LEAKAGE — LOO encoding
  *    of a positive row is (pos−1)/(n−1) vs pos/(n−1) for a negative,
  *    and that label-dependent spread IS the leak a naive mean encoding
  *    hides. Closed form per category, no per-row pass needed.
  *  - q530 feature-hashing collision audit (Weinberger 2009): hash the
  *    document vocabulary into 2^k buckets for k ∈ {8, 12, 16} and
  *    report how many features collide and how much token MASS sits in
  *    collided buckets — the sizing table for the hashing trick.
  *  - q531 weight-of-evidence / information value (the credit-scoring
  *    binning standard): add-one-smoothed WOE per equi-width price bin
  *    plus the IV sum, the "is this feature worth binning" number.
  *
  * (Reference: overseer's arbitrary handler fns,
  * src/overseer/executor.clj:12-39; the q171/q183 eval family's
  * feature-side complement.)
  *
  * Scale shape: each is ONE scan into a hash-agg census (categories /
  * hash buckets / bins) with model-sized frames after; q530's sweep is
  * a 3-row dimension fan-out. Exactness: counts are BIGINTs; encodings
  * are integer micro-units via DIV; WOE/IV quantize ln of ONE exact
  * rational per bin (micro-nats, the q511 discipline), so the IV total
  * is an exact BIGINT sum.
  */
object FeatureEngOps {

  private val urgent = col("o_orderpriority").isin("1-URGENT", "2-HIGH")

  val q529LooTargetEncoding: QueryDef = QueryDef(
    "q529_loo_target_encoding",
    (s, dir) => {
      val t = Tables(s, dir)
      t.orders
        .join(broadcast(t.customer.select(col("c_custkey"), col("c_mktsegment"))),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment").as("segment"))
        .agg(count(lit(1)).as("n"),
          sum(when(urgent, 1L).otherwise(0L)).as("pos"))
        .select(col("segment"), col("n"), col("pos"),
          expr("1000000 * pos DIV n").as("enc_micro"),
          expr("1000000 * (pos - 1) DIV (n - 1)").as("loo_pos_micro"),
          expr("1000000 * pos DIV (n - 1)").as("loo_neg_micro"),
          expr("1000000 * pos DIV (n - 1) - 1000000 * (pos - 1) DIV (n - 1)")
            .as("leak_spread_micro"))
    },
    Some("""WITH seg AS (
        SELECT c_mktsegment AS segment,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS pos
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY 1)
      SELECT segment, n, pos,
        1000000 * pos // n AS enc_micro,
        1000000 * (pos - 1) // (n - 1) AS loo_pos_micro,
        1000000 * pos // (n - 1) AS loo_neg_micro,
        1000000 * pos // (n - 1) - 1000000 * (pos - 1) // (n - 1)
          AS leak_spread_micro
      FROM seg"""))

  val q530FeatureHashing: QueryDef = QueryDef(
    "q530_feature_hashing",
    (s, dir) => {
      val feats = Tables(s, dir).documents
        .select(explode(expr("regexp_extract_all(lower(text), '\\\\w+', 0)"))
          .as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("mass"))
        .localCheckpoint()
      val ks = s.createDataFrame(Seq(8, 12, 16).map(Tuple1(_))).toDF("k")
      val hashed = broadcast(ks).join(feats, lit(true))
        .select(col("k"), col("mass"),
          pmod(conv(substring(md5(concat(lit("fh|"), col("tok"))), 1, 15),
            16, 10).cast("long"),
            pow(lit(2.0), col("k")).cast("long")).as("bucket"))
      val buckets = hashed.groupBy(col("k"), col("bucket"))
        .agg(count(lit(1)).as("nfeat"), sum(col("mass")).as("bmass"))
      buckets.groupBy(col("k"))
        .agg(sum(col("nfeat")).as("n_features"),
          count(lit(1)).as("buckets_used"),
          sum(when(col("nfeat") > 1, col("nfeat")).otherwise(0L))
            .as("collided_features"),
          sum(col("bmass")).as("total_mass"),
          sum(when(col("nfeat") > 1, col("bmass")).otherwise(0L))
            .as("collided_mass"))
        .select(col("k").cast("long").as("k"), col("n_features"),
          col("buckets_used"), col("collided_features"),
          expr("1000000 * collided_mass DIV total_mass")
            .as("collided_mass_micro"))
    },
    Some("""WITH feats AS MATERIALIZED (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS mass FROM
          (SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS tok
           FROM documents)
        GROUP BY 1),
      ks AS (SELECT unnest([8, 12, 16]) AS k),
      hashed AS (
        SELECT k, mass,
          ('0x' || substr(md5('fh|' || tok), 1, 15))::BIGINT
            % CAST(pow(2.0, k) AS BIGINT) AS bucket
        FROM ks CROSS JOIN feats),
      buckets AS (
        SELECT k, bucket, CAST(COUNT(*) AS BIGINT) AS nfeat,
          CAST(SUM(mass) AS BIGINT) AS bmass
        FROM hashed GROUP BY 1, 2)
      SELECT CAST(k AS BIGINT) AS k,
        CAST(SUM(nfeat) AS BIGINT) AS n_features,
        CAST(COUNT(*) AS BIGINT) AS buckets_used,
        CAST(SUM(CASE WHEN nfeat > 1 THEN nfeat ELSE 0 END) AS BIGINT)
          AS collided_features,
        1000000 * CAST(SUM(CASE WHEN nfeat > 1 THEN bmass ELSE 0 END)
          AS BIGINT) // CAST(SUM(bmass) AS BIGINT) AS collided_mass_micro
      FROM buckets GROUP BY 1"""))

  private val Bins = 8

  val q531WoeIv: QueryDef = QueryDef(
    "q531_woe_iv",
    (s, dir) => {
      val cents = Tables(s, dir).orders
        .select(floor(col("o_totalprice") * 100 + lit(0.5)).cast("long").as("c"),
          when(urgent, 1L).otherwise(0L).as("y"))
      val bounds = cents.agg(min(col("c")).as("mn"), max(col("c")).as("mx"))
      val binned = cents.crossJoin(broadcast(bounds))
        .select(expr(s"(c - mn) DIV ((mx - mn) DIV $Bins + 1)").as("bin"),
          col("y"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
        .select(col("bin"), col("n"), col("pos"), (col("n") - col("pos")).as("neg"))
      val tot = binned.agg(sum(col("pos")).as("tp"), sum(col("neg")).as("tn"))
      // add-one smoothing keeps empty-side bins finite; the woe
      // expression is inlined into iv (matching the oracle verbatim)
      val woe =
        floor(log(((col("pos") + 1) * (col("tn") + Bins)).cast("double") /
          ((col("neg") + 1) * (col("tp") + Bins)).cast("double")) * 1e6)
          .cast("long")
      binned.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"), col("pos"), col("neg"),
          woe.as("woe_micro"),
          floor((((col("pos") + 1) * (col("tn") + Bins) -
              (col("neg") + 1) * (col("tp") + Bins)).cast("double") /
            ((col("tp") + Bins).cast("double") * (col("tn") + Bins))) *
            (woe / 1e6) * 1e6).cast("long").as("iv_micro"))
    },
    Some(s"""WITH cents AS (
        SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END AS y
        FROM orders),
      bounds AS (SELECT MIN(c) AS mn, MAX(c) AS mx FROM cents),
      binned AS (
        SELECT (c - mn) // ((mx - mn) // $Bins + 1) AS bin,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(y) AS BIGINT) AS pos,
          CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
        FROM cents CROSS JOIN bounds
        GROUP BY 1),
      tot AS (SELECT CAST(SUM(pos) AS BIGINT) AS tp,
        CAST(SUM(neg) AS BIGINT) AS tn FROM binned)
      SELECT bin, n, pos, neg,
        CAST(floor(ln(CAST((pos + 1) * (tn + $Bins) AS DOUBLE) /
          CAST((neg + 1) * (tp + $Bins) AS DOUBLE)) * 1e6) AS BIGINT)
          AS woe_micro,
        CAST(floor((CAST((pos + 1) * (tn + $Bins) -
            (neg + 1) * (tp + $Bins) AS DOUBLE) /
          (CAST(tp + $Bins AS DOUBLE) * (tn + $Bins))) *
          (CAST(floor(ln(CAST((pos + 1) * (tn + $Bins) AS DOUBLE) /
            CAST((neg + 1) * (tp + $Bins) AS DOUBLE)) * 1e6) AS BIGINT)
            / 1e6) * 1e6) AS BIGINT) AS iv_micro
      FROM binned CROSS JOIN tot"""))

  val all: Seq[QueryDef] =
    Seq(q529LooTargetEncoding, q530FeatureHashing, q531WoeIv)
}
