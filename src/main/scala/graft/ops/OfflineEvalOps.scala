package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Offline-evaluation wave: the doubly-robust off-policy estimator
  * (the missing member of q242's OPE trio — IPS/SNIPS live there, DR
  * needs a reward model and gets its own audit), and exact tie-aware
  * ROC-AUC via integer rank sums.
  *
  * Scale shapes: q361 is two aggregations + one broadcast model join
  * over a single event scan; q362 is one distributed sort per status
  * partition — rank windows, no self-join, with the Mann–Whitney U
  * kept in exact BIGINT arithmetic until a single final division.
  */
object OfflineEvalOps {

  /** Doubly-robust off-policy evaluation (Dudík, Langford & Li 2011).
    * Events are md5-split: the MODEL half fits the per-arm reward model
    * q̂(a) and the target policy π(u) = the user's modal arm; the EVAL
    * half estimates logging propensities p̂(a) and scores
    * DR = mean(q̂(π(u))) + mean(1{a=π(u)}/p̂(a) · (r − q̂(a))) —
    * the direct-method baseline plus the importance-weighted residual
    * correction, reported per target arm beside the plain IPS estimate.
    * The split guarantees the model never sees its own evaluation
    * rewards (the q243 held-split idiom). All row-level terms follow the
    * round(·,6)→DECIMAL discipline so partial-agg order is irrelevant;
    * the model/propensity frames are arm-cardinality broadcasts. */
  val q361DrPolicyEval: QueryDef = QueryDef(
    "q361_dr_policy_eval",
    (s, dir) => {
      val dec = DecimalType(28, 10)
      val ev = Tables(s, dir).events
        .select(col("event_id"), col("user_id"), col("event_type"),
          coalesce(col("value"), lit(0.0)).as("r"))
        .withColumn("half",
          when(substring(md5(col("event_id").cast("string")), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), "model")
            .otherwise("eval"))
        .localCheckpoint() // feeds model, policy, propensity, and scoring
      val modelHalf = ev.filter(col("half") === "model")
      // per-arm reward model on the model half only
      val qhat = broadcast(modelHalf.groupBy(col("event_type"))
        .agg(sum(round(col("r"), 6).cast(dec)).as("sr"), count(lit(1)).as("cn"))
        .select(col("event_type"),
          round(col("sr").cast("double") / col("cn"), 9).as("qhat")))
      // target policy: the user's modal arm on the model half
      val wPick = Window.partitionBy(col("user_id"))
        .orderBy(col("cu").desc, col("event_type").asc)
      val policy = modelHalf.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cu"))
        .withColumn("rn", row_number().over(wPick))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_type").as("pi_a"))
      val evalHalf = ev.filter(col("half") === "eval")
      // logging propensity estimated on the eval half
      val prop = broadcast(evalHalf.groupBy(col("event_type"))
        .agg(count(lit(1)).as("ca"))
        .withColumn("p", round(col("ca").cast("double") /
          sum(col("ca")).over(Window.partitionBy()), 9))
        .select(col("event_type"), col("p")))
      evalHalf
        .join(policy, Seq("user_id")) // users absent from the model half drop out
        .join(prop, Seq("event_type"))
        .join(qhat, Seq("event_type"))
        .join(qhat.select(col("event_type").as("pi_a"),
          col("qhat").as("qhat_pi")), Seq("pi_a"))
        .withColumn("w",
          when(col("event_type") === col("pi_a"), lit(1.0) / col("p"))
            .otherwise(lit(0.0)))
        .groupBy(col("pi_a"))
        .agg(
          count(lit(1)).as("n_eval"),
          sum(round(col("qhat_pi"), 6).cast(dec)).as("sdm"),
          sum(round(col("w") * (col("r") - col("qhat")), 6).cast(dec)).as("scorr"),
          sum(round(col("w") * col("r"), 6).cast(dec)).as("sips"))
        .select(col("pi_a"), col("n_eval"),
          round(col("sdm").cast("double") / col("n_eval"), 6).as("dm"),
          round(col("scorr").cast("double") / col("n_eval"), 6).as("ips_correction"),
          round((col("sdm") + col("scorr")).cast("double") / col("n_eval"), 6).as("dr"),
          round(col("sips").cast("double") / col("n_eval"), 6).as("ips"))
    },
    Some("""WITH ev AS (SELECT event_id, user_id, event_type, COALESCE(value, 0.0) AS r,
          CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1) IN
            ('0','1','2','3','4','5','6','7') THEN 'model' ELSE 'eval' END AS half
        FROM events),
      mh AS (SELECT * FROM ev WHERE half = 'model'),
      qhat AS (SELECT event_type,
          round(CAST(SUM(CAST(round(r, 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 9) AS qhat
        FROM mh GROUP BY 1),
      pol AS (SELECT user_id, event_type AS pi_a FROM (
          SELECT user_id, event_type,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rn
          FROM mh GROUP BY user_id, event_type) WHERE rn = 1),
      eh AS (SELECT * FROM ev WHERE half = 'eval'),
      prop AS (SELECT event_type, round(CAST(COUNT(*) AS DOUBLE)
            / SUM(COUNT(*)) OVER (), 9) AS p
        FROM eh GROUP BY 1),
      sc AS (SELECT pol.pi_a, e.r, qa.qhat, qp.qhat AS qhat_pi,
          CASE WHEN e.event_type = pol.pi_a THEN 1.0 / p.p ELSE 0.0 END AS w
        FROM eh e JOIN pol USING (user_id)
        JOIN prop p ON p.event_type = e.event_type
        JOIN qhat qa ON qa.event_type = e.event_type
        JOIN qhat qp ON qp.event_type = pol.pi_a)
      SELECT pi_a, CAST(COUNT(*) AS BIGINT) AS n_eval,
        round(CAST(SUM(CAST(round(qhat_pi, 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS dm,
        round(CAST(SUM(CAST(round(w * (r - qhat), 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6)
          AS ips_correction,
        round(CAST(SUM(CAST(round(qhat_pi, 6) AS DECIMAL(28,10)))
            + SUM(CAST(round(w * (r - qhat), 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS dr,
        round(CAST(SUM(CAST(round(w * r, 6) AS DECIMAL(28,10))) AS DOUBLE) / COUNT(*), 6) AS ips
      FROM sc GROUP BY 1"""))

  /** Exact tie-aware ROC-AUC of order price as a predictor of urgency
    * (priority 1/2 vs 3/4/5), per order status. The Mann–Whitney rank
    * sum uses average ranks over score ties, kept integral by doubling:
    * 2·avgrank = 2·RANK() + tiecount − 1, so
    * U2 = Σ₊(2·avgrank) − n₊(n₊+1) is exact BIGINT and
    * AUC = U2 / (2·n₊·n₋) is one final division — the identity
    * AUC = P(score₊ > score₋) + ½P(tie) without a quadratic pair join.
    * One distributed sort per status partition; no self-join. */
  val q362RocAuc: QueryDef = QueryDef(
    "q362_roc_auc",
    (s, dir) => {
      val scored = Tables(s, dir).orders
        .select(col("o_orderstatus"), col("o_totalprice").as("score"),
          when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
            .otherwise(0L).as("y"))
      val w = Window.partitionBy(col("o_orderstatus"))
      scored
        .withColumn("rmin", rank().over(w.orderBy(col("score"))))
        .withColumn("tie", count(lit(1))
          .over(Window.partitionBy(col("o_orderstatus"), col("score"))))
        .groupBy(col("o_orderstatus"))
        .agg(
          sum(col("y")).as("n_pos"),
          sum(lit(1L) - col("y")).as("n_neg"),
          sum(when(col("y") === 1,
            lit(2L) * col("rmin") + col("tie") - 1L).otherwise(0L)).as("s2"))
        .withColumn("u2", col("s2") - col("n_pos") * (col("n_pos") + 1L))
        .select(col("o_orderstatus"), col("n_pos"), col("n_neg"),
          (col("u2").cast("double") / 2.0).as("u_stat"),
          round(col("u2").cast("double") /
            (lit(2.0) * col("n_pos") * col("n_neg")).cast("double"), 6).as("auc"))
        .orderBy(col("o_orderstatus"))
    },
    Some("""WITH sc AS (SELECT o_orderstatus, o_totalprice AS score,
          CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS y
        FROM orders),
      r AS (SELECT o_orderstatus, y,
          RANK() OVER (PARTITION BY o_orderstatus ORDER BY score) AS rmin,
          COUNT(*) OVER (PARTITION BY o_orderstatus, score) AS tie
        FROM sc),
      agg AS (SELECT o_orderstatus,
          CAST(SUM(y) AS BIGINT) AS n_pos,
          CAST(SUM(1 - y) AS BIGINT) AS n_neg,
          CAST(SUM(CASE WHEN y = 1 THEN 2 * rmin + tie - 1 ELSE 0 END) AS BIGINT) AS s2
        FROM r GROUP BY 1)
      SELECT o_orderstatus, n_pos, n_neg,
        CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE) / 2.0 AS u_stat,
        round(CAST(s2 - n_pos * (n_pos + 1) AS DOUBLE)
          / CAST(2.0 * n_pos * n_neg AS DOUBLE), 6) AS auc
      FROM agg ORDER BY o_orderstatus"""))

  val all: Seq[QueryDef] = Seq(q361DrPolicyEval, q362RocAuc)
}
