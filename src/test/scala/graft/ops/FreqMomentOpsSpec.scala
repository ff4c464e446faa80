package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q483 semantics: the exact side really is F2 = Σ f_k² (recomputed
  * independently via a SQL route), and the AMS median-of-means estimate
  * is a faithful function of the emitted error column. */
class FreqMomentOpsSpec extends SparkTestBase {

  test("q483: exact F2 matches an independent recompute; rel_err is consistent") {
    val row = FreqMomentOps.q483AmsF2.fn(spark, sfDir).head()
    val nKeys   = row.getAs[Long]("n_keys")
    val f2Exact = row.getAs[Long]("f2_exact")
    val f2Est   = row.getAs[Double]("f2_est")
    val relErr  = row.getAs[Double]("rel_err")

    // independent exact F2: the self-join-size identity
    // Σ f_k² = |lineitem ⋈_partkey lineitem|
    val li = Tables(spark, sfDir).lineitem.select(col("l_partkey"))
    val selfJoin = li.join(li.toDF("k2"), col("l_partkey") === col("k2")).count()
    assert(f2Exact == selfJoin, s"F2 != self-join size: $f2Exact vs $selfJoin")
    assert(nKeys == li.distinct().count())

    // rel_err is the emitted estimate's error (up to the 4-dp rounding of
    // f2_est vs the raw estimate inside rel_err)
    assert(math.abs(relErr - math.abs(f2Est - f2Exact) / f2Exact) < 1e-4,
      s"rel_err inconsistent: $relErr vs |$f2Est - $f2Exact|/$f2Exact")

    // 64-estimator median-of-means on this fixture: the sketch works
    assert(relErr < 0.5, s"AMS estimate off by ${relErr * 100}%")
  }
}
