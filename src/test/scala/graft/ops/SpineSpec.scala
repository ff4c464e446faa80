package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** The distributed prefix-sum spine (r15): exact agreement with the
  * single-partition window it replaces, genuine multi-partition
  * execution, and the q563 plan-shape guarantee the r14 verdict asked
  * for (no growing frame through `Exchange SinglePartition`). */
class SpineSpec extends SparkTestBase {

  test("prefixSpine == global window (rank + running sum), exact") {
    // 1,000 rows in shuffled order across 8 partitions; key 37·id mod
    // 1000 is a permutation (37 ⊥ 1000), so the order is total
    val df = spark.range(1000)
      .select(expr("id * 37 % 1000").as("k"),
        (pmod(col("id"), lit(7)) + 1).as("v"))
      .repartition(8)
    val out = Spine.prefixSpine(df, Seq(col("k")), Seq("v"))
    val w = Window.orderBy(col("k"))
    val expect = df
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("cum_v", sum(col("v")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val got = out.orderBy(col("k")).collect().map(_.toSeq).toSeq
    val want = expect.orderBy(col("k")).collect().map(_.toSeq).toSeq
    assert(got == want)
  }

  test("prefixSpine runs multi-partition (the distribution is real)") {
    val df = spark.range(1000)
      .select(col("id").as("k"), lit(1L).as("v"))
    val out = Spine.prefixSpine(df, Seq(col("k")), Seq("v"))
    assert(out.rdd.getNumPartitions > 1,
      "spine output must stay distributed — a 1-partition result would " +
        "just be the window in disguise")
    // and no task saw the whole frame
    val maxPart = out.rdd.mapPartitions(it => Iterator(it.size)).collect().max
    assert(maxPart < 1000, s"one partition held all rows ($maxPart)")
  }

  test("prefixSpine handles empty and single-row frames") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("k", "v")
    assert(Spine.prefixSpine(empty, Seq(col("k")), Seq("v")).count() == 0)
    val one = Seq((5L, 7L)).toDF("k", "v")
    val r = Spine.prefixSpine(one, Seq(col("k")), Seq("v")).collect()(0)
    assert(r.getLong(2) == 1L && r.getLong(3) == 7L)
  }

  // the surviving Exchange SinglePartition shapes in these plans are the
  // 1-row global-aggregate finals (input = one partial row per
  // partition — model-sized by construction); the assertions below
  // target the GROWING frames: no window at all for q563, and for
  // q92/q95 every window subtree must be fed by a TakeOrdered slice
  // with no single-partition shuffle inside it
  private def withStaticPlan[T](body: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("ntileFromRank == ntile(k) for ragged n across k") {
    // every (n, k) shape: n < k, n = k, n % k ∈ {0, 1, k-1}
    Seq((7, 10), (10, 10), (40, 10), (41, 10), (49, 10), (1000, 64),
        (1037, 64), (63, 64)).foreach { case (n, k) =>
      val df = spark.range(n).select(col("id").as("key"))
      val w = Window.orderBy(col("key"))
      val got = df
        .withColumn("pos", row_number().over(w).cast("long"))
        .withColumn("n", lit(n.toLong))
        .withColumn("b", Spine.ntileFromRank(col("pos"), col("n"), k))
        .withColumn("want", ntile(k).over(w).cast("long"))
        .filter(col("b") =!= col("want"))
      assert(got.count() == 0, s"ntile mismatch at n=$n k=$k")
    }
  }

  test("adaptiveNtile: spine path == window path, bit-identical") {
    val df = spark.range(1037)
      .select(expr("id * 37 % 1037").as("v"), col("id").as("key"))
      .repartition(8)
    val ord = Seq(col("v").desc, col("key"))
    val small = Spine.adaptiveNtile(df, ord, 10, "b") // window path
    val big = Spine.adaptiveNtile(df, ord, 10, "b", threshold = 100) // spine path
    val got = big.select(col("key"), col("b")).orderBy(col("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = small.select(col("key"), col("b")).orderBy(col("key"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == want, "the threshold is a physical choice, not semantic")
  }

  test("adaptiveRank: spine path == window path (rank + running sum)") {
    val df = spark.range(500)
      .select(expr("id * 7 % 500").as("k"), (pmod(col("id"), lit(5)) + 1).as("v"))
      .repartition(6)
    val ord = Seq(col("k"))
    val win = Spine.adaptiveRank(df, ord, Seq("v"), totalCol = Some("n"))
    val spn = Spine.adaptiveRank(df, ord, Seq("v"), threshold = 50,
      totalCol = Some("n"))
    val a = win.orderBy(col("k")).collect().map(_.toSeq).toSeq
    val b = spn.orderBy(col("k")).collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a.forall(_.last == 500L), "totalCol must be the frame count")
  }

  test("adaptiveCarry: spine path == window path (struct carry, nulls " +
       "across partition boundaries)") {
    val df = spark.range(900)
      .select(expr("id * 11 % 900").as("k"),
        when(pmod(col("id"), lit(17)) === 0,
          struct(col("id").as("a"), (col("id") * 2).as("b"))).as("v"))
      .repartition(7)
    val ord = Seq(col("k"))
    val win = Spine.adaptiveCarry(df, ord, "v", "carried")
    val spn = Spine.adaptiveCarry(df, ord, "v", "carried", threshold = 40)
    val a = win.orderBy(col("k")).collect().map(_.toSeq).toSeq
    val b = spn.orderBy(col("k")).collect().map(_.toSeq).toSeq
    assert(a == b)
    // sanity: some carried values are non-null after the first marker
    assert(a.count(_.last != null) > 800)
  }

  test("lnFactorialLadder: distributed path == window path, exact") {
    Seq(1L, 2L, 7L, 1000L, 4099L).foreach { n =>
      val got = Spine.lnFactorialLadder(spark, n, threshold = 0L)
        .orderBy(col("j")).collect().map(r => (r.getLong(0), r.getDouble(1)))
      val want = Spine.lnFactorialLadder(spark, n) // window path (n ≤ 8M)
        .orderBy(col("j")).collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq == want.toSeq, s"ladder mismatch at n=$n")
    }
    // and the above-threshold ladder stays distributed
    assert(Spine.lnFactorialLadder(spark, 4099L, threshold = 0L)
      .rdd.getNumPartitions > 1)
  }

  test("q563 physical plan carries no window operator at all") {
    withStaticPlan {
      val plan = HeapsOps.q563HeapsLaw.fn(spark, sfDir)
        .queryExecution.executedPlan
      val wins = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(wins.isEmpty,
        s"q563's ranks/cumsums must come from the spine, not a window:\n$plan")
      assert(plan.toString.contains("Scan ExistingRDD"),
        s"expected the spine's bridged scan in the plan:\n$plan")
    }
  }

  test("q92/q95 rank windows run over TakeOrdered slices, not the vocabulary") {
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    withStaticPlan {
      Seq(CurationOps.q92VocabCoverage, ScoringOps.q95ZipfSlope).foreach { q =>
        val plan = q.fn(spark, sfDir).queryExecution.executedPlan
        val wins = plan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec => w }
        assert(wins.nonEmpty, s"${q.name}: expected a model-sized window")
        wins.foreach { w =>
          assert(w.collectFirst {
            case t: TakeOrderedAndProjectExec => t }.isDefined,
            s"${q.name}: window must consume a distributed top-k slice:\n$w")
          val bad = w.collect {
            case e: ShuffleExchangeExec
              if e.outputPartitioning == SinglePartition => e }
          assert(bad.isEmpty,
            s"${q.name}: vocabulary-sized single-partition shuffle under the window:\n$w")
        }
      }
    }
  }
}
