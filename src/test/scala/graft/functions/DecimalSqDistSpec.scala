package graft.functions

import graft.SparkTestBase
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** [[DecimalSqDist]] must be bit-identical to the interpreted HOF fold it
  * replaces in q250/q251 — same per-term round(12)/cast(decimal(28,14))
  * dance, same null contract — and must stay inside whole-stage codegen. */
class DecimalSqDistSpec extends SparkTestBase {

  private def hofSqDist(a: String, b: String) = expr(
    s"""aggregate(zip_with($a, $b, (x, y) ->
          cast(round((x - y) * (x - y), 12) as decimal(28,14))),
        cast(0 as decimal(28,14)),
        (acc, t) -> cast(acc + t as decimal(28,14)))""")

  test("decimal_sqdist matches the HOF fold bit-for-bit on real embedding pairs") {
    val emb = Tables(spark, sfDir).embeddings.limit(80)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
    val pairs = emb.select(col("vec_id").as("ia"), col("v").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("v").as("b")))
      .filter(col("ia") < col("ib"))
    val both = pairs
      .withColumn("native", VectorFunctions.decimal_sqdist(col("a"), col("b")))
      .withColumn("hof", hofSqDist("a", "b"))
    assert(both.count() > 1000)
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    assert(both.filter(col("native").isNull).count() == 0)
  }

  test("decimal_sqdist null contract matches zip_with padding: unequal lengths and null elements null the sum") {
    val df = spark.sql(
      """SELECT * FROM VALUES
           (array(1.0D, 2.0D), array(1.0D, 2.0D, 3.0D)),
           (array(1.0D, cast(null as double)), array(1.0D, 2.0D)),
           (array(), array())
         AS t(a, b)""")
      .withColumn("native", VectorFunctions.decimal_sqdist(col("a"), col("b")))
      .withColumn("hof", hofSqDist("a", "b"))
      .collect()
    df.foreach { r =>
      assert(r.isNullAt(2) == r.isNullAt(3),
        s"null divergence on ${r.get(0)} vs ${r.get(1)}: native=${r.get(2)} hof=${r.get(3)}")
      if (!r.isNullAt(2)) assert(r.getDecimal(2) == r.getDecimal(3))
    }
  }

  test("decimal_sqdist survives whole-stage codegen (no fallback)") {
    val df = Tables(spark, sfDir).embeddings.limit(10)
      .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
      .select(VectorFunctions.decimal_sqdist(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.toLowerCase.contains("decimalsqdist"),
      s"expected codegen in:\n$plan")
    // self-distance is exactly zero at scale 14
    df.collect().foreach(r => assert(r.getDecimal(0).signum == 0))
  }

  test("decimal_sqdist rejects non-double-array inputs at analysis time") {
    val df = spark.range(3).selectExpr("array(id) as xs") // array<bigint>
    intercept[org.apache.spark.sql.AnalysisException] {
      df.select(VectorFunctions.decimal_sqdist(col("xs"), col("xs"))).collect()
    }
  }

  // ——————————— decimal_sqdist_argmin: the fused q250/q251 E-step ———————————

  /** The q250/q251 subvector frame: (vec_id, s, sv) — 8 subspaces × 8 dims. */
  private def subVecs = Tables(spark, sfDir).embeddings
    .select(col("vec_id"), explode(expr(
      """transform(sequence(0, 7),
           k -> struct(cast(k as bigint) AS s,
                       transform(slice(embedding, k * 8 + 1, 8),
                                 x -> cast(x as double)) AS sv))""")).as("e"))
    .select(col("vec_id"), col("e.s").as("s"), col("e.sv").as("sv"))

  test("decimal_sqdist_argmin matches join + min(struct(dist, j)) bit-for-bit on real subvectors") {
    val sub = subVecs.localCheckpoint()
    val seeds = sub.filter(col("vec_id") < 16)
      .select(col("vec_id").as("j"), col("s"), col("sv").as("cv"))
    // the old fan-out shape, verbatim
    val joined = sub.join(broadcast(seeds), Seq("s"))
      .withColumn("dist", VectorFunctions.decimal_sqdist(col("sv"), col("cv")))
      .groupBy(col("vec_id"), col("s"))
      .agg(min(struct(col("dist"), col("j"))).as("m"))
      .select(col("vec_id"), col("s"), col("m.dist").as("dist_old"), col("m.j").as("j_old"))
    // the fused in-row shape
    val seedArr = seeds.groupBy(col("s"))
      .agg(sort_array(collect_list(struct(col("j"), col("cv")))).as("cands"))
    val fused = sub.join(broadcast(seedArr), Seq("s"))
      .withColumn("m", VectorFunctions.decimal_sqdist_argmin(col("sv"), col("cands")))
      .select(col("vec_id"), col("s"), col("m.dist").as("dist_new"), col("m.j").as("j_new"))
    val both = joined.join(fused, Seq("vec_id", "s"), "full")
    assert(both.filter(col("dist_old").isNull || col("dist_new").isNull).count() == 0,
      "coverage divergence between the fan-out and fused argmin")
    assert(both.filter(col("j_old") =!= col("j_new") ||
      col("dist_old") =!= col("dist_new")).count() == 0)
  }

  test("decimal_sqdist_argmin null contract: null cv wins (nulls-first struct order), null elements skipped, empty → null") {
    val df = spark.sql(
      """SELECT * FROM VALUES
           (array(1.0D, 2.0D),
            array(named_struct('j', 3L, 'cv', array(1.0D, 1.0D)),
                  named_struct('j', 5L, 'cv', cast(null as array<double>)),
                  named_struct('j', 7L, 'cv', array(1.0D, 2.0D)))),
           (array(1.0D, 2.0D),
            array(cast(null as struct<j: bigint, cv: array<double>>),
                  named_struct('j', 2L, 'cv', array(0.0D, 0.0D)))),
           (array(1.0D, 2.0D),
            cast(array() as array<struct<j: bigint, cv: array<double>>>))
         AS t(v, cands)""")
      .withColumn("m", VectorFunctions.decimal_sqdist_argmin(col("v"), col("cands")))
      .select(col("m.j").as("j"), col("m.dist").as("dist"))
      .collect()
    // row 1: candidate j=5 has null dist, which sorts first — same as
    // min(struct(null, 5)) beating any non-null dist
    assert(df(0).getLong(0) == 5L && df(0).isNullAt(1))
    // row 2: the null ELEMENT is skipped (no join row), j=2 wins
    assert(df(1).getLong(0) == 2L && !df(1).isNullAt(1))
    // row 3: no candidates → null struct
    assert(df(2).isNullAt(0) && df(2).isNullAt(1))
  }

  test("decimal_sqdist_argmin tie on equal dist breaks to the smaller j") {
    val df = spark.sql(
      """SELECT array(0.0D) AS v,
           array(named_struct('j', 9L, 'cv', array(2.0D)),
                 named_struct('j', 4L, 'cv', array(-2.0D)),
                 named_struct('j', 6L, 'cv', array(2.0D))) AS cands""")
      .withColumn("m", VectorFunctions.decimal_sqdist_argmin(col("v"), col("cands")))
      .select(col("m.j")).head
    assert(df.getLong(0) == 4L)
  }

  test("decimal_sqdist_argmin survives whole-stage codegen (no fallback)") {
    val df = subVecs.limit(20)
      .select(col("sv"), array(struct(lit(0L).as("j"), col("sv").as("cv"))).as("cands"))
      .select(VectorFunctions.decimal_sqdist_argmin(col("sv"), col("cands")).as("m"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(") && plan.toLowerCase.contains("decimalsqdistargmin"),
      s"expected codegen in:\n$plan")
    // self-distance argmin: dist exactly zero, j = 0
    df.collect().foreach { r =>
      val m = r.getStruct(0)
      assert(m.getDecimal(0).signum == 0 && m.getLong(1) == 0L)
    }
  }
}
