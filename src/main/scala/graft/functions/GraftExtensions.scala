package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension registration — the library's SQL surface. Sessions
  * built with `spark.sql.extensions=graft.functions.GraftExtensions` get
  * every reusable primitive as a SQL function from the start (the
  * live-session path is `VectorFunctions.registerSql`): vector dot /
  * cosine, the order-exact PQ distance, MinHash/SimHash signatures,
  * Z-order interleave, sorted-set intersection, count-min probe, bloom
  * agg/probe — plus the Levenshtein plan guard and the native as-of join
  * strategy (the as-of OPERATOR itself is reached through
  * `graft.plans.AsofJoin` on DataFrames; SQL-side it would need a parser
  * extension, which nothing in the reference surface requires).
  *
  * Literal-parameter functions (minhash_sig's k) fold their argument at
  * registration-call time: `minhash_sig(hashes, 32)` requires a foldable
  * int, matching how Spark's own approx_count_distinct folds rsd.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("vector_dot"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_dot"),
      (exprs: Seq[Expression]) => VectorDot(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("vector_cosine"),
      new ExpressionInfo(classOf[VectorDot].getName, "vector_cosine"),
      (exprs: Seq[Expression]) => GraftExtensions.cosineExpr(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("decimal_sqdist"),
      new ExpressionInfo(classOf[DecimalSqDist].getName, "decimal_sqdist"),
      (exprs: Seq[Expression]) => DecimalSqDist(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
      (exprs: Seq[Expression]) => MinhashSig(exprs(0),
        GraftExtensions.foldableInt(exprs(1), "minhash_sig(hashes, k)"))))
    e.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[SimhashSig].getName, "simhash_sig"),
      (exprs: Seq[Expression]) => SimhashSig(exprs(0))))
    e.injectFunction((
      FunctionIdentifier("z_interleave"),
      new ExpressionInfo(classOf[ZInterleave].getName, "z_interleave"),
      (exprs: Seq[Expression]) => ZInterleave(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("hilbert_index"),
      new ExpressionInfo(classOf[HilbertIndex].getName, "hilbert_index"),
      (exprs: Seq[Expression]) => HilbertIndex(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[Expression]) => SortedIntersectCount(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("bloom_filter_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "bloom_filter_agg"),
      (exprs: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          exprs(0), exprs(1)).toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "might_contain"),
      (exprs: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(exprs(0), exprs(1))))
    e.injectFunction((
      FunctionIdentifier("multi_contains"),
      new ExpressionInfo(classOf[MultiContains].getName, "multi_contains"),
      (exprs: Seq[Expression]) => MultiContains(exprs(0),
        GraftExtensions.foldableStringArray(exprs(1),
          "multi_contains(text, patterns)").toSeq)))
    e.injectFunction((
      FunctionIdentifier("cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "cms_estimate"),
      (exprs: Seq[Expression]) => CmsEstimate(exprs(0), exprs(1))))
    e.injectOptimizerRule(_ => LevenshteinLengthGuard)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {
  /** Builders shared by the extension and the live-session registry. */
  private[functions] def cosineExpr(a: Expression, b: Expression): Expression = {
    import org.apache.spark.sql.catalyst.expressions.{Divide, Multiply, Sqrt}
    Divide(VectorDot(a, b),
      Multiply(Sqrt(VectorDot(a, a)), Sqrt(VectorDot(b, b))))
  }

  private[functions] def foldableStringArray(
      e: Expression, usage: String): Array[String] = {
    require(e.foldable, s"$usage: patterns must be a literal array of strings")
    e.eval(null) match {
      case a: org.apache.spark.sql.catalyst.util.ArrayData =>
        a.toArray[org.apache.spark.unsafe.types.UTF8String](
          org.apache.spark.sql.types.StringType).map(_.toString)
      case other => throw new IllegalArgumentException(
        s"$usage: patterns must be array<string>, got $other")
    }
  }

  private[functions] def foldableInt(e: Expression, usage: String): Int = {
    require(e.foldable, s"$usage: k must be a literal integer")
    e.eval(null) match {
      case n: java.lang.Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"$usage: k must be integral, got $other")
    }
  }
}
