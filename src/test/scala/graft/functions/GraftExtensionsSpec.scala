package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.graftbridge.ColumnBridge

/** The at-startup wiring: a session configured with
  * `spark.sql.extensions=graft.functions.GraftExtensions` must receive
  * the custom function, the optimizer rule, and the planner strategy.
  * Asserted against the extensions instance directly (building a second
  * SparkSession in one JVM would just return the shared one). */
class GraftExtensionsSpec extends SparkTestBase {

  test("GraftExtensions injects vector_dot, the levenshtein rule, and the as-of strategy") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
    val (rules, strategies) = ColumnBridge.injectedState(e, spark)
    assert(rules.contains(LevenshteinLengthGuard),
      s"optimizer rules: $rules")
    assert(strategies.contains(graft.plans.AsofJoinStrategy),
      s"planner strategies: $strategies")
    // the injected function builder must produce a working VectorDot
    val fn = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.util.GenericArrayData
      import org.apache.spark.sql.types.{ArrayType, FloatType}
      val arr = Literal(new GenericArrayData(Array(1.0f, 2.0f)), ArrayType(FloatType))
      VectorDot(arr, arr).eval(null)
    }
    assert(fn == 5.0)
  }
}
