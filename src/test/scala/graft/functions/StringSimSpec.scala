package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Jaro-Winkler against the textbook fixtures (Winkler 1990 / the values
  * every implementation including DuckDB's reproduces) plus metric
  * properties over random strings. q546's oracle is the cross-engine
  * agreement check; this spec pins the function itself. */
class StringSimSpec extends AnyFunSuite {

  private def close(a: Double, b: Double) = math.abs(a - b) < 1e-12

  test("textbook fixtures") {
    assert(close(StringSim.jaro("martha", "marhta"), 0.9444444444444445))
    assert(close(StringSim.jaroWinkler("martha", "marhta"), 0.9611111111111111))
    assert(close(StringSim.jaroWinkler("dixon", "dicksonx"), 0.8133333333333332))
    assert(close(StringSim.jaroWinkler("dwayne", "duane"), 0.8400000000000001))
    assert(StringSim.jaroWinkler("abc", "xyz") == 0.0)
    assert(StringSim.jaroWinkler("same", "same") == 1.0)
    assert(StringSim.jaroWinkler("", "") == 1.0)
    assert(StringSim.jaroWinkler("a", "") == 0.0)
  }

  test("properties: symmetry, range, boost only above 0.7") {
    val rnd = new Random(3)
    def word() = (0 until 1 + rnd.nextInt(10))
      .map(_ => ('a' + rnd.nextInt(6)).toChar).mkString
    (1 to 500).foreach { _ =>
      val (a, b) = (word(), word())
      val jw = StringSim.jaroWinkler(a, b)
      val j = StringSim.jaro(a, b)
      assert(close(jw, StringSim.jaroWinkler(b, a)), s"symmetry $a/$b")
      assert(jw >= 0.0 && jw <= 1.0, s"range $a/$b -> $jw")
      assert(jw >= j - 1e-12, "boost never lowers")
      if (j <= 0.7) assert(close(jw, j), "no boost at or below 0.7")
    }
  }
}
