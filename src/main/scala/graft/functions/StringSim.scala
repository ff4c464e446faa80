package graft.functions

/** Jaro / Jaro-Winkler string similarity — the record-linkage classic
  * (Winkler 1990, the Census Bureau matcher), textbook formulation:
  * match window ⌊max(|a|,|b|)/2⌋−1, transpositions counted as half the
  * out-of-order matched positions, Winkler prefix boost 0.1·ℓ (ℓ ≤ 4)
  * applied only when jaro > 0.7. This is the same definition DuckDB's
  * `jaro_winkler_similarity` implements, which is what makes the q546
  * oracle exact (outputs rounded at 6 to absorb last-ulp division
  * ordering differences between engines).
  *
  * Pure JVM function — registered as a deterministic scalar UDF. The
  * linkage queries only evaluate it on BLOCKED candidate pairs (bounded
  * per block), so the non-codegen call is never corpus × corpus.
  */
object StringSim {

  def jaro(a: String, b: String): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    if (a.isEmpty || b.isEmpty) return 0.0
    if (a == b) return 1.0
    val window = math.max(0, math.max(a.length, b.length) / 2 - 1)
    val aMatched = new Array[Boolean](a.length)
    val bMatched = new Array[Boolean](b.length)
    var matches = 0
    var i = 0
    while (i < a.length) {
      val lo = math.max(0, i - window)
      val hi = math.min(b.length - 1, i + window)
      var j = lo
      var hit = false
      while (j <= hi && !hit) {
        if (!bMatched(j) && a.charAt(i) == b.charAt(j)) {
          aMatched(i) = true; bMatched(j) = true; matches += 1; hit = true
        }
        j += 1
      }
      i += 1
    }
    if (matches == 0) return 0.0
    var half = 0 // matched positions whose characters disagree in order
    var k = 0
    i = 0
    while (i < a.length) {
      if (aMatched(i)) {
        while (!bMatched(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) half += 1
        k += 1
      }
      i += 1
    }
    val m = matches.toDouble
    (m / a.length + m / b.length + (m - half / 2.0) / m) / 3.0
  }

  def jaroWinkler(a: String, b: String): Double = {
    val j = jaro(a, b)
    if (j <= 0.7) j
    else {
      val lim = math.min(4, math.min(a.length, b.length))
      var l = 0
      while (l < lim && a.charAt(l) == b.charAt(l)) l += 1
      j + 0.1 * l * (1.0 - j)
    }
  }
}
