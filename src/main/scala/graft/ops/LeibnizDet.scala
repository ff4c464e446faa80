package graft.ops

/** Generated Leibniz determinant expansions over NAMED moment columns —
  * the exact-parity trick behind the regression family (q441+): one
  * permutation list renders the identical expression text into both the
  * Spark plan (via expr) and the DuckDB oracle, so even the double-
  * precision summation order is shared between engines. Sizes used are
  * model-sized (≤ 5×5 → 120 terms); the strings are built at plan
  * construction, never per row.
  */
private[ops] object Leibniz {

  def perms(n: Int): Seq[(Seq[Int], Int)] =
    (0 until n).permutations.map { p =>
      val inv = (for {
        i <- p.indices; j <- i + 1 until p.length if p(i) > p(j)
      } yield 1).size
      (p.toSeq, if (inv % 2 == 0) 1 else -1)
    }.toSeq

  /** Determinant of a matrix of column-name strings as one expression. */
  def det(m: Seq[Seq[String]]): String =
    perms(m.size).map { case (p, s) =>
      val prod = p.zipWithIndex.map { case (c, r) => m(r)(c) }.mkString(" * ")
      s"($s.0 * $prod)"
    }.mkString("(", " + ", ")")

  def replaceCol(m: Seq[Seq[String]], j: Int, b: Seq[String]): Seq[Seq[String]] =
    m.zipWithIndex.map { case (row, r) => row.updated(j, b(r)) }

  def minor(m: Seq[Seq[String]], r0: Int, c0: Int): Seq[Seq[String]] =
    m.zipWithIndex.collect { case (row, r) if r != r0 =>
      row.zipWithIndex.collect { case (v, c) if c != c0 => v }
    }
}
