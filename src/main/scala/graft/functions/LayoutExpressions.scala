package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst expression: 2D Z-order (Morton) value — interleaves the
  * low 16 bits of two long columns, x on even bit positions and y on odd.
  * This is the multi-dimensional clustering key behind Z-ORDER table
  * layout: sorting by z makes rows close in (x, y) land in the same file,
  * so min/max file statistics prune 2D range predicates — the layout
  * optimization a 100 TB table needs for selective scans on two columns
  * at once.
  *
  * A native expression (not a UDF, not a 16-term column formula): the
  * generated code is one tight primitive loop inside whole-stage codegen,
  * and the bit formula is simple enough that the DuckDB oracle rebuilds
  * it as shift/mask arithmetic, so z-values hash-match across engines.
  */
case class ZInterleave(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"z_interleave requires (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Long]
    val y = b.asInstanceOf[Long]
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val z = ctx.freshName("z")
      val i = ctx.freshName("i")
      s"""
         |long $z = 0L;
         |for (int $i = 0; $i < 16; $i++) {
         |  $z |= (($a >> $i) & 1L) << (2 * $i);
         |  $z |= (($b >> $i) & 1L) << (2 * $i + 1);
         |}
         |${ev.value} = $z;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZInterleave =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression: 2D Hilbert-curve index of the low 16 bits
  * of two long columns (order-16 curve, d ∈ [0, 2³²)). The Hilbert curve
  * is the strictly-better clustering key for 2D range scans: unlike the
  * Z-curve it has no long diagonal jumps, so equal curve-ranges have
  * tighter (x, y) bounding boxes and min/max file stats prune more
  * (measured against ZInterleave by q363). Algorithm is the classic
  * xy2d quadrant walk (Hilbert 1891; iterative form as in Warren,
  * Hacker's Delight §16): per level s, the quadrant digit is
  * (3·rx) XOR ry, and the ry=0 rotation is a 16-bit complement
  * (65535 − v ≡ v XOR 0xFFFF, so coordinates never leave the grid) plus
  * a swap. 16 unrolled integer steps inside whole-stage codegen; the
  * DuckDB oracle rebuilds the identical walk as 16 chained CTEs
  * ([[LayoutFunctions.hilbertSqlCtes]]), so indexes hash-match across
  * engines.
  */
case class HilbertIndex(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"hilbert_index requires (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(a: Any, b: Any): Any = {
    var x = a.asInstanceOf[Long] & 0xFFFFL
    var y = b.asInstanceOf[Long] & 0xFFFFL
    var d = 0L
    var s = 32768L
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) { x = 65535L - x; y = 65535L - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val d = ctx.freshName("d"); val s = ctx.freshName("s")
      val rx = ctx.freshName("rx"); val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $x = $a & 0xFFFFL; long $y = $b & 0xFFFFL; long $d = 0L;
         |for (long $s = 32768L; $s > 0L; $s >>= 1) {
         |  long $rx = (($x & $s) > 0L) ? 1L : 0L;
         |  long $ry = (($y & $s) > 0L) ? 1L : 0L;
         |  $d += $s * $s * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    if ($rx == 1L) { $x = 65535L - $x; $y = 65535L - $y; }
         |    long $t = $x; $x = $y; $y = $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}

object LayoutFunctions {
  /** z_interleave(x, y): Morton code of the low 16 bits of each input. */
  def z_interleave(x: Column, y: Column): Column =
    ColumnBridge.column(ZInterleave(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long"))))

  /** The identical bit formula as portable SQL over two column names —
    * the oracle side of [[ZInterleave]] (DuckDB `>>`/`<<`/`&` on BIGINT
    * match Java semantics for these non-negative, < 2^16 inputs). */
  def zInterleaveSql(x: String, y: String): String =
    (0 until 16).map { i =>
      s"((($x >> $i) & 1) << ${2 * i}) + ((($y >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")

  /** hilbert_index(x, y): order-16 Hilbert curve index of the low 16 bits. */
  def hilbert_index(x: Column, y: Column): Column =
    ColumnBridge.column(HilbertIndex(
      ColumnBridge.expression(x.cast("long")),
      ColumnBridge.expression(y.cast("long"))))

  /** The identical quadrant walk as 16 chained SQL CTE steps — the oracle
    * side of [[HilbertIndex]]. `from` must expose columns `x`, `y`, and
    * the carry columns; the final step is named `<prefix>16` and exposes
    * `d` plus the carries. XOR is avoided: (3·rx) XOR ry for bits is
    * rx=1 ? 3−ry : ry, which both engines evaluate in integer CASEs. */
  def hilbertSqlCtes(prefix: String, from: String, carryCols: Seq[String]): String = {
    val carry = carryCols.mkString(", ")
    val steps = (0 until 16).map { i =>
      val s = 1L << (15 - i)
      val src = if (i == 0) from else s"$prefix$i"
      val ry = s"(CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END)"
      s"""$prefix${i + 1} AS (SELECT $carry,
         |  d + ${s * s} * (CASE WHEN (x & $s) > 0 THEN 3 - $ry ELSE $ry END) AS d,
         |  CASE WHEN (y & $s) > 0 THEN x
         |       WHEN (x & $s) > 0 THEN 65535 - y ELSE y END AS x,
         |  CASE WHEN (y & $s) > 0 THEN y
         |       WHEN (x & $s) > 0 THEN 65535 - x ELSE x END AS y
         |  FROM $src)""".stripMargin
    }
    steps.mkString(",\n")
  }
}
