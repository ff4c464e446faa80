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
}
