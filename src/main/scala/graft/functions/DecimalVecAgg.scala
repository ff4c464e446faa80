package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Vector-at-a-time machinery for q405's Weiszfeld iteration. The
  * dim-exploded original priced every round as corpus-×64-row joins and
  * aggregations (plus a corpus⋈corpus sort-merge join attaching per-vector
  * weights back to the exploded frame); these two primitives keep the
  * embedding as ONE array row end to end while reproducing the exploded
  * form's arithmetic bit for bit:
  *
  *  - [[DecimalSqDistSkip]] — the per-(label,vec) distance reduce
  *    `SUM(CAST(round((v-c)² , 12) AS DECIMAL(30,12)))` CAST AS DOUBLE,
  *    with JOIN-row semantics: a null term (null element on either side,
  *    NaN/Inf, DECIMAL(30,12) overflow) is SKIPPED like SUM skips null
  *    inputs — NOT zip_with's null-poisoning (that is [[DecimalSqDist]]).
  *  - [[DecimalVecWSum]] — the per-(label,dim) weighted re-center sums,
  *    as one aggregate over (v: array<double>, dd: double) producing
  *    sums(i)  = Σ CAST(round(v(i) / dd, 9) AS DECIMAL(28,9))   (null terms skipped)
  *    wsums(i) = Σ CAST(round(1.0  / dd, 9) AS DECIMAL(28,9))   (per dim PRESENT, like
  *               the exploded join row that exists even when v(i) is null)
  *    counts(i) = rows with dim i present (the COUNT(*) the mean divides by).
  *    With dd = 1.0 this is exactly the mean seed's
  *    `SUM(CAST(round(v, 9) AS DECIMAL(28,9))) / COUNT(*)` numerator.
  *
  * DECIMAL sums are order-free, so the fused shapes cannot diverge from
  * the exploded ones on any input; MedianOpsSpec pins the equivalence on
  * real embeddings and the oracle pins the end result.
  */
object DecimalVecAgg {

  /** Round(x, scale) on DoubleType followed by Cast(· AS DECIMAL(prec,
    * scale)) — Spark's exact semantics: NaN/Inf passthrough on the round,
    * null on NaN/Inf or precision overflow at the cast. Shared by both
    * primitives (scale 9/prec 28 here; [[DecimalSqDist]] is the 12/28
    * twin). */
  def roundCast(x: Double, scale: Int, prec: Int): java.math.BigDecimal = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) return null
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(scale, java.math.RoundingMode.HALF_UP).doubleValue()
    if (java.lang.Double.isNaN(r) || java.lang.Double.isInfinite(r)) return null
    val d = java.math.BigDecimal.valueOf(r)
      .setScale(scale, java.math.RoundingMode.HALF_UP)
    if (d.precision > prec) null else d
  }
}

/** See [[DecimalVecAgg]]: Σ over dims of CAST(round((a_i − b_i)², 12) AS
  * DECIMAL(30,12)) with null terms SKIPPED (join+SUM semantics), the sum
  * null only when NO non-null term exists (or the DECIMAL(38,12) sum
  * overflows), CAST AS DOUBLE. Dims beyond the shorter array contribute
  * nothing — they are the (label,dim) join keys the exploded form never
  * produced. */
case class DecimalSqDistSkip(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decimal_sqdist_skip requires array<double> inputs, got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    DecimalSqDistSkip.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |Double ${ev.value}Box = graft.functions.DecimalSqDistSkip.compute($a, $b);
         |${ev.isNull} = (${ev.value}Box == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : ${ev.value}Box.doubleValue();
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalSqDistSkip =
    copy(left = l, right = r)
}

object DecimalSqDistSkip {
  /** Shared by interpreted eval and generated code (static forwarder). */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc: java.math.BigDecimal = null
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val diff = a.getDouble(i) - b.getDouble(i)
        val term = DecimalVecAgg.roundCast(diff * diff, 12, 30)
        if (term ne null) acc = if (acc eq null) term else acc.add(term)
      }
      i += 1
    }
    if (acc eq null) null
    else if (acc.precision > 38) null // SUM(DECIMAL(30,12)) → DECIMAL(38,12) overflow
    else java.lang.Double.valueOf(acc.doubleValue())
  }
}

/** See [[DecimalVecAgg]]: the Weiszfeld re-center sums over
  * (values: array<double>, divisor: double) as ONE typed aggregate.
  * Result struct(sums: array<decimal(38,9)>, wsums: array<decimal(38,9)>,
  * counts: array<long>), element i null when dim i never saw a non-null
  * term (SUM-of-all-null) or its exact sum exceeds DECIMAL(38,9). A null
  * divisor row is skipped entirely (cannot arise: callers pass
  * greatest(d, 1e-9), which is ≥ 1e-9 even for null d). */
case class DecimalVecWSum(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DecimalVecWSum.Buf] with BinaryLike[Expression] {

  override def prettyName: String = "decimal_vec_wsum"

  override def dataType: DataType = StructType(Seq(
    StructField("sums", ArrayType(DecimalType(38, 9), containsNull = true)),
    StructField("wsums", ArrayType(DecimalType(38, 9), containsNull = true)),
    StructField("counts", ArrayType(LongType, containsNull = false))))
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (leftOk && right.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decimal_vec_wsum requires (array<double>, double), got ${left.dataType} / ${right.dataType}")
  }

  override def createAggregationBuffer(): DecimalVecWSum.Buf = new DecimalVecWSum.Buf()

  override def update(buf: DecimalVecWSum.Buf, input: InternalRow): DecimalVecWSum.Buf = {
    val arr = left.eval(input)
    val dvRaw = right.eval(input)
    if (arr != null && dvRaw != null) {
      val a = arr.asInstanceOf[ArrayData]
      val dd = dvRaw.asInstanceOf[Double]
      val n = a.numElements()
      buf.ensure(n)
      val w = DecimalVecAgg.roundCast(1.0 / dd, 9, 28) // one per row, all dims share it
      var i = 0
      while (i < n) {
        buf.counts(i) += 1L
        if (w ne null)
          buf.wsums(i) = if (buf.wsums(i) eq null) w else buf.wsums(i).add(w)
        if (!a.isNullAt(i)) {
          val term = DecimalVecAgg.roundCast(a.getDouble(i) / dd, 9, 28)
          if (term ne null)
            buf.sums(i) = if (buf.sums(i) eq null) term else buf.sums(i).add(term)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: DecimalVecWSum.Buf, b: DecimalVecWSum.Buf): DecimalVecWSum.Buf = {
    a.ensure(b.len)
    var i = 0
    while (i < b.len) {
      a.counts(i) += b.counts(i)
      if (b.sums(i) ne null)
        a.sums(i) = if (a.sums(i) eq null) b.sums(i) else a.sums(i).add(b.sums(i))
      if (b.wsums(i) ne null)
        a.wsums(i) = if (a.wsums(i) eq null) b.wsums(i) else a.wsums(i).add(b.wsums(i))
      i += 1
    }
    a
  }

  override def eval(buf: DecimalVecWSum.Buf): Any = {
    def out(xs: Array[java.math.BigDecimal]): GenericArrayData =
      new GenericArrayData(xs.take(buf.len).map { x =>
        if ((x eq null) || x.precision > 38) null
        else org.apache.spark.sql.types.Decimal(x)
      }.asInstanceOf[Array[Any]])
    new GenericInternalRow(Array[Any](
      out(buf.sums), out(buf.wsums), new GenericArrayData(buf.counts.take(buf.len))))
  }

  override def serialize(buf: DecimalVecWSum.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(buf.len)
    def writeDec(x: java.math.BigDecimal): Unit =
      if (x eq null) o.writeBoolean(false)
      else { o.writeBoolean(true); o.writeUTF(x.toPlainString) }
    var i = 0
    while (i < buf.len) {
      o.writeLong(buf.counts(i))
      writeDec(buf.sums(i))
      writeDec(buf.wsums(i))
      i += 1
    }
    o.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): DecimalVecWSum.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new DecimalVecWSum.Buf()
    buf.ensure(n)
    def readDec(): java.math.BigDecimal =
      if (!in.readBoolean()) null else new java.math.BigDecimal(in.readUTF())
    var i = 0
    while (i < n) {
      buf.counts(i) = in.readLong()
      buf.sums(i) = readDec()
      buf.wsums(i) = readDec()
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DecimalVecWSum =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DecimalVecWSum =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DecimalVecWSum =
    copy(left = l, right = r)
}

/** Hash-aggregable lexicographic min over (a, b) BIGINT pairs — the
  * struct-min replacement for PAIR frames: `min(struct(d2, pos))` plans
  * Sort + SortAggregate (struct aggregation buffers are not mutable),
  * which sorts the whole fan-out frame per side (the q250/q251 disease;
  * q507's ~5.7M-pair frame still paid it). This DeclarativeAggregate
  * keeps two mutable LONG buffer slots, so the plan is a plain
  * partial+final HashAggregate with map-side combine. Semantics match
  * `min(struct(a, b))` over non-null structs exactly: smallest a, ties
  * to smallest b; rows with a null a or b are skipped (the callers
  * never produce one); empty group → null. */
case class MinPairLong(
    left: Expression,
    right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
  with BinaryLike[Expression] {

  import org.apache.spark.sql.catalyst.expressions._

  override def prettyName: String = "min_pair_long"
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("a", LongType), StructField("b", LongType)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"min_pair_long requires (bigint, bigint), got ${left.dataType} / ${right.dataType}")

  private lazy val bufA = AttributeReference("min_pair_a", LongType)()
  private lazy val bufB = AttributeReference("min_pair_b", LongType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bufA, bufB)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, LongType), Literal.create(null, LongType))

  private def lex(a1: Expression, b1: Expression,
                  a2: Expression, b2: Expression): Expression =
    Or(LessThan(a1, a2), And(EqualTo(a1, a2), LessThan(b1, b2)))

  override lazy val updateExpressions: Seq[Expression] = {
    val skip = Or(IsNull(left), IsNull(right))
    val take = Or(IsNull(bufA), lex(left, right, bufA, bufB))
    Seq(
      If(skip, bufA, If(take, left, bufA)),
      If(skip, bufB, If(take, right, bufB)))
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    val skip = IsNull(bufA.right)
    val take = Or(IsNull(bufA.left), lex(bufA.right, bufB.right, bufA.left, bufB.left))
    Seq(
      If(skip, bufA.left, If(take, bufA.right, bufA.left)),
      If(skip, bufB.left, If(take, bufB.right, bufB.left)))
  }

  override lazy val evaluateExpression: Expression =
    If(IsNull(bufA), Literal.create(null, dataType),
      CreateNamedStruct(Seq(Literal("a"), bufA, Literal("b"), bufB)))

  override protected def withNewChildrenInternal(l: Expression, r: Expression): MinPairLong =
    copy(left = l, right = r)
}

object DecimalVecWSum {
  /** Mutable per-group state; grows to the longest array seen. */
  final class Buf {
    var len: Int = 0
    var sums: Array[java.math.BigDecimal] = Array.empty
    var wsums: Array[java.math.BigDecimal] = Array.empty
    var counts: Array[Long] = Array.empty

    def ensure(n: Int): Unit = if (n > len) {
      if (n > sums.length) {
        val cap = math.max(n, math.max(8, sums.length * 2))
        sums = java.util.Arrays.copyOf(sums, cap)
        wsums = java.util.Arrays.copyOf(wsums, cap)
        counts = java.util.Arrays.copyOf(counts, cap)
      }
      len = n
    }
  }
}
