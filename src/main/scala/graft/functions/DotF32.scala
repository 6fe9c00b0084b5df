package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two `ARRAY<FLOAT>` (or `ARRAY<DOUBLE>`) embedding
  * columns as a native Catalyst expression with whole-stage codegen —
  * a tight primitive loop over the unsafe array data, no intermediate
  * array (the `aggregate(zip_with(...))` higher-order-function
  * formulation allocates a boxed array per pair, which dominates
  * brute-force similarity joins: ~7x slower on the ANN bench query).
  *
  * Semantics match the `zip_with`/`aggregate` formulation exactly:
  * left-to-right accumulation in double (bit-identical to DuckDB's
  * `LIST_DOT_PRODUCT(CAST(.. AS DOUBLE[]))`), and a null element
  * anywhere poisons the result to NULL. When both inputs are
  * `ARRAY<FLOAT> NOT NULL`-elements, codegen dispatches to the
  * branch-free float loop. Mismatched lengths are a data error and
  * fail fast.
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  private def elemOk(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two ARRAY<FLOAT> or ARRAY<DOUBLE> arguments, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def arrInfo(dt: DataType): (Boolean, Boolean) = dt match {
    case ArrayType(et, cn) => (et == DoubleType, cn)
    case _ => (false, false)
  }

  // fast path only when neither side can contain null elements
  private lazy val (leftIsDouble, leftNullable) = arrInfo(left.dataType)
  private lazy val (rightIsDouble, rightNullable) = arrInfo(right.dataType)
  private lazy val fastFloat =
    !leftIsDouble && !rightIsDouble && !leftNullable && !rightNullable

  override def nullable: Boolean =
    super.nullable || leftNullable || rightNullable

  private lazy val elemsNullable = leftNullable || rightNullable

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    if (fastFloat) DotF32.dot(aa, bb)
    else if (!elemsNullable)
      DotF32.dotNoNull(aa, leftIsDouble, bb, rightIsDouble)
    else DotF32.dotGeneric(aa, leftIsDouble, bb, rightIsDouble)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (fastFloat)
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.DotF32.dot($a, $b)")
    else if (!elemsNullable)
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.DotF32.dotNoNull($a, $leftIsDouble, $b, $rightIsDouble)")
    else
      // elemsNullable implies `nullable`, so ev.isNull is a real variable
      nullSafeCodeGen(ctx, ev, (a, b) => {
        s"""
           |java.lang.Double ${ev.value}Boxed = graft.functions.DotF32.dotGeneric(
           |  $a, $leftIsDouble, $b, $rightIsDouble);
           |if (${ev.value}Boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = ${ev.value}Boxed.doubleValue(); }
         """.stripMargin
      })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

object DotF32 {
  private def checkLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements())
      throw new IllegalArgumentException(
        s"dot_f32: embedding lengths differ (${a.numElements()} vs ${b.numElements()})")
    n
  }

  /** Branch-free float path; callable from generated code. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Element-type-dispatching path for arrays whose elements cannot be
    * null; callable from generated code.
    */
  def dotNoNull(a: ArrayData, aIsDouble: Boolean,
      b: ArrayData, bIsDouble: Boolean): Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    acc
  }

  /** Null-propagating, element-type-dispatching path; callable from
    * generated code. Returns null (like zip_with's null poisoning)
    * when any element is null.
    */
  def dotGeneric(a: ArrayData, aIsDouble: Boolean,
      b: ArrayData, bIsDouble: Boolean): java.lang.Double = {
    val n = checkLen(a, b)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aIsDouble) a.getDouble(i) else a.getFloat(i).toDouble
      val y = if (bIsDouble) b.getDouble(i) else b.getFloat(i).toDouble
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
