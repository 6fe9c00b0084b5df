package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Signed-random-projection bucket signature of an `ARRAY<FLOAT>`
  * embedding column as a native Catalyst expression with whole-stage
  * codegen — a primitive loop over the unsafe array data. The Scala-UDF
  * formulation this replaces deserialized every embedding into a boxed
  * `Seq[Float]` per row and broke the codegen span around the scan; at
  * corpus-bucketing scale (every vector, once) that boxing IS the cost.
  *
  * Delegates to [[graft.ops.Similarity.srpSignatureData]] — the SAME
  * memoized hyperplanes and accumulation order as
  * `Similarity.srpSignature`, so a corpus bucketed by this expression
  * and a probe hashed by the Scala function can never disagree (a
  * second copy of the hashing scheme diverging from the first would
  * silently put probes in the wrong buckets).
  */
case class SrpSig(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "srp_sig"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (ARRAY<FLOAT>, INT), got " +
        s"${l.catalogString}, ${r.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    graft.ops.Similarity.srpSignatureData(
      a.asInstanceOf[ArrayData], b.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.ops.Similarity.srpSignatureData($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SrpSig =
    copy(left = newLeft, right = newRight)
}
