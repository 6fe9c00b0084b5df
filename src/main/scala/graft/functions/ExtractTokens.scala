package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.dom.Bs4Config
import graft.extract.{Extractor, Py}

/** SQL surface for the extraction kernel (SURVEY §2.9): a Catalyst
  * `Generator` (UDTF) so plain SQL can explode a page into its token
  * stream:
  *
  *   SELECT url, t.* FROM pages
  *   LATERAL VIEW extract_tokens(html) t AS sent_id, tok_id, tkn,
  *     unaccented, html_ctx, css_class
  *
  * One page row generates many token rows without leaving Catalyst;
  * the DOM never escapes the expression.
  */
case class ExtractTokens(child: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child)

  override def elementSchema: StructType = StructType(Seq(
    StructField("sent_id", IntegerType, nullable = false),
    StructField("tok_id", IntegerType, nullable = false),
    StructField("tkn", StringType, nullable = false),
    StructField("unaccented", StringType, nullable = false),
    StructField("html_ctx", StringType, nullable = false),
    StructField("css_class", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Iterator.empty
    val html = raw match {
      case b: Array[Byte] => Py.universalNewlines(
        new String(b, java.nio.charset.StandardCharsets.UTF_8))
      case s: UTF8String => Py.universalNewlines(s.toString)
      case other => Py.universalNewlines(other.toString)
    }
    try {
      val sents = Extractor.tokenize(html, config = Bs4Config())
      sents.iterator.zipWithIndex.flatMap { case (sent, si) =>
        sent.iterator.zipWithIndex.map { case (t, ti) =>
          InternalRow(si, ti,
            UTF8String.fromString(t.tkn),
            UTF8String.fromString(t.features(0)),
            UTF8String.fromString(t.features(11)),
            UTF8String.fromString(t.features(12)))
        }
      }
    } catch { case _: Throwable => Iterator.empty }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExtractTokens =
    copy(child = newChildren.head)
}

/** Session extensions: `spark.sql.extensions=graft.functions.GraftExtensions`
  * (or GraftExtensions.register(spark)) installs the graft SQL functions.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.extractTokensDescriptor)
    e.injectFunction(GraftExtensions.fnv1a64Descriptor)
    e.injectFunction(GraftExtensions.dotF32Descriptor)
    e.injectFunction(GraftExtensions.simhash64Descriptor)
    e.injectFunction(GraftExtensions.minhashSigDescriptor)
    e.injectFunction(GraftExtensions.srpSigDescriptor)
    e.injectFunction(GraftExtensions.ivfCellDescriptor)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  val extractTokensDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("extract_tokens"),
    new ExpressionInfo(classOf[ExtractTokens].getName, "extract_tokens"),
    (exprs: Seq[Expression]) => ExtractTokens(exprs.head))

  val fnv1a64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("fnv1a64"),
    new ExpressionInfo(classOf[Fnv1a64].getName, "fnv1a64"),
    (exprs: Seq[Expression]) => Fnv1a64(exprs.head))

  val simhash64Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash64"),
    new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
    (exprs: Seq[Expression]) => SimHash64(exprs.head))

  val minhashSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinhashSig].getName, "minhash_sig"),
    (exprs: Seq[Expression]) => {
      GraftFunctions.arity("minhash_sig", 3)(exprs)
      MinhashSig(exprs.head, exprs(1), exprs(2))
    })

  val dotF32Descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_f32"),
    new ExpressionInfo(classOf[DotF32].getName, "dot_f32"),
    (exprs: Seq[Expression]) => {
      GraftFunctions.arity("dot_f32", 2)(exprs); DotF32(exprs.head, exprs(1))
    })

  val srpSigDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("srp_sig"),
    new ExpressionInfo(classOf[SrpSig].getName, "srp_sig"),
    (exprs: Seq[Expression]) => {
      GraftFunctions.arity("srp_sig", 2)(exprs); SrpSig(exprs.head, exprs(1))
    })

  val ivfCellDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("ivf_cell"),
    new ExpressionInfo(classOf[IvfCell].getName, "ivf_cell"),
    (exprs: Seq[Expression]) => {
      GraftFunctions.arity("ivf_cell", 2)(exprs); IvfCell(exprs.head, exprs(1))
    })

  /** Imperative registration for an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "extract_tokens", exprs => ExtractTokens(exprs.head), "built-in")
    GraftFunctions.register(spark)
  }
}
