package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a text column (space-separated word bit-votes over
  * FNV-1a word hashes) as a native Catalyst expression with whole-stage
  * codegen — one pass over the UTF-8 bytes, no String/split/array
  * allocation per row. Bit-identical to [[graft.ops.Dedup.simhash]]
  * (which goes through `String.split(" ")`): segments between single
  * 0x20 bytes, trailing empty segments dropped, an empty input hashing
  * one empty word — so the Dataset-map formulation and the SQL column
  * can be mixed freely.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.ofBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.ofBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Callable from generated code. Replicates `text.split(" ")`
    * semantics over raw UTF-8 bytes: split on every single 0x20 (ASCII
    * space never appears inside a UTF-8 multi-byte sequence, so byte
    * scanning is safe), keep interior empties, drop trailing empties,
    * and treat the empty input as one empty word (Java
    * `"".split(" ")` returns `[""]`).
    */
  def ofBytes(bytes: Array[Byte]): Long = {
    val acc = new Array[Int](64)
    val n = bytes.length
    if (n == 0) vote(acc, 0xcbf29ce484222325L) // FNV basis == hash of ""
    else {
      // last segment end ignoring trailing empties: Java split drops
      // trailing empty strings, i.e. everything after the last
      // non-space byte belongs to dropped empties
      var last = n - 1
      while (last >= 0 && bytes(last) == ' ') last -= 1
      var start = 0
      var i = 0
      while (i <= last) {
        if (bytes(i) == ' ') {
          vote(acc, hashRange(bytes, start, i))
          start = i + 1
        }
        i += 1
      }
      if (last >= 0) vote(acc, hashRange(bytes, start, last + 1))
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  private def hashRange(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  private def vote(acc: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
      b += 1
    }
  }
}
