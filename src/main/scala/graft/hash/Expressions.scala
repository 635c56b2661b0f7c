package graft.hash

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Catalyst expressions over the hash kernels. All are codegen'd via
 * static calls (no CodegenFallback, no UDF) so they stay inside
 * whole-stage codegen spans.
 */

/** `murmur3go(str)` → unsigned murmur3_32 as Long in [0, 2^32).
  * Reference: `/root/reference/vectorisers.go:261-262`. */
case class Murmur3Go(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HashKernels.murmur3Unsigned(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hash.HashKernels.murmur3Unsigned($c)")
  override protected def withNewChildInternal(c: Expression): Murmur3Go = copy(child = c)
  override def prettyName: String = "murmur3go"
}

/** `minhashK(shingles)` → k-element signature (ArrayType(LongType)).
  * Broder '97; band/row semantics per `/root/reference/lsh.go:120-132`. */
case class MinHashK(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HashKernels.minhashArray(v.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hash.HashKernels.minhashArray($c, $k)")
  override protected def withNewChildInternal(c: Expression): MinHashK = copy(child = c)
  override def prettyName: String = s"minhash$k"
}

/** `simhash64(entries)` over ArrayType(Struct(term: Long, weight: Double))
  * → 64-bit signature as LongType.
  * Reference: `/root/reference/hashing.go:32-62`. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    SimHash64.fromEntries(arr)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hash.SimHash64.fromEntries($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

object SimHash64 {
  /** Static entry point shared by eval and generated code. */
  def fromEntries(entries: ArrayData): Long = {
    val n = entries.numElements()
    val ids = new Array[Long](n)
    val ws = new Array[Double](n)
    var i = 0
    while (i < n) {
      val row = entries.getStruct(i, 2)
      ids(i) = row.getLong(0)
      ws(i) = row.getDouble(1)
      i += 1
    }
    HashKernels.simhash64(ids, ws)
  }
}

/** `winnow(text, k, window)` → winnowed k-gram fingerprint array
  * (ArrayType(LongType)); MOSS guarantee for runs ≥ k+window−1. */
case class Winnow(child: Expression, k: Int, window: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    HashKernels.winnowArray(v.asInstanceOf[UTF8String], k, window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.hash.HashKernels.winnowArray($c, $k, $window)")
  override protected def withNewChildInternal(c: Expression): Winnow = copy(child = c)
  override def prettyName: String = "winnow"
}

/** Column-level API. */
object HashFunctions {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  def murmur3go(c: Column): Column = col(Murmur3Go(expr(c)))
  def minhashK(c: Column, k: Int): Column = col(MinHashK(expr(c), k))
  def minhash128(c: Column): Column = minhashK(c, 128)
  def simhash64(entries: Column): Column = col(SimHash64(expr(entries)))
  def winnow(text: Column, k: Int, window: Int): Column =
    col(Winnow(expr(text), k, window))
}
