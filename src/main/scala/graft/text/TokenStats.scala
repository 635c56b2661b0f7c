package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd token-statistics kernels for the quality/language-id
 * per-row paths (optimization round, guide §4): the Column forms —
 * `aggregate(toks, 0.0, acc + length(t))` and
 * `size(filter(toks, array_contains(lit(words), t)))` — are
 * interpreted higher-order folds per document (×5 marker/stop lists on
 * the langid+quality surfaces). Both kernels produce EXACTLY the same
 * values: the length sum is an integer-valued double (token lengths
 * sum far below 2^53, so fold order cannot change the value) and the
 * membership counts are integers.
 */
object TokenStatsKernels {
  /** Σ length(token) as the same integer-valued double the
    * `aggregate(toks, 0.0, acc + length(t))` fold produced. */
  def sumStrLens(tokens: ArrayData): Double = {
    val n = tokens.numElements()
    var s = 0L
    var i = 0
    while (i < n) { s += tokens.getUTF8String(i).numChars(); i += 1 }
    s.toDouble
  }

  /** Count of tokens contained in `set` — identical to
    * `size(filter(toks, t => array_contains(lit(words), t)))`. */
  def countIn(tokens: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = tokens.numElements()
    var c = 0
    var i = 0
    while (i < n) { if (set.contains(tokens.getUTF8String(i))) c += 1; i += 1 }
    c
  }

  def toSet(words: Array[String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => s.add(UTF8String.fromString(w)))
    s
  }
}

/** `sum_str_lens(tokens)` → double (integer-valued). */
case class SumStrLens(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TokenStatsKernels.sumStrLens(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.TokenStatsKernels.sumStrLens($c)")
  override protected def withNewChildInternal(c: Expression): SumStrLens =
    copy(child = c)
  override def prettyName: String = "sum_str_lens"
}

/** `count_in(tokens)` → int membership count against a fixed word set
  * carried as a reference object. */
case class CountIn(child: Expression, words: Array[String])
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  @transient private lazy val set = TokenStatsKernels.toSet(words)
  override def nullSafeEval(v: Any): Any =
    TokenStatsKernels.countIn(v.asInstanceOf[ArrayData], set)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordSet", TokenStatsKernels.toSet(words),
      "java.util.HashSet<org.apache.spark.unsafe.types.UTF8String>")
    defineCodeGen(ctx, ev,
      c => s"graft.text.TokenStatsKernels.countIn($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): CountIn =
    copy(child = c)
  override def prettyName: String = "count_in"
}

object TokenStats {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)
  def sumStrLens(tokens: Column): Column = col(SumStrLens(expr(tokens)))
  def countIn(tokens: Column, words: Array[String]): Column =
    col(CountIn(expr(tokens), words))
}
