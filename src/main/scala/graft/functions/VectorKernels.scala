package graft.functions

import org.apache.spark.sql.catalyst.expressions.{codegen, BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** JVM kernel + codegen Catalyst `Expression` for the dot-product fold at
  * the heart of every cosine operator ([[graft.operators.VectorOps]]).
  *
  * The builtin form — `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — evaluates
  * its lambda INTERPRETED per element: a blocked near-dup pass at sf0.1
  * runs ~2.5M pairs × 64 dims of boxed lambda calls. This kernel is the same
  * left-to-right multiply-add sequence (bit-identical IEEE result, verified
  * by the DuckDB oracle gate) as a static call inside whole-stage codegen.
  */
object VectorKernels {

  /** Sequential left-to-right multiply-add — the exact fold order of
    * `aggregate(zip_with(a, b, (x, y) => x * y), 0.0, _+_)` and of DuckDB's
    * `list_sum(list_transform(...))` accumulation.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  case class DotExpr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any =
      java.lang.Double.valueOf(dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))
    override protected def doGenCode(
        ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotExpr =
      copy(left = newLeft, right = newRight)
  }
}
