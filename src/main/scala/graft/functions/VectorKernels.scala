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
    *
    * CONTRACT (enforced by [[DotExpr]], not here): both arrays same length,
    * no null elements. Called directly, mismatched lengths truncate to the
    * shorter side and a null element reads as garbage via
    * `ArrayData.getDouble` — always gate on [[dotDefined]] first.
    */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** True iff [[dot]] is well-defined: equal lengths, no null elements.
    * The null scan is a bitmap test per element — negligible next to the
    * multiply-add stream it guards.
    */
  def dotDefined(a: ArrayData, b: ArrayData): Boolean = {
    val n = a.numElements()
    if (b.numElements() != n) return false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** Squared euclidean distance, sequential left-to-right fold — the exact
    * operation order of `aggregate(zip_with(a, b, (x, y) => (x-y)*(x-y)),
    * 0.0, _+_)` and of the IVF oracle's
    * `list_sum(list_transform(..., (v[i]-c[i])*(v[i]-c[i])))`, so results
    * are bit-identical to both. Same contract as [[dot]]: gate on
    * [[dotDefined]] first.
    */
  def d2(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = a.getDouble(i) - b.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  /** Squared distance with the builtin fold's null semantics (null on
    * length mismatch or null element) — see [[DotExpr]]. The IVF assignment
    * evaluates this per (row × centroid) per Lloyd round; as an interpreted
    * HOF lambda it dominated the IVF queries' runtime.
    */
  case class D2Expr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (dotDefined(aa, bb)) java.lang.Double.valueOf(d2(aa, bb)) else null
    }
    override protected def doGenCode(
        ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if (graft.functions.VectorKernels.dotDefined($a, $b)) {
          ${ev.value} = graft.functions.VectorKernels.d2($a, $b);
        } else {
          ${ev.isNull} = true;
        }
      """)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): D2Expr =
      copy(left = newLeft, right = newRight)
  }

  /** Dot product with the null semantics of the builtin fold it replaced:
    * `zip_with` nulls the pair result on length mismatch and `x * y`
    * null-propagates a null element, so the aggregate is null. DotExpr
    * returns null in exactly those cases instead of silently truncating /
    * reading garbage (the r4 ADVICE latent-trap fix).
    */
  case class DotExpr(left: Expression, right: Expression)
      extends BinaryExpression with ImplicitCastInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    // Null even for non-null inputs (mismatched lengths / null elements).
    override def nullable: Boolean = true
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (aa, bb) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      if (dotDefined(aa, bb)) java.lang.Double.valueOf(dot(aa, bb)) else null
    }
    override protected def doGenCode(
        ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => s"""
        if (graft.functions.VectorKernels.dotDefined($a, $b)) {
          ${ev.value} = graft.functions.VectorKernels.dot($a, $b);
        } else {
          ${ev.isNull} = true;
        }
      """)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotExpr =
      copy(left = newLeft, right = newRight)
  }
}
