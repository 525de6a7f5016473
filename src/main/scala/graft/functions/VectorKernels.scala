package graft.functions

import org.apache.spark.sql.catalyst.expressions.{codegen, BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
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

  /** IVFADC estimator sum: Σ_s tables[s][codes[s]] in subspace order — the
    * FUSED form of the per-subspace
    * `element_at(element_at(tbl, s+1), element_at(codes, s+1))` chain. The
    * unfused chain evaluates m nested generic map probes per candidate
    * pair, each with its own null gate, boxed key, and re-read of the
    * ArrayData; this is ONE static call scanning the ≤ks-entry primitive
    * key/value arrays in a register loop. The add order is the same
    * left-to-right subspace fold, so the result is bit-identical
    * (oracle-gated on x_v9/x_v11/x_v12/x_v13/x_v14).
    *
    * Returns null when a code has no entry in its table — the unfused
    * chain's `element_at` miss semantics (cannot occur for codes produced
    * by the same books, but the contract is preserved).
    */
  def adcSum(tables: ArrayData, codes: ArrayData): java.lang.Double = {
    val m = codes.numElements()
    var acc = 0.0
    var s = 0
    while (s < m) {
      val map = tables.getMap(s)
      val code = codes.getInt(s)
      val keys = map.keyArray()
      val vals = map.valueArray()
      val n = keys.numElements()
      var i = 0
      var found = false
      while (i < n && !found) {
        if (keys.getInt(i) == code) {
          if (vals.isNullAt(i)) return null // a null d2 entry: propagate like element_at
          acc += vals.getDouble(i)
          found = true
        }
        i += 1
      }
      if (!found) return null
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** [[adcSum]] as a codegen expression: `left` = the per-query ADC tables
    * (array of cid→d2 maps, one per subspace), `right` = the candidate's
    * codes (one cid per subspace). Evaluated once per (candidate, query)
    * pair — the inner loop of every PQ-family search.
    */
  case class AdcSumExpr(left: Expression, right: Expression) extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def nullSafeEval(t: Any, c: Any): Any =
      adcSum(t.asInstanceOf[ArrayData], c.asInstanceOf[ArrayData])
    override protected def doGenCode(
        ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode =
      nullSafeCodeGen(ctx, ev, (t, c) => {
        val r = ctx.freshName("adcSum")
        s"""
        java.lang.Double $r = graft.functions.VectorKernels.adcSum($t, $c);
        if ($r == null) {
          ${ev.isNull} = true;
        } else {
          ${ev.value} = $r.doubleValue();
        }
        """
      })
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcSumExpr =
      copy(left = newLeft, right = newRight)
  }

  /** True iff every element of `a` is non-null and the length is exactly
    * `dim` — the definedness gate for [[nearestCid]].
    */
  def vecDefined(a: ArrayData, dim: Int): Boolean = {
    if (a.numElements() != dim) return false
    var i = 0
    while (i < dim) {
      if (a.isNullAt(i)) return false
      i += 1
    }
    true
  }

  /** argmin-by-(d2, cid) over a fixed centroid table, with monotone early
    * exit: squared-distance partial sums only grow, so a candidate is
    * abandoned the moment its partial reaches the current best — on average
    * that prunes most of the k·dim multiply-adds while provably selecting
    * the SAME cid as scoring every centroid in full:
    *   - a pruned candidate's full d2 ≥ its partial ≥ best, so it could at
    *     most TIE, and ties go to the earlier (smaller, `entries` are
    *     cid-ascending) cid anyway — `>=` in both the exit and the
    *     keep-strict-`<` update encode exactly that;
    *   - a surviving candidate's d2 is the complete left-to-right fold,
    *     bit-identical to [[d2]] / the `array_min(struct(d2, cid))` form
    *     this kernel replaces.
    * NaN vectors poison every candidate (NaN comparisons are false, nothing
    * is ever kept); return the smallest cid then — the same row
    * `array_min`'s NaN-equal struct ordering picked.
    *
    * CONTRACT: gate on [[vecDefined]]; `cids`/`cents` parallel arrays sorted
    * ascending by cid, all subvectors of the same length as `v`.
    */
  def nearestCid(v: ArrayData, cids: Array[Int], cents: Array[Array[Double]]): Int = {
    var best = Double.PositiveInfinity
    var bestCid = -1
    var k = 0
    while (k < cents.length) {
      val c = cents(k)
      val n = c.length
      var acc = 0.0
      var i = 0
      var pruned = false
      while (i < n && !pruned) {
        val d = v.getDouble(i) - c(i)
        acc += d * d
        if (acc >= best) pruned = true
        i += 1
      }
      if (!pruned && acc < best) { best = acc; bestCid = cids(k) }
      k += 1
    }
    if (bestCid == -1 && cids.nonEmpty) cids(0) else bestCid
  }

  /** Nearest-centroid assignment as ONE codegen expression over a
    * plan-constant centroid table (carried as reference objects, not as an
    * O(k·dim) literal tree — so codegen size is flat in k and the early-exit
    * loop lives in a single JIT-friendly kernel). Null when the vector is
    * null, has a null element, or is not exactly `dim` wide — the dirty
    * inputs every call site already filters out (the literal-tree form's
    * null-wins-array_min trap, made explicit).
    */
  case class NearestCidExpr(child: Expression, cids: Seq[Int], cents: Seq[Seq[Double]])
      extends UnaryExpression with ImplicitCastInputTypes {
    require(cids.nonEmpty && cids.size == cents.size, "parallel non-empty cid/centroid tables")
    require(cids == cids.sorted, "centroid table must be cid-ascending (tie order)")

    @transient private lazy val cidArr: Array[Int] = cids.toArray
    @transient private lazy val centArr: Array[Array[Double]] = cents.map(_.toArray).toArray
    private def dim: Int = cents.head.size

    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      if (vecDefined(a, dim)) Integer.valueOf(nearestCid(a, cidArr, centArr)) else null
    }
    override protected def doGenCode(
        ctx: codegen.CodegenContext, ev: codegen.ExprCode): codegen.ExprCode = {
      val cidsRef = ctx.addReferenceObj("nearestCids", cidArr, "int[]")
      val centsRef = ctx.addReferenceObj("nearestCents", centArr, "double[][]")
      nullSafeCodeGen(ctx, ev, v => s"""
        if (graft.functions.VectorKernels.vecDefined($v, $dim)) {
          ${ev.value} = graft.functions.VectorKernels.nearestCid($v, $cidsRef, $centsRef);
        } else {
          ${ev.isNull} = true;
        }
      """)
    }
    override protected def withNewChildInternal(newChild: Expression): NearestCidExpr =
      copy(child = newChild)
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
