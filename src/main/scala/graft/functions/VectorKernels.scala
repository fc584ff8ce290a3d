package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the per-row vector kernels.
  *
  * The higher-order-function forms (`aggregate(zip_with(a, b, _*_),
  * 0.0, _+_)`) are CodegenFallback: every containing projection drops
  * to interpreted evaluation for that subtree, allocating lambda-
  * variable holders per element. At 100-TB embedding scale the dot
  * product IS the inner loop of brute-force scoring and candidate
  * verification, so these two expressions implement it with
  * `doGenCode` — a primitive `double` loop over `ArrayData`, kept
  * inside whole-stage codegen.
  *
  * Result semantics (null, length mismatch, empty, zero-norm) and
  * double-arithmetic ORDER are bit-exact with the HOF formulas they
  * replace — ascending-index fold with a 0.0 seed — so persisted
  * results and DuckDB oracle hashes are unchanged.
  */
object VectorKernels {

  /** `sum_i a(i)*b(i)` over two `array<double>` columns. Null when
    * either side is null, lengths differ, or any element is null
    * (exactly the HOF `aggregate`+`zip_with` contract). */
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  /** Cosine similarity `dot(a,b) / (|a|*|b|)`; null when either side
    * has zero norm (and under any [[dot]] null condition). One fused
    * pass computes all three accumulators. */
  def cosine(a: Column, b: Column): Column =
    Bridge.column(CosineSim(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b.cast("array<double>"))))

  /** [[cosine]] against an `array<tinyint>` right side read IN PLACE —
    * the int8-ADC probe kernel: no cast, no dequantize multiply, no
    * per-row array allocation; the loop reads raw bytes out of the
    * Tungsten array. Correct as a *cosine* because cosine is invariant
    * under the quantizer's per-vector positive scale (`cos(q, s·b) =
    * cos(q, b)` for `s > 0` — [[graft.ops.Similarity.quantizeInt8]]'s
    * scale is `max|x|/127 > 0` whenever the vector is nonzero, and
    * zero vectors return null either way). */
  def cosineI8(a: Column, b: Column): Column =
    Bridge.column(CosineSimI8(
      Bridge.expression(a.cast("array<double>")),
      Bridge.expression(b)))
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // input types are guaranteed array<double> by the VectorKernels
  // wrappers (explicit cast); direct construction must honor that
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused cosine: `dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b)))` in a
  * single pass; the division/sqrt order replicates the composed
  * Column formula exactly so results are bit-identical. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {
  // input types are guaranteed array<double> by the VectorKernels
  // wrappers (explicit cast); direct construction must honor that
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getDouble(i)
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val nm = math.sqrt(daa) * math.sqrt(dbb)
    if (nm == 0.0) null else dab / nm
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val nm = ctx.freshName("nm")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $dab += $x * $y; $daa += $x * $x; $dbb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $nm = Math.sqrt($daa) * Math.sqrt($dbb);
         |    if ($nm == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dab / $nm; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** [[CosineSim]] with an `array<tinyint>` right operand read in place
  * (`getByte`, widened in-register) — the quantized-index probe
  * kernel. Same null / length-mismatch / zero-norm contract and the
  * same accumulate-then-divide order as [[CosineSim]]. */
case class CosineSimI8(left: Expression, right: Expression)
    extends BinaryExpression {
  // left is guaranteed array<double>, right array<tinyint> by the
  // VectorKernels wrapper; direct construction must honor that
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_cosine_i8"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    var dab = 0.0; var daa = 0.0; var dbb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i); val y = b.getByte(i).toDouble
      dab += x * y; daa += x * x; dbb += y * y
      i += 1
    }
    val nm = math.sqrt(daa) * math.sqrt(dbb)
    if (nm == 0.0) null else dab / nm
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dab = ctx.freshName("dab")
      val daa = ctx.freshName("daa")
      val dbb = ctx.freshName("dbb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val nm = ctx.freshName("nm")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dab = 0.0; double $daa = 0.0; double $dbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $x = $a.getDouble($i);
         |    final double $y = (double) $b.getByte($i);
         |    $dab += $x * $y; $daa += $x * $x; $dbb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    final double $nm = Math.sqrt($daa) * Math.sqrt($dbb);
         |    if ($nm == 0.0) { ${ev.isNull} = true; } else { ${ev.value} = $dab / $nm; }
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimI8 =
    copy(left = newLeft, right = newRight)
}
