package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native codegen kernels for product quantization (Jégou, Douze &
  * Schmid 2011) — the encode argmin and the per-query ADC lookup table.
  *
  * The previous formulation built both as literal Catalyst trees
  * (`array_min` over ksub `struct(round(Σ (v[i]−c)², 6), j)` structs per
  * subspace): semantically right, but at m=8, ksub=16, d=8 that is ~5,000
  * expression nodes in ONE projection — the generated `processNext()`
  * blows janino's method limit, the whole stage FAILS to compile, and
  * Spark silently falls back to interpreted execution for the hottest
  * scan in the ANN plane (this was q204/q205's dominant cost in r9, not
  * the shuffles). A referenced `double[][]` codebook plus a static loop
  * kernel generates ~10 lines per subspace instead, keeping the encode /
  * LUT projection inside whole-stage codegen at any (m, ksub, d).
  *
  * Bit-exactness contract (the DuckDB oracles replay it): accumulation is
  * left-to-right within a sub-vector (identical to the `reduceLeft` of
  * the tree form), each distance / dot is rounded to 6 EXACTLY the way
  * Spark's `Round` does it for doubles — `java.math.BigDecimal.valueOf`
  * (canonical string representation, NOT the exact binary expansion)
  * then `setScale(6, HALF_UP)` — and argmin ties keep the lowest donor
  * index, matching the struct-ordering tiebreak. PqSpec pins kernel ==
  * tree-form equality on adversarial half-boundary values.
  */
object PqKernels {

  /** Spark `round(x, 6)` for doubles, exactly (RoundBase codegen emits
    * this same valueOf/setScale/doubleValue chain; NaN/Inf pass through). */
  @inline def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** 1-based argmin_j round6(Σ_di (v[off+di] − codebook(j)(di))²), ties to
    * the lowest j — one subspace's PQ code. */
  def pqCode(v: ArrayData, codebook: Array[Array[Double]], off: Int): Int = {
    var best = Double.PositiveInfinity
    var bestJ = 0
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      var d = 0.0
      var di = 0
      while (di < c.length) {
        val e = v.getDouble(off + di) - c(di)
        d += e * e
        di += 1
      }
      val dr = round6(d)
      if (dr < best) { best = dr; bestJ = j }
      j += 1
    }
    bestJ + 1
  }

  /** LUT(j) = round6(Σ_di v[off+di] · codebook(j)(di)) — one subspace's
    * ADC lookup table for a query vector. */
  def pqLut(v: ArrayData, codebook: Array[Array[Double]], off: Int): ArrayData = {
    val out = new Array[Double](codebook.length)
    var j = 0
    while (j < codebook.length) {
      val c = codebook(j)
      var s = 0.0
      var di = 0
      while (di < c.length) {
        s += v.getDouble(off + di) * c(di)
        di += 1
      }
      out(j) = round6(s)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Base for the two per-subspace PQ expressions: the codebook rides into
  * generated code as a referenced `double[][]` (one `ctx.addReferenceObj`
  * per subspace), the work is a static kernel call. Child must already be
  * `array<double>` (the Column wrappers cast). Null array → null; null
  * ELEMENTS are not expected (embeddings are dense) and would surface as
  * a kernel NPE rather than silent wrong codes. */
abstract class PqSubspaceExpr extends UnaryExpression {
  def codebook: Array[Array[Double]]
  def off: Int
  protected def kernelName: String

  override def nullable: Boolean = child.nullable

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebook", codebook, "double[][]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.PqKernels.$kernelName($v, $cb, $off);")
  }
}

/** One subspace's PQ code (1-based donor index). */
case class PqSubCode(child: Expression, codebook: Array[Array[Double]], off: Int)
    extends PqSubspaceExpr {
  override def prettyName: String = "pq_sub_code"
  override def dataType: DataType = IntegerType
  override protected def kernelName: String = "pqCode"
  override protected def nullSafeEval(v: Any): Any =
    PqKernels.pqCode(v.asInstanceOf[ArrayData], codebook, off)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** One subspace's ADC lookup table (ksub round-6 dot products). */
case class PqSubLut(child: Expression, codebook: Array[Array[Double]], off: Int)
    extends PqSubspaceExpr {
  override def prettyName: String = "pq_sub_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override protected def kernelName: String = "pqLut"
  override protected def nullSafeEval(v: Any): Any =
    PqKernels.pqLut(v.asInstanceOf[ArrayData], codebook, off)
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object PqExpr {
  private def dbl(c: Column): Expression = Bridge.expression(c.cast("array<double>"))
  def subCode(vec: Column, codebook: Array[Array[Double]], off: Int): Column =
    Bridge.column(PqSubCode(dbl(vec), codebook, off))
  def subLut(vec: Column, codebook: Array[Array[Double]], off: Int): Column =
    Bridge.column(PqSubLut(dbl(vec), codebook, off))
}
