package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native codegen kernel for centroid-cell assignment (r11): the
  * top-`keep` nearest centroids of a vector by round-6 cosine, ties to
  * the lowest centroid index.
  *
  * `Similarity.assignCells` previously built this as a literal Catalyst
  * tree — `array_min` / `array_sort` over nCentroids
  * `struct(-round(cosine(v, [dim literals]), 6), cid)` structs. That is
  * semantically right and stays inside codegen, but the tree carries
  * nCentroids × dim literal nodes (16 × 64 = 1,024 for q51's untrained
  * subset), and Catalyst re-analyzes, re-optimizes and re-generates that
  * tree on EVERY plan build — measurable fixed latency per query
  * (q51 solo: ~1.8 s → ~0.9 s from this kernel) and the same
  * janino-method-limit exposure the PQ plane hit at m·ksub·d nodes
  * (PqExpr scaladoc). The centroid matrix rides into generated code as
  * ONE referenced `double[][]` and the work is a static loop kernel —
  * ~3 generated lines at any (nCentroids, dim).
  *
  * Bit-exactness contract (the DuckDB oracles replay it): the cosine is
  * [[graft.functions.VectorExpr.CosineSim]]'s exact accumulation
  * (simultaneous dot/na/nb per element, `dot / (sqrt(na) * sqrt(nb))`),
  * rounded via [[PqKernels.round6]] (Spark `Round`'s BigDecimal
  * semantics), and the selection order is Spark SQL's total double
  * ordering ((-sim, cid) asc — NaN greatest, -0.0 == 0.0), identical to
  * the struct-ordering tiebreak of the tree form. CentroidKernelSpec
  * pins kernel == tree equality including ties and NaN rows. */
object CentroidKernels {

  /** Spark SQL's total order on doubles (SQLOrderingUtil.compareDoubles):
    * NaN greatest, NaN == NaN, -0.0 == 0.0. */
  @inline private def cmpD(a: Double, b: Double): Int =
    if (a < b) -1
    else if (a > b) 1
    else {
      val an = java.lang.Double.isNaN(a); val bn = java.lang.Double.isNaN(b)
      if (an && bn) 0 else if (an) 1 else if (bn) -1 else 0
    }

  /** Top-`keep` centroid indices (0-based longs) of `v` by
    * (round6(cosine) desc, index asc); null when any dim mismatches
    * (the tree form's null-cosine edge). */
  def topCells(v: ArrayData, centroids: Array[Array[Double]], keep: Int): ArrayData = {
    val k = centroids.length
    val negSim = new Array[Double](k)
    var i = 0
    while (i < k) {
      val c = centroids(i)
      if (v.numElements() != c.length) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var d = 0
      while (d < c.length) {
        val x = v.getDouble(d); val y = c(d)
        dot += x * y; na += x * x; nb += y * y
        d += 1
      }
      negSim(i) = -PqKernels.round6(dot / (math.sqrt(na) * math.sqrt(nb)))
      i += 1
    }
    val m = math.min(keep, k)
    val out = new Array[Long](m)
    val taken = new Array[Boolean](k)
    var o = 0
    while (o < m) {
      var best = -1
      var j = 0
      while (j < k) {
        if (!taken(j) && (best < 0 || cmpD(negSim(j), negSim(best)) < 0)) best = j
        j += 1
      }
      taken(best) = true
      out(o) = best.toLong
      o += 1
    }
    new GenericArrayData(out)
  }
}

/** Top-`keep` nearest-centroid indices as `array<long>` — the kernel
  * form of `Similarity.assignCells`' literal argmax. Child must already
  * be `array<double>` (the Column wrapper casts). */
case class CentroidTopCells(child: Expression, centroids: Array[Array[Double]], keep: Int)
    extends UnaryExpression {
  override def prettyName: String = "centroid_top_cells"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any): Any =
    CentroidKernels.topCells(v.asInstanceOf[ArrayData], centroids, keep)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctr = ctx.addReferenceObj("centroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |${ev.value} = graft.functions.CentroidKernels.topCells($v, $ctr, $keep);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object CentroidExpr {
  def topCells(v: Column, centroids: Seq[Array[Double]], keep: Int): Column =
    Bridge.column(CentroidTopCells(
      Bridge.expression(v.cast("array<double>")), centroids.toArray, keep))
}
