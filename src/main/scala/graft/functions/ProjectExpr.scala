package graft.functions

import graft.core.Crs
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the projection kernel (SURVEY §7.3's
  * "UDF -> Expression upgrade path"): evaluates `Crs.forward/inverse` inside
  * whole-stage codegen via a direct static-style call on a referenced Crs
  * object — no ScalaUDF boxing, no encoder round-trip, null-safety inlined.
  */
case class ProjectPoint(lonE: Expression, latE: Expression, crs: Crs, fwd: Boolean)
    extends BinaryExpression {

  override def left: Expression = lonE
  override def right: Expression = latE
  override def dataType: DataType =
    StructType(Seq(StructField("x", DoubleType, nullable = false),
      StructField("y", DoubleType, nullable = false)))
  override def prettyName: String = if (fwd) "project_fwd" else "project_inv"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val r =
      if (fwd) crs.forwardArray(a.asInstanceOf[Double], b.asInstanceOf[Double])
      else crs.inverseArray(a.asInstanceOf[Double], b.asInstanceOf[Double])
    new GenericInternalRow(Array[Any](r(0), r(1)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val crsRef = ctx.addReferenceObj("crs", crs, classOf[Crs].getName)
    val method = if (fwd) "forwardArray" else "inverseArray"
    nullSafeCodeGen(ctx, ev, (lon, lat) => {
      s"""
         |double[] ${ev.value}_r = $crsRef.$method($lon, $lat);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{${ev.value}_r[0], ${ev.value}_r[1]});
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lonE = l, latE = r)
}

object ProjectExpr {
  /** Column API: struct(x, y) of the forward-projected point. */
  def projectFwd(crs: Crs, lon: Column, lat: Column): Column =
    Bridge.column(ProjectPoint(
      Bridge.expression(lon.cast("double")), Bridge.expression(lat.cast("double")), crs, fwd = true))
  /** Column API: struct(x=lon, y=lat) of the inverse-projected point. */
  def projectInv(crs: Crs, x: Column, y: Column): Column =
    Bridge.column(ProjectPoint(
      Bridge.expression(x.cast("double")), Bridge.expression(y.cast("double")), crs, fwd = false))
}
