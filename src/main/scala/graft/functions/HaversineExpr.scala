package graft.functions

import graft.core.Ellipsoid
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native haversine distance expression + the optimizer rule that makes
  * radius predicates scan-prunable (SURVEY §4's "coarse data reduction as a
  * custom Rule[LogicalPlan]").
  *
  * `HaversineDist(lon, lat, lon0, lat0)` evaluates the great-circle metres
  * inside codegen. [[GeoRadiusPruning]] rewrites
  * `haversine_dist(lon, lat, C_lon, C_lat) <= R` filters by conjoining the
  * implied latitude/longitude bounding box — plain comparisons on the raw
  * columns, which Catalyst then pushes into the Parquet scan
  * (`PushedFilters`), so row groups outside the circle's bbox are skipped
  * before the trigonometry ever runs. The original predicate is kept: the
  * bbox is a necessary condition, never a replacement.
  */
case class HaversineDist(lonE: Expression, latE: Expression, lon0E: Expression, lat0E: Expression)
    extends QuaternaryExpression {

  override def first: Expression = lonE
  override def second: Expression = latE
  override def third: Expression = lon0E
  override def fourth: Expression = lat0E
  override def dataType: DataType = DoubleType
  override def prettyName: String = "haversine_dist"

  override def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    HaversineDist.compute(a.asInstanceOf[Double], b.asInstanceOf[Double],
      c.asInstanceOf[Double], d.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HaversineDist.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (lon, lat, lon0, lat0) =>
      s"${ev.value} = $cls.compute($lon, $lat, $lon0, $lat0);")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(lonE = f, latE = s, lon0E = t, lat0E = q)
}

object HaversineDist {
  /** Great-circle distance in metres on the mean earth radius
    * (`pyresample/spherical.py:57-78` haversine). */
  def compute(lon: Double, lat: Double, lon0: Double, lat0: Double): Double = {
    val dLat = math.toRadians(lat0) - math.toRadians(lat)
    val dLon = math.toRadians(lon0) - math.toRadians(lon)
    val a = math.pow(math.sin(dLat / 2), 2) +
      math.cos(math.toRadians(lat)) * math.cos(math.toRadians(lat0)) *
        math.pow(math.sin(dLon / 2), 2)
    2.0 * Ellipsoid.R * math.asin(math.min(1.0, math.sqrt(a)))
  }

  def apply(lon: Column, lat: Column, lon0: Column, lat0: Column): Column =
    Bridge.column(HaversineDist(
      Bridge.expression(lon.cast("double")), Bridge.expression(lat.cast("double")),
      Bridge.expression(lon0.cast("double")), Bridge.expression(lat0.cast("double"))))
}

/** Optimizer rule: conjoin the implied lat/lon bounding box to
  * haversine-radius predicates over literal centres. Marker-protected
  * against re-application. */
object GeoRadiusPruning extends Rule[LogicalPlan] {

  private val MetresPerDegLat = 111194.9266 // pi/180 * R

  private def bbox(lon: Expression, lat: Expression,
      lon0: Double, lat0: Double, r: Double): Option[Expression] = {
    val dLat = r / MetresPerDegLat
    val latMin = lat0 - dLat; val latMax = lat0 + dLat
    if (latMin <= -89.0 || latMax >= 89.0) {
      // near-pole circles wrap every longitude: latitude band only
      return Some(And(
        GreaterThanOrEqual(lat, Literal(math.max(-90.0, latMin))),
        LessThanOrEqual(lat, Literal(math.min(90.0, latMax)))))
    }
    val maxAbsLat = math.max(math.abs(latMin), math.abs(latMax))
    val dLon = dLat / math.cos(math.toRadians(maxAbsLat))
    val lonMin = lon0 - dLon; val lonMax = lon0 + dLon
    val latPred = And(
      GreaterThanOrEqual(lat, Literal(latMin)), LessThanOrEqual(lat, Literal(latMax)))
    val lonPred =
      if (lonMin < -180 || lonMax > 180) {
        // date-line wrap: the OR of `data_reduce.py:296-300`
        val w = lonMin - 360.0 * math.floor((lonMin + 180.0) / 360.0)
        val e = lonMax - 360.0 * math.floor((lonMax + 180.0) / 360.0)
        Or(GreaterThanOrEqual(lon, Literal(w)), LessThanOrEqual(lon, Literal(e)))
      } else
        And(GreaterThanOrEqual(lon, Literal(lonMin)), LessThanOrEqual(lon, Literal(lonMax)))
    Some(And(latPred, lonPred))
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** Idempotent under the optimizer's fixpoint loop: a bbox is only added
    * when its conjuncts aren't already present. */
  private def augment(cond: Expression): Expression = {
    val existing = conjuncts(cond)
    def alreadyThere(b: Expression): Boolean =
      conjuncts(b).forall(c => existing.exists(_.semanticEquals(c)))
    def visit(e: Expression): Expression = e match {
      case cmp @ (LessThanOrEqual(_: HaversineDist, _) | LessThan(_: HaversineDist, _)) =>
        val (hav, radius) = cmp match {
          case LessThanOrEqual(h: HaversineDist, r) => (h, r)
          case LessThan(h: HaversineDist, r) => (h, r)
        }
        (hav, radius) match {
          case (HaversineDist(lon, lat,
              Literal(lon0: Double, DoubleType), Literal(lat0: Double, DoubleType)),
              Literal(r: Double, DoubleType)) =>
            bbox(lon, lat, lon0, lat0, r) match {
              case Some(b) if !alreadyThere(b) => And(b, cmp)
              case _ => cmp
            }
          case _ => cmp
        }
      case And(l, r) => And(visit(l), visit(r))
      case other => other
    }
    visit(cond)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val augmented = augment(cond)
      if (augmented fastEquals cond) f else Filter(augmented, child)
  }
}

/** SparkSessionExtensions installer:
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  * or `GraftExtensions.install(builder)`.
  *
  * Besides the optimizer rule, installation applies [[GraftExtensions
  * .EngineDefaults]] to the session (unless the user set a key
  * explicitly), so the engine's required runtime config travels with the
  * library rather than with each harness. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule { session =>
      // rule builders run once per session when its optimizer is first
      // built — before any query is planned — which makes this the one
      // extension hook with access to the live session's conf
      GraftExtensions.applyEngineDefaults(session)
      GeoRadiusPruning
    }
  }
}

object GraftExtensions {
  /** Conf the engine needs at runtime regardless of how the session was
    * built. `TopKNearest`'s bounded-heap aggregation plans as
    * ObjectHashAggregate, and Spark's default 128-key fallback threshold
    * silently degrades every k-NN query to sort-based aggregation at any
    * real target-grid cardinality; a k-slot heap is O(100 B), so 128k
    * keys per task is still only MBs. */
  val EngineDefaults: Map[String, String] = Map(
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "131072")

  /** Recommended session entry point. Deliberately does NOT write
    * [[EngineDefaults]] into the builder: a `builder.config(k, v)` here
    * would overwrite a value the caller set BEFORE install(). The
    * defaults land through [[applyEngineDefaults]] at rule-injection
    * time instead, which checks for explicit settings first — so user
    * config wins regardless of ordering around install(). */
  def install(builder: SparkSession.Builder): SparkSession.Builder =
    builder.withExtensions(new GraftExtensions)

  /** Sets each engine default unless the user set the key explicitly
    * (session conf or spark-submit --conf). */
  private[graft] def applyEngineDefaults(session: SparkSession): Unit =
    EngineDefaults.foreach { case (k, v) =>
      if (!Bridge.sessionConfContains(session, k) &&
          !session.sparkContext.getConf.contains(k)) {
        session.conf.set(k, v)
      }
    }
}
