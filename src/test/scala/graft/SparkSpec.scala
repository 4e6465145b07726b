package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all specs (getOrCreate -> one session per
  * test JVM; build.sbt forks a single JVM for the whole suite). Built
  * through `GraftExtensions.install` — the library's recommended entry
  * point — so every spec runs under the engine's own extensions and
  * runtime defaults (e.g. the ObjectHashAggregate threshold that keeps
  * TopKNearest off the sort-based fallback path). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.functions.GraftExtensions.install(
    SparkSession.builder())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def approx(a: Double, b: Double, tol: Double = 1e-6): Boolean = math.abs(a - b) <= tol
}
