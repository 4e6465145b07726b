package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints one JSON line (driver contract). Each query is forced with a
  * count() so the full plan executes.
  *
  * Each query runs SPARK_GRAFT_BENCH_ITERS times (default 3) and the
  * reported per-query number is the MEDIAN; `queries_min` carries the
  * per-query minimum. Single runs on a shared local[32] JVM showed up to
  * ±90% noise between rounds on untouched operators — medians make
  * round-over-round regressions detectable. The cache is cleared between
  * iterations so persist() calls inside queries can't carry state across
  * runs (each iteration pays its own materialization, like the driver's
  * one-shot run would).
  *
  * Output is TWO JSON lines: a "detail" line (full query names, per-query
  * minima and medians) and, LAST, the contract "total" line with medians
  * under short keys plus the load-probe dispersion — the driver archives
  * a 2000-char stdout tail, and the last line is sized to survive it. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "3").toInt.max(1)
    // GraftExtensions.install carries the ObjectHashAggregate fallback
    // threshold (top-k heap aggregation stays on the hash path)
    val spark = graft.functions.GraftExtensions.install(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up: JVM/codegen/scheduler spin-up and cold page cache
    // are not operator cost
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    // dev aid: SPARK_GRAFT_BENCH_ONLY=q45,q46 limits the run to matching
    // query-name prefixes (the driver never sets it — full run by default)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // noise sentinel: a fixed CPU-bound probe re-timed before every query.
    // Its dispersion makes external machine load visible IN the artifact —
    // r5's driver run benched under concurrent load and four healthy
    // queries read as 3-4x regressions with nothing in the JSON to say why.
    def probeSec(): Double = {
      val t0 = System.nanoTime()
      spark.range(4000000L).selectExpr("sum(id)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    probeSec() // compile/warm the probe itself before sampling
    val probes = scala.collection.mutable.ArrayBuffer[Double]()
    val results = selected.map { case (name, fn) =>
      probes += probeSec()
      val times = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L
        }
        (System.nanoTime() - t0) / 1e9
      }.sorted
      (name, times(times.length / 2), times.head)
    }
    def fmt(v: Double): String = "%.4f".formatLocal(java.util.Locale.ROOT, v)
    // contract line uses 2 decimals: at 143+ queries the 3-decimal form
    // (~13.5 chars/query) would overflow the driver's 2000-char stdout
    // tail; the clippable detail line keeps 4-decimal medians
    def fmt3(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(key: String => String, f: ((String, Double, Double)) => Double,
        fm: Double => String = fmt): String =
      results.map { case r @ (k, _, _) => "\"" + key(k) + "\":" + fm(f(r)) }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val ps = if (probes.isEmpty) Seq(0.0) else probes.sorted.toSeq // empty selection
    // the driver's artifact keeps only a 2000-char TAIL of stdout, so the
    // summary prints in two lines: full names + per-query minima/medians
    // and the long-form probe stats first (clippable), then the contract
    // line LAST with total, medians under short NUMERIC query keys ("159"
    // — the q prefix alone is ~165 chars at this surface size), and the
    // probe dispersion as pm/px. Contract medians print at ONE decimal
    // (~10 chars/query): the 2-decimal form measured 2017 chars at 184
    // queries — past the tail — and 1 decimal holds to ~195; 4-decimal
    // per-query medians stay on the detail line for local reads
    println(s"""{"metric":"detail","iters":$iters,"probe_med":${fmt(ps(ps.length / 2))},"probe_max":${fmt(ps.last)},"queries_min":${jmap(identity, _._3)},"queries_med_full":${jmap(identity, _._2)}}""")
    def fmt1(v: Double): String = "%.1f".formatLocal(java.util.Locale.ROOT, v)
    println(s"""{"metric":"total","value":${fmt3(total)},"unit":"sec","queries":${jmap(_.split("_").head.drop(1), _._2, fmt1)},"pm":${fmt3(ps(ps.length / 2))},"px":${fmt3(ps.last)},"sf":"${new java.io.File(sfDir).getName}"}""")
    spark.stop()
  }
}
