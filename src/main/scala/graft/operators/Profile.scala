package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling — the data-quality report a pipeline runs before
  * trusting a new drop: per-column row/null/distinct counts and min/max,
  * one output row per column.
  *
  * ONE aggregate over ONE scan computes every column's stats (Spark
  * plans the multi-column DISTINCTs through a single Expand — no
  * per-column re-scan), then a bounded explode unpivots the stat row
  * into (column, stats) rows. At 100 TB this is a single pass with
  * map-side partials; the output is #columns rows.
  *
  * Min/max are emitted as strings for schema uniformity — callers
  * profiling FLOAT columns should pre-cast to DECIMAL if the output
  * must be engine-portable (double→string formatting is not).
  */
object Profile {

  /** Per-group equi-width histogram: `bins` buckets between the group's
    * own min/max, with bin edges and exact counts — the distribution
    * report behind drift dashboards (pair with `Selection.ksTest` for
    * the decision). Group stats are a tiny broadcast aggregate; binning
    * is the same floor arithmetic as `Selection.quantilesByGroup`
    * (deterministic double ops, identical on any engine); ONE (group,
    * bin) hash aggregate bounded by #groups·bins. Degenerate groups
    * (min == max) collapse to bin 0. */
  def histogram(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      bins: Int = 10): DataFrame = {
    require(bins >= 1, "bins must be positive")
    val v = col(valueCol).cast("double")
    val stats = df.groupBy(col(groupCol))
      .agg(min(v).as("_lo"), max(v).as("_hi"))
    df.join(broadcast(stats), groupCol)
      .withColumn("bin",
        when(col("_hi") === col("_lo"), lit(0))
          .otherwise(least(lit(bins - 1),
            floor((v - col("_lo")) * bins / (col("_hi") - col("_lo"))).cast("int"))))
      .groupBy(col(groupCol), col("bin"))
      .agg(count(lit(1)).as("n"),
        min(col("_lo")).as("_lo"), min(col("_hi")).as("_hi"))
      .withColumn("bin_lo", col("_lo") + col("bin") * (col("_hi") - col("_lo")) / bins)
      .withColumn("bin_hi", col("_lo") + (col("bin") + 1) * (col("_hi") - col("_lo")) / bins)
      .select(groupCol, "bin", "bin_lo", "bin_hi", "n")
  }

  /** Benford's-law expected first-digit frequencies as PPB integer
    * literals (round(log10(1+1/d)·1e9)) — shared verbatim with the SQL
    * oracle so both engines compare against identical constants. */
  private[graft] val BenfordPpb: Seq[Long] =
    (1 to 9).map(d => math.round(math.log10(1.0 + 1.0 / d) * 1e9))

  /** Benford's-law first-digit audit of a positive integer metric — the
    * classic fabricated-data / unit-mix-up detector for financial and
    * measurement columns. The first digit comes from the INTEGER's
    * decimal string (no double formatting, no log10 on data), observed
    * frequencies are integer PPB (`n_d·1e9 div N`), and the deviation
    * from Benford is an integer |obs − exp| — the whole report is exact
    * integer arithmetic. One hash aggregate on a 9-value key. */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val digit = expr(s"CAST(substr(CAST($valueCol AS STRING), 1, 1) AS BIGINT)")
    val expected = BenfordPpb.zipWithIndex
      .foldLeft(lit(null).cast("long")) { case (acc, (ppb, i)) =>
        when(col("digit") === (i + 1), lit(ppb)).otherwise(acc)
      }
    df.filter(col(valueCol) > 0)
      .groupBy(digit.as("digit"))
      .agg(count(lit(1)).as("n"))
      .withColumn("n_total",
        sum(col("n")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("obs_ppb", expr("(n * 1000000000L) div n_total"))
      .withColumn("exp_ppb", expected)
      .withColumn("diff_ppb", abs(col("obs_ppb") - col("exp_ppb")))
      .select("digit", "n", "n_total", "obs_ppb", "exp_ppb", "diff_ppb")
  }

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to profile")
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__nn"),
      count_distinct(col(c)).as(s"${c}__nd"),
      min(col(c)).cast("string").as(s"${c}__mn"),
      max(col(c)).cast("string").as(s"${c}__mx")))
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"${c}__nn")).as("n_nulls"),
        col(s"${c}__nd").as("n_distinct"),
        col(s"${c}__mn").as("min_value"),
        col(s"${c}__mx").as("max_value"))): _*)).as("_p"))
      .select("_p.*")
  }

  /** Declarative data-quality expectations (the dbt-test /
    * Great-Expectations audit stage): each expectation is a (name,
    * boolean SQL predicate) pair evaluated per row; the report is ONE
    * aggregate scan emitting rows, violations and pass flag per
    * expectation, unpivoted to #expectations rows. A uniqueness
    * expectation rides the same pass as `count(*) − count_distinct(keys)`.
    *
    * Scale shape: one map-side-combined aggregate over the table — the
    * per-expectation CASE sums are free riders on a single scan; the
    * distinct-count for uniqueness is the only term that shuffles more
    * than a row. */
  def expectations(
      df: DataFrame,
      checks: Seq[(String, String)],
      uniqueKey: Seq[String] = Nil): DataFrame = {
    require(checks.nonEmpty || uniqueKey.nonEmpty, "need at least one expectation")
    val predAggs = checks.flatMap { case (nm, pred) =>
      Seq(sum(when(expr(pred), 0L).otherwise(1L)).as(s"${nm}__v"))
    }
    val uniqAggs =
      if (uniqueKey.isEmpty) Nil
      else Seq((count(lit(1)) - count_distinct(struct(uniqueKey.map(col): _*)))
        .as("__uniq_v"))
    val allAggs = predAggs ++ uniqAggs
    val agged = df.agg(count(lit(1)).as("__n"), allAggs: _*)
    val rows =
      checks.map { case (nm, _) => (nm, col(s"${nm}__v")) } ++
        (if (uniqueKey.isEmpty) Nil
         else Seq((s"unique(${uniqueKey.mkString(",")})", col("__uniq_v"))))
    agged
      .select(explode(array(rows.map { case (nm, v) => struct(
        lit(nm).as("expectation"),
        col("__n").as("n_rows"),
        v.as("n_violations"),
        (v === 0L).cast("int").as("pass")) }: _*)).as("_e"))
      .select("_e.*")
      .orderBy("expectation")
  }
}
