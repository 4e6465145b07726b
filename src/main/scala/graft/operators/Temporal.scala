package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Temporal joins over event tables — the time-series companion to the
  * spatial joins in [[Nearest]].
  *
  * `asOfJoin` implements pandas-`merge_asof` semantics (backward search:
  * each left row is matched to the most recent right row at-or-before its
  * timestamp with the same key) as a **union + fill-forward window**
  * rather than a range join:
  *
  *   1. the right side is reduced to one row per (key, ts) — the row with
  *      the largest tiebreak (`max_by`) — a hash aggregate with map-side
  *      combine;
  *   2. both sides are unioned with a side tag (right=0, left=1) so that at
  *      equal timestamps the right row sorts *before* the left row
  *      ("at-or-before" includes ties);
  *   3. one window partitioned by key, ordered by (ts, side), carries the
  *      last non-null right payload forward (`last(..., ignoreNulls)` over
  *      an unbounded-preceding frame);
  *   4. left rows are kept, right rows dropped.
  *
  * 100 TB design: exactly one wide shuffle on the key column (the window);
  * the right-side dedup is a combiner-friendly aggregate on (key, ts). A
  * range join (`l.ts >= r.ts`) would expand to O(|L|·|R| per key) before
  * filtering; the fill-forward form is linear in |L|+|R| and streams
  * through the window operator with no per-key state beyond one row. Skewed
  * keys (one user with millions of events) sort within a single partition —
  * the same bound as any keyed window; salt upstream if a single key
  * exceeds a partition.
  */
object Temporal {

  /** Backward as-of join.
    *
    * @param left       probe rows (keep all of `leftCols`)
    * @param right      reference rows to search backward over
    * @param keyCol     equality key present on both sides
    * @param tsCol      numeric/timestamp ordering column on both sides
    * @param payloadCol right-side value column to attach
    * @param orderCol   right-side tiebreak: among right rows sharing
    *                   (key, ts), the one with the largest `orderCol` wins
    * @param leftCols   left columns to carry through, in output order
    * @return `leftCols` plus `r_ts` (matched right timestamp) and
    *         `r_<payloadCol>`; both null when no right row precedes.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, payloadCol: String, orderCol: String,
      leftCols: Seq[String]): DataFrame = {
    val rPay = s"r_$payloadCol"
    // One survivor per (key, ts): max_by is deterministic because orderCol
    // is a unique id by contract.
    val r1 = right.groupBy(col(keyCol), col(tsCol))
      .agg(expr(s"max_by($payloadCol, $orderCol)").as(rPay))
      .select(col(keyCol), col(tsCol), lit(0).as("_side"),
        col(tsCol).as("r_ts"), col(rPay))
    val lTagged = left.select(
      (Seq(col(keyCol), col(tsCol), lit(1).as("_side"),
        lit(null).cast(r1.schema("r_ts").dataType).as("r_ts"),
        lit(null).cast(r1.schema(rPay).dataType).as(rPay)) ++
        leftCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => col(c))): _*)
    val r2 = leftCols.filterNot(c => c == keyCol || c == tsCol)
      .foldLeft(r1)((df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType)))
      .select(lTagged.columns.map(col): _*)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(r2)
      .withColumn("r_ts", last(col("r_ts"), ignoreNulls = true).over(w))
      .withColumn(rPay, last(col(rPay), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select((leftCols.map(col) :+ col("r_ts") :+ col(rPay)): _*)
  }

  /** Bounded-window temporal join (the batch form of a stream-stream
    * interval join): every (point, ref) pair with the same key and
    * `point.ts - window <= ref.ts <= point.ts` — e.g. clicks within an
    * attribution window before each purchase.
    *
    * A raw `BETWEEN` range join is O(|P|·|R|) per key on engines without
    * an interval-join operator (Spark plans it as a broadcast
    * nested-loop or a per-key cartesian). Instead both sides are binned
    * by `ts div window`: a ref at-or-before a point within `window` can
    * only live in the point's bin or the one below, so the point side
    * explodes to exactly TWO candidate bins and the join is a plain
    * equi-join on (key, bin) followed by the range filter.
    *
    * 100 TB design: one hash-partitioned shuffle on (key, bin) — the
    * time axis spreads each key over many bins, so a hot key does NOT
    * collapse onto one task the way a key-only join would; candidate
    * fan-out is bounded by per-bin density (data rate × window), not by
    * table sizes. Output columns: `pointCols` plus `r_ts` and
    * `r_<payloadCol>`, one row per matching pair (inner semantics —
    * points with no refs in the window emit nothing).
    */
  def intervalJoin(points: DataFrame, refs: DataFrame, keyCol: String,
      tsCol: String, window: Long, payloadCol: String,
      pointCols: Seq[String]): DataFrame = {
    require(window > 0, "window must be positive")
    val rPay = s"r_$payloadCol"
    val p = points
      .select(pointCols.map(col) :+
        expr(s"$tsCol div ${window}L").as("_pb"): _*)
      .withColumn("_bin", explode(array(col("_pb") - 1, col("_pb"))))
    val r = refs.select(
      col(keyCol).as("_rk"),
      col(tsCol).as("r_ts"),
      col(payloadCol).as(rPay),
      expr(s"$tsCol div ${window}L").as("_bin"))
    p.join(r, p("_bin") === r("_bin") && col(keyCol) === col("_rk"))
      .filter(col("r_ts") >= col(tsCol) - window && col("r_ts") <= col(tsCol))
      .select(pointCols.map(col) :+ col("r_ts") :+ col(rPay): _*)
  }

  /** Regularize an event stream onto a fixed-interval grid with
    * forward-fill — pandas `resample().ffill()` for event tables, the
    * feature-store materialization step. Each key gets one grid row per
    * `interval` tick spanning [min ts, max ts]; the attached value is the
    * most recent event at-or-before the tick ([[asOfJoin]] semantics;
    * ticks before the first event fill null).
    *
    * 100 TB design: the grid derives from a per-key min/max aggregate
    * (map-side combined) and explodes to span/interval rows per key —
    * output-proportional, not input-proportional; the fill is the as-of
    * join's single keyed window. No range join, no per-tick state. */
  def resampleFill(
      events: DataFrame,
      interval: Long,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(interval > 0, "interval must be positive")
    val grid = events.groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("_t0"), max(col(tsCol)).as("_t1"))
      .select(col(keyCol),
        explode(sequence(expr(s"_t0 div ${interval}L"), expr(s"_t1 div ${interval}L"))).as("_b"))
      .select(col(keyCol), (col("_b") * interval).as(tsCol))
    asOfJoin(grid, events.select(col(keyCol), col(tsCol), col(valCol), col(idCol)),
        keyCol, tsCol, valCol, idCol, Seq(keyCol, tsCol))
      .withColumnRenamed(tsCol, "grid_ts")
  }

  /** Ordered funnel analysis: for each key, the reach time of every step,
    * where step i's reach time is the EARLIEST event of that type
    * at-or-after step i-1's reach time (the standard unordered-window
    * funnel definition; a step never reached leaves this and all later
    * steps null).
    *
    * Shape: one conditional min-aggregate per step, each joined back on
    * the key — the step table is #keys rows (broadcast), so the event
    * table is scanned `steps.size` times but never shuffled beyond the
    * per-step key aggregate (map-side combined). Timestamps are exact
    * integers throughout. */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      keyCol: String = "user_id",
      tsCol: String = "tus",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val t0 = events.groupBy(col(keyCol))
      .agg(min(when(col(typeCol) === steps.head, col(tsCol))).as("t0"))
    steps.zipWithIndex.drop(1).foldLeft(t0) { case (acc, (step, i)) =>
      val prevCols = (0 until i).map(j => s"t$j")
      val aggCols = prevCols.map(c => min(col(c)).as(c)) :+
        min(when(col(typeCol) === step &&
          col(s"t${i - 1}").isNotNull && col(tsCol) >= col(s"t${i - 1}"),
          col(tsCol))).as(s"t$i")
      events.join(broadcast(acc), Seq(keyCol))
        .groupBy(col(keyCol))
        .agg(aggCols.head, aggCols.tail: _*)
    }
  }

  /** Cohort retention: keys are grouped by the period of their FIRST
    * event (the cohort); for each (cohort, period-offset) the number of
    * keys active in that period and the retention fraction of the
    * cohort. The product-analytics retention triangle.
    *
    * Shape: one (key → first period) aggregate, one distinct over
    * (key, period), a broadcast cohort-size join — everything map-side
    * combined; counts exact, retention one long/long division. */
  def cohortRetention(
      events: DataFrame,
      period: Long,
      keyCol: String = "user_id",
      tsCol: String = "tus"): DataFrame = {
    require(period > 0, "period must be positive")
    // integer div, not double /: a double quotient can round UP across an
    // integer boundary before the cast truncates, off-by-one vs the
    // oracle's exact BIGINT //
    val p = expr(s"$tsCol div ${period}L")
    val firsts = events.groupBy(col(keyCol)).agg(min(p).as("cohort"))
    val active = events.select(col(keyCol), p.as("_p")).distinct()
    val sizes = firsts.groupBy("cohort").agg(count(lit(1)).as("n_cohort"))
    active.join(firsts, Seq(keyCol))
      .groupBy(col("cohort"), (col("_p") - col("cohort")).as("offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("cohort"))
      .withColumn("retention", col("n_active").cast("double") / col("n_cohort"))
      .select("cohort", "offset", "n_cohort", "n_active", "retention")
  }

  /** Per-key decayed-history features + spike flag — the time-series
    * feature-engineering stage (fraud/anomaly gates, activity scores) of
    * an event pipeline.
    *
    * For each event (ordered by `tsCol`, tie-broken by `idCol`) the k
    * previous values of the same key are folded with half-life weights:
    * `decayed = l1/1 + l2/2 + ... + lk/2^(k-1)` (most recent first).
    * `ewma = decayed / wsum` where `wsum = 2 - 2^(1-n)` normalizes over
    * the n <= k lags that exist; `spike = 1` when the current value
    * exceeds twice the decayed mean.
    *
    * Exactness: a BOUNDED lag pivot, not a running recursion — divisions
    * are by powers of two (exact in IEEE double), terms are added in a
    * fixed textual order, `wsum` is a short exact literal per n, and the
    * spike gate compares `value * wsum > 2 * decayed` (one rounding per
    * side, identical on every engine) — so the whole feature row is
    * bit-reproducible by the SQL oracle with no ROUND anywhere.
    *
    * 100 TB design: exactly one shuffle, keyed by `keyCol` (the lag
    * window); per-row state is k lag slots. A skewed key sorts within one
    * partition — the same bound as sessionization; the time axis can be
    * range-split upstream if one key exceeds a partition. */
  def decayedHistory(
      events: DataFrame,
      k: Int = 8,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(k >= 1 && k <= 52, "k must be in [1, 52] (exact power-of-two weights)")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val lagged = events.select(
      Seq(col(idCol), col(keyCol), col(tsCol), col(valCol)) ++
        (1 to k).map(i => lag(col(valCol), i).over(w).as(s"_l$i")): _*)
    val decayed = (1 to k)
      .map(i => coalesce(col(s"_l$i"), lit(0.0)) / lit(math.pow(2.0, i - 1)))
      .reduceLeft(_ + _)
    val nHist = (1 to k)
      .map(i => when(col(s"_l$i").isNull, 0L).otherwise(1L))
      .reduceLeft(_ + _)
    // wsum literals 1.0, 1.5, 1.75, ... are exact dyadic doubles.
    val wsum = (1 to k).foldLeft(lit(null).cast("double"): org.apache.spark.sql.Column) {
      (acc, n) => when(col("n_hist") === n, lit(2.0 - math.pow(0.5, n - 1))).otherwise(acc)
    }
    lagged
      .withColumn("decayed", decayed)
      .withColumn("n_hist", nHist)
      .withColumn("_wsum", wsum)
      .withColumn("ewma", col("decayed") / col("_wsum"))
      .withColumn("spike",
        when(col("n_hist") > 0 &&
          col(valCol) * col("_wsum") > lit(2.0) * col("decayed"), 1L).otherwise(0L))
      .select(col(idCol), col(keyCol), col(tsCol), col(valCol),
        col("n_hist"), col("decayed"), col("ewma"), col("spike"))
  }

  /** OHLC bar downsampling: one row per (series, bar) with the bar's
    * open/high/low/close values, event count, and decimal-exact value sum
    * — the candlestick/metrics-rollup materialization of an event stream.
    *
    * Open/close are `min_by`/`max_by` with a (ts, id) struct ordering —
    * selections, not arithmetic, so they are engine-exact; the tiebreak
    * id makes same-timestamp bars deterministic. The whole operator is
    * ONE hash aggregate with map-side combine: shuffle volume is bounded
    * by #bars (series × time-buckets), never by input rows, and a hot
    * series spreads over its time axis — this is the shape that holds on
    * an unbounded event log at 100 TB (and the stateful-aggregation twin
    * in a stream). */
  def ohlcBars(
      events: DataFrame,
      interval: Long,
      seriesCol: String = "event_type",
      tsCol: String = "tus",
      valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(interval > 0, "interval must be positive")
    val dec = DecimalType(18, 2)
    events
      .groupBy(col(seriesCol), expr(s"$tsCol div ${interval}L").as("_bar"))
      .agg(
        expr(s"min_by($valCol, struct($tsCol, $idCol))").as("open"),
        max(col(valCol)).as("high"),
        min(col(valCol)).as("low"),
        expr(s"max_by($valCol, struct($tsCol, $idCol))").as("close"),
        count(lit(1)).as("n_events"),
        sum(col(valCol).cast(dec)).cast("double").as("sum_v"))
      .withColumn("bar_ts", col("_bar") * interval)
      .select(col(seriesCol), col("bar_ts"), col("open"), col("high"),
        col("low"), col("close"), col("n_events"), col("sum_v"))
  }

  /** Time-weighted average (TWAP): per key, each value is weighted by how
    * long it was "current" — Σ value_i · (ts_{i+1} − ts_i) / (ts_n − ts_1)
    * over events ordered by (ts, id); the last event carries no duration.
    * The standard price/metric summary that plain AVG gets wrong on
    * irregular sampling.
    *
    * Exactness: values become integer CENTS through a DECIMAL cast
    * (exact), each cents·µs product and their sum stay in wide integer
    * decimal (never a float running sum), and ONE division by the
    * likewise-exact `span·100` happens at the end — the scale-2
    * decimal→double conversion some engines do in two roundings never
    * appears. Keys with zero span (a single event) emit a null twap.
    *
    * 100 TB design: one keyed shuffle (the lead window) feeding one hash
    * aggregate — same bound as sessionization. */
  def twap(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val dec = DecimalType(18, 2)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    events
      .withColumn("_vc", (col(valCol).cast(dec) * 100).cast("long"))
      .withColumn("_dt", lead(col(tsCol), 1).over(w) - col(tsCol))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        (max(col(tsCol)) - min(col(tsCol))).as("span"),
        sum(col("_vc").cast(DecimalType(38, 0)) * col("_dt")).as("_num"))
      .withColumn("twap",
        when(col("span") > 0,
          col("_num").cast("double") / (col("span") * 100).cast("double")))
      .select(col(keyCol), col("n_events"), col("span"), col("twap"))
  }

  /** Exact rolling median of the last `k` values (current row inclusive)
    * per key — the robust smoother a z-score/spike gate wants upstream.
    *
    * Values are converted to micro-integer cents through DECIMAL first
    * (exact), the window collects the ≤k-slot frame into a sorted array,
    * and the median interpolates the two middle INTEGERS — `(a+b)/2` on
    * integers below 2^52 is IEEE-exact, so the result is bit-identical on
    * any engine (the usual float-median interpolation ambiguity never
    * appears). One keyed shuffle; O(k) state per row. */
  def rollingMedian(
      events: DataFrame,
      k: Int = 10,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      valCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    require(k >= 1, "k must be positive")
    val dec = DecimalType(18, 2)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
      .rowsBetween(-(k - 1), Window.currentRow)
    events
      .withColumn("_vc", (col(valCol).cast(dec) * 100).cast("long"))
      .withColumn("_fr", sort_array(collect_list(col("_vc")).over(w)))
      .withColumn("_n", size(col("_fr")))
      // element_at is 1-based; for odd n both picks are the middle element
      .withColumn("roll_med",
        (element_at(col("_fr"), ((col("_n") + 1) / 2).cast("int")).cast("double") +
          element_at(col("_fr"), (col("_n") / 2 + 1).cast("int")).cast("double")) / 2.0 / 100.0)
      .select(col(idCol), col(keyCol), col(tsCol), col(valCol),
        col("_n").cast("long").as("n_window"), col("roll_med"))
  }

  /** Point-in-time state reconstruction: the latest value per key
    * at-or-before `t` — the event-sourcing "table as of T"
    * materialization (backfills, reproducible training snapshots).
    * One filtered scan (the `tsCol <= t` predicate pushes into the
    * Parquet scan) into one hash aggregate; `max_by` on a (ts, id)
    * struct makes same-timestamp updates deterministic. */
  def stateAt(
      events: DataFrame,
      t: Long,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      valCol: String = "value",
      idCol: String = "event_id"): DataFrame =
    events.filter(col(tsCol) <= t)
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_events"),
        max(col(tsCol)).as("last_ts"),
        expr(s"max_by($valCol, struct($tsCol, $idCol))").as("last_value"))

  /** Multi-touch linear attribution: every conversion's credit is split
    * EQUALLY across the touches in its lookback window. Credits are
    * micro-integers (`1_000_000 div n_touches`) so any downstream
    * aggregation (per channel, per hour, per campaign) is associative
    * integer addition — the float 1/n credits that make attribution
    * reports partition-order-dependent never exist.
    *
    * Built on [[intervalJoin]] (binned equi-join, never a nested-loop
    * range join); the per-conversion touch count rides a window over the
    * PAIR table. Returns one row per (conversion, touch). */
  def linearAttribution(
      conversions: DataFrame,
      touches: DataFrame,
      keyCol: String,
      tsCol: String,
      window: Long,
      idCol: String = "event_id"): DataFrame = {
    val pairs = intervalJoin(conversions, touches, keyCol, tsCol, window,
      payloadCol = idCol, pointCols = Seq(idCol, keyCol, tsCol))
    pairs
      .withColumn("n_touches",
        count(lit(1)).over(Window.partitionBy(col(idCol))))
      .withColumn("credit_micro", expr("1000000L div n_touches"))
      .select(col(idCol).as("conv_id"), col(keyCol), col(tsCol).as("conv_ts"),
        col("r_ts").as("touch_ts"), col(s"r_$idCol").as("touch_id"),
        col("n_touches"), col("credit_micro"))
  }

  /** Top-k session paths: the first `maxLen` event types of each
    * session (gap-based, [[q60]]-compatible) joined into a path string,
    * counted corpus-wide — the product-analytics "what do users do"
    * report. One keyed window (session assignment), one per-session
    * aggregate whose ordered path is built ROW-LOCALLY from a sorted
    * struct array (no order-sensitive string_agg), one path count. */
  def topPaths(
      events: DataFrame,
      gap: Long,
      maxLen: Int = 5,
      k: Int = 20,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val isNew = when(
      lag(col(tsCol), 1).over(w).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(w) > gap, 1L).otherwise(0L)
    events
      .withColumn("_sess", sum(isNew).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("_sess"))
      .agg(collect_list(struct(col(tsCol).as("t"), col(idCol).as("i"),
        col(typeCol).as("e"))).as("_evs"))
      .withColumn("path",
        expr(s"array_join(transform(slice(array_sort(_evs), 1, $maxLen), s -> s.e), '>')"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
  }

  /** Per-key inter-arrival statistics + burstiness — the bot/automation
    * signature: human activity is bursty (B → 1), scripted traffic is
    * periodic (B → −1), Poisson traffic sits at 0
    * (Goh & Barabási 2008, B = (σ−µ)/(σ+µ)).
    *
    * Gaps are exact integer µs from one lag window; moments ride wide
    * DECIMAL, so mean (one division), variance ((nΣg²−(Σg)²)/n² — exact
    * integer numerator), σ (IEEE-exact sqrt) and B are engine-
    * bit-identical. One keyed shuffle, O(1) state per row. */
  def interArrival(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      idCol: String = "event_id"): DataFrame = {
    val dec = DecimalType(38, 0)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val gaps = events
      .withColumn("_gap", col(tsCol) - lag(col(tsCol), 1).over(w))
      .filter(col("_gap").isNotNull)
    gaps.groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_gaps"),
        sum(col("_gap").cast(dec)).as("_sg"),
        sum(col("_gap").cast(dec) * col("_gap")).as("_sgg"))
      .withColumn("mean_gap", col("_sg").cast("double") / col("n_gaps"))
      .withColumn("_var",
        (col("n_gaps").cast(dec) * col("_sgg") - col("_sg") * col("_sg")).cast("double") /
          (col("n_gaps").cast("double") * col("n_gaps").cast("double")))
      .withColumn("sd_gap", sqrt(col("_var")))
      .withColumn("burstiness",
        when(col("n_gaps") >= 2 && (col("sd_gap") + col("mean_gap")) > 0,
          (col("sd_gap") - col("mean_gap")) / (col("sd_gap") + col("mean_gap"))))
      .select(col(keyCol), col("n_gaps"), col("mean_gap"), col("sd_gap"), col("burstiness"))
  }

  /** Rolling active-entity counts: for each observed period, the number
    * of distinct keys active IN the period (DAU-style) and in the
    * trailing `windowPeriods`-period window ending there (WAU/MAU-style),
    * plus their ratio (stickiness) — the standard engagement rollup.
    *
    * Shape: ONE distinct over (key, period) — the only input-sized
    * shuffle — then a bounded explode of each activity row over the
    * `windowPeriods` report periods it can serve, and a count-distinct
    * per report period (period count is calendar-bounded, so the final
    * aggregate is tiny). Never a self-join of the event log against
    * itself, never per-row window state over raw events. Counts exact;
    * stickiness one long/long division. Report periods are restricted to
    * periods that actually occur (no trailing phantom windows). */
  def rollingActive(
      events: DataFrame,
      period: Long,
      windowPeriods: Int = 7,
      keyCol: String = "user_id",
      tsCol: String = "tus"): DataFrame = {
    require(period > 0 && windowPeriods >= 1, "bad window")
    val du = events
      .select(col(keyCol), expr(s"$tsCol div ${period}L").as("_day"))
      .distinct()
    val days = du.select(col("_day").as("report_period")).distinct()
    du.withColumn("report_period",
        explode(sequence(col("_day"), col("_day") + (windowPeriods - 1))))
      .join(days, "report_period") // keep only observed periods
      .groupBy("report_period")
      .agg(
        count_distinct(when(col("_day") === col("report_period"), col(keyCol)))
          .as("active_now"),
        count_distinct(col(keyCol)).as("active_window"))
      .withColumn("stickiness",
        col("active_now").cast("double") / col("active_window"))
  }

  /** Markov transition matrix of event types within sessions: counts of
    * (from_type → to_type) steps between CONSECUTIVE events of a key no
    * further than `gap` apart, plus the row-normalized transition
    * probability — the path-mining summary behind next-event prediction
    * and funnel discovery.
    *
    * Counts are exact integers; each probability is one long/long
    * division. Shape: one keyed lag window, one (from, to) hash
    * aggregate, and the row totals ride a window over the TRANSITION
    * MATRIX (#types² rows), never over the event log. */
  def transitionMatrix(
      events: DataFrame,
      gap: Long,
      keyCol: String = "user_id",
      tsCol: String = "tus",
      typeCol: String = "event_type",
      idCol: String = "event_id"): DataFrame = {
    require(gap > 0, "gap must be positive")
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(idCol))
    val steps = events
      .withColumn("_pt", lag(col(typeCol), 1).over(w))
      .withColumn("_pts", lag(col(tsCol), 1).over(w))
      .filter(col("_pt").isNotNull && col(tsCol) - col("_pts") <= gap)
    val m = steps.groupBy(col("_pt").as("from_type"), col(typeCol).as("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("row_total",
        sum(col("n")).over(Window.partitionBy(col("from_type"))))
      .withColumn("p", col("n").cast("double") / col("row_total"))
      .select("from_type", "to_type", "n", "row_total", "p")
  }

  /** CUSUM upward-shift detector (Page 1954) over a per-key daily series,
    * entirely in INTEGER micro-units — bit-exact on any engine.
    *
    * The sequential recurrence S_t = max(0, S_{t-1} + x_t − ref − slack)
    * looks inherently serial, but resets-at-zero have the closed form
    * S_t = P_t − min(0, min_{j≤t} P_j) where P is the prefix sum of the
    * drifts — i.e. TWO stock window functions (running sum + running
    * min), no recursion, no driver loop. `ref` is the per-key integer
    * mean of the daily sums (one div), `slack = ref div 20` (the
    * classic k≈σ/2 allowance), and the alarm fires when S_t exceeds
    * `4·ref` (h≈4σ in micro-units).
    *
    * Scale shape: one hash aggregate to (key, day) — map-side combined,
    * the daily table is O(keys × days) regardless of event volume — then
    * two windows partitioned by key over that SMALL table. Nothing
    * touches the raw log twice. */
  def cusum(
      events: DataFrame,
      keyCol: String = "event_type",
      dayCol: String = "day",
      valueCol: String = "value"): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), col(dayCol))
      .agg(sum(col(valueCol).cast(DecimalType(18, 6)) * 1000000).cast("long").as("day_micro"))
    val wk = Window.partitionBy(keyCol)
    val wOrd = Window.partitionBy(keyCol).orderBy(dayCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("_tot", sum("day_micro").over(wk))
      .withColumn("_nd", count(lit(1)).over(wk))
      // integer `div`, not double `/`: a double quotient cast to long can
      // disagree with the oracle's `//` at near-integer boundaries
      .withColumn("ref", expr("_tot div _nd"))
      .withColumn("drift", col("day_micro") - col("ref") - expr("ref div 20"))
      .withColumn("p", sum("drift").over(wOrd))
      .withColumn("runmin", least(lit(0L), min("p").over(wOrd)))
      .withColumn("s_t", col("p") - col("runmin"))
      .withColumn("alarm", (col("s_t") > col("ref") * 4).cast("int"))
      .select(keyCol, dayCol, "day_micro", "ref", "s_t", "alarm")
  }

  /** Autocorrelation function of a per-key daily series at lags 1..maxLag,
    * EXACT up to the final division: with S = Σx and n the series length,
    * the mean-centered residual n·x_t − S is an INTEGER, so both the lag
    * products Σ d_t·d_{t−L} and the variance Σ d_t² accumulate exactly in
    * DECIMAL(38,0) (the oracle's HUGEINT twin) — r_L is then one
    * double/double division of identically-rounded operands. The n² and
    * n·S cross terms cancel in the ratio, so no rational arithmetic ever
    * materializes.
    *
    * Scale shape: the daily table is O(keys × days); lags are `lag()`
    * columns over ONE keyed window, folded by one aggregate — the raw
    * event log is never touched after the first daily rollup. */
  def acf(
      daily: DataFrame,
      keyCol: String = "event_type",
      dayCol: String = "day",
      valCol: String = "x",
      maxLag: Int = 7): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val wk = Window.partitionBy(keyCol)
    val w = Window.partitionBy(keyCol).orderBy(dayCol)
    val base = daily
      .withColumn("_n", count(lit(1)).over(wk))
      .withColumn("_s", sum(valCol).over(wk))
      .withColumn("_d", (col("_n") * col(valCol) - col("_s")).cast(dec38))
    val lagged = base.select(
      col(keyCol) +: col("_d") +:
        (1 to maxLag).map(l => lag(col("_d"), l).over(w).as(s"_d$l")): _*)
    val aggs = sum(col("_d") * col("_d")).as("den") +:
      (1 to maxLag).flatMap(l => Seq(
        sum(col("_d") * col(s"_d$l")).as(s"num$l"),
        count(col(s"_d$l")).as(s"np$l")))
    val g = lagged.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
    val stackArgs = (1 to maxLag)
      .map(l => s"$l, num$l, np$l").mkString(", ")
    g.selectExpr(keyCol, "den",
        s"stack($maxLag, $stackArgs) AS (lag_k, num, n_pairs)")
      // DECIMAL(38,0)→double and HUGEINT→double disagree in the last ulp
      // on some engines; round-6 the statistic like every transcendental
      .withColumn("acf", round(col("num").cast("double") / col("den").cast("double"), 6))
      .select(keyCol, "lag_k", "n_pairs", "acf")
      .orderBy(keyCol, "lag_k")
  }

  /** Trailing-window Pearson correlation between two aligned integer
    * series (e.g. daily cent totals of two event types): all moments
    * accumulate in DECIMAL(38,0) windows — EXACT at any magnitude — and
    * r is assembled from them per row, n·Σxy−ΣxΣy over
    * √(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²), rounded to 6 (the wide-cast ulp
    * rule). Degenerate windows (either variance 0, or n<2) yield null
    * via an exact decimal compare.
    *
    * The window is global-ordered over the DAILY table (#days rows —
    * model-sized); a per-key variant would partition by the key. */
  def rollingCorr(
      daily: DataFrame,
      xCol: String,
      yCol: String,
      dayCol: String = "day",
      window: Int = 7): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val w = Window.orderBy(dayCol).rowsBetween(-(window - 1), Window.currentRow)
    val x = col(xCol).cast(dec38)
    val y = col(yCol).cast(dec38)
    val withM = daily
      .withColumn("_n", count(lit(1)).over(w).cast(dec38))
      .withColumn("_sx", sum(x).over(w))
      .withColumn("_sy", sum(y).over(w))
      .withColumn("_sxx", sum(x * x).over(w))
      .withColumn("_syy", sum(y * y).over(w))
      .withColumn("_sxy", sum(x * y).over(w))
      .withColumn("_a", col("_n") * col("_sxx") - col("_sx") * col("_sx"))
      .withColumn("_b", col("_n") * col("_syy") - col("_sy") * col("_sy"))
      .withColumn("_num", col("_n") * col("_sxy") - col("_sx") * col("_sy"))
    withM
      .withColumn("n_days", col("_n").cast("long"))
      .withColumn("r",
        when(col("_a") > 0 && col("_b") > 0,
          round(col("_num").cast("double") /
            (sqrt(col("_a").cast("double")) * sqrt(col("_b").cast("double"))), 6)))
      .select(dayCol, xCol, yCol, "n_days", "r")
      .orderBy(dayCol)
  }

  /** Activity streaks (gaps-and-islands): per user, the count of active
    * days, number of maximal consecutive-day runs, the longest run, and
    * the last active day. The island id is the classic
    * `day − row_number()` constant — consecutive days share it.
    *
    * Exact integers end-to-end. Scale shape: distinct (user, day) — a
    * hash aggregate bounded by users×days, NOT event volume — one keyed
    * window for row_number, then two keyed aggregates over tables that
    * only shrink. */
  def streaks(
      events: DataFrame,
      userCol: String = "user_id",
      dayCol: String = "day"): DataFrame = {
    val active = events.select(col(userCol), col(dayCol)).distinct()
    val w = Window.partitionBy(userCol).orderBy(dayCol)
    val islands = active
      .withColumn("grp", col(dayCol) - row_number().over(w))
      .groupBy(col(userCol), col("grp"))
      .agg(count(lit(1)).as("len"), max(dayCol).as("grp_end"))
    islands
      .groupBy(col(userCol))
      .agg(
        sum("len").as("n_active_days"),
        count(lit(1)).as("n_streaks"),
        max("len").as("longest_streak"),
        max("grp_end").as("last_day"))
      .orderBy(userCol)
  }

  /** Merge overlapping/touching intervals per key (calendar coverage,
    * downtime union, ad-break consolidation): the classic sweep — sort
    * by start, a new island begins where start exceeds the running max
    * of all previous ends (end-exclusive, so touching intervals merge),
    * island id = running sum of the flags, one grouped aggregate emits
    * the merged spans with how many raw intervals each collapsed.
    *
    * Exact integers end-to-end; ties on start are order-insensitive (an
    * equal-start row can never open a new island past a preceding twin).
    * Scale shape: one key-partitioned shuffle, two keyed windows, one
    * keyed aggregate — nothing global, same chassis as sessionization. */
  def mergeIntervals(
      intervals: DataFrame,
      keyCol: String = "user_id",
      startCol: String = "s",
      endCol: String = "e",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(startCol), col(endCol), col(tieCol))
    intervals
      .withColumn("_pmax", max(endCol).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("_new",
        when(col("_pmax").isNull || col(startCol) > col("_pmax"), 1L).otherwise(0L))
      .withColumn("island", sum("_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("island"))
      .agg(min(startCol).as("start"), max(endCol).as("end"),
        count(lit(1)).as("n_merged"))
      .withColumn("span", col("end") - col("start"))
      .select(keyCol, "island", "start", "end", "span", "n_merged")
  }

  /** Funnel abandonment — the temporal ANTI-join: `fromType` events with
    * no `toType` event from the same user STRICTLY after them within
    * `windowUs`. One keyed RANGE window (frame [+1, +window] on the µs
    * value) computes the conditional next-conversion time for every
    * event in a single pass — no join, no second scan — and the flag is
    * its null-ness. The oracle states the same predicate independently
    * as NOT EXISTS.
    *
    * Exact integers; value-framed RANGE makes equal-timestamp events
    * unambiguous (strictly-after means tus+1 onward). Scale shape: one
    * user-keyed shuffle, one window — the sessionization chassis. */
  def abandonment(
      events: DataFrame,
      fromType: String,
      toType: String,
      windowUs: Long,
      userCol: String = "user_id",
      tsCol: String = "tus",
      tieCol: String = "event_id",
      typeCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol).cast("long"))
      .rangeBetween(1L, windowUs)
    events
      .withColumn("next_conv_us",
        min(when(col(typeCol) === toType, col(tsCol))).over(w))
      .filter(col(typeCol) === fromType)
      .withColumn("abandoned", col("next_conv_us").isNull.cast("int"))
      .select(userCol, tieCol, tsCol, "next_conv_us", "abandoned")
  }

  /** FIFO matching (inventory cost-basis, lot allocation, trade
    * netting): allocate each issue to receipts in arrival order. The
    * declarative closed form: with per-key cumulative quantities, receipt
    * i covers the half-open range [B_{i−1}, B_i) of the key's running
    * total and issue j covers [S_{j−1}, S_j); FIFO allocates exactly the
    * OVERLAP of those ranges — so the whole sequential hand-off becomes
    * one interval-intersection join:
    *   matched(i, j) = min(B_i, S_j) − max(B_{i−1}, S_{j−1})  where > 0.
    *
    * Output size is inherently LINEAR (≤ n_receipts + n_issues − 1 pairs
    * per key — each pair ends at a boundary of one side). The join
    * enumerates per-key candidate pairs before the range filter — fine
    * while per-key line counts are bounded (the common shape); at
    * extreme per-key depth, band-bucket the cumulative axis and join on
    * (key, bucket) like the winnow/segment ops. Integer quantities
    * in, exact integers out. */
  def fifoMatch(
      receipts: DataFrame,
      issues: DataFrame,
      keyCol: String = "key",
      qtyCol: String = "qty",
      ordCol: String = "ord",
      idCol: String = "id"): DataFrame = {
    def ranges(df: DataFrame, side: String): DataFrame = {
      val w = Window.partitionBy(keyCol).orderBy(col(ordCol), col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      df.withColumn("_hi", sum(qtyCol).over(w))
        .withColumn("_lo", col("_hi") - col(qtyCol))
        .select(col(keyCol), col(idCol).as(s"${side}_id"),
          col("_lo").as(s"${side}_lo"), col("_hi").as(s"${side}_hi"))
    }
    ranges(receipts, "rcpt")
      .join(ranges(issues, "issue"), Seq(keyCol))
      .filter(col("rcpt_lo") < col("issue_hi") && col("issue_lo") < col("rcpt_hi"))
      .select(col(keyCol), col("rcpt_id"), col("issue_id"),
        (least(col("rcpt_hi"), col("issue_hi")) -
          greatest(col("rcpt_lo"), col("issue_lo"))).as("matched_qty"))
  }

  /** Per-key exponentially-weighted moving average (α = 1/2), EXACT: the
    * truncated EWMA over the last `window` observations is a DYADIC
    * rational — v_m/2 + v_{m−1}/4 + … with the two oldest terms sharing
    * the residual weight so weights sum to exactly 1 — so scaling by
    * 2^(m−1) makes the numerator an INTEGER:
    *   N = v_1 + Σ_{j=2..m} v_j·2^(j−2),   ewma = N / 2^(m−1).
    * Values are micro-quantized (decimal ×1e6, the cusum/acf recipe), the
    * weighted sum is an indexed `transform` + integer fold — at |v| ≤
    * 490·1e6 < 2^29 and window 32, N < 2^61, inside BIGINT — and the
    * final division is by a power of two: an exact exponent shift, so
    * the ONLY rounding is the BIGINT→double conversion, identical on
    * every engine.
    *
    * Scale shape: one keyed window collects the ≤window-element array
    * (bounded state per row), the fold is codegen'd per row — a single
    * user-keyed shuffle, same as sessionization. */
  def ewmaDyadic(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      valueCol: String = "value",
      window: Int = 32): DataFrame = {
    require(window >= 1 && window <= 32, s"dyadic window $window exceeds the 2^61 integer budget")
    // |N| ≤ max|v_micro| · 2^(window−1) (the weights sum to 2^(window−1)), so
    // keeping |v_micro| < 2^(62−(window−1)) bounds the numerator inside BIGINT.
    // Enforced per row INSIDE the v_micro projection (not a separate
    // assert_true column, which column pruning could silently drop).
    val microBudget = 1L << (62 - (window - 1))
    val w = Window.partitionBy(keyCol).orderBy(tsCol, tieCol)
      .rowsBetween(-(window - 1), Window.currentRow)
    events
      .withColumn("v_micro", expr(
        s"""CASE WHEN abs(cast(cast($valueCol as decimal(18,6)) * 1000000 as bigint)) < ${microBudget}L
           |THEN cast(cast($valueCol as decimal(18,6)) * 1000000 as bigint)
           |ELSE raise_error(concat('ewmaDyadic: |', cast($valueCol as string),
           |  '| exceeds the dyadic 2^61 integer budget for window=$window'))
           |END""".stripMargin))
      .withColumn("_arr", collect_list("v_micro").over(w))
      .withColumn("n_window", size(col("_arr")).cast("long"))
      // weights oldest→newest: 1, 1, 2, 4, … = 2^max(i−1, 0) at 0-based i
      .withColumn("_num", expr(
        """aggregate(
             transform(_arr, (x, i) -> x * shiftleft(cast(1 as bigint), greatest(i - 1, 0))),
             cast(0 as bigint), (a, x) -> a + x)"""))
      .withColumn("ewma",
        col("_num").cast("double") /
          expr("cast(shiftleft(cast(1 as bigint), cast(n_window - 1 as int)) as double)") / 1e6)
      .select(col(keyCol), col(tieCol), col("v_micro"), col("n_window"),
        col("_num").as("num"), col("ewma"))
  }

  /** Slowly-changing-dimension (SCD type 2) interval build: collapse a
    * per-key event stream into state VERSIONS — one row per run of equal
    * states, with [valid_from, valid_to) nanosecond bounds, the event
    * count the run collapsed, and an is_current flag. The read-side twin
    * is [[stateAt]] (point-in-time reconstruction); this is the
    * warehouse-load side that materializes the full dimension history.
    *
    * Runs are gaps-and-islands: a state-change flag (lag-compare), a
    * running sum for the version id, one grouped aggregate, and a lead()
    * for the exclusive upper bound. Exact integers; one key-partitioned
    * shuffle; every window is keyed — nothing global. */
  def scd2Intervals(
      events: DataFrame,
      keyCol: String = "user_id",
      tsCol: String = "ts",
      tieCol: String = "event_id",
      stateCol: String = "event_type"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val runs = events
      .select(col(keyCol), col(tsCol), col(tieCol), col(stateCol))
      .withColumn("_chg",
        when(lag(stateCol, 1).over(w).isNull ||
          lag(stateCol, 1).over(w) =!= col(stateCol), 1L).otherwise(0L))
      .withColumn("version", sum("_chg").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("version"))
      .agg(min(stateCol).as("state"), // constant within the run
        min(tsCol).as("valid_from"),
        count(lit(1)).as("n_events"))
    val wv = Window.partitionBy(keyCol).orderBy("version")
    runs
      .withColumn("valid_to", lead("valid_from", 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
      .select(keyCol, "version", "state", "valid_from", "valid_to",
        "n_events", "is_current")
  }
}
