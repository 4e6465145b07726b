package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff / change-data-capture between two versions of a keyed
  * table — the warehouse maintenance primitive (SCD auditing, late-data
  * reconciliation, backfill verification).
  *
  * Rows are compared by an md5 over the value columns in a FIXED column
  * order with an explicit null sentinel (`concat_ws` alone would collapse
  * NULL and empty string), so "changed" is content-exact and engine-
  * portable. Shape: one hash-project per side (map-only, column-pruned)
  * and ONE full-outer equi-join on the key — at 100 TB both sides shuffle
  * once on the key; with bucketed layouts (`sources/Bucketed.scala`) the
  * exchange disappears entirely.
  */
object Snapshot {

  private def rowHash(valueCols: Seq[String]) =
    md5(concat_ws("\u0001",
      valueCols.map(c => coalesce(col(c).cast("string"), lit("\u0002"))): _*))

  /** Per-key change set: `added` / `removed` / `changed` rows only
    * (`unchanged` keys are dropped — at scale they are the overwhelming
    * majority and never belong in a diff output). */
  def diff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty, "need value columns to compare")
    val a = oldDf.select(col(keyCol).as("_k"), rowHash(valueCols).as("_ho"))
    val b = newDf.select(col(keyCol).as("_k2"), rowHash(valueCols).as("_hn"))
    a.join(b, col("_k") === col("_k2"), "full_outer")
      .withColumn("status",
        when(col("_k").isNull, "added")
          .when(col("_k2").isNull, "removed")
          .when(col("_ho") =!= col("_hn"), "changed"))
      .filter(col("status").isNotNull)
      .select(coalesce(col("_k"), col("_k2")).as(keyCol), col("status"))
  }

  /** Incremental view maintenance for distributive aggregates: update a
    * per-group (sum, count) view from OLD→NEW row deltas instead of
    * rescanning history — at 100 TB the view refresh touches the delta
    * and the (group-sized) view, never the fact table.
    *
    * Delta construction is diff's full-outer key join carrying values: a
    * changed/removed row retracts (−value, −1) at its OLD group, a
    * changed/added row asserts (+value, +1) at its NEW group — so key
    * moves across groups maintain BOTH groups correctly. The result
    * joins the delta-merged view against a direct recompute of the new
    * snapshot and emits a per-group `match_inc` flag: the query is its
    * own equality proof (exact decimal arithmetic, so merged == direct
    * bit-for-bit, not approximately).
    */
  def incrementalAggregate(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      groupCol: String,
      valCol: String): DataFrame = {
    val a = oldDf.select(col(keyCol).as("_k"), col(groupCol).as("_go"),
      col(valCol).as("_vo"), rowHash(Seq(groupCol, valCol)).as("_ho"))
    val b = newDf.select(col(keyCol).as("_k2"), col(groupCol).as("_gn"),
      col(valCol).as("_vn"), rowHash(Seq(groupCol, valCol)).as("_hn"))
    val j = a.join(b, col("_k") === col("_k2"), "full_outer")
      .filter(col("_k").isNull || col("_k2").isNull || col("_ho") =!= col("_hn"))
    val retract = j.filter(col("_k").isNotNull)
      .select(col("_go").as(groupCol), (-col("_vo")).as("dv"), lit(-1L).as("dn"))
    val assertD = j.filter(col("_k2").isNotNull)
      .select(col("_gn").as(groupCol), col("_vn").as("dv"), lit(1L).as("dn"))
    val delta = retract.unionByName(assertD)
      .groupBy(groupCol)
      .agg(sum("dv").as("delta_sum"), sum("dn").as("delta_n"))
    val oldView = oldDf.groupBy(groupCol)
      .agg(sum(valCol).as("old_sum"), count(lit(1)).as("old_n"))
    val direct = newDf.groupBy(groupCol)
      .agg(sum(valCol).as("direct_sum"), count(lit(1)).as("direct_n"))
    oldView
      .join(delta, Seq(groupCol), "full_outer")
      .select(col(groupCol),
        coalesce(col("old_sum"), lit(0).cast(oldDf.schema(valCol).dataType)).as("old_sum"),
        coalesce(col("old_n"), lit(0L)).as("old_n"),
        coalesce(col("delta_sum"), lit(0).cast(oldDf.schema(valCol).dataType)).as("delta_sum"),
        coalesce(col("delta_n"), lit(0L)).as("delta_n"))
      .withColumn("inc_sum", col("old_sum") + col("delta_sum"))
      .withColumn("inc_n", col("old_n") + col("delta_n"))
      .join(direct, Seq(groupCol), "full_outer")
      // standard IVM tombstone: a group whose count reached zero is
      // DELETED from the maintained view, matching the recompute's absence
      .filter(!(col("inc_n") === 0 && col("direct_n").isNull))
      .withColumn("match_inc",
        (col("inc_sum") <=> col("direct_sum") && col("inc_n") <=> col("direct_n")).cast("int"))
      .select(groupCol, "old_sum", "old_n", "delta_sum", "delta_n",
        "inc_sum", "inc_n", "direct_sum", "direct_n", "match_inc")
  }

  /** One-row diff summary: counts per status plus both snapshot sizes —
    * the reconciliation report a backfill job logs. */
  def diffSummary(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCol: String,
      valueCols: Seq[String]): DataFrame = {
    val d = diff(oldDf, newDf, keyCol, valueCols)
      .agg(
        coalesce(sum(when(col("status") === "added", 1L).otherwise(0L)), lit(0L)).as("n_added"),
        coalesce(sum(when(col("status") === "removed", 1L).otherwise(0L)), lit(0L)).as("n_removed"),
        coalesce(sum(when(col("status") === "changed", 1L).otherwise(0L)), lit(0L)).as("n_changed"))
    val no = oldDf.agg(count(lit(1)).as("n_old"))
    val nn = newDf.agg(count(lit(1)).as("n_new"))
    d.crossJoin(no).crossJoin(nn)
      .select("n_old", "n_new", "n_added", "n_removed", "n_changed")
  }
}
