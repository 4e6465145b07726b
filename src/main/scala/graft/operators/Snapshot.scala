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
