package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bitmap-index segment analytics (builder extension): audience overlap
  * via word-sharded membership bitmaps — the technique behind roaring/
  * bitmap indexes in analytics stores (our fixed 32-bit words are the
  * dense container case).
  *
  * Members (user ids) are packed as bit (id mod 32) of word (id div 32);
  * a segment's membership is then a (word → BIGINT bitmap) table built by
  * ONE `bit_or` hash aggregate, |members|/32 rows per segment instead of
  * |members|. Set algebra becomes word-keyed integer ops: |A∩B| is
  * Σ bit_count(a & b) over the word-aligned join — no row-per-member
  * join ever happens, which is the whole point at 100 TB: the pairwise
  * overlap of S segments costs |users|/32 × S² bitmap rows, not
  * |events|² anything. All integer-exact; the oracle computes the same
  * counts INDEPENDENTLY from distinct (segment, user) rows.
  */
object Bitmap {

  /** Pairwise segment overlap: exact |A|, |B|, |A∩B| and Jaccard for
    * every unordered segment pair. The S² pair frame is built from the
    * model-sized per-segment totals (S = #segments, tiny), so pairs with
    * EMPTY intersections still appear with n_inter = 0. */
  def segmentOverlap(
      events: DataFrame,
      segCol: String = "event_type",
      userCol: String = "user_id"): DataFrame = {
    // Word index is an ARITHMETIC right-shift (true floor-division) and the
    // bit position a low-5-bit mask: both are two's-complement-correct for
    // negative ids, where `div`/`%` truncate toward zero and would map e.g.
    // id -5 and id 27 onto the same (word, bit) slot.
    val bm = events
      .select(col(segCol).as("seg"),
        expr(s"shiftright(cast($userCol as bigint), 5)").as("w"),
        expr(s"shiftleft(cast(1 as bigint), cast(cast($userCol as bigint) & 31 as int))").as("b"))
      .groupBy("seg", "w")
      .agg(expr("bit_or(b)").as("bm"))
    val sizes = bm.groupBy("seg").agg(sum(expr("bit_count(bm)")).as("n"))
    val inter = bm.as("a")
      .join(bm.as("b"), col("a.w") === col("b.w") && col("a.seg") < col("b.seg"))
      .groupBy(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"))
      .agg(sum(expr("bit_count(a.bm & b.bm)")).cast("long").as("_ni"))
    sizes.select(col("seg").as("seg_a"), col("n").as("n_a"))
      .join(sizes.select(col("seg").as("seg_b"), col("n").as("n_b")),
        col("seg_a") < col("seg_b"))
      .join(inter, Seq("seg_a", "seg_b"), "left")
      .withColumn("n_inter", coalesce(col("_ni"), lit(0L)))
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .select("seg_a", "seg_b", "n_a", "n_b", "n_inter", "jaccard")
  }
}
