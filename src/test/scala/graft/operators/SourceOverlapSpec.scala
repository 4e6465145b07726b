package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** `Dedup.sourceOverlap` against a hand-built three-source corpus:
  * fingerprints are word-ORDER-insensitive, per-source duplicates count
  * once, the matrix covers every pair including zero overlap, and the
  * Jaccard is the exact long/long division. */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "x y", "A"),
    (2L, "z w", "A"),
    (3L, "x y", "A"),      // within-source duplicate: counts once
    (4L, "y x", "B"),      // same word SET as "x y" -> shared with A
    (5L, "q", "B"),
    (6L, "only here", "C")
  ).toDF("doc_id", "text", "source")

  test("sourceOverlap emits the full pair matrix with exact Jaccard") {
    val out = Dedup.sourceOverlap(docs).orderBy("src1", "src2").collect()
    val expected = Seq(
      Row("A", "B", 2L, 2L, 1L, 1.0 / 3.0),
      Row("A", "C", 2L, 1L, 0L, 0.0),
      Row("B", "C", 2L, 1L, 0L, 0.0))
    assert(out.toSeq == expected)
  }

  test("sourceOverlap has no cartesian stage on the corpus side") {
    val phys = Dedup.sourceOverlap(docs).queryExecution.executedPlan.toString
    assert(!phys.contains("CartesianProduct"))
  }
}
