package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** `Snapshot.diff`/`diffSummary` semantics: status assignment, unchanged
  * suppression, and the null-vs-empty hash distinction. */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def oldDf = Seq(
    (1L, Some("a"), 10L),
    (2L, Some("b"), 20L),
    (3L, Some("c"), 30L),
    (4L, None: Option[String], 40L)
  ).toDF("k", "s", "v")

  private def newDf = Seq(
    (1L, Some("a"), 10L),              // unchanged
    (2L, Some("B"), 20L),              // changed
    (4L, Some(""), 40L),               // null -> empty string MUST be a change
    (5L, Some("e"), 50L)               // added
  ).toDF("k", "s", "v")                // key 3 removed

  test("diff: added/removed/changed, unchanged suppressed, null != empty") {
    val out = Snapshot.diff(oldDf, newDf, "k", Seq("s", "v")).orderBy("k").collect()
    assert(out.toSeq == Seq(
      Row(2L, "changed"),
      Row(3L, "removed"),
      Row(4L, "changed"),
      Row(5L, "added")))
  }

  test("diffSummary counts and snapshot sizes") {
    val s = Snapshot.diffSummary(oldDf, newDf, "k", Seq("s", "v")).head()
    assert(s == Row(4L, 4L, 1L, 1L, 2L))
  }

  test("identical snapshots diff to empty, summary zeros") {
    assert(Snapshot.diff(oldDf, oldDf, "k", Seq("s", "v")).count() == 0)
    val s = Snapshot.diffSummary(oldDf, oldDf, "k", Seq("s", "v")).head()
    assert(s == Row(4L, 4L, 0L, 0L, 0L))
  }
}
