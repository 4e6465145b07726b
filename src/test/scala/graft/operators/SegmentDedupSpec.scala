package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** `Dedup.dedupSegments` — C4-style corpus segment dedup with keep-first
  * policy and in-order document reassembly. */
class SegmentDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], segWords: Int = 2): Map[Long, Row] =
    Dedup.dedupSegments(docs.toDF("doc_id", "text"), segWords = segWords)
      .collect()
      .map(r => r.getLong(0) -> r)
      .toMap

  test("repeated segment survives only at its first corpus occurrence") {
    // 2-word segments: doc 1 = [a b][c d], doc 2 = [a b][x y]
    val out = run(Seq(1L -> "a b c d", 2L -> "a b x y"))
    assert(out(1L).getLong(3) === 2 && out(1L).getLong(4) === 2) // all kept
    assert(out(2L).getLong(3) === 2 && out(2L).getLong(4) === 1) // "a b" dropped
    // doc 2 rebuilt as just "x y"
    val md5xy = java.security.MessageDigest.getInstance("MD5")
      .digest("x y".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(2L).getString(1) === md5xy)
    assert(out(2L).getLong(2) === 3)
  }

  test("within-doc repeats collapse to the earliest position") {
    val out = run(Seq(5L -> "a b a b a b"))
    assert(out(5L).getLong(3) === 3 && out(5L).getLong(4) === 1)
    assert(out(5L).getLong(2) === 3) // "a b"
  }

  test("fully-deduplicated doc is kept as an empty row, not dropped") {
    val out = run(Seq(1L -> "a b", 2L -> "a b"))
    assert(out.contains(2L))
    assert(out(2L).getLong(4) === 0)
    val md5empty = java.security.MessageDigest.getInstance("MD5")
      .digest(Array.empty[Byte]).map("%02x".format(_)).mkString
    assert(out(2L).getString(1) === md5empty)
    assert(out(2L).getLong(2) === 0)
  }

  test("partial last segment is a segment of its own") {
    // doc 1 = [a b][c]; doc 2 = [c] alone duplicates doc 1's tail segment
    val out = run(Seq(1L -> "a b c", 2L -> "c"))
    assert(out(1L).getLong(3) === 2 && out(1L).getLong(4) === 2)
    assert(out(2L).getLong(3) === 1 && out(2L).getLong(4) === 0)
  }

  test("first occurrence is by (doc_id, position), not input order") {
    // the duplicate segment sits LATER inside doc 1 but doc 1 has the
    // smaller doc_id: doc 1 keeps it, doc 2 loses it
    val out = run(Seq(2L -> "z z q q", 1L -> "a b z z"))
    assert(out(1L).getLong(4) === 2)
    assert(out(2L).getLong(4) === 1) // kept "q q", lost "z z"
  }
}
