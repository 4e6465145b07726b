package graft.operators

import graft.SparkSpec

/** `TextAnalysis.winnowFingerprints` / `winnowOverlap` — the Schleimer
  * et al. winnowing guarantees, checked against a Scala reimplementation
  * and on constructed document pairs. */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val K = 3
  private val W = 4

  /** Reference winnowing in plain Scala, same 60-bit md5-prefix hash. */
  private def refFingerprints(text: String): Set[Long] = {
    val ws = text.split(" ", -1)
    val nGrams = math.max(ws.length - K + 1, 1)
    val hs = (0 until nGrams).map { i =>
      val gram = ws.slice(i, math.min(i + K, ws.length)).mkString(" ")
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val nWins = math.max(hs.length - W + 1, 1)
    (0 until nWins).map(j => hs.slice(j, math.min(j + W, hs.length)).min).toSet
  }

  test("fingerprint sets match the reference implementation exactly") {
    val docs = Seq(
      1L -> "the quick brown fox jumps over the lazy dog again and again",
      2L -> "a b",                       // shorter than k words
      3L -> "x y z",                     // exactly k words -> one gram
      4L -> "p q r s t")                 // fewer grams than the window
    val got = TextAnalysis.winnowFingerprints(docs.toDF("doc_id", "text"), K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    docs.foreach { case (id, text) =>
      assert(got(id) === refFingerprints(text), s"doc $id")
    }
  }

  test("winnowing guarantee: a shared run of >= w+k-1 words shares a fingerprint") {
    val common = "one two three four five six" // 6 = W + K - 1 words
    val docs = Seq(
      10L -> s"alpha beta $common gamma delta",
      20L -> s"p q r s $common t u v")
    val fps = TextAnalysis.winnowFingerprints(docs.toDF("doc_id", "text"), K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
    assert((fps(10L) intersect fps(20L)).nonEmpty)
  }

  test("identical docs share their whole fingerprint set; overlap pairs find them") {
    val text = "spark join filter window group sort merge batch stream vector hash key"
    val docs = Seq(1L -> text, 2L -> text, 3L -> "totally different words here nothing shared at all today ok fine yes")
    val pairs = TextAnalysis.winnowOverlap(docs.toDF("doc_id", "text"), K, W,
      maxDf = 10, minShared = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq === Seq((1L, 2L)))
    assert(pairs.head._3 === refFingerprints(text).size.toLong)
  }

  test("df cap drops ubiquitous fingerprints from the posting join") {
    // the same text in 5 docs -> every fingerprint has df=5 > maxDf=4 -> no pairs
    val text = "a b c d e f g h"
    val docs = (1L to 5L).map(_ -> text)
    val pairs = TextAnalysis.winnowOverlap(docs.toDF("doc_id", "text"), K, W,
      maxDf = 4, minShared = 1)
    assert(pairs.count() === 0)
  }
}
