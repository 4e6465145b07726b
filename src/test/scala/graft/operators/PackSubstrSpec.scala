package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `TextAnalysis.packSlices` (faithful concat-and-split packing with
  * boundary straddles) and `Dedup.exactSubstrDedup` (Lee et al. 2022
  * ExactSubstr keep-first duplicate-span removal), both cross-checked
  * against plain-Scala replicas of their declared semantics. */
class PackSubstrSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------ packSlices

  private val packDocs = Seq(
    // (doc_id, lang, text) — token counts chosen to straddle budget=5
    (0L, "en", "a b c"),             // 3 tokens
    (4L, "en", "d e f g"),           // 4 tokens -> straddles 5-boundary
    (8L, "en", "h i j k l m n o"),   // 8 tokens -> spans two boundaries
    (1L, "de", "p q r s t u"),       // own shard/stream
    (12L, "en", "v w")               // tail of shard 0
  ).toDF("doc_id", "lang", "text")

  test("packSlices: slices partition each doc's tokens contiguously") {
    val out = TextAnalysis.packSlices(packDocs, budget = 5L)
      .orderBy("doc_id", "chunk_id").collect()
    val byDoc = out.groupBy(_.getLong(0))
    for ((_, rows) <- byDoc) {
      val n = rows.head.getLong(3)
      assert(rows.head.getLong(6) === 0L)          // first slice starts at 0
      assert(rows.last.getLong(7) === n)           // last slice ends at n_tokens
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getLong(7) === b.getLong(6))    // contiguous
          assert(b.getLong(5) === a.getLong(5) + 1) // consecutive chunks
        case _ =>
      }
    }
  }

  test("packSlices: every non-tail sequence holds exactly `budget` tokens") {
    val out = TextAnalysis.packSlices(packDocs, budget = 5L)
    val perChunk = out.groupBy("lang", "shard", "chunk_id")
      .agg(sum(col("tok_end") - col("tok_start")).as("toks"),
        max("chunk_id").as("cid"))
    val maxChunk = out.groupBy("lang", "shard")
      .agg(max("chunk_id").as("last_cid"))
    val joined = perChunk.join(maxChunk, Seq("lang", "shard")).collect()
    for (r <- joined) {
      val toks = r.getAs[Long]("toks")
      if (r.getAs[Long]("cid") < r.getAs[Long]("last_cid")) assert(toks === 5L)
      else assert(toks <= 5L && toks > 0L)
    }
  }

  test("packSlices: first slice's chunk matches packSequences' chunk_id") {
    val seq0 = TextAnalysis.packSequences(packDocs, budget = 5L)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    val first = TextAnalysis.packSlices(packDocs, budget = 5L)
      .filter(col("tok_start") === 0L)
      .select("doc_id", "chunk_id").as[(Long, Long)].collect().toMap
    assert(first === seq0)
  }

  // ------------------------------------------------------ exactSubstrDedup

  /** Plain-Scala replica of the declared semantics: every duplicated
    * L-window is removed at every occurrence except the (doc, pos)-minimal
    * one; kept text = chars not covered by any removed window. */
  private def replica(docs: Seq[(Long, String)], L: Int): Map[Long, String] = {
    case class Occ(doc: Long, pos: Int) // pos 1-based
    val occs = for {
      (id, t) <- docs
      p <- 1 to (t.length - L + 1)
    } yield (t.substring(p - 1, p - 1 + L), Occ(id, p))
    val covered = scala.collection.mutable.Map[Long, Set[Int]]().withDefaultValue(Set.empty)
    for ((_, os) <- occs.groupBy(_._1) if os.size > 1) {
      val sorted = os.map(_._2).sortBy(o => (o.doc, o.pos))
      for (o <- sorted.tail)
        covered(o.doc) = covered(o.doc) ++ (o.pos until o.pos + L)
    }
    docs.map { case (id, t) =>
      id -> t.zipWithIndex.collect { case (c, i) if !covered(id).contains(i + 1) => c }.mkString
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], L: Int): Map[Long, (Long, Long, String)] =
    Dedup.exactSubstrDedup(docs.toDF("doc_id", "text"), minLen = L)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap

  test("exactSubstr: shared passage kept at first occurrence, cut elsewhere") {
    val passage = "0123456789abcdefghij" // 20 chars
    val docs = Seq(
      1L -> s"AAAA${passage}BBBB",
      2L -> s"CCCC${passage}DDDD")
    val out = run(docs, L = 20)
    assert(out(1L)._2 === 0L)                       // first doc intact
    assert(out(1L)._3 === s"AAAA${passage}BBBB")
    assert(out(2L)._2 === 20L)                      // passage excised
    assert(out(2L)._3 === "CCCCDDDD")
  }

  test("exactSubstr: overlapping duplicated windows merge into one span") {
    // doc 2 repeats a 25-char passage; every 20-window inside it is
    // duplicated, their spans overlap and must merge without double-cutting
    val p = "qwertyuiopasdfghjklzxcvbn" // 25 chars
    val out = run(Seq(1L -> s"__${p}__", 2L -> s"**${p}**"), L = 20)
    assert(out(2L)._2 === 25L)
    assert(out(2L)._3 === "****")
  }

  test("exactSubstr: docs shorter than L are never touched") {
    val out = run(Seq(1L -> "same short", 2L -> "same short"), L = 30)
    assert(out(1L)._2 === 0L && out(2L)._2 === 0L)
    assert(out(2L)._3 === "same short")
  }

  test("exactSubstr: within-doc repetition keeps only the first copy") {
    val p = "ABCDEFGHIJKLMNOPQRST" // 20 chars, repeated inside one doc
    val out = run(Seq(7L -> s"${p}--${p}"), L = 20)
    assert(out(7L)._2 === 20L)
    assert(out(7L)._3 === s"${p}--")
  }

  test("exactSubstr: randomized corpus matches the plain-Scala replica") {
    val rnd = new scala.util.Random(42)
    // small alphabet + shared phrases force plenty of duplicated windows
    val phrases = Vector("the quick brown fox jumps over", "pack my box with five dozen jugs",
      "sphinx of black quartz judge my vow", "how vexingly quick daft zebras jump")
    val docs = (0L until 40L).map { id =>
      val parts = (0 until 3 + rnd.nextInt(3)).map { _ =>
        if (rnd.nextBoolean()) phrases(rnd.nextInt(phrases.size))
        else (0 until 8).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
      }
      id -> parts.mkString(" ")
    }
    val expect = replica(docs, L = 12)
    val got = run(docs, L = 12)
    for ((id, _) <- docs) {
      assert(got(id)._3 === expect(id), s"doc $id rewrite mismatch")
      assert(got(id)._1 === docs.find(_._1 == id).get._2.length.toLong)
      assert(got(id)._2 === (got(id)._1 - expect(id).length))
    }
  }
}
