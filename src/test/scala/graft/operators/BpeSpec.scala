package graft.operators

import graft.SparkSpec
import graft.tools.TrainBpe

/** BPE train/apply semantics: the trainer's deterministic argmax over the
  * (word, count) table, and the applier's sentinel/double-space replace
  * chain implementing greedy left-to-right merge application. */
class BpeSpec extends SparkSpec {

  test("train: weighted argmax with chained merges is deterministic") {
    val merges = TrainBpe.train(Seq(("abab", 2L), ("ab", 1L)), nMerges = 2)
    // (a,b) appears 2x in each "abab" (weight 2) + once in "ab" -> 5;
    // after merging, ("ab","ab") is the only remaining pair
    assert(merges == Seq(("a", "b"), ("ab", "ab")))
  }

  test("train: ties break on the lexicographically smallest pair") {
    // "xy" and "xz" both count 1 -> (x,y) < (x,z)
    val merges = TrainBpe.train(Seq(("xy", 1L), ("xz", 1L)), nMerges = 1)
    assert(merges == Seq(("x", "y")))
  }

  test("applyBpe: chained merges, greedy overlap, per-doc counts") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "abc ab xabc"), // chained merges: a+b -> ab, ab+c -> abc
      (2L, "aaa"))         // greedy: (a,a) merges left-to-right -> [aa, a]
      .toDF("doc_id", "text")
    val out = TextAnalysis.applyBpe(docs,
        Seq(("a", "b"), ("ab", "c"), ("a", "a")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: "abc"->1 subword, "ab"->1, "xabc"->2 (x + abc)
    assert(out(1L) == ((3L, 4L)), s"got $out")
    // doc 2: "aaa" -> [aa, a] = 2 subwords, never [a, aa]
    assert(out(2L) == ((1L, 2L)), s"got $out")
  }

  test("applyBpe: no merges = character tokenization; md5 stable") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val r = TextAnalysis.applyBpe(docs, Seq.empty).collect().head
    assert(r.getLong(1) == 2L && r.getLong(2) == 4L)
    assert(r.getString(3).length == 32) // md5 of "a  b  c  d"
  }
}
