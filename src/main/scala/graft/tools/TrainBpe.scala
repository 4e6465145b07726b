package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: train a byte-pair-encoding merge list on a corpus and print
  * it as Scala literal source for `queries/TrainedBpe.scala`.
  *
  * BPE training (Sennrich et al. 2016) operates on the aggregated
  * (word, count) table, not the corpus: the distributed half is ONE
  * explode→groupBy word-count aggregate (vocabulary-sized output), and
  * the iterative merge loop runs driver-side over that model-sized table
  * — the same train-on-aggregate/score-at-scale split as
  * [[TrainCentroids]] (GPT-2's tokenizer was trained exactly this way).
  * Applying the trained merges is a per-row replace chain
  * (`TextAnalysis.applyBpe`), zero-shuffle at any corpus size.
  *
  * Determinism: the argmax pair breaks ties on the lexicographically
  * smallest (left, right); pairs whose symbols contain quote/backslash
  * are skipped so the baked literals are engine-portable without escape
  * divergence.
  *
  * Usage: runMain graft.tools.TrainBpe [sfDir] [nMerges]
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nMerges = args.lift(1).map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val wordCounts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    println(s"// trained on ${wordCounts.length} distinct words")
    val merges = train(wordCounts, nMerges)
    println("// ---- Scala (Seq[(String, String)]) — paste into TrainedBpe ----")
    println(merges.map { case (a, b) => s"""("$a", "$b")""" }
      .mkString("Seq(\n  ", ",\n  ", ")"))
    spark.stop()
  }

  /** Classic BPE over a (word, count) table: each round counts adjacent
    * symbol pairs weighted by word count, merges the most frequent pair
    * everywhere, and records it. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var words = wordCounts.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val out = Seq.newBuilder[(String, String)]
    var round = 0
    while (round < nMerges) {
      val pairCounts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          if (!p._1.exists(ch => ch == '\'' || ch == '"' || ch == '\\') &&
              !p._2.exists(ch => ch == '\'' || ch == '"' || ch == '\\'))
            pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) round = nMerges
      else {
        val best = pairCounts.toSeq
          .minBy { case ((a, b), c) => (-c, a, b) }._1
        out += best
        val merged = best._1 + best._2
        words = words.map { case (syms, c) =>
          val ns = scala.collection.mutable.ArrayBuffer[String]()
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              ns += merged; i += 2
            } else { ns += syms(i); i += 1 }
          }
          (ns.toArray, c)
        }
        round += 1
      }
    }
    out.result()
  }
}
