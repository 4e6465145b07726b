package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines (builder extension): token
  * counting, quality scoring, stopword-based language ID. All pure
  * `functions._` arithmetic + small broadcast joins — codegen'd, one shuffle
  * per aggregation, no UDFs.
  */
object TextAnalysis {

  /** Default stopword keyword lists for language ID (n-gram heuristic —
    * tiny on purpose, broadcastable). */
  val LangKeywords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "and", "en" -> "of", "en" -> "to", "en" -> "is", "en" -> "in",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "das", "de" -> "ist", "de" -> "ein",
    "fr" -> "le", "fr" -> "la", "fr" -> "les", "fr" -> "et", "fr" -> "des", "fr" -> "est",
    "es" -> "el", "es" -> "los", "es" -> "las", "es" -> "y", "es" -> "de", "es" -> "es",
    "zh" -> "的", "zh" -> "了", "zh" -> "是", "zh" -> "我", "zh" -> "在", "zh" -> "有")

  val EnStopwords: Seq[String] =
    Seq("the", "and", "of", "to", "is", "in", "a", "that", "it", "for")

  /** BPE-style pre-tokenizer pattern (contractions, letter runs, digit
    * runs, punctuation runs — the GPT-2 pre-split shape, in portable
    * regex syntax). */
  val BpeTokenPattern: String = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+"

  /** Whitespace + BPE-ish token counts, char count, chars-per-token. */
  def tokenStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs.select(
      col(idCol),
      size(split(col(textCol), " ")).cast("long").as("n_words"),
      regexp_count(col(textCol), lit(BpeTokenPattern)).cast("long").as("n_bpe_tokens"),
      length(col(textCol)).cast("long").as("n_chars"))
      .withColumn("chars_per_word", col("n_chars").cast("double") / col("n_words"))

  /** Quality scoring: stopword ratio (relational count against a broadcast
    * stoplist) and punctuation ratio (replace-based count — no regex so the
    * same expression is portable to any SQL dialect). */
  def quality(
      docs: DataFrame,
      stopwords: Seq[String] = EnStopwords,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val stops = stopwords.toDF("word")
    val wordsAll = docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
    val hits = wordsAll
      .join(broadcast(stops), "word")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("stop_hits"))
    val punct = length(col(textCol)) -
      length(regexp_replace(col(textCol), "[.,!?;]", ""))
    docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_words"),
        punct.cast("long").as("n_punct"),
        length(col(textCol)).cast("long").as("n_chars"))
      .join(hits, Seq(idCol), "left")
      .withColumn("stop_hits", coalesce(col("stop_hits"), lit(0L)))
      .withColumn("stop_ratio", col("stop_hits").cast("double") / col("n_words"))
      .withColumn("punct_ratio", col("n_punct").cast("double") / col("n_chars"))
  }

  /** Stopword-vote language ID: count keyword hits per (doc, lang), pick the
    * argmax with a deterministic (count desc, lang asc) tie-break. */
  def langId(
      docs: DataFrame,
      keywords: Seq[(String, String)] = LangKeywords,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val kw = keywords.toDF("pred_lang", "word")
    val wordsAll = docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
    val scores = wordsAll
      .join(broadcast(kw), "word")
      .groupBy(col(idCol), col("pred_lang"))
      .agg(count(lit(1)).as("hits"))
    val w = Window.partitionBy(idCol).orderBy(col("hits").desc, col("pred_lang").asc)
    scores
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("pred_lang"), col("hits"))
  }
}
