package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** SQL fragment: the array of word `n`-grams of the word array column
    * `w`, joined by single spaces; empty when the doc has fewer than `n`
    * words (`sequence(0, negative)` would otherwise count *down*). */
  private[graft] def gramsSql(n: Int, w: String = "w"): String = {
    val parts = (0 until n).map(j => s"$w[i + $j]").mkString(", ")
    s"CASE WHEN size($w) >= $n THEN transform(sequence(0, size($w) - $n), i -> concat_ws(' ', $parts)) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END"
  }

  /** SQL fragment: count of the most frequent element of the gram array =
    * longest run in its sorted form — a single per-row fold, so the
    * per-doc mode never touches a shuffle (streaming-safe: stateless). */
  private[graft] def maxRunSql(grams: String): String =
    s"""aggregate(array_sort($grams),
       named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
       (acc, x) -> named_struct(
         'prev', x,
         'run',  IF(x <=> acc.prev, acc.run + 1L, 1L),
         'best', GREATEST(acc.best, IF(x <=> acc.prev, acc.run + 1L, 1L))),
       acc -> acc.best)"""

  /** Gopher-style repetition statistics, per document: the share of the doc
    * taken by its most frequent word 2-gram / 3-gram and the fraction of
    * duplicated 5-grams. The classic repetitious-text quality filters
    * (Rae et al. 2021 §A1.1) for pretraining-data cleaning.
    *
    * Scale: entirely per-row — n-gram arrays, a sort, and a run-length
    * fold via higher-order functions. Zero shuffles, no groupBy on the
    * (huge) gram key space; at 100 TB this is a pure map stage pipelined
    * into the scan.
    *
    * Output per doc: `n_words`, `top2_n`/`top2_frac` (count and share of
    * the modal bigram among the `n_words-1` bigrams), `top3_n`/`top3_frac`,
    * `dup5_n`/`dup5_frac` (5-gram occurrences beyond first, over total
    * 5-grams). Fractions are NULL when the doc is too short to have any
    * n-gram of that order.
    */
  def repetitionStats(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .withColumn("n_words", size(col("w")).cast("long"))
      .withColumn("top2_n", expr(maxRunSql(gramsSql(2))))
      .withColumn("top3_n", expr(maxRunSql(gramsSql(3))))
      .withColumn("_g5", expr(gramsSql(5)))
      .withColumn("_n5", size(col("_g5")).cast("long"))
      .withColumn("_d5", size(array_distinct(col("_g5"))).cast("long"))
      .select(
        col(idCol),
        col("n_words"),
        col("top2_n"),
        when(col("n_words") >= 2, col("top2_n").cast("double") / (col("n_words") - 1))
          .as("top2_frac"),
        col("top3_n"),
        when(col("n_words") >= 3, col("top3_n").cast("double") / (col("n_words") - 2))
          .as("top3_frac"),
        (col("_n5") - col("_d5")).as("dup5_n"),
        when(col("_n5") > 0, (col("_n5") - col("_d5")).cast("double") / col("_n5"))
          .as("dup5_frac"))

  /** Corpus-level repeated n-gram detection: word `n`-grams appearing in at
    * least `minDocs` distinct documents, with how many docs and total
    * occurrences — the boilerplate / benchmark-contamination sweep over a
    * training corpus.
    *
    * Scale: explode → two keyed aggregations, both with map-side partial
    * combine. The first groups on (doc, gram) so the second's `count(*)`
    * IS the distinct-doc count — no `countDistinct` (which would be a
    * second shuffle per key) anywhere. Gram keys hash-partition evenly;
    * no all-pairs, no driver state.
    */
  def repeatedNgrams(
      docs: DataFrame,
      n: Int = 6,
      minDocs: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), explode(expr(gramsSql(n))).as("ngram"))
      .groupBy(col(idCol), col("ngram"))
      .agg(count(lit(1)).as("n_occ_doc"))
      .groupBy("ngram")
      .agg(count(lit(1)).as("n_docs"), sum("n_occ_doc").as("n_occ"))
      .filter(col("n_docs") >= minDocs)

  /** Corpus-boilerplate span removal — the rewrite stage downstream of
    * [[repeatedNgrams]] (detection): every occurrence of an n-gram that
    * appears in ≥ `minDocs` distinct docs is excised from every doc (a
    * word survives iff NO bad-gram span covers its position), and the doc
    * is reassembled in order. The C4-style boilerplate scrub.
    *
    * Scale shape: the corpus-level bad-gram set comes from one
    * detection aggregation; each doc then joins only the bad grams IT
    * contains (gram-keyed equi-join + collect_set — carried state is
    * per-doc boilerplate, not the global set), and the rewrite is one
    * per-row projection: mark bad gram START positions (O(grams ×
    * |doc's bad set|) membership tests — never words × window), flatten
    * the covered spans, filter the word array. No broadcast of the
    * global gram set, no per-word window scans. */
  def removeBoilerplate(
      docs: DataFrame,
      n: Int = 6,
      minDocs: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val bad = repeatedNgrams(docs, n, minDocs, textCol, idCol).select(col("ngram"))
    val withGrams = docs
      .withColumn("_w", split(col(textCol), " "))
      .withColumn("_g", expr(gramsSql(n, "_w")))
    val docBad = withGrams
      .select(col(idCol), explode(array_distinct(col("_g"))).as("ngram"))
      .join(bad, Seq("ngram"))
      .groupBy(col(idCol))
      .agg(collect_set(col("ngram")).as("_bad"))
    withGrams
      .join(docBad, Seq(idCol), "left")
      .withColumn("_bad", coalesce(col("_bad"), expr("CAST(array() AS ARRAY<STRING>)")))
      // start positions of bad grams; guard the empty cases so no
      // descending sequence() is ever built
      .withColumn("_badIdx", expr(
        """CASE WHEN size(_g) = 0 OR size(_bad) = 0 THEN CAST(array() AS ARRAY<INT>)
           ELSE filter(sequence(0, size(_g) - 1), i -> array_contains(_bad, _g[i])) END"""))
      .withColumn("_cov", expr(
        s"array_distinct(flatten(transform(_badIdx, i -> sequence(i, i + ${n - 1}))))"))
      .withColumn("_keep", expr(
        "filter(sequence(0, size(_w) - 1), j -> NOT array_contains(_cov, j))"))
      .select(col(idCol),
        size(col("_w")).cast("long").as("n_words"),
        (size(col("_w")) - size(col("_keep"))).cast("long").as("n_removed"),
        concat_ws(" ", expr("transform(_keep, j -> _w[j])")).as("clean_text"))
  }

  /** Deterministic stratified sampling: keep `perStratum` docs per stratum,
    * chosen by md5-hash order (a uniform pseudo-random draw that every
    * engine reproduces) with id tie-break. The data-mixing/balancing stage
    * of a curation pipeline. One rank window per stratum — shuffle keyed by
    * the stratum column; at 100 TB use a composite stratum (e.g.
    * lang × hash-shard) if single strata are hot. */
  def stratifiedSample(
      docs: DataFrame,
      strataCol: String,
      perStratum: Int,
      idCol: String = "doc_id"): DataFrame = {
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    docs
      .withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= perStratum)
  }

  /** Sequence packing (concat-and-split pretraining convention): within
    * each (stratum, shard) stream, docs are laid end-to-end in id order
    * and cut into fixed `budget`-token chunks; a doc's chunk is where its
    * first token lands. Computed as one running-sum window — offset =
    * inclusive-cumsum − own length, chunk = offset div budget.
    *
    * `nShards` parallelizes the inherently-sequential cumsum: packing is
    * valid under ANY consistent partitioning of docs into streams, so
    * sharding by `id % nShards` trades nothing away and multiplies the
    * available parallelism — at 100 TB set nShards ≈ cores so no single
    * language serializes the window. */
  def packSequences(
      docs: DataFrame,
      budget: Long,
      strataCol: String = "lang",
      nShards: Int = 4,
      tokensCol: Column = null,
      idCol: String = "doc_id"): DataFrame = {
    val tokens = Option(tokensCol).getOrElse(size(split(col("text"), " ")).cast("long"))
    val shard = pmod(col(idCol), lit(nShards)).cast("int")
    val w = Window.partitionBy(col(strataCol), col("_shard")).orderBy(col(idCol).asc)
    docs
      .withColumn("_shard", shard)
      .withColumn("n_tokens", tokens)
      .withColumn("_cum", sum(col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pack_offset", col("_cum") - col("n_tokens"))
      .withColumn("chunk_id", expr(s"pack_offset div ${budget}"))
      .select(col(idCol), col(strataCol), col("_shard").as("shard"),
        col("n_tokens"), col("pack_offset"), col("chunk_id"))
  }

  /** Faithful concat-and-split packing: [[packSequences]] gives each doc a
    * start offset in its (stratum, shard) token stream; this explodes the
    * doc into one row per fixed `budget`-token training sequence it
    * overlaps. A doc straddling a sequence boundary is SPLIT — the
    * `[tok_start, tok_end)` half-open token slice says which of the doc's
    * tokens land in that sequence — so nothing is padded and nothing is
    * dropped, the GPT-pretraining packing convention (every sequence except
    * the stream tail is exactly `budget` tokens).
    *
    * Scale: inherits packSequences' single per-(stratum, shard) cumsum
    * window; the explode fan-out is `ceil(len/budget)+1` rows per doc
    * (≤ 2 for docs shorter than the budget) — bounded, map-side, no
    * further shuffle. */
  def packSlices(
      docs: DataFrame,
      budget: Long,
      strataCol: String = "lang",
      nShards: Int = 4,
      tokensCol: Column = null,
      idCol: String = "doc_id"): DataFrame =
    packSequences(docs, budget, strataCol, nShards, tokensCol, idCol)
      .filter(col("n_tokens") > 0)
      .withColumn("chunk_id", explode(expr(
        s"sequence(pack_offset div ${budget}L, (pack_offset + n_tokens - 1) div ${budget}L)")))
      .withColumn("tok_start",
        greatest(lit(0L), expr(s"chunk_id * ${budget}L - pack_offset")))
      .withColumn("tok_end",
        least(col("n_tokens"), expr(s"(chunk_id + 1) * ${budget}L - pack_offset")))
      .select(col(idCol), col(strataCol), col("shard"), col("n_tokens"),
        col("pack_offset"), col("chunk_id"), col("tok_start"), col("tok_end"))

  /** Temperature-weighted mixture sampling (the multi-source data-mixing
    * stage): each stratum (language / source) gets a token quota
    * proportional to `sqrt(stratum_tokens)` — the α = 0.5 temperature
    * reweighting that upsamples low-resource strata relative to
    * proportional sampling (the multilingual-pretraining convention,
    * e.g. Conneau & Lample 2019 §3.1) — then docs fill each quota in
    * md5-hash order (a uniform, engine-portable draw) until the stratum
    * budget is exhausted.
    *
    * Exactness: stratum token sums are integers; `floor(sqrt(long))` is
    * deterministic across engines (IEEE sqrt is correctly rounded);
    * quotas are integer `div`; the fill is one integer running-sum
    * window. Scale: one tiny per-stratum aggregate (broadcast back), one
    * rank window keyed by stratum — same shuffle shape as
    * [[stratifiedSample]]; shard hot strata the same way if needed. */
  def temperatureMixture(
      docs: DataFrame,
      budget: Long,
      strataCol: String = "lang",
      idCol: String = "doc_id",
      tokensCol: Column = null): DataFrame = {
    val tokens = Option(tokensCol).getOrElse(size(split(col("text"), " ")).cast("long"))
    val withT = docs.withColumn("n_tokens", tokens)
    // the weight total comes from a single-partition window over the
    // per-stratum table (#strata rows — bounded by the label space, not
    // the corpus) instead of a second aggregate branch: the corpus is
    // scanned once for the weights, not twice
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val quotas = withT.groupBy(col(strataCol))
      .agg(sum("n_tokens").as("strat_tokens"))
      .withColumn("_w", floor(sqrt(col("strat_tokens").cast("double"))).cast("long"))
      .withColumn("_tw", sum(col("_w")).over(wAll))
      .withColumn("quota_tokens", expr(s"(${budget}L * _w) div _tw"))
      .select(col(strataCol), col("quota_tokens"))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(md5(col(idCol).cast("string")).asc, col(idCol).asc)
    withT
      .join(broadcast(quotas), strataCol)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .filter(col("cum_tokens") <= col("quota_tokens"))
      .select(col(idCol), col(strataCol), col("n_tokens"), col("cum_tokens"), col("quota_tokens"))
  }

  /** Benchmark decontamination: drop every corpus doc sharing at least one
    * word `n`-gram with the benchmark set — the standard eval-leakage
    * sweep before pretraining. Distinct grams per side, gram-keyed
    * equi-join to find contaminated ids, then a left-anti join back:
    * shuffle volume is the (deduplicated) gram tables, never all-pairs;
    * the benchmark side is usually small enough to broadcast.
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 6,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val corpusGrams = corpus
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), explode(expr(gramsSql(n))).as("ngram"))
      .distinct()
    // benchmark side never needs ids: distinct over the bare gram column,
    // one aggregation instead of a (doc, gram) distinct + a second one
    val benchGrams = benchmark
      .select(split(col(textCol), " ").as("w"))
      .select(explode(expr(gramsSql(n))).as("ngram"))
      .distinct()
    val contaminated = corpusGrams
      .join(benchGrams, Seq("ngram"))
      .select(col(idCol))
      .distinct()
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }

  /** TF-IDF top terms per document — the keyword-extraction / topic-
    * filtering stage of a curation pipeline. tf = in-doc term count,
    * idf = round-6 `ln(N / df)` with df = distinct-doc frequency, score =
    * tf·idf, top `k` per doc with a term tie-break.
    *
    * Scale shape: ONE keyed aggregation with map-side combine — (doc,
    * term) counts, whose row count already IS the distinct pair set —
    * then df as a term-partitioned `count(*)` window over that same tf
    * table (a groupBy+join formulation physically re-evaluates the whole
    * tf subtree, i.e. a second corpus explode+aggregate pass; the window
    * reads it once), and a bounded per-doc top-k window. N joins in as a
    * 1-row broadcast (its `count(*)` is a parquet-footer scan). The idf
    * is rounded to 6 before the multiply so the ln's last-ulp libm
    * variance can't reorder ranks across engines. */
  def tfidfTopTerms(
      docs: DataFrame,
      k: Int = 5,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val terms = docs.select(col(idCol), explode(split(col(textCol), " ")).as("term"))
    val tf = terms.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val n = docs.agg(count(lit(1)).as("_n"))
    val wTerm = Window.partitionBy("term")
    val wDoc = Window.partitionBy(idCol).orderBy(col("score").desc, col("term").asc)
    tf
      .withColumn("df", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(n))
      .withColumn("idf", round(log(col("_n").cast("double") / col("df")), 6))
      .withColumn("score", col("tf") * col("idf"))
      .withColumn("rank", row_number().over(wDoc))
      .filter(col("rank") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("idf"), col("score"), col("rank"))
  }

  /** Overlapping document chunking (the RAG / context-window splitter):
    * each doc's word stream is cut into `chunkTokens`-token windows that
    * start every `chunkTokens - overlap` tokens, so consecutive chunks
    * share `overlap` tokens and no token is lost. Windows stop once one
    * reaches the end of the doc (last start = ceil((n-chunk)/stride) ·
    * stride — the tokenizer-stride convention), so no trailing window
    * that adds zero new tokens is ever emitted. Purely row-local — start
    * offsets via `sequence`, windows via `slice`, one posexplode — a
    * zero-shuffle map stage pipelined into the scan at any scale
    * (streaming-safe: stateless). Short docs yield one (short) chunk. */
  def chunkDocuments(
      docs: DataFrame,
      chunkTokens: Int = 64,
      overlap: Int = 16,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens, "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    docs
      .select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), col("_w"),
        posexplode(expr(
          s"sequence(0, greatest(0, ((size(_w) - $chunkTokens + ${stride - 1}) div $stride) * $stride), $stride)"))
          .as(Seq("chunk_id", "chunk_start")))
      .select(
        col(idCol),
        col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        expr(s"slice(_w, chunk_start + 1, $chunkTokens)").as("_c"))
      .select(col(idCol), col("chunk_id"), col("chunk_start"),
        size(col("_c")).cast("long").as("n_chunk_tokens"),
        concat_ws(" ", col("_c")).as("chunk_text"))
  }

  /** Per-doc benchmark-contamination report — the observability twin of
    * [[decontaminate]]: for every corpus doc, how many of its distinct
    * word `n`-grams also occur in the benchmark set, as count and
    * fraction (0.0 for clean docs; docs too short for any n-gram report
    * NULL fraction). Same scale shape as the drop variant — distinct
    * grams per side, gram-keyed equi-join, never all-pairs — but both
    * per-doc counts come from ONE aggregation over the flagged gram
    * table (a left join against the benchmark set marks each gram, then
    * `count(*)` / `count(flag)` split totals from hits), so the
    * expensive corpus-gram distinct is computed once, not re-evaluated
    * per consuming aggregate. */
  def contaminationReport(
      corpus: DataFrame,
      benchmark: DataFrame,
      n: Int = 6,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val corpusGrams = corpus
      .select(col(idCol), split(col(textCol), " ").as("w"))
      .select(col(idCol), explode(expr(gramsSql(n))).as("ngram"))
      .distinct()
    val benchGrams = benchmark
      .select(split(col(textCol), " ").as("w"))
      .select(explode(expr(gramsSql(n))).as("ngram"))
      .distinct()
      .withColumn("_hit", lit(1))
    val perDoc = corpusGrams
      .join(benchGrams, Seq("ngram"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), count(col("_hit")).as("n_contaminated"))
    corpus.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .withColumn("n_grams", coalesce(col("n_grams"), lit(0L)))
      .withColumn("n_contaminated", coalesce(col("n_contaminated"), lit(0L)))
      .withColumn("contamination",
        when(col("n_grams") > 0,
          col("n_contaminated").cast("double") / col("n_grams")))
  }

  /** Unigram-LM perplexity scoring (the CCNet-style quality signal,
    * Wenzek et al. 2020 §4.3 — docs far from the corpus language model
    * are tail quality): train a unigram model on the corpus itself
    * (p(w) = count/total), score every doc by its mean word log-prob and
    * report perplexity `exp(-avg_logp)`.
    *
    * Exactness discipline: each word's log-prob is rounded to 6 and
    * stored as an integer MICRO-log (×1e6, long), so the per-doc sum is
    * integer arithmetic — addition-order-free across engines — and the
    * only float steps are one division at the end and a round-6 exp.
    *
    * Scale shape: the corpus explodes twice — once collapsed map-side
    * into the vocab model (shuffle = vocab-sized), once for scoring,
    * where the model joins in (broadcast when the vocabulary fits, the
    * usual case). The model total rides a single-partition window over
    * the vocab table, never a second corpus aggregate. */
  def lmScore(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    lmScoreWith(docs, unigramLm(docs, textCol), textCol, idCol)

  /** The unigram model half of [[lmScore]]: (word, round-6 micro-log-
    * prob) trained on `corpus`. A build artifact — persist it and score
    * incremental batches with [[lmScoreWith]] (CCNet proper trains the
    * model on a REFERENCE corpus, e.g. Wikipedia, and scores the crawl
    * under it — exactly this split). */
  def unigramLm(corpus: DataFrame, textCol: String = "text"): DataFrame = {
    val wTot = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    corpus.select(explode(split(col(textCol), " ")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .withColumn("_tt", sum(col("cnt")).over(wTot))
      .withColumn("li",
        round(round(log(col("cnt").cast("double") / col("_tt")), 6) * 1e6).cast("long"))
      .select("w", "li")
  }

  /** The scoring half of [[lmScore]] against an explicit (possibly
    * reference-corpus-trained) model. Out-of-vocabulary words are
    * excluded from the mean (the inner model join drops them) and
    * `n_scored` counts only in-vocab words — callers filtering on
    * coverage can compare `n_scored` to a separate token count. */
  def lmScoreWith(
      docs: DataFrame,
      lm: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("w"))
      .join(lm, "w")
      .groupBy(col(idCol))
      .agg(sum("li").as("_sli"), count(lit(1)).as("n_scored"))
      .withColumn("avg_logp", col("_sli").cast("double") / (col("n_scored") * lit(1000000L)))
      .withColumn("ppl", round(exp(-col("avg_logp")), 6))
      .select(col(idCol), col("n_scored"), col("avg_logp"), col("ppl"))

  /** Frequency-ranked vocabulary of `corpus` — the tokenizer-prep model:
    * the `topV` most frequent words with counts and 1-based ranks, ties
    * at every rank (including the cut) broken alphabetically so any
    * engine builds the identical table. One explode → word aggregate
    * (map-side combined, key space = vocabulary) → `TakeOrderedAndProject`
    * top-V; the rank window runs over the MODEL table (V rows), never the
    * corpus. Like [[unigramLm]] this is a build artifact: persist it and
    * score batches under it. */
  def vocabulary(
      corpus: DataFrame,
      topV: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val byFreq = corpus
      .select(explode(split(col(textCol), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(topV)
    byFreq.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("word").asc)))
  }

  /** Zipf power-law fit over the top-`topV` vocabulary: the least-squares
    * slope of ln(count) against ln(rank) — the canonical "does this
    * corpus look like natural language" diagnostic (natural text sits
    * near −1; machine-generated or boilerplate-heavy corpora drift off).
    * Both logs are round-6 micro INTEGERS, so the five regression moments
    * are exact BIGINT sums over the V-row model table and the slope and
    * intercept are each one exact-integer expression cast to double at
    * the end — bit-identical on any engine. The corpus is touched once
    * (the [[vocabulary]] aggregate); the fit itself runs over V rows. */
  def zipfFit(
      corpus: DataFrame,
      topV: Int = 1000,
      textCol: String = "text"): DataFrame = {
    val xy = vocabulary(corpus, topV, textCol)
      .select(
        round(round(log(col("rank").cast("double")), 6) * 1e6).cast("long").as("_x"),
        round(round(log(col("cnt").cast("double")), 6) * 1e6).cast("long").as("_y"))
    xy.agg(count(lit(1)).as("n_types"),
        sum("_x").as("_sx"), sum("_y").as("_sy"),
        sum(col("_x") * col("_x")).as("_sxx"), sum(col("_x") * col("_y")).as("_sxy"))
      .withColumn("slope",
        round((col("n_types") * col("_sxy") - col("_sx") * col("_sy")).cast("double") /
          (col("n_types") * col("_sxx") - col("_sx") * col("_sx")).cast("double"), 6))
      // intercept reuses the ROUNDED slope, so it is one double expression
      // over already-exact values (micro sums scaled back to nats)
      .withColumn("intercept",
        round((col("_sy").cast("double") / 1e6 -
          col("slope") * (col("_sx").cast("double") / 1e6)) / col("n_types"), 6))
      .select("n_types", "slope", "intercept")
  }

  /** Apply a trained BPE merge list (Sennrich et al. 2016) to every
    * document — the score half of the `tools/TrainBpe` split. Each word
    * becomes its character symbols joined by DOUBLE spaces inside
    * single-space sentinels (symbols never contain spaces, so the
    * delimiting is unambiguous), and each trained merge (a, b) is ONE
    * literal `replace(' a  b ' → ' ab ')` — left-to-right non-overlapping
    * replacement IS greedy BPE application, and both Spark and any SQL
    * engine implement `replace` identically (verified primitive-by-
    * primitive). The whole operator is a per-row expression chain:
    * zero-shuffle, join-free, streaming-safe, linear at any corpus size.
    *
    * Emits per doc: word count, subword count, the compression ratio,
    * and the md5 of the full tokenized stream — so an oracle engine
    * replaying the same merges proves TOKEN-LEVEL parity, not just
    * counts. */
  def applyBpe(
      docs: DataFrame,
      merges: Seq[(String, String)],
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(merges.forall { case (a, b) =>
      !(a + b).exists(ch => ch == '\'' || ch == '"' || ch == '\\' || ch == ' ') },
      "BPE symbols must be quote/backslash/space-free (TrainBpe guarantees this)")
    val chain = merges.foldLeft("' ' || array_join(split(w, ''), '  ') || ' '") {
      case (acc, (a, b)) => s"replace($acc, ' $a  $b ', ' $a$b ')"
    }
    docs
      .selectExpr(idCol, s"$textCol AS _text",
        s"transform(split($textCol, ' '), w -> trim($chain)) AS _toks")
      .selectExpr(
        idCol,
        "CAST(size(split(_text, ' ')) AS BIGINT) AS n_words",
        "aggregate(_toks, CAST(0 AS BIGINT), (acc, t) -> acc + size(split(t, '  '))) AS n_subwords",
        "md5(array_join(_toks, '  ')) AS tok_md5")
      .withColumn("ratio", round(col("n_subwords").cast("double") / col("n_words"), 6))
  }

  /** Per-doc out-of-vocabulary rate under a [[vocabulary]] model — the
    * coverage check that decides whether a tokenizer/vocab fits a corpus
    * slice. Explode → broadcast vocab join (model-sized) → one per-doc
    * aggregate; the rate is a single long/long division. Docs whose every
    * word is OOV (or empty docs — `split` never returns an empty array)
    * report rate 1.0 with `in_vocab` 0. */
  def oovRate(
      docs: DataFrame,
      vocab: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs.select(col(idCol), explode(split(col(textCol), " ")).as("word"))
      .join(broadcast(vocab.select(col("word"), lit(1).as("_hit"))), Seq("word"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), count(col("_hit")).as("in_vocab"))
      .withColumn("oov_rate",
        (col("n_words") - col("in_vocab")).cast("double") / col("n_words"))
      .select(col(idCol), col("n_words"), col("in_vocab"), col("oov_rate"))

  /** ASCII text canonicalization — the normalization stage that runs
    * BEFORE dedup/fingerprinting so cosmetic variants (case, punctuation,
    * whitespace runs) collapse to one canonical form: lowercase, replace
    * every char outside `[a-z0-9 ]` with a space, collapse space runs,
    * trim. Pure per-row `lower`/`regexp_replace` chain — join-free,
    * stateless, streaming-safe, one map stage at any scale; the regexes
    * are in the Java ∩ RE2 subset so any engine replays them verbatim.
    * Emits the canonical text, its md5 60-bit fingerprint (feed to
    * dedup), and a `changed` flag. */
  def normalizeText(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val norm = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[^a-z0-9 ]", " "), " +", " "))
    docs
      .withColumn("norm_text", norm)
      .withColumn("norm_fp",
        conv(substring(md5(col("norm_text")), 1, 15), 16, 10).cast("long"))
      .withColumn("changed",
        when(col("norm_text") === col(textCol), 0).otherwise(1))
      .select(col(idCol), col("norm_text"), col("norm_fp"), col("changed"),
        length(col("norm_text")).cast("long").as("n_chars_norm"))
  }

  /** Tokenize to ids under a [[vocabulary]] model — the APPLY step of the
    * tokenizer-prep pair: each word becomes its vocab rank, OOV words
    * become id 0 (the UNK token), positions are 1-based. One posexplode +
    * broadcast model join — map-only at any scale, the id table is
    * (doc, pos)-keyed for direct sequence reassembly (`sort within doc`)
    * or packing ([[packSequences]]). */
  def tokenize(
      docs: DataFrame,
      vocab: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame =
    docs
      .select(col(idCol), posexplode(split(col(textCol), " ")).as(Seq("_p", "word")))
      .join(broadcast(vocab.select(col("word"), col("rank"))), Seq("word"), "left")
      .select(col(idCol), (col("_p") + 1).cast("int").as("pos"),
        coalesce(col("rank"), lit(0)).cast("int").as("token_id"))

  /** Round-6 micro log of ln(0.4) — the stupid-backoff discount (Brants
    * et al. 2007); a literal so both engines share the identical value. */
  val StupidBackoffMicro: Long = -916291L

  /** Bigram model half of [[bigramScoreWith]]: conditional log-probs
    * `li2(w1 w2) = round-6 micro ln(c(w1,w2) / c(w1))` trained on
    * `corpus`. Two explode aggregates (word and word-pair key spaces,
    * map-side combined) + one join on w1 — model-sized output, a build
    * artifact like [[unigramLm]] (which supplies the backoff tier). */
  def bigramLm(corpus: DataFrame, textCol: String = "text"): DataFrame = {
    val w = corpus.select(split(col(textCol), " ").as("_w"))
    val uni = w.select(explode(col("_w")).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("_c1"))
    w.select(explode(expr(bigramPairsSql)).as("_b"))
      .select(col("_b.w1").as("w1"), col("_b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("_c2"))
      .join(uni, "w1")
      .withColumn("li2",
        round(round(log(col("_c2").cast("double") / col("_c1")), 6) * 1e6).cast("long"))
      .select("w1", "w2", "li2")
  }

  private def bigramPairsSql: String =
    "CASE WHEN size(_w) >= 2 THEN transform(sequence(0, size(_w) - 2), " +
      "i -> struct(_w[i] AS w1, _w[i + 1] AS w2)) " +
      "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) END"

  /** PMI collocation mining: the corpus's top-`topK` adjacent word pairs
    * by pointwise mutual information `ln(p(w1,w2) / (p(w1)·p(w2)))`, with
    * probabilities taken over the bigram table's own margins (left margin
    * `cl = Σ_y c(w1,y)`, right margin `cr = Σ_x c(x,w2)`, total `T`) —
    * the standard collocation-extraction tool (Church & Hanks 1990) for
    * building tokenizer merge lists and spotting boilerplate phrases.
    * `minCount` drops the unstable low-frequency tail first.
    *
    * Shape: ONE corpus explode-aggregate to the (w1, w2) count table,
    * then margins and total ride windows over that model-sized table —
    * the corpus is never rescanned (the [[sourceDrift]] pattern). PMI is
    * a round-6 micro integer, so ranking is engine-exact; ties break on
    * the words. */
  def collocations(
      corpus: DataFrame,
      minCount: Long = 5L,
      topK: Int = 50,
      textCol: String = "text"): DataFrame = {
    val c2 = corpus.select(split(col(textCol), " ").as("_w"))
      .select(explode(expr(bigramPairsSql)).as("_b"))
      .select(col("_b.w1").as("w1"), col("_b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    c2
      .withColumn("_cl", sum("n").over(Window.partitionBy("w1")))
      .withColumn("_cr", sum("n").over(Window.partitionBy("w2")))
      .withColumn("_t", sum("n").over(Window.partitionBy()))
      .filter(col("n") >= minCount)
      .withColumn("_pm",
        round(round(log((col("n") * col("_t")).cast("double") /
          (col("_cl") * col("_cr"))), 6) * 1e6).cast("long"))
      .orderBy(col("_pm").desc, col("w1").asc, col("w2").asc)
      .limit(topK)
      .select(col("w1"), col("w2"), col("n"),
        (col("_pm").cast("double") / 1000000L).as("pmi"))
  }

  /** Bigram perplexity with STUPID BACKOFF against explicit (possibly
    * reference-trained) models: each doc bigram scores `li2(w1 w2)` when
    * the bigram is in the model, else discount + `li1(w2)` from the
    * unigram tier, else discount + `unkMicro` (caller-fixed UNK floor) —
    * one coalesce over two broadcast-model left joins, so every score is
    * an integer micro sum and the whole stage is join-free of the corpus
    * beyond one explode. Docs with < 2 words emit nothing (q74
    * semantics). `n_backoff` counts backed-off bigrams — the coverage
    * signal a reference-model deployment monitors. */
  def bigramScoreWith(
      docs: DataFrame,
      bi: DataFrame,
      uniLm: DataFrame,
      unkMicro: Long = -20000000L,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val pairs = docs
      .select(col(idCol), split(col(textCol), " ").as("_w"))
      .select(col(idCol), explode(expr(bigramPairsSql)).as("_b"))
      .select(col(idCol), col("_b.w1").as("w1"), col("_b.w2").as("w2"))
    pairs
      .join(broadcast(bi), Seq("w1", "w2"), "left")
      .join(broadcast(uniLm.select(col("w").as("w2"), col("li").as("_li1"))),
        Seq("w2"), "left")
      .withColumn("_m", coalesce(col("li2"),
        lit(StupidBackoffMicro) + coalesce(col("_li1"), lit(unkMicro))))
      .withColumn("_bo", when(col("li2").isNull, 1L).otherwise(0L))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), sum("_bo").as("n_backoff"),
        sum("_m").as("_sm"))
      .withColumn("avg_logp",
        col("_sm").cast("double") / (col("n_bigrams") * lit(1000000L)))
      .withColumn("ppl", round(exp(-col("avg_logp")), 6))
      .select(col(idCol), col("n_bigrams"), col("n_backoff"), col("avg_logp"), col("ppl"))
  }

  /** Per-source vocabulary drift vs the corpus: KL(p_source ‖ p_corpus)
    * over word distributions — the observability stat that flags a domain
    * whose language shifted (crawl rot, SEO injection, template changes).
    *
    * Exactness shape: the per-(source, word) log-ratio
    * `li = round-6 micro ln((c_sw·T)/(T_s·c_w))` is integer; the KL sum
    * `Σ c_sw·li / (T_s·1e6)` divides ONCE at the end, so engines agree
    * bit-for-bit. Plan shape: one explode → (source, word) aggregate
    * (map-side combined); T_s, c_w and T all ride windows over that
    * MODEL-sized table (sources × vocab), never a second corpus pass. */
  def sourceDrift(
      docs: DataFrame,
      sourceCol: String = "source",
      textCol: String = "text"): DataFrame = {
    val sw = docs
      .select(col(sourceCol).as("src"), explode(split(col(textCol), " ")).as("w"))
      .groupBy("src", "w").agg(count(lit(1)).as("c_sw"))
    val wSrc = Window.partitionBy("src")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wWord = Window.partitionBy("w")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wAll = Window.partitionBy(lit(0))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sw
      .withColumn("_ts", sum("c_sw").over(wSrc))
      .withColumn("_cw", sum("c_sw").over(wWord))
      .withColumn("_t", sum("c_sw").over(wAll))
      .withColumn("_li",
        round(round(log((col("c_sw") * col("_t")).cast("double") /
          (col("_ts") * col("_cw"))), 6) * 1e6).cast("long"))
      .groupBy(col("src").as(sourceCol))
      .agg(max("_ts").as("n_words"),
        sum(col("c_sw") * col("_li")).as("_klm"))
      .withColumn("kl",
        col("_klm").cast("double") / (col("n_words") * lit(1000000L)))
      .select(col(sourceCol), col("n_words"), col("kl"))
  }

  /** PII patterns for [[redactPii]] — deliberately in the Java ∩ RE2
    * regex subset (no lookaround, no backrefs) so any SQL engine replays
    * them verbatim. */
  val EmailRegex: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Regex: String = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRegex: String = "\\b[0-9]{3}[-. ][0-9]{4}\\b"

  /** PII scrub — the standard redaction stage of a cleaning pipeline:
    * emails, IPv4 addresses and phone-shaped digit runs replaced by
    * `<EMAIL>`/`<IP>`/`<PHONE>` tokens, with per-doc match counts. A pure
    * `regexp_count` + `regexp_replace` chain: per-row, join-free and
    * stateless, so it runs unchanged on a stream (composes with
    * `cleanIngest`) and costs one map stage at any scale. Replacement
    * order is fixed (email → ip → phone): email local parts and IPv4
    * octets both contain digit runs a later phone pass could otherwise
    * clip differently. */
  /** The replacement chain of [[redactPii]] as a bare Column (for callers
    * that only want the scrubbed text, e.g. `cleanIngest`). */
  def redactedText(t: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(t, lit(EmailRegex), lit("<EMAIL>")),
        lit(Ipv4Regex), lit("<IP>")),
      lit(PhoneRegex), lit("<PHONE>"))

  def redactPii(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    // each count is taken on its stage's INPUT text, so n_redactions
    // equals the number of tokens actually written — a phone-shaped run
    // inside an email local part is consumed by the email pass and not
    // double-counted
    val t = col(textCol)
    val afterEmail = regexp_replace(t, lit(EmailRegex), lit("<EMAIL>"))
    val afterIp = regexp_replace(afterEmail, lit(Ipv4Regex), lit("<IP>"))
    docs
      .withColumn("n_emails", regexp_count(t, lit(EmailRegex)).cast("long"))
      .withColumn("n_ips", regexp_count(afterEmail, lit(Ipv4Regex)).cast("long"))
      .withColumn("n_phones", regexp_count(afterIp, lit(PhoneRegex)).cast("long"))
      .withColumn("n_redactions", col("n_emails") + col("n_ips") + col("n_phones"))
      .withColumn("redacted", regexp_replace(afterIp, lit(PhoneRegex), lit("<PHONE>")))
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

  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    * SIGMOD'03 — the MOSS rolling-hash scheme): hash every `k`-word gram,
    * slide a window of `winSize` consecutive gram hashes, record the
    * minimum of each window, and keep the distinct minima as the
    * document's fingerprint set. The guarantee: any shared word run of
    * length >= winSize + k - 1 between two documents produces at least one
    * shared fingerprint; density of selected hashes is ~2/(winSize+1).
    *
    * Entirely row-local (one projection, no shuffle): the gram hashes and
    * window minima are array transforms over the split word array. Hash =
    * 60-bit md5 prefix, the library-wide oracle-portable convention.
    *
    * Output: (doc_id, fp) — one row per distinct fingerprint, ready for
    * posting-list joins.
    */
  def winnowFingerprints(
      docs: DataFrame,
      k: Int = 3,
      winSize: Int = 4,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val ws = split(col(textCol), " ")
    // documents shorter than k words degenerate to one whole-text gram;
    // fewer than winSize grams to one window (slice clamps at the end on
    // both engines, so the arithmetic needs no special-casing beyond >=1)
    val nGrams = greatest(size(ws) - lit(k - 1), lit(1))
    val hs = transform(sequence(lit(0), nGrams - 1),
      i => conv(substring(md5(array_join(slice(ws, i + 1, lit(k)), " ")), 1, 15), 16, 10)
        .cast("long"))
    docs
      .select(col(idCol), hs.as("hs"))
      .select(col(idCol),
        explode(array_distinct(transform(
          sequence(lit(0), greatest(size(col("hs")) - lit(winSize - 1), lit(1)) - 1),
          j => array_min(slice(col("hs"), j + 1, lit(winSize)))))).as("fp"))
  }

  /** Fingerprint-overlap pairs over winnowed documents: a posting-list
    * self-join on fingerprint, scored by the number of shared
    * fingerprints. Fingerprints appearing in more than `maxDf` documents
    * are dropped first (the standard posting-list cap: they carry no
    * discriminative signal and their pair fan-out is quadratic in df —
    * with the cap, fan-out per fingerprint is bounded by maxDf^2, so the
    * join scales linearly in corpus size at 100 TB).
    *
    * df rides a window over the single posting table; the self-join is a
    * hash join on the 60-bit fingerprint; minShared filters noise pairs.
    */
  def winnowOverlap(
      docs: DataFrame,
      k: Int = 3,
      winSize: Int = 4,
      maxDf: Int = 10,
      minShared: Int = 2,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val fps = winnowFingerprints(docs, k, winSize, textCol, idCol)
    val dfWin = Window.partitionBy(col("fp"))
    val posted = fps
      .withColumn("df", count(lit(1)).over(dfWin))
      .filter(col("df") <= maxDf)
      .select(col(idCol), col("fp"))
    posted.as("a")
      .join(posted.as("b"),
        col("a.fp") === col("b.fp") && col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("d1"), col(s"b.$idCol").as("d2"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** N-gram novelty score: per document, the fraction of its DISTINCT
    * word n-grams that appear in no other document — a direct "how much
    * genuinely new text does this doc contribute" curation signal (the
    * complement of the duplication family: high novelty ⇒ keep, near-zero
    * novelty ⇒ the doc is stitched from corpus boilerplate).
    *
    * Shape: per-doc distinct grams (row-local array ops), ONE explode to
    * (doc, gram), the gram document-frequency as a window count over the
    * gram partition (no second corpus scan — the ADVICE subtree-reuse
    * rule), then a per-doc aggregate. Two shuffles total, both on keys
    * that hash evenly (gram text, doc id); counts exact, the fraction one
    * long/long division. */
  /** Character-class profile: per-doc counts and fractions of letters,
    * digits, spaces, and sentence punctuation — the cheap structural
    * quality features (a doc that is 40% digits is a table dump; 0%
    * spaces is a blob). Pure replace-based counting like [[quality]]'s
    * punct ratio — portable regex, zero shuffles, streaming-safe. */
  def charClasses(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    def cnt(pattern: String) =
      (length(col(textCol)) -
        length(regexp_replace(col(textCol), pattern, ""))).cast("long")
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars"),
      cnt("[A-Za-z]").as("n_letters"),
      cnt("[0-9]").as("n_digits"),
      cnt(" ").as("n_spaces"),
      cnt("[.,!?;]").as("n_punct"))
      .withColumn("letter_frac",
        when(col("n_chars") > 0, col("n_letters").cast("double") / col("n_chars")))
      .withColumn("digit_frac",
        when(col("n_chars") > 0, col("n_digits").cast("double") / col("n_chars")))
  }

  /** SQL fragment: `(run_count, Σ c·round(ln(c)·1e6))` fold pieces for
    * [[charEntropy]] — micro-log integers so the per-doc entropy is a
    * single exact-integer numerator over one division. */
  private def lnMicroSql(c: String): String =
    s"CAST(round(ln(CAST($c AS DOUBLE)) * 1e6) AS BIGINT)"

  /** Per-document character-level Shannon entropy (nats) — the classic
    * low-entropy filter for binary junk / repeated-char spam and
    * high-entropy filter for encrypted/base64 blobs in pretraining
    * pipelines.
    *
    * entropy = ln(n) − (1/n)·Σ c·ln(c) over the character histogram,
    * computed as (n·lnµ(n) − Σ c·lnµ(c)) / (n·1e6) with lnµ = round(ln·1e6)
    * — micro-log INTEGERS, so the numerator is exact and the whole value
    * is one division (engine-bit-identical; the 1-ulp libm differences
    * die in the micro rounding).
    *
    * Scale: entirely per-row — a char sort + run-length fold via
    * higher-order functions, zero shuffles, streaming-safe. */
  def charEntropy(
      docs: DataFrame,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val finishRun = s"IF(s.run = 0L, 0L, s.run * ${lnMicroSql("s.run")})"
    val fold =
      s"""aggregate(array_sort(split($textCol, '')),
         named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'acc', 0L, 'uniq', 0L),
         (s, x) -> IF(x <=> s.prev,
           named_struct('prev', x, 'run', s.run + 1L, 'acc', s.acc, 'uniq', s.uniq),
           named_struct('prev', x, 'run', 1L, 'acc', s.acc + $finishRun, 'uniq', s.uniq + 1L)),
         s -> named_struct('acc', s.acc + $finishRun, 'uniq', s.uniq))"""
    docs.select(
      col(idCol),
      length(col(textCol)).cast("long").as("n_chars_total"),
      expr(fold).as("_f"))
      .withColumn("n_unique_chars", col("_f.uniq"))
      .withColumn("entropy",
        when(col("n_chars_total") > 0,
          (col("n_chars_total") * expr(lnMicroSql("n_chars_total")) - col("_f.acc"))
            .cast("double") / (col("n_chars_total").cast("double") * 1e6)))
      .select(idCol, "n_chars_total", "n_unique_chars", "entropy")
  }

  /** HTML/XML → text (the WET-style extraction step every web-scale
    * corpus ingest starts with; reference scope: none — pyresample has
    * no text surface): drop script/style/comment blocks, turn the
    * remaining tags into spaces (so adjacent text nodes don't fuse),
    * decode the six ubiquitous entities (&amp; LAST so `&amp;lt;` decodes
    * to the literal `&lt;`, not twice), collapse whitespace. A pure
    * per-row `regexp_replace`/`replace` chain — codegen, zero shuffles,
    * streaming-safe; composes in front of `cleanIngest`'s quality gates.
    * Regex subtleties live Spark-side only: q211's oracle rebuilds the
    * expected clean text from the known generator, so the chain is
    * checked against ground truth, not against another regex engine. */
  def stripHtml(html: Column): Column = {
    // tag bodies are matched quoted-attribute-aware ((?:[^>"']|"..."|'...')*)
    // so `<div title="a>b">` consumes through the closing `>` instead of
    // truncating at the quoted one (r11; the plain [^>]* form truncated)
    val tagBody = """(?:[^>"']|"[^"]*"|'[^']*')*"""
    val noBlocks = regexp_replace(html,
      s"(?is)<(script|style)$tagBody>.*?</\\1\\s*>", " ")
    val noComments = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComments, s"<$tagBody>", " ")
    // residual fallback (r12): the quote-aware body cannot match a tag
    // holding an UNPAIRED quote (legal-HTML5 unquoted attribute values
    // like <div data-name=O'Brien>, or mismatched quotes in crawl data),
    // so such pseudo-tags would leak raw into clean_text. Degrade them to
    // spacing with the plain [^>]* form — a no-op on anything the
    // quote-aware pass already consumed (a survivor of that pass matches
    // <[^>]*> only if its body has an unpaired quote), and it runs BEFORE
    // entity decoding so a decoded literal &lt;x&gt; still survives.
    val noResidual = regexp_replace(noTags, "<[^>]*>", " ")
    val decoded = Seq(
      "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noResidual) { case (c, (ent, v)) => replace(c, lit(ent), lit(v)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Canonical URL for dedup/grouping (the shared convention of web
    * pipeline dedup stages): drop the fragment; lowercase scheme+host;
    * drop default ports (:80 http, :443 https) and a `www.` prefix;
    * strip tracking parameters (utm_*, fbclid, gclid) with separator
    * repair; drop a trailing `?`/`&` and ONE trailing slash; sort the
    * surviving query parameters (r11 — `?b=2&a=1` ≡ `?a=1&b=2`, the
    * standard canonicalization the pre-r11 chain missed). Pure codegen
    * string ops — zero shuffles, streaming-safe. */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // authority prefix = scheme://host[:port] (everything before the
    // first /, ? past the //) — the only case-insensitive part of a URL
    val pfx = regexp_extract(noFrag, "^([^/?#]*//[^/?#]*)", 1)
    val rest = substring(noFrag, length(pfx) + 1, lit(Int.MaxValue))
    val lowPfx = lower(pfx)
    val noPort = regexp_replace(
      regexp_replace(lowPfx, "^(https://[^/:]*):443$", "$1"),
      "^(http://[^/:]*):80$", "$1")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    val noTrack = regexp_replace(concat(noWww, rest),
      "([?&])(utm_[^=&]*|fbclid|gclid)=[^&]*", "$1")
    val repaired = regexp_replace(
      regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&")
    val noDangle = regexp_replace(repaired, "[?&]+$", "")
    val noSlash = regexp_replace(noDangle, "([^/])/$", "$1")
    // sort surviving query params: split off the query string, array_sort
    // the &-separated params lexicographically, rejoin — still per-row
    // codegen (no explode, no shuffle)
    val path = regexp_replace(noSlash, "\\?.*$", "")
    val qs = regexp_extract(noSlash, "\\?(.*)$", 1)
    when(qs === "", path)
      .otherwise(concat(path, lit("?"), array_join(array_sort(split(qs, "&")), "&")))
  }

  def noveltyScore(
      docs: DataFrame,
      n: Int = 3,
      textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val grams = docs
      .withColumn("_w", split(col(textCol), " "))
      .select(col(idCol),
        explode(expr(s"array_distinct(${gramsSql(n, "_w")})")).as("gram"))
    val withDf = grams
      .withColumn("df", count(lit(1)).over(Window.partitionBy(col("gram"))))
    withDf.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty", col("n_novel").cast("double") / col("n_grams"))
  }
}
