package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured scaling evidence (VERDICT r5 next-round #5): run the heaviest
  * queries at sf0.1 and at a synthetic 10x blow-up of the same tables,
  * and report the observed time ratio + scaling exponent per query
  * (exp = log10(t10/t1); 1.0 = perfectly linear on fixed cores).
  *
  * The blow-up unions 10 shifted copies of each SOURCE table so the
  * workload grows 10x WITHOUT changing its nature:
  *  - lineitem: keys shift by the copy index only (+i) — the derived
  *    swath coordinates decorrelate per copy while key magnitudes stay
  *    inside the bit budget of packed-key expressions (large additive
  *    offsets overflow q42's source-point key under ANSI mode);
  *  - customer (the target grid) stays UNSCALED: the natural reading of
  *    "10x the data" for resampling is 10x the swath onto the same grid —
  *    scaling both sides would measure an artificial quadratic join;
  *  - documents: ids shift, and every word gets a per-copy suffix, so
  *    gram/fingerprint key spaces grow 10x with NO cross-copy near-dup
  *    pairs (10 verbatim copies would instead create O(100x) candidate
  *    pairs and measure a different, artificially-quadratic workload).
  *
  * Usage: sbt "runMain graft.tools.ScaleBench" — writes the blow-up to
  * target/tmp/ once (reused across runs), prints one JSON line.
  */
object ScaleBench {
  private val HeavyQueries =
    Seq("q25_minhash_lsh", "q42_gauss_stere", "q45_bilinear_stere",
      "q56_repeated_ngrams", "q63_decontaminate", "q64_neardup_clusters",
      "q66_remove_boilerplate", "q67_semantic_dedup", "q69_quantized_topk",
      "q70_tfidf_terms", "q75_bm25", "q76_dsir_weights", "q80_curated_shards",
      "q81_bm25_batch", "q87_top_fraction", "q88_domain_cap",
      "q106_source_overlap", "q107_decay_features",
      "q108_semantic_decontaminate", "q109_containment",
      "q131_rolling_median", "q133_pagerank", "q134_novelty",
      "q136_triangles", "q142_kcore", "q151_top_paths",
      "q159_hll_distinct", "q160_cms_heavy", "q161_bloom_prefilter",
      "q167_bfs_hops", "q168_ddsketch",
      "q175_setsim_join", "q176_ewma", "q180_phrase_search",
      "q181_bitmap_overlap", "q182_interval_merge", "q183_star_revenue",
      "q184_hll_cube", "q185_abandonment",
      "q186_dominant_supplier", "q187_ivm", "q188_fifo_match",
      "q189_weighted_hops", "q190_srm_check", "q191_mix_rate",
      "q192_sketch_error", "q193_share_rollup", "q194_mahalanobis",
      "q195_scd2_enrich", "q196_margin_ivf",
      "q199_bucket_utm", "q200_bucket_sinu", "q201_bucket_aea",
      "q202_bucket_ortho", "q203_media_headers",
      "q204_pq_adc", "q205_ivfpq",
      "q206_pack_slices", "q207_substr_dedup",
      "q208_bucket_rotated", "q209_bucket_cea",
      "q210_ivfpq_indexed", "q211_web_ingest", "q212_image_neardup",
      "q213_opq_adc", "q214_audio_neardup", "q215_minhash_index",
      "q216_cluster_split", "q217_ivf_range", "q218_pipeline_report",
      "q219_lsh_bandcap", "q220_index_delete",
      "q221_image_dup_classes", "q222_fp_capped", "q223_ivf_range_indexed", "q224_fp_index", "q225_cosine_bandcap",
      "q226_minhash_clusters", "q227_incremental_clusters",
      "q228_delta_clusters", "q229_chain_read")
  // q100_margin_mine is deliberately NOT in the default sweep: both its
  // sides scale with embeddings, so the exact cross join is O(100x) at a
  // 10x blow-up — the measured quadratic is recorded once in SCALING.md
  // (run SPARK_GRAFT_SCALE_ONLY=q100 to reproduce). q196 is the
  // IVF-composed production path: a constant-factor nProbe/k reduction
  // at fixed centroid count (still |Q|·|C|-class asymptotically), linear
  // only under the k ∝ √n training discipline that keeps per-cell
  // occupancy bounded — the sweep's fixed k=8 measures the former.

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"target/tmp/${base.split('/').last}x$factor")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt.max(1)
    val spark = graft.functions.GraftExtensions.install(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // orders is the newest table in the layout — checking it (not just
    // documents) forces a rebuild of scale dirs created by older versions
    // that lacked the pass-through dimension copies
    // SPARK_GRAFT_SCALE_TABLES=docs,emb builds ONLY the named blow-ups —
    // the 50x stress mode (r12, extended r13): the dedup/components/index
    // families touch documents alone, the ANN families embeddings alone,
    // and a 50x lineitem/events build would cost more than the
    // measurements it feeds. Values: docs, emb, events, all (default).
    val tables = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set("all"))
    // loud input validation (r13 advice): an unknown table name would
    // silently build nothing and measure the wrong workload
    val knownTables = Set("all", "docs", "dupdocs", "emb", "events")
    require(tables.subsetOf(knownTables),
      s"SPARK_GRAFT_SCALE_TABLES: unknown ${tables.diff(knownTables).mkString(",")} — " +
        s"valid values: ${knownTables.toSeq.sorted.mkString(",")}")
    require(!(tables.contains("dupdocs") && (tables.contains("docs") || tables.contains("all"))),
      "docs/all and dupdocs build documents.parquet with DIFFERENT contents — " +
        "build them into separate SPARK_GRAFT_SCALE_DIRs")
    def wants(t: String) = tables.contains("all") || tables.contains(t)
    // documents.parquet is mode-stamped: 'docs' (key-shifted blow-up) and
    // 'dupdocs' (verbatim replication) share the filename, so a skip on
    // an existing file from the OTHER mode would silently measure the
    // wrong workload (r13 advice) — fail loudly on mode mismatch instead
    val docsStamp = new java.io.File(s"$out/_graft_docs_mode")
    def writeDocsStamp(mode: String): Unit = {
      new java.io.File(out).mkdirs()
      val w = new java.io.PrintWriter(docsStamp, "UTF-8")
      try w.print(mode) finally w.close()
    }
    def requireDocsMode(mode: String): Unit =
      if (new java.io.File(s"$out/documents.parquet").exists()) {
        val stored =
          if (docsStamp.exists())
            scala.io.Source.fromFile(docsStamp, "UTF-8").mkString.trim
          else "docs" // pre-stamp dirs only ever held the plain blow-up
        require(stored == mode,
          s"$out/documents.parquet was built in mode '$stored' but this run wants " +
            s"'$mode' — point SPARK_GRAFT_SCALE_DIR elsewhere or delete $out")
      }
    if (wants("all") && (!new java.io.File(s"$out/documents.parquet").exists() ||
        !new java.io.File(s"$out/orders.parquet").exists())) {
      System.err.println(s"[scale] building ${factor}x blow-up at $out")
      blowUpKeys(spark, base, out, "lineitem",
        Seq("l_orderkey", "l_partkey", "l_suppkey"), factor)
      // dimension-side tables stay UNSCALED (same semantics as the fixed
      // customer target grid: 10x the facts onto the same dimensions)
      for (t <- Seq("customer", "orders", "nation", "region", "supplier", "part"))
        spark.read.parquet(s"$base/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    if (wants("docs")) {
      requireDocsMode("docs")
      if (!new java.io.File(s"$out/documents.parquet").exists()) {
        System.err.println(s"[scale] building ${factor}x documents blow-up at $out")
        blowUpDocs(spark, base, out, factor)
        writeDocsStamp("docs")
      }
    }
    // dupdocs (r13): VERBATIM copies — ids shift, text/n_chars unchanged,
    // so every exact-duplicate class grows ×factor and the near-dup pair
    // table grows ×factor² in the uncollapsed formulation. This is the
    // adversarial replicated-corpus workload the exact-class collapse
    // (Dedup.ngramClusterLabels) exists for: collapsed, the rep set —
    // hence pair generation and label propagation — stays EXACTLY the
    // base corpus's regardless of factor.
    if (wants("dupdocs")) {
      requireDocsMode("dupdocs")
      if (!new java.io.File(s"$out/documents.parquet").exists()) {
        System.err.println(s"[scale] building ${factor}x VERBATIM documents blow-up at $out")
        val src = spark.read.parquet(s"$base/documents.parquet")
        val off = src.agg(max(col("doc_id"))).head().getLong(0) + 1L
        (0 until factor).map(i => src.withColumn("doc_id", col("doc_id") + lit(i * off)))
          .reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/documents.parquet")
        writeDocsStamp("dupdocs")
      }
    }
    if (wants("emb") && !new java.io.File(s"$out/embeddings.parquet").exists()) {
      System.err.println(s"[scale] building ${factor}x embeddings blow-up at $out")
      blowUpEmbeddings(spark, base, out, factor)
    }
    if (wants("events") && !new java.io.File(s"$out/events.parquet").exists()) {
      System.err.println(s"[scale] building ${factor}x events blow-up at $out")
      blowUpEvents(spark, base, out, factor)
    }

    // shuffle-byte meter (r12: the 50x rows record bytes, not just wall
    // time): stage-completion events aggregate task shuffle writes; the
    // 300 ms settle after each timed run lets the async bus drain —
    // approximate by a few stages at worst, plenty for growth SHAPE
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val shuffleListener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(shuffleListener)

    def time(dir: String, name: String): (Double, Long) = {
      val fn = graft.SparkEntry.queries(name)
      val runs = (1 to iters).map { _ =>
        spark.catalog.clearCache()
        // and RDD-level leftovers (localCheckpoint/persist from earlier
        // queries) — same late-suite pressure fix as graft.Bench
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        Thread.sleep(300) // drain listener bus from the previous run
        val sw0 = shuffleBytes.get()
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        val t = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        (t, shuffleBytes.get() - sw0)
      }
      // report the shuffle bytes OF THE RUN whose time is reported (r13
      // advice: min-time paired with last-run bytes could mix two runs)
      runs.minBy(_._1)
    }
    // dev aid: SPARK_GRAFT_SCALE_ONLY=q175,q183 limits to matching name
    // prefixes — resolved against ALL registered queries, so off-sweep
    // baselines (q100's deliberate quadratic) stay reproducible
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY").map(_.split(",").toSeq)
    val selected = only match {
      case Some(pfx) =>
        graft.SparkEntry.queries.keys.toSeq.sorted.filter(q => pfx.exists(q.startsWith))
      case None => HeavyQueries
    }
    val rows = selected.map { q =>
      val (t1, sw1) = time(base, q)
      val (tN, swN) = time(out, q)
      val ratio = tN / t1
      val exp = math.log(ratio) / math.log(factor)
      val swRatio = if (sw1 > 0) swN.toDouble / sw1 else 0.0
      System.err.println(f"[scale] $q%-22s t1=$t1%7.2fs t$factor=$tN%7.2fs ratio=$ratio%5.2f " +
        f"exp=$exp%4.2f sw1=${sw1 / 1048576.0}%8.1fMB sw$factor=${swN / 1048576.0}%8.1fMB swx=$swRatio%5.2f")
      s""""$q":{"t1":${f"$t1%.2f"},"t$factor":${f"$tN%.2f"},"ratio":${f"$ratio%.2f"},"exp":${f"$exp%.2f"},""" +
        s""""shuffle_mb_1":${f"${sw1 / 1048576.0}%.1f"},"shuffle_mb_$factor":${f"${swN / 1048576.0}%.1f"}}"""
    }
    println(s"""{"metric":"scale","factor":$factor,"iters":$iters,"queries":{${rows.mkString(",")}}}""")
    spark.sparkContext.removeSparkListener(shuffleListener)
    spark.stop()
  }

  /** Union `factor` copies with each key column shifted by just the copy
    * index: the modular coordinate formulas decorrelate the copies while
    * key magnitudes stay essentially unchanged (packed-key safe). */
  private def blowUpKeys(
      spark: SparkSession, base: String, out: String,
      name: String, keyCols: Seq[String], factor: Int): Unit = {
    val src = spark.read.parquet(s"$base/$name.parquet")
    val copies = (0 until factor).map { i =>
      keyCols.foldLeft(src) { (df, k) => df.withColumn(k, col(k) + lit(i.toLong)) }
    }
    copies.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$out/$name.parquet")
  }

  /** Embeddings blow-up: shifted ids + per-copy cyclic rotation of the
    * vector (copy 0 stays verbatim). Rotation keeps the norm and, for
    * generic vectors, decorrelates the copies — so ANN/dedup candidate
    * spaces grow ~10x without planting 10 exact duplicates of every
    * vector (which would measure an artificial all-dup workload). The id
    * offset is chosen ≢ 0 (mod 100) so the `vec_id % 100 = 0` QUERY set
    * stays the unscaled copy-0 set — "10x the corpus, same queries",
    * mirroring the fixed resampling target grid. */
  private def blowUpEmbeddings(
      spark: SparkSession, base: String, out: String, factor: Int): Unit = {
    val src = spark.read.parquet(s"$base/embeddings.parquet")
    val maxId = src.agg(max(col("vec_id"))).head().getLong(0)
    val off = ((maxId / 100) + 1) * 100 + 7 // ≢ 0 mod 100 for copies 1..9
    val copies = (0 until factor).map { i =>
      val shifted = src.withColumn("vec_id", col("vec_id") + lit(i * off))
      if (i == 0) shifted
      else shifted.withColumn("embedding", expr(
        s"concat(slice(embedding, ${i + 1}, size(embedding) - $i), slice(embedding, 1, $i))"))
    }
    copies.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
  }

  /** Events blow-up: shifted event AND user ids per copy — 10x the users,
    * 10x the traffic over the SAME time range (the honest reading of "10x
    * the event stream": per-user history lengths and session shapes stay
    * the data's own; a ts shift would instead serialize the time axis,
    * and reusing user ids would 10x every history length and measure a
    * different, denser workload). */
  private def blowUpEvents(spark: SparkSession, base: String, out: String, factor: Int): Unit = {
    val src = spark.read.parquet(s"$base/events.parquet")
    val (maxEv, maxUs) = {
      val r = src.agg(max(col("event_id")), max(col("user_id"))).head()
      (r.getLong(0) + 1L, r.getLong(1) + 1L)
    }
    val copies = (0 until factor).map { i =>
      src.withColumn("event_id", col("event_id") + lit(i * maxEv))
        .withColumn("user_id", col("user_id") + lit(i * maxUs))
    }
    copies.reduce(_ unionByName _).write.mode("overwrite").parquet(s"$out/events.parquet")
  }

  /** Documents blow-up: shifted ids + per-copy word suffix (copy 0 stays
    * verbatim), so dedup/gram key spaces scale without cross-copy hits. */
  private def blowUpDocs(spark: SparkSession, base: String, out: String, factor: Int): Unit = {
    val src = spark.read.parquet(s"$base/documents.parquet")
    val off = src.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val copies = (0 until factor).map { i =>
      val shifted = src.withColumn("doc_id", col("doc_id") + lit(i * off))
      if (i == 0) shifted
      else shifted.withColumn("text", regexp_replace(col("text"), "(\\S+)", "$1x" + i))
    }
    copies.reduce(_ unionByName _)
      // keep derived metadata consistent with the rewritten text: a stale
      // n_chars would give all copies of a doc identical block keys and
      // reintroduce the cross-copy candidate pairs this construction
      // exists to avoid (q26/q64 block on (lang, n_chars))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
  }
}
