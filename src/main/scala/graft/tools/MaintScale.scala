package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 50× measurement of the INCREMENTAL cluster-maintenance plane (r14,
  * verdict item 5): holds the ingest batch size FIXED while the old
  * corpus scales, and times the merge alone — the one-time corpus
  * clustering and the batch's pair generation are setup, not the
  * steady-state daily cost.
  *
  * Reported per corpus scale, min over SPARK_GRAFT_BENCH_ITERS (default
  * 2) iterations:
  *  - `update`: `Dedup.updateClusterLabels` (frontier-bounded
  *    propagation) + count — the pure compute cost of folding the
  *    batch's pairs into the labels;
  *  - `merge`: `Dedup.mergeClusterLabels` — update + the full label
  *    generation write + manifest swap (the persisted-plane cost; the
  *    generation write is O(corpus) slim rows by design, so this row is
  *    expected near-linear while `update` must stay batch-bounded).
  *
  * Usage mirrors ScaleBench: `runMain graft.tools.MaintScale [baseDir]`
  * with the 50× docs blow-up prebuilt by ScaleBench at
  * `target/tmp/<base>x<factor>` (SPARK_GRAFT_SCALE_TABLES=docs). */
object MaintScale {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "50").toInt
    val big = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      s"target/tmp/${base.split('/').last}x$factor")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "2").toInt.max(1)
    val batchSize = sys.env.getOrElse("SPARK_GRAFT_MAINT_BATCH", "200").toInt
    val spark = graft.functions.GraftExtensions.install(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    require(new java.io.File(s"$big/documents.parquet").exists(),
      s"no ${factor}x docs blow-up at $big — run ScaleBench with SPARK_GRAFT_SCALE_TABLES=docs first")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    def timed(body: => Unit): (Double, Long) = {
      Thread.sleep(300)
      val sw0 = shuffleBytes.get()
      val t0 = System.nanoTime()
      body
      ((System.nanoTime() - t0) / 1e9, shuffleBytes.get() - sw0)
    }

    /** One corpus scale: fixed-size batch split off, old labels built
      * and persisted (setup), then update/merge timed. */
    def measure(dir: String, tag: String): Map[String, (Double, Long)] = {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // deterministic fixed-size batch: the LOWEST batchSize doc ids
      // (never scales with the corpus)
      val batchIds = docs.select(col("doc_id")).orderBy("doc_id").limit(batchSize)
        .collect().map(_.getLong(0)).toSet
      val isBatch = col("doc_id").isInCollection(batchIds)
      System.err.println(s"[maint] $tag: building old labels (setup, untimed)")
      // ONE pair pass over the full corpus, split old/ingest (the q227
      // shape) — setup for the measurement, shared by every iteration
      val pairs = graft.operators.Dedup.ngramJaccard(docs, Seq("lang", "n_chars"))
        .select("d1", "d2").localCheckpoint(true)
      val inB = (c: org.apache.spark.sql.Column) => c.isInCollection(batchIds)
      val oldPairs = pairs.filter(!inB(col("d1")) && !inB(col("d2")))
      val newPairs = pairs.filter(inB(col("d1")) || inB(col("d2")))
        .localCheckpoint(true)
      val oldLabels = graft.operators.Dedup.nearDupClusters(
          docs.filter(!isBatch).select("doc_id"), oldPairs)
        .select(col("doc_id").as("id"), col("cluster_id"))
        .localCheckpoint(true)
      val nNew = newPairs.count()
      System.err.println(s"[maint] $tag: ${oldLabels.count()} old labels, $nNew ingest pairs")

      val runs = (1 to iters).map { i =>
        spark.catalog.clearCache()
        val upd = timed {
          graft.operators.Dedup.updateClusterLabels(oldLabels, newPairs).count(); ()
        }
        // persisted plane: fresh dir per iteration so every merge does
        // identical work (build gen0, merge writes gen1)
        val labDir = java.nio.file.Files.createTempDirectory(s"maint_${tag}_$i").toString
        graft.operators.Dedup.writeClusterLabels(oldLabels, labDir)
        val mrg = timed {
          graft.operators.Dedup.mergeClusterLabels(spark, labDir, newPairs); ()
        }
        // delta mode (r14): same merge, only the touched rows written
        val deltaDir = java.nio.file.Files.createTempDirectory(s"maintd_${tag}_$i").toString
        graft.operators.Dedup.writeClusterLabels(oldLabels, deltaDir)
        val dlt = timed {
          graft.operators.Dedup.mergeClusterLabels(spark, deltaDir, newPairs,
            delta = true); ()
        }
        (upd, mrg, dlt)
      }
      Map("update" -> runs.map(_._1).minBy(_._1),
        "merge" -> runs.map(_._2).minBy(_._1),
        "merge_delta" -> runs.map(_._3).minBy(_._1))
    }

    val small = measure(base, "base")
    val large = measure(big, s"${factor}x")
    val rows = Seq("update", "merge", "merge_delta").map { k =>
      val (t1, s1) = small(k); val (tN, sN) = large(k)
      val exp = math.log(tN / t1) / math.log(factor)
      System.err.println(f"[maint] $k%-7s t1=$t1%6.2fs t$factor=$tN%6.2fs exp=$exp%5.2f " +
        f"sw1=${s1 / 1048576.0}%7.1fMB sw$factor=${sN / 1048576.0}%7.1fMB")
      s""""$k":{"t1":${f"$t1%.2f"},"t$factor":${f"$tN%.2f"},"exp":${f"$exp%.2f"},""" +
        s""""shuffle_mb_1":${f"${s1 / 1048576.0}%.1f"},"shuffle_mb_$factor":${f"${sN / 1048576.0}%.1f"}}"""
    }
    println(s"""{"metric":"maint_scale","factor":$factor,"batch":$batchSize,${rows.mkString(",")}}""")
    spark.stop()
  }
}
