package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maintenance for the persisted on-disk index layouts (IVF-PQ code
  * partitions, MinHash banded signatures): their append lifecycles
  * (`Similarity.appendIvfPqIndex`, `Dedup.appendMinhashIndex`) add one
  * parquet file per touched partition per append, so a high-frequency
  * ingest cadence accumulates small files and the probe cost becomes
  * file-OPEN-bound long before it is byte-bound — the standard warehouse
  * small-file story.
  *
  * [[compact]] rewrites such a layout to one file per partition value
  * WITHOUT changing a single row: read, hash-repartition ON the partition
  * column (every value's rows land in exactly one task, so each
  * partition directory gets exactly one output file), rewrite into a
  * staging directory, carry the `_graft_*` model/parameter sidecars
  * byte-verbatim, then swap via two renames. Because index rows are
  * independent (no global statistics, no ordering — the property that
  * already makes append ≡ rebuild), compaction ≡ identity on every probe
  * result; MinhashIndexSpec and IvfPqMaintSpec pin probe-before ==
  * probe-after bit-exactly.
  *
  * Crash window: between the two renames the live path is briefly
  * absent; a crash there leaves the complete OLD index at
  * `<dir>__precompact` for manual recovery, and the staging dir is only
  * renamed in AFTER a fully successful write. On object stores without
  * atomic rename, run with `swap = false` and repoint serving at the
  * returned staging path instead (the blue/green form).
  *
  * SINGLE MUTATOR (r12, contract): exactly one writer — append,
  * tombstone, or compact — may mutate an index at a time. Concurrent
  * READS are safe throughout (and with a [[Manifest]]-pointer layout,
  * safe even across a compaction swap), but a row appended to the live
  * dir AFTER compact's staging read and BEFORE its swap is silently
  * lost (moved to `__precompact`, then deleted), and a tombstone
  * written in that window is wrongly cleared as if materialized.
  * [[compact]] enforces the append half of this loudly: it re-lists the
  * live dir before swapping and aborts if any data file is newer than
  * its staging snapshot. Serialize mutators externally (an ingest lock,
  * a single owner job) — the same rule every log-structured index
  * (LSM, Lucene, Iceberg without a catalog) imposes. */
object IndexMaintenance {

  private val TombstoneDir = "_graft_tombstones"

  /** DELETE from a persisted index, tombstone-style: the ids are
    * appended to a slim parquet set under `<dir>/_graft_tombstones`
    * (leading underscore — the index's own parquet reads never see it),
    * every probe anti-joins live rows against the set
    * ([[filterTombstoned]]), and the next [[compact]] drops the rows
    * physically and clears the set. O(|deleted|) per delete, zero index
    * rewriting until compaction — the GDPR-expunge shape.
    *
    * Semantics: a tombstone is id-level and PERMANENT until the
    * compaction that materializes it — appending new rows under a
    * tombstoned id does not resurrect the id (delete means "this id's
    * content is expunged"); re-admit by compacting first, then
    * appending. */
  def tombstone(spark: SparkSession, dir: String, ids: DataFrame, idCol: String): Unit = {
    require(fileSystem(spark, dir).exists(new Path(dir)), s"tombstone: no index at $dir")
    // a string id would CAST to null silently and the delete would no-op
    // — same plan-build-time contract as the heap top-k paths
    Similarity.requireIntegralId(ids, idCol, "tombstone")
    ids.select(col(idCol).cast("long").as("_del_id")).distinct()
      .write.mode("append").parquet(new Path(dir, TombstoneDir).toString)
  }

  /** The index's tombstone id set, when any deletes are pending. */
  def tombstones(spark: SparkSession, dir: String): Option[DataFrame] = {
    val p = new Path(dir, TombstoneDir)
    if (fileSystem(spark, dir).exists(p))
      Some(spark.read.parquet(p.toString).distinct())
    else None
  }

  /** `rows` minus any tombstoned ids — the probe-side read of a
    * [[tombstone]]d index (one anti-join on a slim id set; AQE
    * broadcasts it at realistic delete volumes). */
  def filterTombstoned(
      spark: SparkSession, dir: String, rows: DataFrame, idCol: String): DataFrame =
    tombstones(spark, dir) match {
      case None => rows
      case Some(t) =>
        rows.join(t, rows(idCol).cast("long") === t("_del_id"), "left_anti")
    }

  private def fileSystem(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursive (path, length, modtime) listing of every FILE under
    * `root` — the drift fingerprint for [[compact]]'s single-mutator
    * guard. A concurrent append adds part files (and rewrites
    * `_SUCCESS`), a concurrent tombstone adds files under
    * `_graft_tombstones` — all visible as set difference. */
  private def listTree(
      fs: org.apache.hadoop.fs.FileSystem, root: Path): Seq[(String, Long, Long)] = {
    val it = fs.listFiles(root, true)
    val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
    while (it.hasNext) {
      val st = it.next()
      buf += ((st.getPath.toUri.getPath, st.getLen, st.getModificationTime))
    }
    buf.toSeq
  }

  /** Compacts the partitioned parquet index at `dir` to one file per
    * `partitionCol` value, materializing any pending [[tombstone]]s
    * (rows dropped physically, the tombstone set cleared — pass
    * `tombstoneIdCol` so the anti-join knows the id column). Returns the
    * path now holding the compacted layout: `dir` itself when `swap`
    * (default), else the staging dir. */
  def compact(
      spark: SparkSession,
      dir: String,
      partitionCol: String,
      swap: Boolean = true,
      tombstoneIdCol: Option[String] = None): String = {
    val live = new Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(live), s"compact: no index at $dir")
    val staging = new Path(dir + "__compacting")
    val backup = new Path(dir + "__precompact")
    fs.delete(staging, true)
    fs.delete(backup, true)

    // single-mutator guard (r12): snapshot the live tree now; re-list
    // just before the swap and abort loudly if anything changed, so an
    // append/tombstone racing this compaction fails the compaction
    // instead of vanishing into __precompact
    val snapshot = listTree(fs, live)

    val rows = spark.read.parquet(dir)
    val liveRows = tombstoneIdCol match {
      case Some(idc) => filterTombstoned(spark, dir, rows, idc)
      case None => rows
    }
    liveRows
      .repartition(col(partitionCol))
      .write.partitionBy(partitionCol).parquet(staging.toString)

    // carry the model/parameter sidecars byte-verbatim — the compacted
    // index is the SAME index, so append/probe guards must keep
    // matching. FILES only: the tombstone DIRECTORY is deliberately not
    // carried — its deletes were just materialized into the rewrite
    fs.listStatus(live).map(_.getPath)
      .filter(p => p.getName.startsWith("_graft_") && fs.getFileStatus(p).isFile)
      .foreach { p =>
        val in = fs.open(p)
        val bytes =
          try {
            val buf = new java.io.ByteArrayOutputStream()
            org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
            buf.toByteArray
          } finally in.close()
        val out = fs.create(new Path(staging, p.getName), true)
        try out.write(bytes) finally out.close()
      }

    if (!swap) return staging.toString
    val drift = listTree(fs, live).toSet.diff(snapshot.toSet)
    require(drift.isEmpty,
      s"compact: concurrent mutation of $dir detected (single-mutator " +
        s"contract) — aborting before the swap; changed: " +
        drift.take(5).map(_._1).mkString(", "))
    require(fs.rename(live, backup), s"compact: could not stage-out $dir")
    require(fs.rename(staging, live), s"compact: could not swap in ${staging.getName}")
    fs.delete(backup, true)
    dir
  }
}
