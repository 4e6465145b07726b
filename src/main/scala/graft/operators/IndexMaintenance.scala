package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
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
  * returned staging path instead (the blue/green form). */
object IndexMaintenance {

  /** Compacts the partitioned parquet index at `dir` to one file per
    * `partitionCol` value. Returns the path now holding the compacted
    * layout: `dir` itself when `swap` (default), else the staging dir. */
  def compact(
      spark: SparkSession,
      dir: String,
      partitionCol: String,
      swap: Boolean = true): String = {
    val live = new Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(live), s"compact: no index at $dir")
    val staging = new Path(dir + "__compacting")
    val backup = new Path(dir + "__precompact")
    fs.delete(staging, true)
    fs.delete(backup, true)

    spark.read.parquet(dir)
      .repartition(col(partitionCol))
      .write.partitionBy(partitionCol).parquet(staging.toString)

    // carry the model/parameter sidecars byte-verbatim — the compacted
    // index is the SAME index, so append/probe guards must keep matching
    fs.listStatus(live).map(_.getPath)
      .filter(_.getName.startsWith("_graft_"))
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
    require(fs.rename(live, backup), s"compact: could not stage-out $dir")
    require(fs.rename(staging, live), s"compact: could not swap in ${staging.getName}")
    fs.delete(backup, true)
    dir
  }
}
