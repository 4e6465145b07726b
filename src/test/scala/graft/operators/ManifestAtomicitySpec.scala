package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A local-disk-backed FileSystem that ANNOUNCES an object-store scheme:
  * registered as `fs.s3a.impl`, it lets specs drive the real manifest
  * lifecycle code against a path whose scheme the atomic-rename guard
  * must reject. Needs the public no-arg constructor Hadoop's reflection
  * requires. */
class MockS3aFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
}

/** Same trick for an unrecognized scheme (neither allow- nor
  * denylisted). */
class MockWeirdFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("weirdfs:///")
}

/** The manifest swap's atomic-rename contract (r17, r15 verdict item
  * #7): the pointer-swap lifecycle silently tears on object stores
  * whose rename is copy+delete — the r16 `.crc`-sidecar race proved
  * the hazard class is real even on a local FS — so a denylisted
  * scheme must fail LOUDLY with the blue/green remediation instead of
  * deploying a swap that corrupts under concurrent readers. */
class ManifestAtomicitySpec extends SparkSpec {

  private def withS3aMock[T](body: => T): T = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.s3a.impl", classOf[MockS3aFileSystem].getName)
    hc.set("fs.s3a.impl.disable.cache", "true")
    try body finally { hc.unset("fs.s3a.impl"); hc.unset("fs.s3a.impl.disable.cache") }
  }

  test("enableManifest on a non-atomic-rename scheme fails loudly with the swap=false remediation") {
    val s = spark
    import s.implicits._
    withS3aMock {
      val local = java.nio.file.Files.createTempDirectory("manifest_s3a").toString
      Seq((1L, 1L)).toDF("id", "cluster_id").write.mode("overwrite").parquet(local)
      val e = intercept[IllegalStateException] {
        IndexMaintenance.enableManifest(spark, "s3a:" + local)
      }
      assert(e.getMessage.contains("atomic rename"), e.getMessage)
      assert(e.getMessage.contains("swap = false"), e.getMessage)
      assert(e.getMessage.contains(IndexMaintenance.AssumeAtomicRenameConf), e.getMessage)
      // the guard fired BEFORE any mutation: no gen dir, no manifest
      val files = new java.io.File(local).listFiles().map(_.getName)
      assert(!files.exists(_.startsWith("_graft_")),
        s"guard must fire before any file moves, saw: ${files.mkString(",")}")
    }
  }

  test("writeClusterLabels (the real lifecycle caller) is covered by the guard") {
    val s = spark
    import s.implicits._
    withS3aMock {
      val local = java.nio.file.Files.createTempDirectory("labels_s3a").toString
      val e = intercept[IllegalStateException] {
        Dedup.writeClusterLabels(
          Seq((1L, 1L), (2L, 1L)).toDF("id", "cluster_id"), "s3a:" + local)
      }
      assert(e.getMessage.contains("atomic rename"), e.getMessage)
    }
  }

  test("compact(swap = true) refuses before the staging rewrite") {
    val s = spark
    import s.implicits._
    withS3aMock {
      val local = java.nio.file.Files.createTempDirectory("compact_s3a").toString
      Seq((1L, "a"), (2L, "b")).toDF("id", "part")
        .write.partitionBy("part").mode("overwrite").parquet(local)
      val e = intercept[IllegalStateException] {
        IndexMaintenance.compact(spark, "s3a:" + local, "part")
      }
      assert(e.getMessage.contains("atomic rename"), e.getMessage)
      assert(!new java.io.File(local + "__compacting").exists(),
        "swap=true must refuse before writing the staging tree")
      // (the swap=false blue/green rewrite itself is exercised on file://
      // by the compact specs — the scheme-faking mock can't drive it:
      // RawLocalFileSystem's permission loader rejects foreign-scheme
      // URIs inside listLocatedStatus)
    }
  }

  test("the escape hatch and the fail-open unknown-scheme path") {
    val fs3a = new MockS3aFileSystem()
    // denylisted + escape hatch set => allowed
    spark.conf.set(IndexMaintenance.AssumeAtomicRenameConf, "true")
    try IndexMaintenance.requireAtomicRename(spark, fs3a, "spec")
    finally spark.conf.unset(IndexMaintenance.AssumeAtomicRenameConf)
    // unknown scheme => one-time warning, never a throw (a denylist
    // cannot enumerate every HDFS-compatible store)
    IndexMaintenance.requireAtomicRename(spark, new MockWeirdFileSystem(), "spec")
    // local FS (every other spec in the suite) => silent pass
    val localFs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    IndexMaintenance.requireAtomicRename(spark, localFs, "spec")
  }
}
