package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Checkpoints.loopBarrier` (r14, verdict "What's wrong #5"): the
  * iterative loops default to `localCheckpoint` — executor-local
  * blocks, no replication, ideal at local[32] but fatal to a multi-hour
  * cluster loop when an executor dies mid-iteration. With
  * `spark.graft.reliableCheckpointDir` set, every loop barrier routes
  * through `SparkContext.setCheckpointDir` + `Dataset.checkpoint`
  * (reliable storage, survives executor loss). This spec exercises the
  * reliable route end-to-end: same results, and the checkpoint files
  * actually land under the configured directory. */
class ReliableCheckpointSpec extends SparkSpec {

  test("connectedComponents and kCore under a reliable checkpoint dir: same labels, files on reliable storage") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_cp").toString
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 20L))
      .toDF("d1", "d2")
    val baseline = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kBaseline = Graph.kCore(pairs, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    spark.conf.set(Checkpoints.ConfKey, dir)
    try {
      val reliable = Dedup.connectedComponents(pairs)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable === baseline)
      assert(reliable === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L))
      val kReliable = Graph.kCore(pairs, 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(kReliable === kBaseline)
      // the loop barriers must have written real checkpoint data under
      // the configured root (not executor-local block storage)
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(new java.io.File(dir)).nonEmpty,
        "reliable mode must write checkpoint files under the configured dir")
    } finally spark.conf.unset(Checkpoints.ConfKey)

    // back to default: localCheckpoint route still works after unset
    val again = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === baseline)
  }
}
