package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Property-level net for the r11 dedup-plane additions, on seeded
  * random inputs (the SketchPropertySpec discipline — deterministic
  * "random" rounds, independent driver-side oracles):
  *   - splitByCluster's leakage invariant against a driver-side
  *     union-find on random graphs (not just the fixture chain);
  *   - the hot-bucket cap's subset monotonicity across a cap chain on a
  *     corpus with injected duplicate clusters;
  *   - tombstone-delete set algebra (batched == sequential deletes). */
class DedupPropertySpec extends SparkSpec {

  test("splitByCluster on random graphs: members agree with a driver union-find; no edge straddles") {
    val s = spark
    import s.implicits._
    for (seed <- Seq(11L, 23L, 47L)) {
      val rnd = new scala.util.Random(seed)
      val n = 60
      val docs = (1L to n).map(i => (i, s"doc $i")).toDF("doc_id", "text")
      val edges = (1 to 45).map(_ => (rnd.nextInt(n).toLong + 1, rnd.nextInt(n).toLong + 1))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val out = Selection.splitByCluster(docs, edges.toDF("d1", "d2"))
        .select("doc_id", "cluster_id", "split").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      // independent oracle: driver-side union-find with min-id labels
      val parent = scala.collection.mutable.Map((1L to n).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (1L to n).foreach { i =>
        assert(out(i)._1 === find(i), s"seed=$seed doc=$i cluster")
      }
      edges.foreach { case (a, b) =>
        assert(out(a)._2 === out(b)._2, s"seed=$seed edge ($a,$b) straddles splits")
      }
    }
  }

  test("minhashLsh cap chain is subset-monotone on corpora with injected dup clusters") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(5L)
    val pool = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
    def text() = (1 to 8).map(_ => pool(rnd.nextInt(pool.size))).mkString(" ")
    // 30 random docs + two injected duplicate clusters of sizes 7 and 3
    val base = (1L to 30L).map(i => (i, text()))
    val dupA = (101L to 107L).map(i => (i, "alpha beta gamma delta eps zeta"))
    val dupB = (201L to 203L).map(i => (i, "theta eta zeta eps delta gamma"))
    val docs = (base ++ dupA ++ dupB).toDF("doc_id", "text")
    def pairs(cap: Int) = Dedup.minhashLsh(docs, threshold = 0.2, maxBandSize = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val chain = Seq(2, 3, 5, 8, Int.MaxValue).map(pairs)
    chain.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), "raising the cap may only ADD pairs")
    }
    // the size-7 cluster is present uncapped, fully pruned at cap 5
    assert(chain.last.exists { case (a, b) => a >= 101L && a <= 107L && b <= 107L })
    assert(!chain(2).exists { case (a, b) => a >= 101L && a <= 107L && b <= 107L })
    // the size-3 cluster survives every cap >= 3
    assert(chain(1).exists { case (a, b) => a >= 201L && b <= 203L })
  }

  test("tombstone algebra: one batched delete == sequential deletes, any order") {
    val s = spark
    import s.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ref = docs.filter(col("doc_id") % 2 === 0)
    val incoming = docs.filter(col("doc_id") % 2 === 1)
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getBoolean(1), Option(r.get(2)).map(_.toString), r.getLong(3))
    def probe(dir: String) = Dedup.dedupAgainstMinhashIndex(incoming, dir)
      .select(col("doc_id"), col("keep"), col("dup_of"), col("n_ref_dups"))
      .collect().map(key).toSet
    val victims = ref.limit(40).select("doc_id").collect().map(_.getLong(0)).toSeq
    val (va, vb) = victims.splitAt(20)

    val batched = java.nio.file.Files.createTempDirectory("mh_alg_a").toString
    Dedup.writeMinhashIndex(ref, batched)
    Dedup.deleteFromMinhashIndex(spark, batched, victims.toDF("doc_id"))

    val sequential = java.nio.file.Files.createTempDirectory("mh_alg_b").toString
    Dedup.writeMinhashIndex(ref, sequential)
    Dedup.deleteFromMinhashIndex(spark, sequential, vb.toDF("doc_id")) // reversed order
    Dedup.deleteFromMinhashIndex(spark, sequential, va.toDF("doc_id"))

    assert(probe(batched) === probe(sequential))
    // and compaction preserves the decisions on both
    Dedup.compactMinhashIndex(spark, batched)
    assert(probe(batched) === probe(sequential))
  }

  /** r12: the distinct-fingerprint near-dup engine against a full
    * driver-side replay, on seeded-random fp tables with heavy
    * duplicate classes and single-bit variants, across the knob grid
    * (maxDist × maxBandSize × maxClassSize) — every branch of the
    * class gate, the occupancy cap, the dist-0 equality join and the
    * banded expansion covered by an independent oracle. */
  test("fingerprintNearDup on random fp tables: engine == driver replay across the knob grid") {
    val s = spark
    import s.implicits._
    def replay(fps: Map[Long, Long], maxDist: Int, maxBand: Int,
        maxClass: Int): Set[(Long, Long, Int)] = {
      val classes = fps.groupBy(_._2).view.mapValues(_.keys.toSet).toMap
        .filter(_._2.size <= maxClass)
      val same = for {
        ids <- classes.values.toSet[Set[Long]]; a <- ids; b <- ids if a < b
      } yield (a, b, 0)
      val buckets = (for {
        f <- classes.keys; k <- 0 until 5
      } yield ((k, (f >>> (13 * k)) & 0x1FFF), f))
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet)
        .filter(_._2.size <= maxBand).values.toSeq
      val near = for {
        bucket <- buckets.toSet[Set[Long]]; f1 <- bucket; f2 <- bucket if f1 < f2
        dist = java.lang.Long.bitCount(f1 ^ f2) if dist >= 1 && dist <= maxDist
        a <- classes(f1); b <- classes(f2)
      } yield (math.min(a, b), math.max(a, b), dist)
      same ++ near
    }
    for (seed <- Seq(3L, 17L, 101L)) {
      val rnd = new scala.util.Random(seed)
      val bases = Vector.fill(6)(rnd.nextLong() & ((1L << 63) - 1))
      val rows = (1L to 80L).map { id =>
        val b = bases(rnd.nextInt(bases.size))
        // ~1/3 single-bit variants => near pairs at dist 1-2 across
        // classes; the rest pile into identical-fp classes
        val fp = if (rnd.nextInt(3) == 0) b ^ (1L << rnd.nextInt(63)) else b
        (id, fp)
      }
      val df = rows.toDF("id", "fp")
      val expectedByKey = rows.toMap
      for {
        md <- Seq(0, 2, 8)
        mb <- Seq(2, 4, Int.MaxValue)
        mc <- Seq(1, 5, Int.MaxValue)
      } {
        val got = Multimodal.fingerprintNearDup(df, col("fp"), md, "id", mb, mc)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val want = replay(expectedByKey, md, mb, mc)
        assert(got === want,
          s"seed=$seed maxDist=$md maxBand=$mb maxClass=$mc: " +
            s"extra=${(got -- want).take(3)} missing=${(want -- got).take(3)}")
      }
    }
  }

  test("random delta-merge sequences: chain reads == from-scratch rebuild at every step (r15 overlay)") {
    val s = spark
    import s.implicits._
    // driver-side union-find oracle (min-id labels over all pairs so far)
    def rebuild(ids: Set[Long], pairs: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) { val m = math.min(ra, rb); parent(math.max(ra, rb)) = m }
        ()
      }
      pairs.foreach { case (a, b) => union(a, b) }
      (ids ++ pairs.flatMap(p => Seq(p._1, p._2))).map(x => x -> find(x)).toMap
    }
    for (seed <- Seq(7L, 31L)) {
      val rnd = new scala.util.Random(seed)
      val baseIds = (1L to 50L).toSet
      val basePairs = Seq.fill(8)((rnd.nextInt(50) + 1L, rnd.nextInt(50) + 1L))
        .filter(p => p._1 != p._2)
      val dir = java.nio.file.Files.createTempDirectory(s"labels_prop_$seed").toString
      Dedup.writeClusterLabels(
        Dedup.nearDupClusters(baseIds.toSeq.toDF("doc_id"), basePairs.toDF("d1", "d2"))
          .select(col("doc_id").as("id"), col("cluster_id")), dir)
      var allPairs = basePairs
      val maxChain = 2 + rnd.nextInt(5) // folds happen mid-sequence too
      for (step <- 1 to 6) {
        // batch mixes: old-old merges, old-new, new-new (fresh ids)
        val batch = Seq.fill(1 + rnd.nextInt(3)) {
          val a = if (rnd.nextBoolean()) rnd.nextInt(50) + 1L
                  else 1000L + rnd.nextInt(20) * 2L + step * 100L
          val b = if (rnd.nextBoolean()) rnd.nextInt(50) + 1L
                  else 1000L + rnd.nextInt(20) * 2L + 1L + step * 100L
          (a, b)
        }.filter(p => p._1 != p._2)
        if (batch.nonEmpty) {
          Dedup.mergeClusterLabels(spark, dir, batch.toDF("d1", "d2"),
            delta = true, maxChain = maxChain)
          allPairs ++= batch
        }
        val got = Dedup.readClusterLabels(spark, dir)
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val want = rebuild(baseIds, allPairs)
        assert(got === want,
          s"seed=$seed step=$step maxChain=$maxChain: " +
            s"diff=${(got.toSet -- want.toSet).take(3)} / ${(want.toSet -- got.toSet).take(3)}")
      }
    }
  }
}
