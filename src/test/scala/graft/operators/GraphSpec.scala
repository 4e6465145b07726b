package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{col, lit, pmod}

/** `Graph.pageRankInt` against the hand-run integer recurrence, plus the
  * determinism-under-partitioning property the integer formulation
  * guarantees (associative integer sums — no FP order sensitivity). */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def star = Seq((1L, 2L), (1L, 3L)).toDF("d1", "d2")

  test("pageRankInt reproduces the hand-computed integer recurrence") {
    // star 1-{2,3}: deg(1)=2, deg(2)=deg(3)=1, all start at 1_000_000.
    // r1: 1 -> 150000+85%*(1M+1M)=1850000; 2,3 -> 150000+85%*500000=575000
    // r2: 1 -> 150000+85%*1150000=1127500; 2,3 -> 150000+85%*925000=936250
    // r3: 1 -> 150000+(85*1872500)//100=1741625
    //     2,3 -> 150000+(85*563750)//100=629187  (floor of .5)
    val out = Graph.pageRankInt(star, iters = 3).orderBy("id").collect()
    assert(out.toSeq == Seq(
      Row(1L, 2L, 1741625L),
      Row(2L, 1L, 629187L),
      Row(3L, 1L, 629187L)))
  }

  test("regular graphs sit at the fixed point") {
    // triangle: all degrees 2, perfectly symmetric -> rank stays 1_000_000
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("d1", "d2")
    val out = Graph.pageRankInt(tri, iters = 4).collect()
    assert(out.forall(_.getLong(2) == 1000000L))
  }

  test("bit-identical under repartitioning (integer associativity)") {
    val edges = spark.range(300).selectExpr("id AS d1", "(id * 7) % 300 AS d2")
      .filter("d1 <> d2")
    val a = Graph.pageRankInt(edges, iters = 3).orderBy("id").collect()
    val b = Graph.pageRankInt(edges.repartition(13), iters = 3).orderBy("id").collect()
    assert(a.toSeq == b.toSeq)
  }

  test("triangleStats: clique, path, and brute-force equivalence") {
    // 4-clique {1,2,3,4}: every vertex in 3 triangles, clustering 1.0
    val clique = (for (i <- 1 to 4; j <- (i + 1) to 4) yield (i.toLong, j.toLong))
      .toDF("d1", "d2")
    val c = Graph.triangleStats(clique).orderBy("id").collect()
    assert(c.forall(r => r.getLong(1) == 3L && r.getLong(2) == 3L && r.getDouble(3) == 1.0))
    // path 10-11-12: no triangles; middle clustering 0.0, ends null (deg 1)
    val path = Seq((10L, 11L), (11L, 12L)).toDF("d1", "d2")
    val p = Graph.triangleStats(path).orderBy("id").collect()
    assert(p.map(_.getLong(2)).toSeq == Seq(0L, 0L, 0L))
    assert(p(0).isNullAt(3) && p(1).getDouble(3) == 0.0 && p(2).isNullAt(3))
  }

  test("triangleStats matches brute-force triple enumeration") {
    val n = 40
    val edges = (for (i <- 0 until n; j <- (i + 1) until n
        if (i * 31 + j * 17) % 5 == 0) yield (i.toLong, j.toLong))
    val adj = edges.toSet
    def connected(a: Long, b: Long) = adj.contains((a min b, a max b))
    val brute = (for {
      a <- 0L until n.toLong; b <- (a + 1) until n.toLong; c <- (b + 1) until n.toLong
      if connected(a, b) && connected(b, c) && connected(a, c)
    } yield Seq(a, b, c)).flatten.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = Graph.triangleStats(edges.toDF("d1", "d2")).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.filter(_._2 > 0) == brute.filter(_._2 > 0))
  }

  test("kCore: cascading peel empties a path, keeps a clique with tail") {
    // path 1-2-3-4-5-6: 2-core is empty, but only after cascading rounds
    val path = (1 to 5).map(i => (i.toLong, (i + 1).toLong)).toDF("d1", "d2")
    assert(Graph.kCore(path, k = 2).count() == 0)
    // triangle {1,2,3} + pendant chain 3-10-11: chain peels away over two
    // rounds, the triangle survives with within-core degree 2
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 10L), (10L, 11L)).toDF("d1", "d2")
    val core = Graph.kCore(g, k = 2).orderBy("id").collect()
    assert(core.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 2L), (2L, 2L), (3L, 2L)))
    // k=1 keeps everything edge-incident
    assert(Graph.kCore(g, k = 1).count() == 5)
  }

  test("pageRank/bfs/weighted/triangles fast paths ≡ distributed plans on a random graph (r16)") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(99)
    val pairs = (Seq.tabulate(300)(_ => (rnd.nextLong(400), rnd.nextLong(400)))
      .filter { case (a, b) => a != b } ++ (50L until 90L).map(i => (i, i + 1)))
      .toDF("d1", "d2")
    val weighted = pairs.withColumn("w", pmod(col("d1") * 7 + col("d2") * 3, lit(9L)) + 1)
    val seeds = Seq(3L, 77L, 200L, 399L).toDF("id")
    def both(name: String)(f: => org.apache.spark.sql.DataFrame)
        : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
      val local = f
      spark.conf.set("spark.graft.cc.localThreshold", "0")
      val dist = try f finally spark.conf.unset("spark.graft.cc.localThreshold")
      assert(local.schema === dist.schema, s"$name: schema parity")
      (local, dist)
    }
    def rowsOf(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
      df.collect().map(_.toSeq).toSet
    val (prL, prD) = both("pageRank")(Graph.pageRankInt(pairs, iters = 3))
    assert(rowsOf(prL) === rowsOf(prD), "pageRankInt parity")
    val (bfL, bfD) = both("bfs")(Graph.bfsHops(pairs, seeds, maxDepth = 3))
    assert(rowsOf(bfL) === rowsOf(bfD), "bfsHops parity")
    val (whL, whD) = both("weighted")(Graph.weightedHops(weighted, seeds, rounds = 3))
    assert(rowsOf(whL) === rowsOf(whD), "weightedHops parity")
    val (trL, trD) = both("triangles")(Graph.triangleStats(pairs))
    assert(rowsOf(trL) === rowsOf(trD), "triangleStats parity")
    assert(trL.collect().exists(r => !r.isNullAt(3)), "graph dense enough to exercise clustering")
  }

  test("kCore small-graph fast path ≡ distributed loop (incl. maxIters truncation)") {
    val s = spark
    import s.implicits._
    // deterministic random graph + a long pendant chain off a clique so
    // the peel needs many cascading rounds
    val rnd = new scala.util.Random(7)
    val clique = for (a <- 0L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val chain = (4L until 40L).map(i => (i, i + 1))
    val noise = Seq.tabulate(150)(_ => (rnd.nextLong(60), rnd.nextLong(60)))
      .filter { case (a, b) => a != b }
    val g = (clique ++ chain ++ noise).toDF("d1", "d2")
    for (k <- Seq(1, 2, 3); mi <- Seq(2, 50)) { // mi=2 pins truncation parity
      val localR = Graph.kCore(g, k, maxIters = mi)
      spark.conf.set("spark.graft.cc.localThreshold", "0")
      val distR =
        try Graph.kCore(g, k, maxIters = mi)
        finally spark.conf.unset("spark.graft.cc.localThreshold")
      assert(localR.schema === distR.schema, s"schema parity (k=$k, maxIters=$mi)")
      val lm = localR.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dm = distR.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(lm === dm, s"fast path must match the distributed peel (k=$k, maxIters=$mi)")
    }
  }

  test("assortativity: star graph is exactly -1, regular graph undefined") {
    // star 1-{2,3,4}: every directed edge pairs degree 3 with degree 1
    val out = Graph.assortativity(Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("d1", "d2")).head()
    assert(out.getLong(0) == 6L && out.getDouble(1) == -1.0)
    // triangle: all degrees equal -> zero variance -> null r
    val tri = Graph.assortativity(Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("d1", "d2")).head()
    assert(tri.isNullAt(1))
  }

  test("charEntropy: exact micro-log entropy on hand histograms") {
    val docs = Seq((1L, "aabb"), (2L, "aaaa"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(docs).orderBy("doc_id").collect()
    // ln(4)µ = 1386294, ln(2)µ = 693147: (4·1386294 − 4·693147)/4e6
    assert(out(0).getLong(1) == 4L && out(0).getLong(2) == 2L)
    assert(out(0).getDouble(3) == 0.693147)
    assert(out(1).getDouble(3) == 0.0) // single-char run: ln n cancels exactly
    assert(out(2).isNullAt(3))         // empty text -> null entropy
  }

  test("noveltyScore: df=1 fraction over distinct per-doc grams") {
    val docs = Seq(
      (1L, "a b c d"),   // grams {a b c, b c d}
      (2L, "a b c x"),   // grams {a b c, b c x}
      (3L, "z z z z z")  // distinct grams {z z z}
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, n = 3).orderBy("doc_id").collect()
    assert(out.toSeq == Seq(
      Row(1L, 2L, 1L, 0.5),
      Row(2L, 2L, 1L, 0.5),
      Row(3L, 1L, 1L, 1.0)))
  }

  test("noveltyScore drops docs shorter than n words") {
    val docs = Seq((1L, "a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, n = 3)
    assert(out.collect().map(_.getLong(0)).toSeq == Seq(2L))
  }
}
