package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair tables — the companion to
  * [[Dedup.connectedComponents]] for the similarity/link graphs a curation
  * pipeline produces (near-dup pairs, citation/links, co-occurrence).
  *
  * `pageRankInt` is a DETERMINISTIC INTEGER formulation of PageRank:
  * ranks are micro-units (start = 1,000,000 per node), each node sends
  * `rank div degree` to every neighbour, and the update is
  * `rank' = 150000 + (85 * incoming) div 100` — i.e. damping 0.85 in
  * exact integer arithmetic. Because integer addition is associative and
  * commutative, the result is bit-identical regardless of partitioning,
  * aggregation order, or engine — the floating-point PageRank's
  * sum-order nondeterminism never appears, at the cost of a ≤1-micro-unit
  * floor bias per edge (irrelevant for ranking use).
  *
  * A FIXED number of iterations keeps the plan fully declarative: the
  * rounds are chained joins in ONE logical plan (no driver loop, no
  * checkpoint). For convergence-driven iteration counts, drive this from
  * a loop with `localCheckpoint` per round like `connectedComponents`.
  *
  * 100 TB design: the edge table is orders of magnitude smaller than the
  * corpus (it is the candidate-pair output of banded LSH); each round is
  * one shuffle keyed by node id with map-side combine on the incoming
  * sums. Degree skew (a hub node) only concentrates the FINAL combine of
  * pre-combined partials — the same bound as any hash aggregate.
  */
object Graph {

  /** @param pairs undirected edges as (d1, d2) — any extra columns ignored
    * @param iters number of power-iteration rounds (fixed, declarative)
    * @return (id, degree, rank) with rank in micro-units after `iters`
    *         rounds; every node incident to an edge appears. */
  def pageRankInt(pairs: DataFrame, iters: Int = 3): DataFrame = {
    require(iters >= 1 && iters <= 8, "iters must be in [1, 8] (declarative chain)")
    // symmetrize via explode (single evaluation of the upstream pair plan)
    val edges = pairs
      .select(explode(array(
        struct(col("d1").as("src"), col("d2").as("dst")),
        struct(col("d2").as("src"), col("d1").as("dst")))).as("_e"))
      .select(col("_e.src").as("src"), col("_e.dst").as("dst"))
      .distinct()
    val deg = edges.groupBy(col("src").as("id"))
      .agg(count(lit(1)).as("degree"))
    val r0 = deg.withColumn("rank", lit(1000000L))
    (1 to iters).foldLeft(r0) { (r, _) =>
      val contrib = edges
        .join(r.select(col("id").as("src"), expr("rank div degree").as("_c")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("_c")).as("_in"))
      // every node has degree >= 1, so the contrib join always rebuilds
      // the full node set; inner join back to deg re-attaches the degree
      deg.join(contrib, "id")
        .withColumn("rank", lit(150000L) + expr("(85 * _in) div 100"))
        .select(col("id"), col("degree"), col("rank"))
    }
  }
}
