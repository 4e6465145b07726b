package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Direct coverage of the TopKNearest heap aggregate, payload path
  * included: random candidate sets under adversarial partitioning (forces
  * partial/merge/serialize) must equal a driver-side sort-take-k, with
  * payload values and nulls riding each winner. */
class TopKAggSpec extends SparkSpec {

  test("random candidates across 7 partitions == brute-force top-k with payloads") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(42)
    val groups = 13; val n = 4000; val k = 5
    val rows = (0 until n).map { i =>
      val g = rnd.nextInt(groups).toLong
      val d = math.floor(rnd.nextDouble() * 50) // coarse -> forced dist ties
      val p1 = if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble())
      val p2 = rnd.nextDouble()
      (g, d, i.toLong, p1, p2)
    }
    val df = rows.toDF("dst_id", "dist2", "src_id", "p1", "p2")
      .repartition(7, col("src_id")) // scatter groups across partitions
    val got = df
      .groupBy("dst_id")
      .agg(TopKNearest.topkNearest(
        struct(col("dist2"), col("src_id"),
          col("p1").cast("double"), col("p2").cast("double")),
        k, Seq("p1", "p2")).as("top"))
      .select(col("dst_id"), explode(col("top")).as("t"))
      .select("dst_id", "t.dist2", "t.src_id", "t.p1", "t.p2")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]), r.getDouble(4)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3, t._4, t._5)).toSeq).toMap

    val expect = rows.groupBy(_._1).view.mapValues { rs =>
      rs.sortBy(r => (r._2, r._3)).take(k).map(r => (r._2, r._3, r._4, r._5)).toSeq
    }.toMap

    assert(got.keySet == expect.keySet)
    expect.foreach { case (g, want) =>
      assert(got(g) == want, s"group $g:\n got ${got(g)}\nwant $want")
    }
  }

  test("k larger than the candidate count keeps everything, ascending") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, 3.0, 30L), (1L, 1.0, 10L), (1L, 2.0, 20L))
      .toDF("dst_id", "dist2", "src_id")
    val got = df.groupBy("dst_id")
      .agg(TopKNearest.topkNearest(struct(col("dist2"), col("src_id")), 10).as("top"))
      .select(explode(col("top")).as("t")).select("t.src_id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(10L, 20L, 30L))
  }
}
