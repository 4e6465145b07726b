package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `Layout.zorderWrite` end-to-end: write a uniform 64×64 grid z-ordered
  * into 16 files, read the files BACK, and check the per-file bboxes a
  * min/max-pruning reader would see. */
class ZorderWriteSpec extends SparkSpec {
  import spark.implicits._

  test("z-ordered files have tile-shaped bboxes; a small box touches few files") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    val cells = (for { x <- 0 until 64; y <- 0 until 64 } yield (x, y)).toDF("x", "y")
    Layout.zorderWrite(cells, "x", "y", bits = 6, path = dir, nFiles = 16)

    val boxes = spark.read.parquet(dir)
      .withColumn("file", input_file_name())
      .groupBy("file")
      .agg(count(lit(1)).as("n"),
        min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(boxes.length === 16)
    assert(boxes.map(_.getAs[Long]("n")).sum === 64L * 64)
    // row-major stripes would be 64 wide x 4 tall: aspect ratio 16.
    // z-contiguous ranges are near-square tiles; range-partition
    // boundaries are sampled, so allow slack — but nothing stripe-shaped.
    boxes.foreach { r =>
      val w = r.getAs[Int]("x1") - r.getAs[Int]("x0") + 1
      val h = r.getAs[Int]("y1") - r.getAs[Int]("y0") + 1
      val aspect = math.max(w, h).toDouble / math.min(w, h)
      assert(aspect <= 4.0, s"stripe-shaped file bbox ${w}x$h")
    }
    // an 8x8 query box: stripes would intersect 2-3 full-width files AND
    // every file overlaps in x; tile bboxes localize it
    val touching = boxes.count { r =>
      r.getAs[Int]("x0") <= 15 && r.getAs[Int]("x1") >= 8 &&
        r.getAs[Int]("y0") <= 15 && r.getAs[Int]("y1") >= 8
    }
    assert(touching <= 4, s"$touching files touch an 8x8 box")
  }
}
