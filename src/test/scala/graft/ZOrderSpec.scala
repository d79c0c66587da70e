package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  /** Reference interleave, independent of the Column implementation. */
  private def morton(a: Long, b: Long, bits: Int): Long =
    (0 until bits).map(i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))).sum

  test("mortonCode matches the reference interleave over the full 6-bit grid") {
    val grid = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val got = grid.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.mortonCode(col("a"), col("b"), 6).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (a, b, z) => assert(z === morton(a, b, 6), s"($a,$b)") }
    // codes over the full grid are a permutation of 0..4095
    assert(got.map(_._3).sorted.toSeq === (0L until 4096L))
  }

  test("clusterByZOrder: every partition's bounding box is compact in BOTH dims") {
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y)).toDF("x", "y")
    val parts = ZOrder.clusterByZOrder(grid, "x", "y", bits = 6, numFiles = 16)
      .withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"), count(lit(1)).as("n"))
      .as[(Int, Int, Int, Int, Int, Long)].collect()
    assert(parts.length === 16)
    // a z-interval of 4096/16 = 256 cells is a union of aligned quads:
    // its bounding box stays near 16x16 (allow 2x boundary slop). A
    // single-column sort would give width-64 boxes in the other dim.
    parts.foreach { case (pid, x0, x1, y0, y1, n) =>
      val area = (x1 - x0 + 1).toLong * (y1 - y0 + 1).toLong
      assert(area <= 1024, s"partition $pid bbox too large: " +
        s"[$x0..$x1]x[$y0..$y1] area $area for $n rows")
    }
  }

  test("mortonCode rejects bad bit widths; codes stay in whole-stage codegen") {
    intercept[IllegalArgumentException] { ZOrder.mortonCode(col("a"), col("b"), 0) }
    intercept[IllegalArgumentException] { ZOrder.mortonCode(col("a"), col("b"), 32) }
    val plan = Seq((1L, 2L)).toDF("a", "b")
      .select(ZOrder.mortonCode(col("a"), col("b"), 10).as("z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"), plan)
  }
}
