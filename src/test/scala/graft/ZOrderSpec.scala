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

  test("mortonCodeN: 3-D codes match the reference interleave; 2-D delegates exactly") {
    // reference: bit i of dim j at position i*n + j
    def mortonN(vs: Seq[Long], bits: Int): Long =
      (for (i <- 0 until bits; j <- vs.indices)
        yield ((vs(j) >> i) & 1L) << (i * vs.length + j)).sum
    val grid3 = for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (x.toLong, y.toLong, z.toLong)
    val got = grid3.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.mortonCodeN(Seq(col("a"), col("b"), col("c")), 3).as("z"))
      .as[(Long, Long, Long, Long)].collect()
    got.foreach { case (a, b, c, z) =>
      assert(z === mortonN(Seq(a, b, c), 3), s"($a,$b,$c)") }
    // the full 3-D grid is a permutation of 0..511
    assert(got.map(_._4).sorted.toSeq === (0L until 512L))
    // n*bits beyond a signed BIGINT is refused loudly
    val e = intercept[IllegalArgumentException](
      ZOrder.mortonCodeN(Seq(col("a"), col("b"), col("c")), 22))
    assert(e.getMessage.contains("63"))
  }

  test("3-D z-codes: aligned code ranges have compact boxes in EVERY dimension") {
    // the locality property itself, measured on ALIGNED code ranges
    // (code div 512 = the 8 top octants): every box is exactly an
    // 8-cube. A single-column sort leaves two dimensions at the full
    // 0..15 extent. (clusterByZOrderN's repartitionByRange draws
    // SAMPLED boundaries, so its physical ranges can straddle octants
    // — mechanics covered below and by the 2-D test; the deterministic
    // claim belongs to the codes.)
    val grid = (for (x <- 0 until 16; y <- 0 until 16; z <- 0 until 16)
      yield (x, y, z)).toDF("x", "y", "z")
    val parts = grid
      .select(col("x"), col("y"), col("z"),
        (ZOrder.mortonCodeN(Seq(col("x"), col("y"), col("z")), 4) / 512)
          .cast("int").as("pid"))
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"),
        min("y").as("y0"), max("y").as("y1"),
        min("z").as("z0"), max("z").as("z1"))
      .as[(Int, Int, Int, Int, Int, Int, Int)].collect()
    assert(parts.length === 8)
    parts.foreach { case (pid, x0, x1, y0, y1, z0, z1) =>
      assert((x1 - x0) <= 7 && (y1 - y0) <= 7 && (z1 - z0) <= 7,
        s"octant $pid box [$x0..$x1, $y0..$y1, $z0..$z1] not an 8-cube")
    }
    // mechanics: the cluster call preserves content and partition count
    val clustered = ZOrder.clusterByZOrderN(grid, Seq("x", "y", "z"),
      bits = 4, numFiles = 8)
    assert(clustered.rdd.getNumPartitions === 8)
    assert(clustered.count() === 4096)
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
