package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A single sort column gives parquet row-group min/max pruning on ONE
  * dimension only; queries filtering the second dimension scan
  * everything. Interleaving the bits of both keys into one Morton code
  * and range-clustering by it bounds EVERY file's extent in BOTH
  * dimensions (each z-interval is a union of small query-aligned
  * rectangles), so two-dimensional point/range filters prune files on
  * either — or both — predicates. This is the layout trick behind
  * Delta/Iceberg `ZORDER BY`, expressed here as plain Spark: a static
  * bit-twiddling Column expression (whole-stage-codegen'd, no UDF) and
  * a range repartition + within-partition sort.
  *
  * Codes are built from the low `bits` of each key (callers bucket or
  * offset real values into that range first — rank-based normalization
  * is the production path for skewed domains); 2 dims × up to 31 bits
  * fit a BIGINT.
  */
object ZOrder {

  /** The Morton interleave of the low `bits` of `a` and `b`:
    * bit i of `a` lands at 2i, bit i of `b` at 2i+1. Pure integer
    * Column arithmetic — a static ~4·bits-node expression, fully inside
    * whole-stage codegen. */
  def mortonCode(a: Column, b: Column, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in 1..31, got $bits")
    val al = a.cast("long"); val bl = b.cast("long")
    (0 until bits).map { i =>
      (shiftright(al, i).bitwiseAND(1) * lit(1L << (2 * i))) +
        (shiftright(bl, i).bitwiseAND(1) * lit(1L << (2 * i + 1)))
    }.reduce(_ + _)
  }

  /** Cluster `df` for 2-D skipping: range-partition by the Morton code
    * of (`colA` low bits, `colB` low bits) into `numFiles` partitions,
    * sort within each — one shuffle, and every written file covers a
    * compact z-interval (small bounding box in both dimensions). Write
    * the result with any sink; parquet row-group stats do the pruning
    * at read time. The helper column is dropped before return. */
  def clusterByZOrder(df: DataFrame, colA: String, colB: String,
                      bits: Int, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be > 0, got $numFiles")
    require(!df.columns.contains("__z"),
      "input already has a '__z' column — rename it before clustering " +
        "(the helper column would silently shadow and then drop it)")
    df.withColumn("__z", mortonCode(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }
}
