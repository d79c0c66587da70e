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

  /** The N-dimensional Morton interleave of the low `bits` of each
    * column: bit i of column j lands at position i·n + j. Pure integer
    * Column arithmetic — a static ~2·n·bits-node expression, fully
    * inside whole-stage codegen. n·bits must fit a signed BIGINT
    * (≤ 63); three 20-bit dims or four 15-bit dims are the practical
    * envelopes. */
  def mortonCodeN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.length
    require(n >= 2, s"Morton interleave needs >= 2 dimensions, got $n")
    require(bits > 0 && n * bits <= 63,
      s"n*bits must be in 1..63 (signed BIGINT), got $n*$bits = ${n * bits}")
    val longs = cols.map(_.cast("long"))
    (for { i <- 0 until bits; (c, j) <- longs.zipWithIndex }
      yield shiftright(c, i).bitwiseAND(1) * lit(1L << (i * n + j)))
      .reduce(_ + _)
  }

  /** The 2-D Morton interleave: bit i of `a` at 2i, of `b` at 2i+1 —
    * exactly [[mortonCodeN]] with dims (a, b). */
  def mortonCode(a: Column, b: Column, bits: Int): Column =
    mortonCodeN(Seq(a, b), bits)

  /** Cluster `df` for N-dimensional skipping: range-partition by the
    * Morton code of the columns' low bits into `numFiles` partitions,
    * sort within each — one shuffle, and every written file covers a
    * compact z-interval (small bounding box in EVERY dimension). Write
    * the result with any sink; parquet row-group stats do the pruning
    * at read time. The helper column is dropped before return. */
  def clusterByZOrderN(df: DataFrame, cols: Seq[String],
                       bits: Int, numFiles: Int): DataFrame = {
    require(numFiles > 0, s"numFiles must be > 0, got $numFiles")
    require(!df.columns.contains("__z"),
      "input already has a '__z' column — rename it before clustering " +
        "(the helper column would silently shadow and then drop it)")
    df.withColumn("__z", mortonCodeN(cols.map(col), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
  }

  /** 2-D [[clusterByZOrderN]] (the original surface). */
  def clusterByZOrder(df: DataFrame, colA: String, colB: String,
                      bits: Int, numFiles: Int): DataFrame =
    clusterByZOrderN(df, Seq(colA, colB), bits, numFiles)
}
