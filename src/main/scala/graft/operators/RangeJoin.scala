package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval (range) join by binning.
  *
  * Open-source Spark plans a non-equi `p >= lo AND p < hi` join as a
  * (broadcast) nested loop — fine for a handful of bands (q38), fatal
  * when the interval side outgrows broadcast: the fallback is an
  * all-pairs CartesianProduct. Binning restores an equi-join: every
  * point maps to bucket ⌊p/w⌋, every interval explodes to the buckets
  * it overlaps, the join runs hash-on-bucket, and the exact predicate
  * re-verifies each candidate (bucket overlap is a superset of true
  * matches). This is the same rewrite Databricks' range-join hint
  * performs; here it is an explicit, composable operator.
  *
  * Choosing `binWidth`: candidates per point ≈ intervals overlapping
  * its bucket; replication per interval ≈ length/w + 1. Set w near the
  * TYPICAL interval length — too small explodes the interval side,
  * too large degrades toward all-pairs within a bucket. Mis-sizing
  * within the `maxBucketsPerInterval` guard only costs speed, never
  * correctness (the verify is exact); an interval wider than the guard
  * fails LOUDLY per row instead of materializing an executor-OOM
  * bucket array (open-ended sentinel intervals — hi = "infinity" —
  * must be clamped to the points' real domain by the caller first).
  */
object RangeJoin {

  /** Inner join of `points` to `intervals` on
    * `lo <= p < hi` (half-open, the histogram/band convention),
    * executed as a bucket equi-join + exact verify. Output columns:
    * all of `points`' then all of `intervals`' (like a plain join).
    * Bucket ids derive from `floor(x / binWidth)` in DOUBLE — exact
    * for the integral/decimal-ish domains range joins bucket in
    * practice; equal values always land in equal buckets either way,
    * and the exact verify decides membership. */
  def binnedPointJoin(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String, hiCol: String,
                      binWidth: Double,
                      maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0, got $maxBucketsPerInterval")
    for (df <- Seq(points, intervals))
      require(!df.columns.contains("__bk"),
        "input already has a '__bk' column — rename it before joining " +
          "(the helper column would silently shadow and then drop it)")
    def bucket(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    val p = points.withColumn("__bk", bucket(col(pointCol)))
    // a half-open interval overlaps buckets ⌊lo/w⌋ .. ⌊hi/w⌋ (the hi
    // bucket is included: hi itself is exclusive but hi-ε is not).
    // The span guard turns a binWidth far below the interval length —
    // or an unclamped "infinity" sentinel — into a loud error instead
    // of a silent giant array allocation.
    val span = bucket(col(hiCol)) - bucket(col(loCol)) + 1
    val iv = intervals.withColumn("__bk",
      explode(when(span > maxBucketsPerInterval,
        raise_error(concat(
          lit(s"range-join interval spans more than $maxBucketsPerInterval " +
            s"buckets at binWidth $binWidth: ["),
          col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
          lit(") — raise binWidth or clamp sentinel bounds"))))
        .otherwise(sequence(bucket(col(loCol)), bucket(col(hiCol))))))
    // the interval side grows with its table × replication — hash
    // join on the bucket, never a sort
    p.join(iv.hint("shuffle_hash"), "__bk")
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("__bk")
  }
}
