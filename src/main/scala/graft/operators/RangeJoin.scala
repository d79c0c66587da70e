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

  /** Interval-OVERLAP join: inner join of two interval sets on
    * half-open overlap (`loL < hiR AND loR < hiL`) — the temporal
    * overlap query (concurrent sessions, conflicting bookings,
    * validity-window intersection) that q86's point-in-interval shape
    * doesn't cover. Same bucket rewrite, both sides exploded.
    *
    * Duplicate suppression without a shuffle: two overlapping
    * intervals share every bucket their intersection touches, so a
    * naive bucket join emits the pair once per shared bucket. Each
    * pair is kept only in its CANONICAL bucket — the later of the two
    * start buckets, which (proof in the predicate) is always shared by
    * a truly-overlapping pair — so every true pair survives exactly
    * once and no dropDuplicates exchange is needed. Column names of
    * the four bound columns must be distinct across the two inputs
    * (the exact verify references all four after the join). */
  def binnedOverlapJoin(left: DataFrame, right: DataFrame,
                        loL: String, hiL: String, loR: String, hiR: String,
                        binWidth: Double,
                        maxBucketsPerInterval: Long = 100000L): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be > 0, got $maxBucketsPerInterval")
    require(Seq(loL, hiL, loR, hiR).distinct.size == 4,
      "interval bound columns must have four distinct names")
    for (df <- Seq(left, right); c <- Seq("__bk", "__lbk0", "__rbk0"))
      require(!df.columns.contains(c),
        s"input already has a '$c' column — rename it before joining")
    def bucket(c: Column): Column = floor(c / lit(binWidth)).cast("long")
    def exploded(df: DataFrame, lo: String, hi: String, startCol: String) = {
      val span = bucket(col(hi)) - bucket(col(lo)) + 1
      df.withColumn(startCol, bucket(col(lo)))
        .withColumn("__bk",
          explode(when(span > maxBucketsPerInterval,
            raise_error(concat(
              lit(s"overlap-join interval spans more than $maxBucketsPerInterval " +
                s"buckets at binWidth $binWidth: ["),
              col(lo).cast("string"), lit(", "), col(hi).cast("string"),
              lit(") — raise binWidth or clamp sentinel bounds"))))
            .otherwise(sequence(col(startCol), bucket(col(hi))))))
    }
    val l = exploded(left, loL, hiL, "__lbk0")
    val r = exploded(right, loR, hiR, "__rbk0")
    l.join(r.hint("shuffle_hash"), "__bk")
      // canonical bucket: max of the start buckets. For a true overlap
      // (loR < hiL, wlog __rbk0 is the max) it lies in BOTH covers:
      // __rbk0 >= __lbk0 by choice, and loR < hiL ⇒ __rbk0 <= ⌊hiL/w⌋.
      .where(col("__bk") === greatest(col("__lbk0"), col("__rbk0")) &&
        col(loL) < col(hiR) && col(loR) < col(hiL))
      .drop("__bk", "__lbk0", "__rbk0")
  }
}
