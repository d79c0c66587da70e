package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe equi-join by salting: the big (skewed) side gets a
  * deterministic per-row salt in [0, buckets); the small side is
  * replicated once per salt value; the join key becomes
  * (keys…, salt). A hot key's rows then spread over `buckets` shuffle
  * partitions instead of one straggler task.
  *
  * Semantically identical to the plain equi-join: each big-side row
  * matches exactly the one replica carrying its salt. (AQE's skew-join
  * splitting handles moderate skew automatically; explicit salting is
  * for the pathological hot-key case where one key exceeds a single
  * executor, or for deterministic layout control.)
  *
  * The salt derives from xxhash64 over ALL big-side columns — no RNG,
  * so plans are reproducible across runs and cluster layouts; duplicate
  * identical rows share a salt, which only matters if one fully
  * duplicated row dominates the key.
  */
object SkewJoin {

  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"unsupported join type: $joinType")
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col): _*), lit(buckets)).cast("int"))
    // shuffle_hash, not sort-merge: salting targets hash-join skew, and a
    // per-bucket hash build needs no sort of either side (the replicated
    // side is deliberately past the broadcast threshold — that's the
    // scenario salting exists for).
    val replicated = small.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1)))).hint("shuffle_hash")
    saltedBig.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }
}
