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

  /** Keys of `big` whose estimated row count exceeds `hotRowThreshold`,
    * from a seeded uniform sample — the production way to find skew
    * without a full-key aggregation pass. Deterministic for a given
    * input + seed. A missed hot key only costs speed (it takes the
    * plain path); a false positive only costs a little replication. */
  def detectHotKeys(big: DataFrame, keys: Seq[String], hotRowThreshold: Long,
                    sampleFraction: Double = 0.001, seed: Long = 42L): DataFrame = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0, s"bad fraction $sampleFraction")
    // below ~10 expected samples per at-threshold key the Poisson
    // estimator is noise: at < 1 every sampled key reads as hot, the
    // "hot set is small" bound collapses, and the broadcast blows up
    require(sampleFraction >= 1.0 || hotRowThreshold * sampleFraction >= 10.0,
      s"sampleFraction too small to estimate the threshold: " +
        s"hotRowThreshold*fraction = ${hotRowThreshold * sampleFraction} < 10")
    val sampleThresh = math.max(1L, (hotRowThreshold * sampleFraction).toLong)
    big.sample(withReplacement = false, sampleFraction, seed)
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= sampleThresh)
      .select(keys.map(col): _*)
  }

  /** Skew-aware join, production shape: [[saltedJoin]] replicates the
    * ENTIRE small side `buckets`× — the right demo primitive, but at
    * 100 TB that is buckets× shuffle volume to fix what is usually a
    * handful of hot keys. Here only rows whose key is detected hot
    * (sampled estimate > `hotRowThreshold`) take the salted path; the
    * rest take an ordinary hash join. A uniform input degrades to
    * exactly the plain join (empty hot set, empty salted branch).
    *
    * The hot-key set is small by construction (each key detected
    * represents > hotRowThreshold rows, so there can be at most
    * |big| / hotRowThreshold of them) — it broadcasts, so routing rows
    * to branches adds NO shuffle. Results are identical to the plain
    * join for any detection outcome; only the physical plan changes. */
  def adaptiveSaltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
                         buckets: Int, hotRowThreshold: Long,
                         sampleFraction: Double = 0.001,
                         joinType: String = "inner"): DataFrame = {
    val hot = broadcast(
      detectHotKeys(big, keys, hotRowThreshold, sampleFraction))
    val cold = big.join(hot, keys, "left_anti")
      .join(small.hint("shuffle_hash"), keys, joinType)
    val salted = saltedJoin(
      big.join(hot, keys, "left_semi"),
      small.join(hot, keys, "left_semi"),
      keys, buckets, joinType)
    cold.unionByName(salted)
  }
}
