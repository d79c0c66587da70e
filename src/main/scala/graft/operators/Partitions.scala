package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive partition counts for loop-invariant tables (guide §2:
  * partitioning must derive from data size, not from a constant tuned
  * for either local mode or the cluster).
  *
  * Round-18 scaling data (PERF_r18 `scaling`): at sf0.1 the iterative
  * family (q124 0.57, q133 0.38, q137 0.38, q147 0.60, q136 0.55,
  * q131 0.34) ran 2–3× FASTER at 8 cores than at 32. Mechanism: every
  * per-iteration exchange inherited `spark.sql.shuffle.partitions`
  * (= the core count), so a KB-scale loop table was sliced into 32
  * partitions × N iterations of pure scheduling/shuffle-block overhead
  * — and because the PINNED edge/label tables carry that partitioning
  * through every loop join, AQE can never coalesce it (the cached side
  * is not a shuffle, so EnsureRequirements must match its partition
  * count exactly). Sizing the one build-time repartition from the
  * plan's base-relation bytes fixes the small end without touching the
  * large end: the count is capped at `spark.sql.shuffle.partitions`,
  * so any input at or above the cluster's own sizing keeps the
  * cluster's knob and the plan is byte-identical to the uncapped form.
  */
private[graft] object Partitions {

  /** Partition count for a loop table derived from `df`: the plan's
    * base-relation bytes (exact FILE sizes for file sources — never
    * join/filter row estimates, which swing both ways) divided by
    * `targetBytes`, clamped to [1, spark.sql.shuffle.partitions].
    *
    * File bytes OVER-estimate a projected/filtered loop table
    * (compressed full-width rows vs a two-column key projection), and
    * non-file leaves (checkpointed intermediates report
    * `defaultSizeInBytes`) saturate the cap — both err toward MORE
    * partitions, the safe direction: the result is never larger than
    * what the session would have used anyway. */
  def forLoopTable(df: DataFrame, targetBytes: Long = 8L << 20): Int = {
    require(targetBytes > 0, s"targetBytes must be > 0, got $targetBytes")
    val scanBytes = df.queryExecution.optimizedPlan.collectLeaves().map {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        BigInt(r.relation.sizeInBytes)
      case l => l.stats.sizeInBytes
    }.sum
    val sp = df.sparkSession.sessionState.conf.numShufflePartitions
    val n = (scanBytes + targetBytes - 1) / targetBytes
    n.min(BigInt(sp)).max(BigInt(1)).toInt
  }
}
