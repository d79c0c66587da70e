package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** The ONE place that decides how a lineage-truncating pin is taken,
  * so every iterative/multi-consumer operator gets the same fault
  * story (round-10 verdict follow-up #3: `Dedup.dupClusters` had the
  * reliable fallback, `Baskets.counts`/`Bpe.train`/`Graph` did not —
  * on a real cluster an executor loss kills a truncated-lineage job
  * mid-query, because localCheckpoint blocks have no lineage to
  * recompute from and no replica to read).
  *
  * Contract:
  *  - [[pin]]: eager lineage truncation. Reliable `checkpoint()` when
  *    the session has a checkpoint dir configured (`sc.setCheckpointDir`
  *    — HDFS/object store on a cluster: blocks survive executor loss),
  *    `localCheckpoint` otherwise (executor-resident blocks, freed by
  *    the ContextCleaner on GC — the right default for local[n] where
  *    there is no executor to lose).
  *  - [[loopPin]]: the pin for loop-invariant tables consumed by every
  *    iteration (PageRank/BFS edge lists). Reliable `checkpoint()` when
  *    a dir is configured — durable AND holds no executor memory, the
  *    blocks live as files; columnar MEMORY_AND_DISK `persist`
  *    otherwise. persist is ALSO executor-loss-safe (it keeps lineage
  *    and recomputes lost blocks), and it measured strictly better than
  *    localCheckpoint for GB-scale edge lists: checkpoint blocks store
  *    deserialized rows, and that storage squeezed the iteration joins'
  *    execution memory into intermittent OOM at the 100× decade's
  *    8 GiB heap (see [[Graph.pageRank]]'s definition-site note).
  *    Caller owns the unpersist (a persisted table is session-pinned;
  *    checkpointed files are reclaimed with the checkpoint dir).
  *
  * Both preserve the child's outputPartitioning (Dataset.checkpoint and
  * persist each carry it), so pre-partitioned loop tables keep their
  * shuffle-once property through the pin.
  */
private[graft] object Materialize {

  def reliableAvailable(df: DataFrame): Boolean =
    df.sparkSession.sparkContext.getCheckpointDir.isDefined

  /** Eager lineage-truncating pin; reliable when the session has a
    * checkpoint dir, local otherwise. */
  def pin(df: DataFrame): DataFrame =
    if (reliableAvailable(df)) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Pin for loop-invariant tables: reliable checkpoint when a dir is
    * configured, columnar MEMORY_AND_DISK persist otherwise (lazy —
    * the first iteration materializes it). */
  def loopPin(df: DataFrame): DataFrame =
    if (reliableAvailable(df)) df.checkpoint(eager = true)
    else df.persist(StorageLevel.MEMORY_AND_DISK)

  /** Release a [[loopPin]]'d table: unpersist is a no-op on a
    * checkpointed frame, so callers can release unconditionally. */
  def release(df: DataFrame): Unit = df.unpersist(blocking = false)

  /** [[pin]] for an iteratively REPLACED loop state (BPE's symbol
    * table): pins the new state eagerly, then deletes the superseded
    * reliable checkpoint backing `prev` — the new pin is fully
    * materialized, so its lost-partition recovery reads only its own
    * files and nothing ever reads `prev`'s again. Without this, a
    * checkpoint-dir run of an N-iteration trainer keeps N full copies
    * of the state on the reliable store for the whole job
    * (`spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
    * false, and even enabled it frees only on GC). No-op deletion on
    * the local path (localCheckpoint frames have no checkpoint file).
    */
  def pinReplacing(df: DataFrame, prev: DataFrame): DataFrame = {
    val out = pin(df)
    deleteCheckpoint(prev)
    out
  }

  /** Delete the reliable checkpoint files backing `df`, if any — call
    * only when nothing will read `df` again (the final state of a
    * [[pinReplacing]] loop, after its last consumer). Safe no-op for
    * localCheckpoint'd, persisted, or un-pinned frames. */
  def deleteCheckpoint(df: DataFrame): Unit =
    checkpointPathOf(df).foreach { p =>
      val fs = p.getFileSystem(
        df.sparkSession.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }

  /** The reliable checkpoint dir backing a [[pin]]'d frame: the
    * LogicalRDD a Dataset.checkpoint wraps carries the checkpointed
    * RDD, whose getCheckpointFile is Some only on the reliable path.
    *
    * Matches ONLY when the LogicalRDD is the plan's ROOT — i.e. `df`
    * IS the [[pin]] result, not a frame derived from one. A collect-
    * anywhere match (the pre-round-13 shape) made
    * `deleteCheckpoint(state.select(...))` silently find the UPSTREAM
    * pin and delete checkpoint files still backing a live frame;
    * derived frames now resolve to None (deleteCheckpoint is a no-op,
    * exactly as for persisted/un-pinned frames). Callers of
    * [[pinReplacing]]/[[deleteCheckpoint]] must pass the pin result
    * itself. */
  private def checkpointPathOf(df: DataFrame): Option[org.apache.hadoop.fs.Path] =
    (df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }).flatMap(_.getCheckpointFile).map(new org.apache.hadoop.fs.Path(_))
}
