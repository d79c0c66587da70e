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

  /** Opaque handle for an iteratively REPLACED loop state (BPE's
    * symbol table): [[replace]] pins the new state eagerly, then
    * deletes the superseded reliable checkpoint backing the previous
    * pin — the new pin is fully materialized, so its lost-partition
    * recovery reads only its own files and nothing ever reads the old
    * ones again. Without this, a checkpoint-dir run of an N-iteration
    * trainer keeps N full copies of the state on the reliable store
    * for the whole job (`spark.cleaner.referenceTracking
    * .cleanCheckpoints` defaults to false, and even enabled it frees
    * only on GC). No-op deletion on the local path (localCheckpoint
    * frames have no checkpoint file).
    *
    * WHY a handle and not free functions over DataFrames (round-13
    * verdict #5): the raw `deleteCheckpoint(df)` form had two failure
    * modes for a caller holding a DERIVED frame — the pre-round-13
    * collect-anywhere path match deleted checkpoint files still
    * backing a live pin, and the root-only fix turned that into a
    * silent leak (no-op delete, files accumulate). The handle holds
    * the pin ROOT privately, so delete-by-derived-frame is not
    * expressible at all: misuse is now a compile error. */
  final class Pinned private[Materialize] (initial: DataFrame) {
    private var pinned: DataFrame = pin(initial)

    /** The current pinned state — always the pin root itself. */
    def df: DataFrame = pinned

    /** Pin `next` (typically derived from [[df]]) and reclaim the
      * superseded pin's reliable checkpoint files. Returns the new
      * pinned state. */
    def replace(next: DataFrame): DataFrame = {
      val out = pin(next)
      deleteRoot(pinned)
      pinned = out
      out
    }

    /** Reclaim the final state's checkpoint files — call when nothing
      * will read [[df]] again (after the loop's last consumer). */
    def delete(): Unit = deleteRoot(pinned)
  }

  /** Start a [[Pinned]] loop-state handle: pins `df` eagerly (reliable
    * under a checkpoint dir, local otherwise — the [[pin]] rule). */
  def pinState(df: DataFrame): Pinned = new Pinned(df)

  /** Delete the reliable checkpoint files backing a pin ROOT, if any.
    * Private — external callers go through [[Pinned]], which cannot
    * hand this a derived frame. Safe no-op for localCheckpoint'd,
    * persisted, or un-pinned frames. */
  private def deleteRoot(df: DataFrame): Unit =
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
    * anywhere match (the pre-round-13 shape) silently found the
    * UPSTREAM pin through a derived frame and deleted checkpoint files
    * still backing a live frame; derived frames resolve to None. The
    * [[Pinned]] handle guarantees by construction that only pin roots
    * reach here. */
  private def checkpointPathOf(df: DataFrame): Option[org.apache.hadoop.fs.Path] =
    (df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }).flatMap(_.getCheckpointFile).map(new org.apache.hadoop.fs.Path(_))
}
