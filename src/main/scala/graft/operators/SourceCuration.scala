package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source corpus curation — the C4/RefinedWeb "cap and blocklist
  * by source domain" stage (the reference has no corpus surface; this
  * is part of the large-scale pipeline extension mandate): drop every
  * document from a blocklisted source, then keep at most `cap`
  * documents per surviving source, chosen by the deterministic salted
  * md5 hash order (q64's reproducible-sampler shape — no RNG, no
  * partition-order dependence, stable across engines and re-runs, and
  * the SAME docs survive when the corpus is re-curated after upstream
  * edits elsewhere).
  *
  * Shape at 100 TB:
  *  - the blocklist is host-count-sized (~1e5 rows for a web corpus) —
  *    broadcast LEFT ANTI join, zero shuffle on the corpus side;
  *  - the cap is `row_number() <= cap` under a per-source window, which
  *    Spark rewrites via WindowGroupLimit: each map task keeps only its
  *    partial top-`cap` rows per source BEFORE the exchange, so the
  *    shuffle carries O(sources × cap × tasks) rows, not the corpus —
  *    a hot source (the skew case for any per-host window) is pruned
  *    map-side to `cap` rows per task.
  */
object SourceCuration {

  /** Deterministic per-source rank: salted md5 of the id, ties on the
    * id itself (a unique total order per source). */
  def hashRank(salt: String, sourceCol: Column, idCol: Column): Column =
    row_number().over(Window.partitionBy(sourceCol)
      .orderBy(md5(concat(lit(salt), idCol.cast("string"))), idCol))
      .cast("int")

  /** Survivors of blocklist-then-cap curation: input rows minus
    * blocklisted sources, at most `cap` per source, with the rank
    * (`rn`, 1-based in hash order) attached. `blocklist` must be a
    * one-column frame of source keys (host-count-sized — broadcast). */
  def curate(docs: DataFrame, sourceCol: String, idCol: String,
             cap: Int, blocklist: DataFrame, salt: String): DataFrame = {
    require(cap >= 1, s"cap must be >= 1, got $cap")
    val bl = broadcast(blocklist.toDF("blocked_source"))
    docs
      .join(bl, docs(sourceCol) === bl("blocked_source"), "left_anti")
      .withColumn("rn", hashRank(salt, col(sourceCol), col(idCol)))
      .filter(col("rn") <= cap)
  }
}
