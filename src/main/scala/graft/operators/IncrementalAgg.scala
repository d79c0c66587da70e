package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental materialized-rollup maintenance — the exact-aggregate
  * sibling of the q92 sketch rollup: a grouped rollup table is kept
  * up-to-date through batch arrivals by merging PARTIAL aggregates,
  * never by rescanning the fact. Per-batch cost is O(batch) + O(|rollup
  * grid|); the naive alternative re-reads the whole fact each refresh,
  * which at 100 TB is the difference between a minutes-cadence
  * materialized view and a nightly one.
  *
  * Only decomposable aggregates participate — sum/count merge by
  * addition, min/max by themselves (the same partial/final split
  * Spark's own HashAggregate performs inside one query, lifted across
  * queries and table versions). AVG is intentionally absent: maintain
  * sum + count and derive at read (an avg column cannot be merged).
  *
  * [[merge]] re-aggregation widens decimal sums (Spark grows precision
  * by 10 per sum), so merged columns are cast back to the EXISTING
  * side's dtypes — a maintained table keeps one stable schema forever
  * instead of marching toward Decimal(38) and breaking readers. Under
  * ANSI mode a true overflow fails loudly rather than silently
  * saturating.
  */
object IncrementalAgg {

  /** One maintained column: `outCol` = `func`(`inCol`) per group.
    * func ∈ sum | count | min | max; inCol "*" with count counts rows
    * (otherwise count counts non-nulls of inCol, like SQL). */
  final case class AggSpec(outCol: String, func: String, inCol: String) {
    require(Set("sum", "count", "min", "max")(func),
      s"unsupported func '$func' — decomposable aggs only (sum/count/min/max); " +
        "derive avg from a maintained sum and count at read time")
  }

  /** The batch's partial rollup: groupBy(keys) with each spec's
    * aggregate. This is what a pipeline persists per batch/partition —
    * grid-sized, not batch-sized. */
  def partial(batch: DataFrame, keys: Seq[String], aggs: Seq[AggSpec]): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate column required")
    val exprs = aggs.map {
      case AggSpec(out, "count", "*") => count(lit(1)).as(out)
      case AggSpec(out, "count", in) => count(col(in)).as(out)
      case AggSpec(out, "sum", in)   => sum(col(in)).as(out)
      case AggSpec(out, "min", in)   => min(col(in)).as(out)
      case AggSpec(out, "max", in)   => max(col(in)).as(out)
    }
    batch.groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
  }

  /** Merge two partial rollups (the maintained table and a new batch's
    * [[partial]]) into the rollup of their union: groups present on one
    * side pass through, shared groups combine with the merge function
    * of each spec. Output dtypes follow `existing` (see class doc). */
  def merge(existing: DataFrame, delta: DataFrame, keys: Seq[String],
            aggs: Seq[AggSpec]): DataFrame = {
    val exprs = aggs.map { s =>
      val m: Column = s.func match {
        case "min" => min(col(s.outCol))
        case "max" => max(col(s.outCol))
        case _     => sum(col(s.outCol)) // sum AND count merge by addition
      }
      m.as(s.outCol)
    }
    val existingTypes = existing.schema.map(f => f.name -> f.dataType).toMap
    existing.unionByName(delta)
      .groupBy(keys.map(col): _*).agg(exprs.head, exprs.tail: _*)
      .select(keys.map(col) ++ aggs.map(s =>
        col(s.outCol).cast(existingTypes(s.outCol)).as(s.outCol)): _*)
  }
}
