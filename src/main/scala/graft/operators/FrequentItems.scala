package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.MisraGries

/** EXACT heavy hitters without shuffling the column's cardinality:
  * the two-pass sketch-then-verify shape.
  *
  * Pass 1 runs the native [[graft.expressions.MisraGries]] aggregate
  * (O(k) state per partial, k (value, count) pairs per map task on the
  * wire — cardinality-independent) to get a candidate set GUARANTEED
  * to contain every value with frequency > n/(k+1); with
  * k >= 2/minSupport that superset covers everything at or above
  * minSupport with 2x margin. Pass 2 re-scans, keeps only candidate
  * rows (an array_contains against the <= k candidates — the same
  * one-row-aggregate cross-join shape as q85, nothing collected to the
  * driver), and counts them exactly: the sketch's borderline noise is
  * filtered by true counts, so the result is exact and deterministic
  * under any partitioning.
  *
  * The naive `groupBy(value).count.filter` shuffles one row per
  * DISTINCT value — at 100 TB that is billions of groups for an
  * answer bounded by 1/minSupport rows. Here the shuffles are: k-sized
  * sketch partials (pass 1) and only the rows whose value is already a
  * candidate (pass 2; for rare-but-candidate values this is a small
  * fraction of the input). The input IS scanned twice — the classic
  * exact-heavy-hitter trade (one extra sequential scan for an exact
  * answer with bounded memory).
  *
  * NULLs are not values: the sketch skips them and `n` counts non-null
  * rows, so support is relative to the non-null population.
  */
object FrequentItems {

  /** All values of `valueCol` (a string column) occurring in at least
    * `minSupport` fraction of non-null rows, with their EXACT counts:
    * (valueCol, cnt). */
  def exactHeavyHitters(df: DataFrame, valueCol: String,
                        minSupport: Double): DataFrame = {
    require(minSupport > 0.0 && minSupport < 1.0,
      s"minSupport must be in (0, 1), got $minSupport")
    val value = col(valueCol)
    val sk = df.agg(
      sketch(value, kFor(minSupport)).as("__cand"),
      count(value).as("__n"))
    df.filter(value.isNotNull)
      .join(broadcast(sk))
      .filter(array_contains(col("__cand"), value))
      .groupBy(value)
      .agg(count(lit(1)).as("cnt"), max(col("__n")).as("__n"))
      .filter(col("cnt").cast("double") >= col("__n").cast("double") * lit(minSupport))
      .drop("__n")
  }

  /** Counter budget: 2x the 1/minSupport bound, so the guarantee line
    * n/(k+1) sits at half the requested support — candidates at the
    * threshold survive with margin, and k stays tiny (40 counters for
    * 5% support). */
  def kFor(minSupport: Double): Int =
    math.max(2, math.ceil(2.0 / minSupport).toInt)

  /** The raw candidate-array aggregate (superset of the heavy hitters,
    * partition-order dependent below the guarantee line — see
    * [[graft.expressions.MisraGries]]). Requires
    * [[graft.GraftExtensions]] on the session. */
  def sketch(value: Column, k: Int): Column =
    call_function(MisraGries.name, value, lit(k))
}
