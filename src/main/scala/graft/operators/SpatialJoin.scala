package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed spatial neighbor join: all pairs of points within an
  * L2 radius, found through cell buckets instead of an all-pairs
  * cross join (the same candidate-generation discipline as the LSH /
  * band-bucket dedup operators — at 100 TB the cross join does not
  * exist as an option).
  *
  * Points live on an integer grid, so the distance test is exact
  * BIGINT arithmetic (`dx²+dy² ≤ r²` — no doubles, no sqrt) and the
  * result replays bit-identically on any engine.
  */
object SpatialJoin {

  /** Pairs of points at L2 distance ≤ `r`, as
    * `(a_id, b_id, d2)` with `a_id < b_id` (each unordered pair
    * exactly once) and `d2` the exact squared distance.
    *
    * `pts` must be `(id, x, y)` integral with unique ids and
    * NON-NEGATIVE coordinates (`div` truncates toward zero, so the
    * cell of a negative coordinate would collide with its mirror; a
    * floor-div grid would be needed for signed coordinates). Cells are
    * `r × r`, so any qualifying pair is at most one cell apart on
    * each axis: the left side expands each point to its 3×3 cell
    * neighborhood (a bounded ×9, NOT a data-dependent blowup), the
    * right side stays on its home cell, and the join key is the cell
    * — one shuffle each side, candidates only from adjacent cells.
    * The `a_id < b_id` filter both dedups (a pair matches once in
    * this direction — b's home cell appears exactly once among a's
    * nine) and halves the candidate stream.
    */
  def neighborPairs(pts: DataFrame, r: Long): DataFrame = {
    require(r >= 1, s"radius must be >= 1, got $r")
    val p = pts.toDF("id", "x", "y")
    val probe = p.select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
        explode(expr(s"flatten(transform(sequence(-1, 1), dx -> " +
          s"transform(sequence(-1, 1), dy -> " +
          s"struct((x div $r) + dx AS cx, (y div $r) + dy AS cy))))")).as("c"))
      .select(col("a_id"), col("ax"), col("ay"),
        col("c.cx").as("cx"), col("c.cy").as("cy"))
    val build = p.select(col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
      expr(s"x div $r").as("cx"), expr(s"y div $r").as("cy"))
    probe.join(build.hint("shuffle_hash"), Seq("cx", "cy"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        ((col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by"))).as("d2"))
      .filter(col("d2") <= r * r)
  }
}
