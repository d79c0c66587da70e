package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.BloomMightContain

/** Bloom-pruned equi-join: build a [[org.apache.spark.util.sketch
  * .BloomFilter]] over the build side's join keys, probe it on every
  * big-side row BEFORE the join's shuffle, then run the exact join on
  * the survivors.
  *
  * Why it matters at 100 TB: when the build side is selective (a
  * filtered dimension, a work-list) but too big to broadcast, a plain
  * shuffle join moves the ENTIRE probe side across the network only to
  * drop most rows at the join. The bloom probe drops them at the scan
  * instead — shuffle volume falls to (matching rows + fpp·non-matching).
  * The sketch itself is bounded bytes (~1.2 MB per million keys at 1%
  * fpp) regardless of build-side row width; the driver round-trip is
  * that sketch, not data. (Spark's own runtime row-level filtering
  * does this automatically for some plans; this operator makes the
  * semi-join reduction explicit, composable, and available to any
  * caller — e.g. ahead of an aggregation or a multi-join chain where
  * the injected-filter heuristics don't fire.)
  *
  * Exactness: false positives survive the probe but are discarded by
  * the exact join — results are ALWAYS identical to the plain join.
  * A false-positive rate only costs shuffle bytes. NULL keys fail the
  * probe (never equi-join anyway).
  *
  * `expectedItems` sizes the sketch; overshooting wastes sketch bytes,
  * undershooting inflates fpp (still correct). Pass the build side's
  * approximate distinct-key count; when unknown, an upper bound on its
  * row count is safe.
  */
object BloomJoin {

  /** Inner/semi equi-join of `probe` to `build` on `key`, with the
    * probe side pre-filtered by a bloom sketch of `build`'s keys.
    *
    * Two build-side passes run: one aggregation to the sketch (bounded
    * bytes to the driver) and the join's own scan — the standard cost
    * of every bloom-semi-join (Spark's runtime filtering pays the
    * same); at scale the build side is the small, filtered input, and
    * the prize is not shuffling the huge probe side.
    */
  def prunedJoin(probe: DataFrame, build: DataFrame, key: String,
                 expectedItems: Long, fpp: Double = 0.01,
                 joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_semi").contains(joinType),
      s"bloom pruning only preserves inner/left_semi semantics, got $joinType")
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    // the sketch hashes the BUILD side's representation and the probe
    // hashes its own — a coercible type mismatch (string '123' vs
    // bigint 123) would hash differently and silently prune TRUE
    // matches the plain coercing join would return; fail loudly instead
    val (pt, bt) = (probe.schema(key).dataType, build.schema(key).dataType)
    require(pt == bt,
      s"probe/build key types must match exactly (got $pt vs $bt): the " +
        "bloom probe hashes each side's own representation, so a " +
        "coerced join key would silently drop true matches")
    val sketch = build.stat.bloomFilter(key, expectedItems, fpp)
    val pruned = probe.filter(mightContain(col(key), serialize(sketch)))
    // shuffle_hash: the build side is selective but (by precondition)
    // not broadcastable; a hash build needs no sort of the huge side
    pruned.join(build.hint("shuffle_hash"), Seq(key), joinType)
  }

  /** The bloom membership probe as a standalone Column — for callers
    * composing their own plan (e.g. pruning before an aggregation). */
  def mightContain(key: Column, sketchBytes: Array[Byte]): Column =
    BloomMightContain.mightContain(key, lit(sketchBytes))

  /** The sketch's wire form (the plan-embedded literal). One place owns
    * the format; pair with `BloomFilter.readFrom`. */
  def serialize(sketch: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    sketch.writeTo(bos)
    bos.toByteArray
  }
}
