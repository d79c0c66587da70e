package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar (per-dimension) int8-range quantization for embedding
  * columns — the storage/bandwidth half of large-scale vector search:
  * float32 embeddings compress 4x into [0, 255] codes with a bounded,
  * per-dimension reconstruction error, so a 100 TB embedding corpus
  * scans (and shuffles, and caches) at a quarter the bytes; exact
  * vectors are kept only for the final re-rank of a candidate set
  * (QuantizeSpec composes the two: quantized brute-force recall, exact
  * re-rank on top).
  *
  * Scale shape: the bounds pass is ONE aggregate — `posexplode` +
  * `groupBy(dim)` partial-aggregates map-side, so each task puts
  * `dims` (min, max) rows on the wire regardless of row count; the
  * bounds then ride a broadcast (2 arrays of `dims` doubles) and
  * encoding is row-local arithmetic fused into whole-stage codegen
  * (pure builtin Columns — no UDF, no custom expression needed).
  *
  * Determinism (oracle-ability): all arithmetic is explicitly DOUBLE —
  * `floor((x - lo) * 255.0 / (hi - lo) + 0.5)` evaluates bit-identically
  * on any IEEE-754 engine, so DuckDB replaying the same formula over
  * the same parquet produces the same codes. Degenerate dimensions
  * (hi == lo) encode to 0 and reconstruct to lo exactly.
  *
  * Reconstruction: `lo + code * (hi - lo) / 255` — error is bounded by
  * half a step, `(hi - lo) / 510`, per dimension (the q99 verdict
  * checks it with 20% margin, following the q30 engine-agnostic
  * verdict discipline).
  */
object Quantize {

  /** Per-dimension [lo, hi] over the whole frame, as ONE row with two
    * `dims`-sized double arrays (columns `__lo`, `__hi`) — shaped for
    * `crossJoin(broadcast(...))` onto the corpus. NULL vectors are
    * skipped; ragged dimension counts fail the later zip loudly rather
    * than silently mis-bucketing. */
  def bounds(df: DataFrame, vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("__d", "__x")))
      .groupBy(col("__d"))
      .agg(min(col("__x").cast("double")).as("__mn"),
        max(col("__x").cast("double")).as("__mx"))
      .agg(
        transform(array_sort(collect_list(struct(col("__d"), col("__mn")))),
          e => e.getField("__mn")).as("__lo"),
        transform(array_sort(collect_list(struct(col("__d"), col("__mx")))),
          e => e.getField("__mx")).as("__hi"))

  /** The [0, 255] code array for `vec` given broadcast `lo`/`hi`
    * arrays (all 1-indexed accesses; LONG elements). */
  def encode(vec: Column, lo: Column, hi: Column): Column =
    transform(sequence(lit(1), size(vec)), i => {
      val x = element_at(vec, i).cast("double")
      val l = element_at(lo, i)
      val h = element_at(hi, i)
      when(h === l, lit(0L))
        .otherwise(floor((x - l) * lit(255.0) / (h - l) + lit(0.5)))
    })

  /** Approximate reconstruction of a code array (double elements). */
  def decode(codes: Column, lo: Column, hi: Column): Column =
    transform(sequence(lit(1), size(codes)), i => {
      val c = element_at(codes, i).cast("double")
      val l = element_at(lo, i)
      val h = element_at(hi, i)
      l + c * (h - l) / lit(255.0)
    })

  /** The corpus with a `codes` column (and the bounds columns `__lo`,
    * `__hi` retained for decode/verdict use). One bounds aggregate +
    * one broadcast; encoding is row-local. */
  def quantized(df: DataFrame, vecCol: String): DataFrame =
    df.crossJoin(broadcast(bounds(df, vecCol)))
      .withColumn("codes", encode(col(vecCol), col("__lo"), col("__hi")))
}
