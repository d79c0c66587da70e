package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (array<float>).
  *
  * - [[bruteForceTopK]]: exact cosine top-k — the baseline. The query
  *   set broadcasts; each executor scans its slice of the corpus once
  *   (BroadcastNestedLoopJoin), then a per-query window ranks. Scales
  *   linearly in corpus size × query count; right for small query sets
  *   or as the verify stage after an ANN prefilter.
  * - [[signBucketPairs]]: random-hyperplane LSH — bucket by the 16-bit
  *   sign pattern of fixed ±1 hyperplane projections, join within
  *   buckets, verify with exact cosine. The scale path for all-pairs
  *   near-dup at 100 TB: the only shuffle is on the bucket key, and
  *   verification touches only bucket collisions.
  *
  * Hyperplanes are md5-parity ±1 constants — deterministic across JVMs,
  * engines, and cluster layouts (no RNG state).
  */
object Similarity {

  /** Cosine similarity of two float-array columns, computed in double
    * via the native fused-loop [[graft.expressions.DotProductFloat]]
    * (bit-identical accumulation order to the composed
    * aggregate/zip_with form, but codegen'd — no per-row allocation). */
  def cosine(a: Column, b: Column): Column = {
    val d = graft.expressions.VectorExpressions.dotF _
    d(a, b) / (sqrt(d(a, a)) * sqrt(d(b, b)))
  }

  private def dotD(x: Column, y: Column): Column =
    graft.expressions.VectorExpressions.dotF(x, y)

  /** Exact top-k neighbors for each row of `queries` against `corpus`
    * (both (idCol, vecCol)); self-pairs excluded. Output:
    * (query_id, neighbor_id, rank).
    *
    * Norms are computed once per row on each side BEFORE the join (the
    * join blocks projection collapse, so they are not re-inlined), so
    * each of the |Q|×|C| pairs costs one dot product, not three. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      sqrt(dotD(col(vecCol), col(vecCol))).as("__qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      sqrt(dotD(col(vecCol), col(vecCol))).as("__cn"))
    val scored = c
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotD(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("__cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }

  /** Fixed ±1 hyperplanes: sign from md5 parity of "plane:dim". */
  def hyperplane(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { i =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$plane:$i".getBytes("UTF-8"))
      if ((md(0) & 1) == 0) 1.0 else -1.0
    }

  /** 16-bit sign-pattern bucket key ("0110..." string). Scaling a vector
    * by a positive constant cannot change its bucket. */
  def signBucket(vecCol: Column, dims: Int, planes: Int = 16): Column = {
    val bits = (0 until planes).map { p =>
      val h = array(hyperplane(p, dims).map(x => lit(x.toFloat)): _*)
      val dot = graft.expressions.VectorExpressions.dotF(vecCol, h)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** All pairs with cosine > threshold, found via sign-bucket join +
    * exact verify. Recall note: a pair lands in the same bucket only if
    * all plane signs agree — certain for (anti)parallel vectors (the
    * planted-duplicate case), probabilistic otherwise; raise recall by
    * unioning several bucketings with distinct plane sets. */
  def signBucketPairs(df: DataFrame, idCol: String, vecCol: String,
                      dims: Int, threshold: Double): DataFrame = {
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bk", signBucket(col("v"), dims))
    val a = withB.as("a")
    val b = withB.as("b")
    a.join(b, col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        cosine(col("a.v"), col("b.v")).as("__cos"))
      .filter(col("__cos") > threshold)
      .select("a_id", "b_id")
  }
}
