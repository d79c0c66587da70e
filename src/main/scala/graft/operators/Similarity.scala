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
  * - [[signBucketPairs]]: random-hyperplane LSH — bucket by the sign
  *   pattern of fixed ±1 hyperplane projections (multi-probe: `tables`
  *   independent bucketings unioned, hot buckets sub-split), join
  *   within buckets, verify with exact cosine. The scale path for
  *   all-pairs near-dup at 100 TB: the only shuffle is on the bucket
  *   key, and verification touches only bucket collisions.
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

  /** Fixed ±1 hyperplanes: sign from md5 parity of "plane:dim"
    * (delegates to the canonical derivation next to the fused native
    * expression, so the two can never diverge). */
  def hyperplane(plane: Int, dims: Int): Seq[Double] =
    graft.expressions.SignBucketKeys.hyperplane(plane, dims)

  /** Sign-pattern bucket key ("0110..." string) over `planes` hyperplanes
    * starting at index `planeOffset` (distinct offsets → independent
    * bucketings). Scaling a vector by a positive constant cannot change
    * its bucket.
    *
    * COMPOSED parity reference for the fused native
    * [[graft.expressions.SignBucketKeys]] (which computes all tables'
    * keys in one pass — the composed per-plane tree is ~100× slower
    * per row and survives only for the DedupSpec parity test). */
  def signBucket(vecCol: Column, dims: Int, planes: Int = 16,
                 planeOffset: Int = 0): Column = {
    val bits = (0 until planes).map { p =>
      val h = array(hyperplane(planeOffset + p, dims).map(x => lit(x.toFloat)): _*)
      val dot = graft.expressions.VectorExpressions.dotF(vecCol, h)
      when(dot >= 0, lit("1")).otherwise(lit("0"))
    }
    concat(bits: _*)
  }

  /** All pairs with cosine > threshold, found via multi-probe sign-bucket
    * LSH + exact verify.
    *
    * Recall: a pair is a candidate if its sign pattern agrees on ALL
    * `planes` hyperplanes of AT LEAST ONE of the `tables` bucketings
    * (each bucketing uses a disjoint plane set). One bucketing is
    * certain only for (anti)parallel vectors; for a noised near-dup at
    * cosine c the per-bucketing collision probability is
    * (1 - arccos(c)/π)^planes, so unioning L bucketings drives the miss
    * rate to (1-p)^L. False positives never survive: every candidate is
    * re-checked with exact cosine.
    *
    * Hot-bucket guard: a degenerate corpus (e.g. many near-zero or
    * near-identical vectors sharing one sign pattern) would make a
    * single bucket quadratic. Buckets larger than `maxBucketSize` are
    * sub-split by a deterministic salt (xxhash64 of the id), bounding
    * per-bucket join work at ~maxBucketSize² while keeping partial
    * recall inside the hot bucket — the job degrades gracefully instead
    * of dying. The counts pass shuffles only (bucket_key, count) thanks
    * to map-side partial aggregation; the hot set is not force-broadcast
    * (its size scales with pathology — AQE broadcasts it when small).
    *
    * Scale shape (100 TB): bucket keys are per-row native expressions
    * (no shuffle); the only data shuffles are the (id, bucket, vec)
    * self-join exchange — shared by both sides via repartition +
    * shuffle_hash (exchange reuse) — and the tiny candidate dedup.
    */
  /** SemDeDup-style cluster-scoped semantic prune: within each cluster
    * (a precomputed assignment — k-means via [[Ivf]], a sign-bucket key,
    * or any upstream partition of the corpus), drop a row when a
    * LOWER-ID row of the same cluster sits within `threshold` cosine of
    * it. Output: (id, cluster, keep) for every input row — the caller
    * filters `keep` to materialize the pruned corpus.
    *
    * The keep rule is min-id — deterministic across engines and cluster
    * layouts (no RNG, no partition-order dependence), and transitive-
    * safe: the lowest id of every semantic group always survives, so
    * the pruned corpus is never empty per group.
    *
    * Scale shape (100 TB): this is the second half of SemDeDup — the
    * clustering step bounds cluster sizes (k chosen so n/k rows fit a
    * partition), and THIS step's only exchange is one shuffle on the
    * cluster key, shared by both join sides via repartition +
    * shuffle_hash (exchange reuse: the corpus is scanned and normed
    * once). Per-cluster all-pairs is the algorithm's contract, not an
    * accident — pruning quadratic work is exactly what the clustering
    * stage is for, so an unbounded cluster is an upstream bug; the
    * bucketed [[signBucketPairs]] (with its hot-bucket sub-split) is
    * the right tool when no bounded clustering exists.
    *
    * Norms are projected BEFORE the self-join (the join blocks
    * projection collapse) so each pair costs one fused dot product.
    *
    * `maxClusterSize > 0` arms a LOUD guard (the RangeJoin span-guard
    * discipline): a cluster above the bound raises with the cluster
    * key and size instead of letting one degenerate cluster go
    * quadratic silently. The count is a window over the SAME
    * shuffle-by-cluster exchange the join consumes — arming it costs
    * no extra pass. */
  def semanticPrune(df: DataFrame, idCol: String, vecCol: String,
                    clusterCol: String, threshold: Double,
                    maxClusterSize: Int = 0): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(clusterCol).as("ck"),
      col(vecCol).as("v"),
      sqrt(dotD(col(vecCol), col(vecCol))).as("__n"))
      .repartition(col("ck"))
    val e =
      if (maxClusterSize <= 0) base
      else {
        // the assert rides the kept norm column — a free-standing
        // guard column would be pruned away with its error unraised
        val wc = Window.partitionBy(col("ck"))
        val msg = concat(lit("semanticPrune: cluster "),
          col("ck").cast("string"), lit(" has "), col("__cn").cast("string"),
          lit(s" rows > maxClusterSize=$maxClusterSize — fix the upstream " +
            "clustering; per-cluster work is quadratic by contract"))
        base.withColumn("__cn", count(lit(1)).over(wc))
          .withColumn("__n", when(
            assert_true(col("__cn") <= maxClusterSize, msg).isNull, col("__n")))
          .drop("__cn")
      }
    val a = e.as("a").hint("shuffle_hash")
    val b = e.as("b").hint("shuffle_hash")
    val dropped = a.join(b,
        col("a.ck") === col("b.ck") && col("a.id") < col("b.id"))
      .filter(dotD(col("a.v"), col("b.v")) /
        (col("a.__n") * col("b.__n")) >= threshold)
      .select(col("b.id").as("id")).distinct()
      .withColumn("__drop", lit(true))
    df.select(col(idCol).as("id"), col(clusterCol).as("cluster"))
      .join(dropped, Seq("id"), "left")
      .select(col("id"), col("cluster"), col("__drop").isNull.as("keep"))
  }

  def signBucketPairs(df: DataFrame, idCol: String, vecCol: String,
                      dims: Int, threshold: Double, planes: Int = 16,
                      tables: Int = 1, maxBucketSize: Int = 10000,
                      hotSampleFraction: Double = 1.0): DataFrame = {
    require(tables >= 1 && planes >= 1 && maxBucketSize >= 2,
      s"need tables>=1, planes>=1, maxBucketSize>=2 (got $tables, $planes, $maxBucketSize)")
    require(hotSampleFraction > 0.0 && hotSampleFraction <= 1.0,
      s"hotSampleFraction must be in (0, 1], got $hotSampleFraction")
    // below ~10 expected samples per at-cap bucket the estimator flips:
    // every bucket with one sampled row reads as 'hot' and gets split,
    // silently shredding recall across perfectly cold buckets
    require(hotSampleFraction >= 1.0 || maxBucketSize * hotSampleFraction >= 10.0,
      s"hotSampleFraction too small to detect hot buckets reliably: " +
        s"maxBucketSize*fraction = ${maxBucketSize * hotSampleFraction} < 10")
    // one fused native pass for all tables·planes sign bits (the
    // composed signBucket tree is parity-tested but ~100× slower)
    val withB = df.select(col(idCol).as("id"), col(vecCol).as("v"))
      .withColumn("bk", explode(
        graft.expressions.VectorExpressions.signBucketKeysF(col("v"), tables, planes, dims)))
    // Hot-bucket detection is a SECOND scan of the corpus (keys must be
    // recomputed — they derive from the vectors). The default exact
    // pass is right up to bench scale; at 100 TB pass a small
    // hotSampleFraction: a bucket at the cap is sampled ~cap·f times,
    // so f = 100/cap still detects reliably while the detection scan
    // reads ~f of the corpus. A missed borderline-hot bucket only
    // costs graceful degradation, never correctness — every candidate
    // is exact-verified either way.
    val sampled =
      if (hotSampleFraction >= 1.0) withB
      else withB.sample(withReplacement = false, hotSampleFraction, 42L)
    val hot = sampled.groupBy("bk").agg(count(lit(1)).as("__n0"))
      .filter(col("__n0") > maxBucketSize * hotSampleFraction)
      .withColumn("__n", (col("__n0") / hotSampleFraction).cast("long"))
      .drop("__n0")
    val keyed = withB.join(hot, Seq("bk"), "left")
      .withColumn("bk2", when(col("__n").isNull, col("bk")).otherwise(
        concat(col("bk"), lit("#"), pmod(xxhash64(col("id")),
          ceil(col("__n").cast("double") / maxBucketSize).cast("long")))))
      .select(col("id"), col("v"), col("bk2"))
      .repartition(col("bk2"))
    val a = keyed.as("a").hint("shuffle_hash")
    val b = keyed.as("b").hint("shuffle_hash")
    a.join(b, col("a.bk2") === col("b.bk2") && col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"),
        cosine(col("a.v"), col("b.v")).as("__cos"))
      .filter(col("__cos") > threshold)
      .select("a_id", "b_id")
      .distinct()
  }
}
