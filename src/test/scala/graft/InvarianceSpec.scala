package graft

/** Partition-count / AQE invariance — the single-box proxy for the
  * 1000-executor claim: a query whose result depends on
  * `spark.sql.shuffle.partitions` or on adaptive re-planning would
  * return different answers on a different-sized cluster, which is
  * exactly the failure mode the suite's determinism rules (integer
  * arithmetic, total-order tie-breaks, order-invariant aggregates)
  * exist to prevent. This spec REPLAYS one representative query from
  * each determinism-sensitive family under three execution regimes —
  * the suite default, a co-prime partition count (7 splits every
  * hash distribution differently), and AQE disabled — and asserts the
  * collected results are IDENTICAL as sorted row multisets.
  *
  * Families covered: iterative graph (q124 PageRank — floor divisions
  * inside three unrolled iterations), basket mining (q131 — e6-grid
  * confidence/lift), integer k-means (q136 — trajectory must not fork),
  * robust stats (q112 — dyadic-rational medians), weighted median
  * (q120 — cross-multiplied cumulative weights), connected components
  * (q56 — min-label convergence), MinHash LSH (q20 — band buckets),
  * weighted shortest path (q147 — tropical semiring), BM25 ranking
  * (q103 — exact integer rationals), window FIFO (q125),
  * item-cosine neighbor ranking (q149 — e6 squared cosine + window
  * top-k).
  *
  * CONVENTION (round-12 verdict #8): any NEW query whose plan contains
  * a window function, a zipWithIndex/mapPartitions layout dependence,
  * a TypedImperativeAggregate, or float-derived arithmetic joins the
  * `queries` list below in the same change that adds it — membership
  * is part of a query's definition of done, not a retrofit. Queries
  * that are pure codegen'd column arithmetic + order-invariant
  * aggregates (SUM/COUNT/MIN/MAX over exact types) may stay out.
  */
class InvarianceSpec extends SparkSpec {

  private val queries = Seq(
    "q124_pagerank", "q131_brand_rules", "q136_kmeans", "q112_robust_stats",
    "q120_weighted_median", "q56_dup_clusters", "q20_minhash_lsh",
    "q147_weighted_path", "q103_bm25", "q125_fifo_alloc",
    "q149_item_cosine",
    // array/concatenated-string outputs: ROW sorting can't mask a
    // nondeterministic INTERNAL order, so these pin that every emitted
    // array/path/list is ordered by construction (sort_array, rank
    // tie-breaks), not by partition accident
    "q98_group_topk", "q102_tfidf_terms", "q113_session_paths",
    "q70_pack_sequences", "q47_listagg", "q143_crossdoc_spans",
    // layout-lever queries: the bucketed write (16 buckets) and the
    // DPP-pruned scan must give identical answers at any parallelism
    "q146_bucketed_join", "q148_dpp_prune",
    // curation/export family (round-11 verdict #5): q153's
    // WindowGroupLimit map-side top-k must survive split/partition
    // levers; q154/q156 ride ContiguousIds' zipWithIndex — the
    // suite's ONE layout-sensitive primitive, so the dense numbering
    // (lang-grouped and hash-mixed orders both) gets the full
    // four-regime replay; q155's decode is per-row but its mapParti-
    // tions batching must not fork under 32 KiB splits either
    "q153_source_curation", "q154_export_manifest",
    "q155_image_decode", "q156_training_order",
    // q157 quantizes FLOAT features to integers before summing — the
    // one float-derived arithmetic in the suite; the quantization is
    // per-row (exact, pre-aggregation) so regimes must agree
    "q157_image_features",
    // q158/q159 are the WAV twins of q155/q157: mapPartitions decode
    // batching must not fork under tiny splits or partition levers
    "q158_audio_decode", "q159_audio_energy",
    // q160/q161 are the MJPEG-AVI twins: per-partition REUSED JPEG
    // reader/writer instances must not leak state across rows or fork
    // under split/partition levers
    "q160_video_decode", "q161_video_motion",
    // q162 dispatches all three codecs in one mapPartitions pass — the
    // whole-lake decode must not fork under any regime either
    "q162_media_pipeline",
    // q163's KMV sketches are TypedImperativeAggregates whose merge
    // order the regime levers scramble — min-k of a SET must not care
    "q163_kmv_overlap")

  /** Sorted row-multiset fingerprint: row order and partitioning must
    * not matter, so compare on sorted `toString` lines. The cache is
    * cleared FIRST — a persist left by a prior replay would serve the
    * fact-sized stages from the CacheManager (plan-matched across
    * invocations) and the regime lever would never reach them. */
  private def rows(name: String): Seq[String] = {
    spark.catalog.clearCache()
    SparkEntry.queries(name)(spark, sf0001)
      .collect().map(_.toString).sorted.toSeq
  }

  private def withConfs(confs: (String, String)*)(body: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  for (q <- queries)
    test(s"$q: identical under default, 7 partitions, AQE off, tiny splits") {
      val base = rows(q)
      assert(base.nonEmpty, s"$q returned no rows at sf0.001")
      withConfs("spark.sql.shuffle.partitions" -> "7") {
        assert(rows(q) === base, s"$q depends on the shuffle partition count")
      }
      withConfs("spark.sql.adaptive.enabled" -> "false") {
        assert(rows(q) === base, s"$q depends on adaptive re-planning")
      }
      // the INPUT-side lever: 32 KiB splits multiply the scan task
      // count (and with it partial-aggregate grouping and row arrival
      // order) the way a wider executor fleet would — a collect_list
      // or first() that survives the shuffle levers can still fork
      // here if its order pin is accidental
      withConfs("spark.sql.files.maxPartitionBytes" -> "32768",
        "spark.sql.files.openCostInBytes" -> "0") {
        assert(rows(q) === base, s"$q depends on input split boundaries")
      }
    }
}
