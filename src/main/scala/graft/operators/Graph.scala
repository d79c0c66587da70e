package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames.
  *
  * Extracted from the q111 market-basket analysis (the reference's BI
  * surface has no graph operator; this is part of the large-scale
  * pipeline extension mandate) so the counting core is reusable and
  * brute-force property-testable independent of the TPC-H basket
  * projection that feeds it in `BreadthQueries`.
  *
  * Materialization contract: the `materialize = true` defaults persist
  * multi-consumed intermediates (edge lists, adjacency, per-hop dist
  * tables) for the duration of the returned plan's execution, and a
  * persisted Dataset stays pinned in the session CacheManager until
  * unpersist/clearCache — it is NOT freed by GC the way localCheckpoint
  * blocks are. One-shot runners that execute many queries in one JVM
  * must clear between queries (`Bench.steadyState`: clearCache +
  * blocking unpersist of all persistent RDDs + GC — both Bench and
  * Verify do); long-lived sessions embedding these operators should do
  * the same once the result is consumed, or pass `materialize = false`
  * and accept the re-executed lineage.
  */
object Graph {

  /** Out-adjacency lists `(src, nbrs)` of the degree-ordered
    * orientation of a canonical edge list (`a < b`, deduped — see
    * [[canonical]]): every edge points from its lower-(degree, id)
    * endpoint, so each out-list is bounded O(√m) (the compact-forward
    * / Chiba–Nishizeki arboricity argument) and Σ size(nbrs) = m
    * exactly.
    *
    * `materialize = true` (the default) pins the built adjacency
    * ([[Materialize.loopPin]] — columnar MEMORY_AND_DISK persist on a
    * checkpoint-dir-less session, reliable checkpoint otherwise): the
    * adjacency is consumed from BOTH sides of the triangle join below,
    * and without materialization each branch re-executes the whole
    * upstream lineage — the edge build, the degree aggregate, and two
    * degree joins, measured 1.9× slower than the materialized plan at
    * the 10× decade.
    *
    * Vertex ids are cast to BIGINT at intake (lossless for any
    * integral input — the [[triangleCount]] contract): the downstream
    * `sorted_intersect_count` intersection is a native expression over
    * `array<bigint>`, so without the cast an int/short edge list fails
    * its type check where the old `size(array_intersect(...))` path
    * accepted any element type.
    *
    * Variance note (round-11 q111 diagnosis, 100× decade, isolated
    * min-of-3 sweeps): this deserialized pin measures 25.5/31.1/30.9 s
    * over three consecutive sweeps (±10% — the round-10 23.7–35.9 s
    * band was in-sweep interference, not this operator). The suggested
    * MEMORY_AND_DISK_SER alternative measured 26.0/29.3/40.6 s — no
    * better warm and strictly worse cold (the 40.6 s run had the page
    * cache cold; SER adds a deserialization pass on every one of the
    * triangle join's TWO reads of the adjacency). Kept deserialized.
    * An int-array adjacency (half the payload) was considered and
    * rejected: real corpus ids exceed 2³¹, and a dual-type fast path
    * would fork the native intersection for a local-bench-only win.
    */
  def orientedAdjacency(e0in: DataFrame, materialize: Boolean = true): DataFrame = {
    val e0 = e0in.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b"))
    val deg = e0.select(col("a").as("n")).unionAll(e0.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("dg"))
    // total order = lexicographic (degree, id) — compared directly,
    // never packed into one BIGINT (a dg*10^10+id ordinal overflows
    // once a vertex degree reaches ~9.2e8 and silently flips the
    // orientation)
    val aLower = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val adj = e0
      .join(deg.withColumnRenamed("n", "a").withColumnRenamed("dg", "da"), "a")
      .join(deg.withColumnRenamed("n", "b").withColumnRenamed("dg", "db"), "b")
      .select(
        when(aLower, col("a")).otherwise(col("b")).as("src"),
        when(aLower, col("b")).otherwise(col("a")).as("dst"))
      // sorted out-lists: O(deg log deg) once at build, and the
      // triangle intersection below becomes ONE two-pointer merge per
      // edge (native sorted_intersect_count) instead of a per-row hash
      // set + materialized intersection array
      .groupBy(col("src")).agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    if (materialize) Materialize.loopPin(adj) else adj
  }

  /** Triangle count given oriented adjacency lists (see
    * [[orientedAdjacency]]): each triangle's lowest edge sees it
    * exactly once as |N⁺(u) ∩ N⁺(v)|. The oriented edges are
    * re-derived by EXPLODING the adjacency lists instead of joining an
    * edge set back against them on src: each exploded row is one edge
    * with its src out-list already attached, so the src-side array
    * join never exists in the plan — only ONE array-carrying shuffle
    * remains, the dst-side lookup. (A wedge JOIN — the naive shape —
    * materializes Σ C(outdeg, 2) rows and measured 3× slower on the
    * q111 basket graph, with the gap widening in density.)
    *
    * That remaining join is hinted shuffle_hash: sort-merge would SORT
    * both sides' rows carrying the O(√m) neighbor arrays, and the sort
    * of array payloads dominated the join at the 100× decade (median
    * 42 → 34 s interleaved-measured); the hash build side is one
    * adjacency partition — bounded by the shuffle partition count, no
    * driver involvement.
    */
  def triangleCountFromAdj(adj: DataFrame): DataFrame =
    adj
      .select(col("nbrs").as("src_nbrs"), explode(col("nbrs")).as("dst"))
      .join(adj.select(col("src").as("dst"), col("nbrs").as("dst_nbrs"))
        .hint("shuffle_hash"), "dst")
      // native two-pointer |A ∩ B| over the sorted out-lists (see
      // orientedAdjacency): codegen'd, allocation-free — replaces
      // size(array_intersect(...)), which hashed one side and built
      // the intersection array per edge (identical count on set
      // inputs; parity spec-pinned)
      .select(call_function(graft.expressions.SortedIntersectCount.name,
        col("src_nbrs"), col("dst_nbrs")).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).cast("bigint").as("n_triangles"))

  /** Exact triangle count of an undirected simple graph.
    *
    * `edges` must have two integral columns (ids are cast to BIGINT
    * internally — the native sorted-intersection requires
    * `array<bigint>` adjacency); loops are dropped and
    * each undirected edge may appear in either or both directions and
    * with duplicates — the input is canonicalized first (skip that
    * full-edge shuffle with `assumeCanonical` when the caller already
    * built a deduped `a < b` list). Returns one row
    * `(n_triangles BIGINT)`.
    */
  def triangleCount(edges: DataFrame, assumeCanonical: Boolean = false): DataFrame = {
    val e0 = if (assumeCanonical) edges.toDF("a", "b") else canonical(edges)
    triangleCountFromAdj(orientedAdjacency(e0))
  }

  /** Integer-exact PageRank over an undirected graph (each canonical
    * edge walks both directions), damping 0.85, `iters` unrolled
    * iterations. Nodes are the edge endpoints (an isolated vertex has
    * no edges to rank through); returns `(p BIGINT, r BIGINT)` with
    * ranks on a `scale` integer grid.
    *
    * All arithmetic is BIGINT with floor division — `r/deg` truncates
    * identically on any engine, and the per-node contribution sums
    * are exact integer sums (order-invariant), so the final ranking
    * replays bit-identically on any engine (the q103 BM25 trick
    * applied to an iterative algorithm):
    *
    *   r₀(v)   = scale div n
    *   rₖ₊₁(v) = (15·scale) div (100·n) + (85·Σ_{u→v} rₖ(u) div deg(u)) div 100
    *
    * Overflow bound: 85·Σ ≤ 85·scale·n must stay under 2⁶³ — the
    * default scale 10⁹ holds to ~10⁸ vertices; shrink `scale` beyond
    * that (the knob trades rank granularity for headroom).
    *
    * Shape at scale: each iteration is one hash join of the directed
    * edge list with the (node, rank) table plus one sum exchange on
    * the destination — no driver action anywhere (the node count
    * enters as a crossJoin with a one-row aggregate); the iteration
    * count is a compile-time constant, so the whole plan is a static
    * `iters`-deep pipeline Catalyst sees end-to-end.
    */
  def pageRank(e0: DataFrame, iters: Int = 3, scale: Long = 1000000000L,
               materialize: Boolean = true): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // the directed edge list and the degree table are consumed by
    // EVERY iteration — materialized once, so the upstream edge build
    // runs once instead of once per iteration per branch. loopPin:
    // persist (columnar, compressed, disk-spillable) on a local
    // session, NOT localCheckpoint — local checkpoint blocks store
    // deserialized rows, several GB for a decade-scale edge list, and
    // that storage squeezed the execution memory of the iteration
    // joins into intermittent OOM at the 100× bench's 8 GiB heap;
    // reliable checkpoint when a dir is configured (cluster: survives
    // executor loss, holds no executor memory). The iteration count is
    // a small compile-time constant, so lineage depth (dupClusters'
    // reason for a checkpoint cadence) is not a concern here.
    def ckpt(df: DataFrame) =
      if (materialize) Materialize.loopPin(df) else df
    // the edge list is pre-partitioned on `a` BEFORE the persist: every
    // iteration joins it on a = p, and a cached relation carries its
    // outputPartitioning, so the loop-invariant m-row side shuffles ONCE
    // at build instead of once per iteration — only the vertex-sized
    // contrib side exchanges inside the loop. The deg aggregate below
    // rides the same partitioning (groupBy key = partition key ⇒ no
    // exchange).
    //
    // r19: the partition COUNT is sized from the input scan bytes
    // ([[Partitions.forLoopTable]], capped at shuffle.partitions —
    // plan-identical at/above cluster scale), not inherited from the
    // session constant: the pinned partitioning propagates through
    // every iteration join, AQE cannot coalesce around a cached side,
    // and at sf0.1 the 32-way slicing of a KB-scale loop was pure
    // scheduling overhead (PERF_r18 scaling: q124 ran 1.75× faster on
    // 8 cores than 32).
    val nLoop = Partitions.forLoopTable(e0)
    val sp = e0.sparkSession.sessionState.conf.numShufflePartitions
    val e = ckpt(e0.select(col("a"), col("b"))
      .unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .repartition(nLoop, col("a")))
    val deg = ckpt(e.groupBy(col("a").as("p")).agg(count(lit(1)).as("dg")))
    val cnt = deg.agg(count(lit(1)).as("n"))
    val r0 = deg.select(col("p")).crossJoin(cnt)
      .select(col("p"), expr(s"$scale div n").as("r"))
    (1 to iters).foldLeft(r0) { (rPrev, _) =>
      val contrib = rPrev.join(deg, "p")
        .select(col("p"), expr("r div dg").as("c"))
      // shuffle_hash, build = contrib: sort-merge would SORT the
      // m-row edge side every iteration — the sort buffers for three
      // iterations' worth of edge shuffles were the measured OOM at
      // the 100× decade (8 GiB heap). The hash build side is one
      // partition's slice of the VERTEX table — bounded by
      // |V|/partitions, never edge-sized (the triangleCountFromAdj
      // argument).
      val sums = e.join(contrib.hint("shuffle_hash"), col("a") === col("p"))
        .groupBy(col("b")).agg(sum(col("c")).as("s"))
      // align the vertex-sized aggregate back onto the loop sizing so
      // the join below (and the next iteration's contrib join) stays
      // co-partitioned at nLoop instead of forcing the planner to
      // re-exchange one side per iteration; the partial aggregation
      // above still runs map-side before this tiny exchange. No-op
      // (plan-identical) when the cap was hit.
      val sumsAligned =
        if (nLoop < sp) sums.repartition(nLoop, col("b")) else sums
      deg.select(col("p")).crossJoin(cnt)
        .join(sumsAligned, col("p") === col("b"), "left")
        .select(col("p"),
          // 15·scale precomputed in Scala: interpolating `15 * scale`
          // would parse as INT32 × INT32 and overflow under ANSI
          expr(s"${15L * scale}L div (100 * n) + (85 * coalesce(s, 0L)) div 100").as("r"))
    }
  }

  /** Multi-source BFS: exact hop distance from a seed set, out to
    * `maxHops`, over an undirected canonical edge list (`a < b`,
    * deduped). Returns `(p, dist INT)` for every vertex within
    * `maxHops` of any seed — the classic "blast radius" / reachability
    * query (impact analysis, contamination spread, k-hop ego nets).
    *
    * `seeds` is one column of vertex ids; seeds that are not edge
    * endpoints still appear at dist 0 (their radius is just empty).
    *
    * Shape at scale: the hop count is a compile-time constant, so the
    * plan is a static `maxHops`-deep pipeline — each hop is ONE hash
    * join of the frontier with the directed edge list plus one
    * min-aggregate on the reached vertex; no driver action, no
    * iteration-to-convergence (that is [[Dedup.dupClusters]]'s job).
    * The directed edge list is consumed by every hop, so it is
    * materialized once (`localCheckpoint`, the [[pageRank]] pattern).
    * The frontier passed to hop k+1 is the FULL dist-so-far table; the
    * join fans out each vertex's edges once per hop, which is the
    * textbook distributed unrolled BFS — work per hop is O(m) worst
    * case, never quadratic.
    */
  def bfs(e0: DataFrame, seeds: DataFrame, maxHops: Int,
          materialize: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    // loopPin, not localCheckpoint — the pageRank rationale: columnar
    // compressed storage instead of GB-scale deserialized row blocks
    // locally, reliable checkpoint on a cluster, and hop count bounds
    // lineage depth by construction
    def ckpt(df: DataFrame) =
      if (materialize) Materialize.loopPin(df) else df
    // pre-partitioned on the per-hop join key `a` (the pageRank
    // rationale): the m-row edge side shuffles once at build, and each
    // hop's join exchanges only the vertex-sized frontier. Partition
    // count sized from scan bytes (r19 — see pageRank), and every
    // hop's dist table is aligned onto the same sizing so the hop
    // joins stay co-partitioned at nLoop.
    val nLoop = Partitions.forLoopTable(e0)
    val sp = e0.sparkSession.sessionState.conf.numShufflePartitions
    def align(df: DataFrame): DataFrame =
      if (nLoop < sp) df.repartition(nLoop, col("p")) else df
    val e = ckpt(e0.select(col("a"), col("b"))
      .unionAll(e0.select(col("b").as("a"), col("a").as("b")))
      .repartition(nLoop, col("a")))
    val d0 = seeds.toDF("p").distinct().select(col("p"), lit(0).as("dist"))
    (1 to maxHops).foldLeft(ckpt(align(d0))) { (dPrev, k) =>
      // dist(v) at hop k = min(dist so far, k if any neighbor reached):
      // union the relaxed frontier with the standing table, keep min —
      // one join + one agg per hop, both on the vertex key. Each hop's
      // dist table is materialized: it is consumed TWICE (the frontier
      // filter and the union), and without the checkpoint every hop
      // re-executes its whole prefix from both branches — the plan
      // doubles per hop (measured: 8 duplicated hop subtrees at 3
      // hops). The table is one row per reached vertex — bounded.
      // shuffle_hash for the same reason as pageRank's contrib join:
      // the frontier is vertex-sized, the edge side must not sort
      val relaxed = e.join(
          dPrev.filter(col("dist") === k - 1).hint("shuffle_hash"),
          col("a") === col("p"))
        .select(col("b").as("p"), lit(k).as("dist"))
      ckpt(align(dPrev.unionAll(relaxed)
        .groupBy(col("p")).agg(min(col("dist")).cast("int").as("dist"))))
    }
  }

  /** Bounded-hop weighted shortest path (Bellman–Ford relaxation) from
    * a seed set over an undirected weighted edge list `(a, b, w)` with
    * non-negative BIGINT weights: dist(v) after k rounds is the exact
    * minimum path weight among paths of ≤ k edges. Returns
    * `(p, dist BIGINT)` for every vertex reachable within `maxHops`.
    *
    * Unlike [[bfs]] the relaxation CANNOT restrict to the newest
    * frontier — a vertex's distance may improve at any round through a
    * longer-but-lighter path — so each round relaxes the FULL standing
    * dist table (the textbook distributed Bellman–Ford). All
    * arithmetic is BIGINT min/+ (the tropical semiring), so results
    * replay bit-identically on any engine; overflow needs max path
    * weight < 2⁶³, i.e. maxHops · max(w) bounded — trivially true for
    * the compile-time hop counts this targets.
    *
    * Shape at scale: one hash join of the pre-partitioned edge list
    * with the vertex-sized dist table plus one min-aggregate per
    * round; the edge list shuffles once at build (the [[pageRank]]
    * pre-partitioning), each round exchanges only vertex-sized tables;
    * no driver action anywhere.
    */
  def weightedHops(e0: DataFrame, seeds: DataFrame, maxHops: Int,
                   materialize: Boolean = true): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    def ckpt(df: DataFrame) =
      if (materialize) Materialize.loopPin(df) else df
    // loop sizing + per-round alignment: the bfs/pageRank rationale
    val nLoop = Partitions.forLoopTable(e0)
    val sp = e0.sparkSession.sessionState.conf.numShufflePartitions
    def align(df: DataFrame): DataFrame =
      if (nLoop < sp) df.repartition(nLoop, col("p")) else df
    val e = ckpt(e0.select(col("a"), col("b"), col("w"))
      .unionAll(e0.select(col("b").as("a"), col("a").as("b"), col("w")))
      .repartition(nLoop, col("a")))
    val d0 = seeds.toDF("p").distinct().select(col("p"), lit(0L).as("dist"))
    (1 to maxHops).foldLeft(ckpt(align(d0))) { (dPrev, _) =>
      // each round's dist table is consumed twice (keep + relax) —
      // materialized for the bfs reason (the plan doubles per round
      // otherwise). shuffle_hash: the dist side is vertex-sized, the
      // edge side must never sort.
      val relaxed = e.join(dPrev.hint("shuffle_hash"), col("a") === col("p"))
        .select(col("b").as("p"), (col("dist") + col("w")).as("dist"))
      ckpt(align(dPrev.unionAll(relaxed)
        .groupBy(col("p")).agg(min(col("dist")).cast("bigint").as("dist"))))
    }
  }

  /** Canonical undirected simple edge list: `a < b`, loops removed,
    * duplicates collapsed. */
  def canonical(edges: DataFrame): DataFrame = {
    val a = edges.columns(0)
    val b = edges.columns(1)
    edges
      .select(least(col(a), col(b)).as("a"), greatest(col(a), col(b)).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
  }
}
