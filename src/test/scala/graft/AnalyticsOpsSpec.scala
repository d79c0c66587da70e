package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{AssocRules, Dedup, Graph, ItemSimilarity, StatTests}

/** Round-9 analytics operators vs independent references: BFS against a
  * sequential queue BFS, association rules against a nested-Map brute
  * force, the stat tests against hand-computed values, and
  * sorted-neighborhood dedup against planted duplicates.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // ---------------------------------------------------------------- BFS

  private def bruteBfs(edges: Seq[(Long, Long)], seeds: Set[Long],
                       maxHops: Int): Map[Long, Int] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var dist = seeds.map(_ -> 0).toMap
    for (k <- 1 to maxHops) {
      val frontier = dist.collect { case (p, d) if d == k - 1 => p }
      val reached = frontier.toSeq.flatMap(p => adj.getOrElse(p, Seq.empty))
      dist = reached.foldLeft(dist)((m, p) =>
        if (m.contains(p)) m else m + (p -> k))
    }
    dist
  }

  test("bfs: matches a sequential queue BFS on random graphs") {
    val edgeGen = Gen.listOfN(60,
      Gen.zip(Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L)))
    for (seed <- 1L to 5L) {
      val raw = sample(edgeGen, seed).filter(e => e._1 != e._2)
      val edges = raw.map(e => (e._1 min e._2, e._1 max e._2)).distinct
      val seeds = Set(0L, 7L, 13L)
      val got = Graph.bfs(
          edges.toDF("a", "b"), seeds.toSeq.toDF("p"), maxHops = 3)
        .as[(Long, Int)].collect().toMap
      assert(got === bruteBfs(edges, seeds, 3), s"seed=$seed")
    }
  }

  test("bfs: hop-0-only and isolated seeds") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("a", "b")
    val got0 = Graph.bfs(edges, Seq(1L, 99L).toDF("p"), maxHops = 0)
      .as[(Long, Int)].collect().toMap
    assert(got0 === Map(1L -> 0, 99L -> 0))
    val got2 = Graph.bfs(edges, Seq(1L, 99L).toDF("p"), maxHops = 2)
      .as[(Long, Int)].collect().toMap
    assert(got2 === Map(1L -> 0, 2L -> 1, 3L -> 2, 99L -> 0))
  }

  // --------------------------------------------------- sorted_intersect_count

  test("sorted_intersect_count: equals size(array_intersect) on sorted sets") {
    val gen = Gen.listOfN(40, Gen.chooseNum(0L, 60L))
    for (seed <- 1L to 6L) {
      val a = sample(gen, seed).distinct.sorted
      val b = sample(gen, seed + 100).distinct.sorted
      val df = Seq((a, b)).toDF("x", "y")
      val got = df.select(call_function("sorted_intersect_count",
        col("x"), col("y"))).as[Long].head()
      val ref = df.select(size(array_intersect(col("x"), col("y")))
        .cast("long")).as[Long].head()
      assert(got === ref, s"seed=$seed")
      assert(got === (a.toSet & b.toSet).size.toLong, s"seed=$seed")
    }
    val edge = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L), Seq(2L, 4L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L))).toDF("x", "y")
    assert(edge.select(call_function("sorted_intersect_count",
      col("x"), col("y"))).as[Long].collect().toSeq === Seq(0L, 0L, 3L))
  }

  test("sorted_intersect_count: STRING variant equals size(array_intersect) " +
      "on sort_array'd sets (the q89 verify contract)") {
    // inputs are DISTINCT but UNSORTED; sorting happens through Spark's
    // own sort_array so the test exercises the exact production
    // collation (UTF8String byte order), not Scala's UTF-16 sort
    val gen = Gen.listOfN(40, Gen.chooseNum(0, 60).map(i => s"w$i tok"))
    for (seed <- 1L to 6L) {
      val a = sample(gen, seed).distinct
      val b = sample(gen, seed + 100).distinct
      val df = Seq((a, b)).toDF("x0", "y0")
        .select(sort_array(array_compact(col("x0"))).as("x"),
          sort_array(array_compact(col("y0"))).as("y"))
      val got = df.select(call_function("sorted_intersect_count",
        col("x"), col("y"))).as[Long].head()
      val ref = df.select(size(array_intersect(col("x"), col("y")))
        .cast("long")).as[Long].head()
      assert(got === ref, s"seed=$seed")
      assert(got === (a.toSet & b.toSet).size.toLong, s"seed=$seed")
    }
    // edges: empty side, no overlap, full overlap, non-ASCII bytes
    val edge = Seq(
      (Seq.empty[String], Seq("a b")),
      (Seq("a b", "a c"), Seq("b a", "c a")),
      (Seq("x y", "é z", "a b"), Seq("é z", "a b", "x y")))
      .toDF("x0", "y0")
      .select(sort_array(array_compact(col("x0"))).as("x"),
        sort_array(array_compact(col("y0"))).as("y"))
    assert(edge.select(call_function("sorted_intersect_count",
      col("x"), col("y"))).as[Long].collect().toSeq === Seq(0L, 0L, 3L))
  }

  // ------------------------------------------- weighted shortest path (q147)

  /** Sequential Bellman–Ford: relax every edge against the frozen
    * start-of-round table, merge mins — the operator's exact contract. */
  private def bruteWsp(edges: Seq[(Long, Long, Long)], seeds: Set[Long],
                       maxHops: Int): Map[Long, Long] = {
    val dir = edges ++ edges.map(e => (e._2, e._1, e._3))
    var dist: Map[Long, Long] = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to maxHops) {
      val relaxed = dir.flatMap { case (a, b, w) =>
        dist.get(a).map(d => b -> (d + w)) }
      dist = relaxed.foldLeft(dist) { case (m, (p, dd)) =>
        if (m.get(p).forall(_ > dd)) m + (p -> dd) else m }
    }
    dist
  }

  test("weightedHops: matches sequential Bellman-Ford on random graphs") {
    val edgeGen = Gen.listOfN(60, Gen.zip(
      Gen.chooseNum(0L, 24L), Gen.chooseNum(0L, 24L), Gen.chooseNum(1L, 9L)))
    for (seed <- 1L to 5L) {
      val edges = sample(edgeGen, seed).filter(e => e._1 != e._2).distinct
      val seeds = Set(0L, 7L, 13L)
      val got = Graph.weightedHops(
          edges.toDF("a", "b", "w"), seeds.toSeq.toDF("p"), maxHops = 3)
        .as[(Long, Long)].collect().toMap
      assert(got === bruteWsp(edges, seeds, 3), s"seed=$seed")
    }
  }

  test("weightedHops: exact at the 2^62 path-weight margin") {
    // BIGINT min/+ must stay exact where double would round: 2^61 and
    // 2^61+1 differ by 1 ulp-invisible unit at this magnitude
    val w1 = 1L << 61
    val edges = Seq((1L, 2L, w1), (1L, 3L, w1 + 1), (2L, 4L, w1), (3L, 4L, w1))
      .toDF("a", "b", "w")
    val got = Graph.weightedHops(edges, Seq(1L).toDF("p"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(got(4L) === 2L * w1)        // via 2, not via 3 (one unit more)
    assert(got(2L) === w1 && got(3L) === w1 + 1)
  }

  test("weightedHops: a lighter 2-hop path beats a heavy direct edge") {
    // 1-2 costs 10 direct, but 1-3-2 costs 3 — a frontier-filtered
    // relaxation (the BFS shortcut) would freeze dist(2) at 10
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 2L, 2L)).toDF("a", "b", "w")
    val got1 = Graph.weightedHops(edges, Seq(1L).toDF("p"), maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(got1 === Map(1L -> 0L, 2L -> 10L, 3L -> 1L))
    val got2 = Graph.weightedHops(edges, Seq(1L).toDF("p"), maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(got2 === Map(1L -> 0L, 2L -> 3L, 3L -> 1L))
  }

  // ------------------------------------------------------- association rules

  private def bruteRules(bi: Seq[(Long, String)], minSup: Long)
      : Set[(String, String, Long, Long, Long, Long, Long)] = {
    val d = bi.distinct
    val itemN = d.groupBy(_._2).map { case (k, v) => k -> v.size.toLong }
    val baskets = d.map(_._1).distinct.size.toLong
    val pairN = d.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val vs = items.map(_._2).sorted
      for (i <- vs.indices; j <- i + 1 until vs.size) yield (vs(i), vs(j))
    }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      .filter(_._2 >= minSup)
    pairN.toSeq.flatMap { case ((ia, ib), pn) =>
      Seq((ia, ib, pn), (ib, ia, pn))
    }.map { case (a, b, pn) =>
      val an = itemN(a); val bn = itemN(b)
      val conf = pn * 1000000L / an
      (a, b, pn, an, bn, conf, conf * baskets / bn)
    }.toSet
  }

  test("assoc rules: matches nested-Map brute force on random baskets") {
    val bGen = Gen.listOfN(120,
      Gen.zip(Gen.chooseNum(0L, 19L), Gen.oneOf("w", "x", "y", "z", "v")))
    for (seed <- 1L to 5L) {
      val bi = sample(bGen, seed)
      val got = AssocRules.mine(bi.toDF("bk", "it"), minSupport = 3)
        .as[(String, String, Long, Long, Long, Long, Long)].collect().toSet
      assert(got === bruteRules(bi, 3), s"seed=$seed")
    }
  }

  test("assoc rules: e6-grid arithmetic is exact at the 9.2e12-basket margin") {
    // synthetic aggregates, no data: evaluate the PRODUCTION expressions
    // (AssocRules.ConfidenceExpr/LiftExpr — the definition site, not a
    // re-typed copy) on counts near the documented overflow bound and
    // compare against BigInt floor division. pair_n * 1e6 and
    // confidence_e6 * baskets both graze 2^63 here (9.2e18 of 9.223e18);
    // ANSI mode makes any overflow a loud exception, and the value
    // check pins the floor-division semantics.
    val margin = 9200000000000L // ~9.2e12, the Scaladoc bound
    val cGen = for {
      baskets <- Gen.chooseNum(margin / 10, margin)
      aN <- Gen.chooseNum(1L, baskets)
      bN <- Gen.chooseNum(1L, baskets)
      pairN <- Gen.chooseNum(1L, aN min bN)
    } yield (pairN, aN, bN, baskets)
    val cases = (1L to 40L).map(s => sample(cGen, s)) :+
      (margin, margin, 1L, margin) :+        // conf = exactly 1e6, lift maximal
      (1L, 1L, margin, margin) :+            // conf 1e6, lift num = 1e6*margin
      (margin, margin, margin, margin)       // all at the bound
    val got = cases.toDF("pair_n", "a_n", "b_n", "baskets")
      .selectExpr("pair_n", "a_n", "b_n", "baskets",
        s"${AssocRules.ConfidenceExpr} as c", s"${AssocRules.LiftExpr} as l")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    for ((pn, an, bn, bk, c, l) <- got) {
      val cRef = (BigInt(pn) * 1000000) / an
      val lRef = (cRef * bk) / bn
      assert(BigInt(c) === cRef, s"confidence ($pn,$an)")
      assert(BigInt(l) === lRef, s"lift ($pn,$an,$bn,$bk)")
    }
  }

  // ------------------------------------------------------- item similarity

  /** Independent reference for ItemSimilarity.topNeighbors: nested-Map
    * counts, integer e6 squared cosine, per-item sort + take(k). */
  private def bruteNeighbors(bi: Seq[(Long, String)], minPair: Long, k: Int)
      : Set[(String, String, Long, Long, Long, Long, Int)] = {
    val baskets = bi.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
    val itemN = baskets.values.toSeq.flatten
      .groupBy(identity).map { case (i, xs) => i -> xs.size.toLong }
    val pairN = baskets.values.toSeq
      .flatMap(its => for (a <- its.toSeq; b <- its.toSeq if a < b) yield (a, b))
      .groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .filter(_._2 >= minPair)
    val scored = pairN.toSeq
      .flatMap { case ((a, b), pn) => Seq((a, b, pn), (b, a, pn)) }
      .map { case (i, nb, pn) =>
        val an = itemN(i); val bn = itemN(nb)
        (i, nb, pn, an, bn, (pn * 1000000L / an) * pn / bn)
      }
    scored.groupBy(_._1).toSeq.flatMap { case (_, rs) =>
      rs.sortBy(r => (-r._6, -r._3, r._2)).take(k).zipWithIndex
        .map { case ((i, nb, pn, an, bn, sc), idx) =>
          (i, nb, pn, an, bn, sc, idx + 1)
        }
    }.toSet
  }

  test("item similarity: matches nested-Map brute force on random baskets") {
    val bGen = Gen.listOfN(150,
      Gen.zip(Gen.chooseNum(0L, 24L), Gen.oneOf("s", "t", "u", "v", "w", "x")))
    for (seed <- 1L to 5L) {
      val bi = sample(bGen, seed)
      val got = ItemSimilarity.topNeighbors(bi.toDF("bk", "it"),
          k = 3, minPair = 2)
        .as[(String, String, Long, Long, Long, Long, Int)].collect().toSet
      assert(got === bruteNeighbors(bi, 2, 3), s"seed=$seed")
    }
  }

  test("item similarity: degenerate inputs yield empty neighbor tables, not errors") {
    // all-singleton baskets: no pair ever forms
    val singletons = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("bk", "it")
    assert(ItemSimilarity.topNeighbors(singletons, k = 3, minPair = 1).count() === 0)
    // a support floor above every co-occurrence count
    val pairs = Seq((1L, "a"), (1L, "b"), (2L, "a"), (2L, "b")).toDF("bk", "it")
    assert(ItemSimilarity.topNeighbors(pairs, k = 3, minPair = 5).count() === 0)
    // empty input
    val empty = spark.emptyDataset[(Long, String)].toDF("bk", "it")
    assert(ItemSimilarity.topNeighbors(empty, k = 3, minPair = 1).count() === 0)
    // invalid parameters fail loudly at the definition site
    intercept[IllegalArgumentException] {
      ItemSimilarity.topNeighbors(pairs, k = 0, minPair = 1)
    }
    intercept[IllegalArgumentException] {
      ItemSimilarity.topNeighbors(pairs, k = 3, minPair = 0)
    }
  }

  test("item similarity: e6 squared-cosine exact at the 9.2e12 margin") {
    // same discipline as the AssocRules margin pin: evaluate the
    // PRODUCTION ScoreExpr on synthetic counts grazing the documented
    // overflow bound (pair_n * 1e6 and quotient * pair_n both near
    // 2^63 under ANSI) and compare against BigInt floor division.
    val margin = 9200000000000L
    val cGen = for {
      aN <- Gen.chooseNum(margin / 10, margin)
      bN <- Gen.chooseNum(margin / 10, margin)
      pairN <- Gen.chooseNum(1L, aN min bN)
    } yield (pairN, aN, bN)
    val cases = (1L to 40L).map(s => sample(cGen, s)) :+
      (margin, margin, margin) :+   // cosine exactly 1 at the bound
      (1L, margin, margin) :+       // floor-to-zero far corner
      (margin, margin, 1L)          // b_n = 1 maximizes the 2nd quotient
    val got = cases.toDF("pair_n", "a_n", "b_n")
      .selectExpr("pair_n", "a_n", "b_n",
        s"${ItemSimilarity.ScoreExpr} as sc")
      .as[(Long, Long, Long, Long)].collect()
    for ((pn, an, bn, sc) <- got) {
      val ref = (BigInt(pn) * 1000000 / an) * pn / bn
      assert(BigInt(sc) === ref, s"score ($pn,$an,$bn)")
    }
  }

  // --------------------------------------------------------- contiguous ids

  test("contiguous ids: equal row_number()-1 at any partition count and input layout") {
    // the determinism claim behind q152: sampled range bounds and the
    // shuffle-partition count decide only WHERE partitions split,
    // never the id a row gets — with a unique order key the ids are
    // the total-order ordinals, full stop
    val df = (1 to 97).map(i => ((i % 7).toLong, i.toLong)).toDF("g", "id")
    val expect = (1 to 97).map(i => ((i % 7).toLong, i.toLong))
      .sortBy(identity).zipWithIndex
      .map { case ((g, id), ix) => (g, id, ix.toLong) }
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (parts <- Seq("3", "7", "32"); inputParts <- Seq(1, 5)) {
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        val got = graft.operators.ContiguousIds
          .assign(df.repartition(inputParts), Seq("g", "id"), "ex_id")
          .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
        assert(got === expect, s"parts=$parts inputParts=$inputParts")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  test("contiguous ids: empty input yields an empty frame with the id column") {
    // zipWithIndex has historically surprised on empty partitions —
    // pin the degenerate layouts explicitly (round-10 verdict #7)
    val empty = spark.emptyDataset[(Long, Long)].toDF("g", "id")
    val got = graft.operators.ContiguousIds.assign(empty, Seq("g", "id"), "ex_id")
    assert(got.columns.toSeq === Seq("g", "id", "ex_id"))
    assert(got.count() === 0)
  }

  test("contiguous ids: single row gets id 0") {
    val one = Seq((5L, 9L)).toDF("g", "id")
    val got = graft.operators.ContiguousIds.assign(one, Seq("g", "id"), "ex_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((5L, 9L, 0L)))
  }

  test("contiguous ids: all rows in one range (constant leading key) stay dense") {
    // every row shares g=1, so range sampling can put the whole input
    // in ONE populated partition with the rest empty — ids must still
    // be the dense 0..n-1 ordinals of the (g, id) order
    val df = (1 to 41).map(i => (1L, (43 - i).toLong)).toDF("g", "id")
    val got = graft.operators.ContiguousIds.assign(df, Seq("g", "id"), "ex_id")
      .as[(Long, Long, Long)].collect().sortBy(_._3).toSeq
    val expect = (1 to 41).map(i => (1L, (43 - i).toLong)).sortBy(_._2)
      .zipWithIndex.map { case ((g, id), ix) => (g, id, ix.toLong) }
    assert(got === expect)
  }

  // ------------------------------------------------------------ array_pairs

  /** The composed HOF form array_pairs replaced (AssocRules' previous
    * candidate generator) — the semantic reference. */
  private def composedPairs(items: org.apache.spark.sql.Column) = {
    import org.apache.spark.sql.functions._
    flatten(transform(
      sequence(lit(0), size(items) - 2),
      i => transform(
        slice(items, i + 2, size(items)),
        y => struct(element_at(items, i + 1).as("ia"), y.as("ib")))))
  }

  test("array_pairs: matches the composed HOF form on random string arrays") {
    val aGen = Gen.listOfN(8, Gen.chooseNum(1, 6)).flatMap(ns =>
      Gen.sequence[List[List[String]], List[String]](ns.map(n =>
        Gen.listOfN(n, Gen.identifier.map(_.take(5))))))
    for (seed <- 1L to 5L) {
      val arrays = sample(aGen, seed).map(_.distinct)
      val df = arrays.zipWithIndex.map { case (a, i) => (i, a) }.toDF("i", "items")
        .filter(size($"items") >= 2)
      val native = df.select($"i",
          explode(call_function(graft.expressions.ArrayPairs.name, $"items")).as("p"))
        .select($"i", $"p.ia", $"p.ib").as[(Int, String, String)].collect().toSeq
      val composed = df.select($"i", explode(composedPairs($"items")).as("p"))
        .select($"i", $"p.ia", $"p.ib").as[(Int, String, String)].collect().toSeq
      assert(native.sorted === composed.sorted, s"seed=$seed")
      // and pair ORDER within a row matches too (i < j index order)
      assert(native === composed, s"seed=$seed (order)")
    }
  }

  test("array_pairs: long arrays, singletons, empties, null elements, null input") {
    val df = Seq(
      (1, Some(Seq[java.lang.Long](1L, 2L, 3L))),
      (2, Some(Seq[java.lang.Long](7L))),
      (3, Some(Seq.empty[java.lang.Long])),
      (4, Some(Seq[java.lang.Long](5L, null, 9L))),
      (5, None)).toDF("i", "items")
    val got = df.select($"i",
        call_function(graft.expressions.ArrayPairs.name, $"items").as("ps"))
      .as[(Int, Option[Seq[(Option[Long], Option[Long])]])].collect().toMap
    assert(got(1) === Some(Seq((Some(1L), Some(2L)), (Some(1L), Some(3L)),
      (Some(2L), Some(3L)))))
    assert(got(2) === Some(Seq.empty))
    assert(got(3) === Some(Seq.empty))
    assert(got(4) === Some(Seq((Some(5L), None), (Some(5L), Some(9L)),
      (None, Some(9L)))))
    assert(got(5) === None)
  }

  test("array_pairs: quadratic-overflow guard fails loudly") {
    val big = Seq((1, (0 until 65536).map(_.toLong))).toDF("i", "items")
    val e = intercept[Exception] {
      big.select(call_function(graft.expressions.ArrayPairs.name, $"items"))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("array_pairs")))
  }

  // ------------------------------------------------------------ stat tests

  test("two-proportion z: hand-computed significant and null cases") {
    def run(xa: Int, na: Int, xb: Int, nb: Int) = {
      val rows = (0 until na).map(i => (0, if (i < xa) 1 else 0)) ++
        (0 until nb).map(i => (1, if (i < xb) 1 else 0))
      StatTests.twoProportionZ(rows.toDF("grp", "ok"), "grp", "ok")
        .select("n_a", "x_a", "n_b", "x_b", "z2", "significant")
        .as[(Long, Long, Long, Long, Double, Boolean)].collect().head
    }
    // 20.0% vs 26.0% on 1000 each: z² = 10.1637…, significant
    assert(run(200, 1000, 260, 1000) ===
      ((1000L, 200L, 1000L, 260L, 10.163749294184075, true)))
    // 20.0% vs 21.0%: z² = 0.3068…, not significant
    assert(run(200, 1000, 210, 1000) ===
      ((1000L, 200L, 1000L, 210L, 0.30679552078539535, false)))
  }

  test("two-proportion z: degenerate pools (all/none convert) score z² = 0") {
    val all = Seq((0, 1), (0, 1), (1, 1), (1, 1)).toDF("grp", "ok")
    val none = Seq((0, 0), (0, 0), (1, 0), (1, 0)).toDF("grp", "ok")
    for (df <- Seq(all, none)) {
      val r = StatTests.twoProportionZ(df, "grp", "ok")
        .select("z2", "significant").as[(Double, Boolean)].collect().head
      assert(r === ((0.0, false)))
    }
  }

  test("two-proportion z: side A is the lexicographically smaller label") {
    val rows = Seq(("b", 1), ("b", 0), ("a", 1), ("a", 1)).toDF("grp", "ok")
    val r = StatTests.twoProportionZ(rows, "grp", "ok")
      .select("grp_a", "x_a", "grp_b", "x_b")
      .as[(String, Long, String, Long)].collect().head
    assert(r === (("a", 2L, "b", 1L)))
  }

  test("two-proportion z / drift TV: a 3-valued group column fails loudly") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    val z3 = Seq(("a", 1), ("b", 0), ("c", 1)).toDF("grp", "ok")
    val ez = intercept[Exception](
      StatTests.twoProportionZ(z3, "grp", "ok").collect())
    assert(msgs(ez).exists(_.contains("3 distinct values")), msgs(ez).toString)
    val d3 = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("pop", "v")
    val ed = intercept[Exception](
      StatTests.driftTV(d3, "pop", "v", 0L, 10L, 5).collect())
    assert(msgs(ed).exists(_.contains("3 distinct values")), msgs(ed).toString)
  }

  test("chi-square: hand-computed 2x2 contingency on the e2 grid") {
    // [[30,10],[20,40]]: true chi² = 16.667; quantized e_q grid → 1666
    val rows =
      Seq.fill(30)(("r0", "c0")) ++ Seq.fill(10)(("r0", "c1")) ++
        Seq.fill(20)(("r1", "c0")) ++ Seq.fill(40)(("r1", "c1"))
    val r = StatTests.chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(r === ((1666L, 4L, 100L)))
  }

  test("chi-square: independent columns score ~zero") {
    val rows = for (i <- 0 until 400) yield (s"r${i % 2}", s"c${(i / 2) % 4}")
    val r = StatTests.chiSquare(rows.toDF("a", "b"), "a", "b")
      .as[(Long, Long, Long)].collect().head
    assert(r === ((0L, 8L, 400L)))
  }

  // ----------------------------------------------------------------- drift

  /** Sequential TV drift with the operator's exact integer rules. */
  private def bruteTV(rows: Seq[(String, Long)], lo: Long, hi: Long,
                      bins: Int): (Long, Long, Long, Long, Long) = {
    val pops = rows.map(_._1).distinct.sorted
    val (pa, pb) = (pops.head, pops.last)
    def binOf(v: Long): Long =
      math.max(0L, math.min(bins - 1L, (v - lo) * bins / (hi - lo)))
    val ca = rows.filter(_._1 == pa).groupBy(r => binOf(r._2)).map { case (b, v) => b -> v.size.toLong }
    val cb = rows.filter(_._1 == pb).groupBy(r => binOf(r._2)).map { case (b, v) => b -> v.size.toLong }
    val na = ca.values.sum; val nb = cb.values.sum
    val num = (ca.keySet ++ cb.keySet).toSeq.map(b =>
      math.abs(ca.getOrElse(b, 0L) * nb - cb.getOrElse(b, 0L) * na)).sum
    val den = 2 * na * nb
    val s = math.max(1L, den / 1000000000000L)
    (na, nb, num, den, (num / s) * 1000000L / math.max(1L, den / s))
  }

  test("drift TV: matches sequential reference on random two-pop samples") {
    val rowGen = Gen.listOfN(200,
      Gen.zip(Gen.oneOf("p", "q"), Gen.chooseNum(-50L, 1050L)))
    for (seed <- 1L to 5L) {
      val rows = sample(rowGen, seed)
      val got = graft.operators.StatTests
        .driftTV(rows.toDF("pop", "v"), "pop", "v", lo = 0L, hi = 1000L, bins = 10)
        .select("n_a", "n_b", "tv_num", "tv_den", "tv_e6")
        .as[(Long, Long, Long, Long, Long)].collect().head
      assert(got === bruteTV(rows, 0L, 1000L, 10), s"seed=$seed")
    }
  }

  test("drift TV: identical populations score zero; disjoint score ~1e6") {
    val same = (0 until 100).flatMap(i => Seq(("a", i.toLong), ("b", i.toLong)))
    val s = graft.operators.StatTests
      .driftTV(same.toDF("pop", "v"), "pop", "v", 0L, 100L, 10)
      .select("tv_e6").as[Long].collect().head
    assert(s === 0L)
    val disjoint = (0 until 100).map(i => ("a", i.toLong % 50)) ++
      (0 until 100).map(i => ("b", 50L + i % 50))
    val d = graft.operators.StatTests
      .driftTV(disjoint.toDF("pop", "v"), "pop", "v", 0L, 100L, 10)
      .select("tv_e6").as[Long].collect().head
    assert(d >= 999999L) // exactly 1.0 up to the e6 floor grid
  }

  // -------------------------------------------------------------- k-means

  test("vecsum_long: elementwise exact sums, null skips, empty-group null") {
    import graft.expressions.VecSumLong.vecSum
    val df = Seq(
      (1, Seq(1L, 2L, 3L)), (1, Seq(10L, 20L, 30L)), (2, Seq(-5L, 0L, 5L)))
      .toDF("g", "v")
    val got = df.groupBy($"g").agg(vecSum($"v").as("s"))
      .as[(Int, Seq[Long])].collect().toMap
    assert(got === Map(1 -> Seq(11L, 22L, 33L), 2 -> Seq(-5L, 0L, 5L)))
    val withNull = Seq((1, Seq(1L, 2L)), (1, null.asInstanceOf[Seq[Long]]))
      .toDF("g", "v")
    assert(withNull.groupBy($"g").agg(vecSum($"v").as("s"))
      .as[(Int, Seq[Long])].collect().toMap === Map(1 -> Seq(1L, 2L)))
  }

  /** Sequential Lloyd with the operator's exact integer rules. */
  private def bruteKMeans(pts: Seq[(Long, Array[Long])], k: Int, iters: Int)
      : Map[Int, (Long, Long, Long)] = {
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var cents: Seq[(Int, Array[Long])] =
      pts.sortBy(_._1).take(k).zipWithIndex.map { case (p, i) => (i, p._2) }
    def assignAll() = pts.map { case (id, q) =>
      val best = cents.map(c => (d2(q, c._2), c._1)).min
      (id, q, best._2, best._1)
    }
    for (_ <- 1 to iters) {
      val byC = assignAll().groupBy(_._3)
      cents = cents.map { case (cid, prev) =>
        byC.get(cid) match {
          case Some(members) =>
            val n = members.size
            val sv = members.map(_._2).transpose.map(_.sum)
            (cid, sv.map(s => s / n).toArray) // JVM /: trunc toward zero
          case None => (cid, prev)
        }
      }
    }
    assignAll().groupBy(_._3).map { case (cid, ms) =>
      cid -> (ms.size.toLong, ms.map(_._4).sum,
        cents.find(_._1 == cid).get._2.sum)
    }
  }

  test("k-means: matches sequential integer Lloyd on random points") {
    val ptGen = Gen.listOfN(40, Gen.listOfN(4, Gen.chooseNum(-1000L, 1000L)))
    for (seed <- 1L to 5L) {
      val pts = sample(ptGen, seed).zipWithIndex
        .map { case (v, i) => (i.toLong, v.toArray) }
      val got = graft.operators.KMeans.fit(
          pts.map(p => (p._1, p._2.toSeq)).toDF("id", "q"), "id", "q",
          k = 3, iters = 2)
        .as[(Int, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      assert(got === bruteKMeans(pts, 3, 2), s"seed=$seed")
    }
  }

  test("k-means: an emptied cluster keeps its previous centroid") {
    // two far groups + k=3 seeded from the first three points (all in
    // group one): at least one centroid empties in iteration 1
    val pts = (0 until 10).map(i => (i.toLong, Array(0L + i, 0L))) ++
      (10 until 20).map(i => (i.toLong, Array(100000L + i, 0L)))
    val got = graft.operators.KMeans.fit(
        pts.map(p => (p._1, p._2.toSeq)).toDF("id", "q"), "id", "q",
        k = 3, iters = 2)
      .as[(Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got === bruteKMeans(pts, 3, 2))
  }

  // ----------------------------------------------------- sorted neighborhood

  test("sorted neighborhood: finds planted near-dup names, bounded candidates") {
    val clean = (0 until 200).map(i => (i.toLong, f"Customer#$i%09d"))
    // planted: one-char corruptions of existing names, ids 1000+
    val planted = Seq(
      (1000L, "Customer#00000004X"), // dist 1 from …000000042-ish block
      (1001L, "Customer#0000000z7"), // dist 1
      (1002L, "Xustomer#000000099")) // different block — NOT findable
    val df = (clean ++ planted).toDF("id", "name")
    val pairs = Dedup.sortedNeighborhoodPairs(df, "id", "name",
        v => substring(v, 1, 16), w = 5, maxDist = 2)
      .as[(Long, Long, Int)].collect()
    val hit = pairs.filter(p => p._1 >= 1000 || p._2 >= 1000)
      .map(p => p._1 max p._2).toSet
    assert(hit.contains(1000L) && hit.contains(1001L))
    assert(!hit.contains(1002L)) // blocking bounds the search — documented miss
    // every neighbor of an identical prefix run is within dist 2 of the
    // corruption only near it; candidate volume ≤ w·n by construction
    assert(pairs.length <= 5 * (clean.length + planted.length))
    // symmetric sanity: all adjacent clean names differ by ≥1 digit →
    // dist ≥ 1; pairs never pair a row with itself
    assert(pairs.forall(p => p._1 != p._2))
  }
}
