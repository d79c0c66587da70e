package graft

import org.apache.spark.sql.functions._

import graft.operators.{ShardedExport, SourceCuration}

/** q153/q154 operator cores: per-source cap-and-blocklist curation and
  * the shard-balanced export manifest. */
class ExportCurationSpec extends SparkSpec {
  import spark.implicits._

  test("curate: blocklisted sources vanish, caps bind per source, hash order is stable") {
    // hostA: 5 docs (cap 3 binds), hostB: 2 docs (under cap), bad: blocked
    val docs = (1L to 5L).map(i => (i, "hostA")) ++
      Seq((10L, "hostB"), (11L, "hostB"), (20L, "bad"), (21L, "bad"))
    val bl = Seq("bad").toDF("source")
    val out = SourceCuration.curate(docs.toDF("doc_id", "source"),
      "source", "doc_id", cap = 3, bl, "t:")
      .as[(Long, String, Int)].collect().toSeq
    assert(!out.exists(_._2 == "bad"))
    assert(out.count(_._2 == "hostA") === 3)
    assert(out.filter(_._2 == "hostB").map(_._1).toSet === Set(10L, 11L))
    // survivors = the 3 smallest salted hashes among hostA's 5 — the
    // sequential reference of the windowed rank
    val expectA = (1L to 5L)
      .sortBy(i => (java.security.MessageDigest.getInstance("MD5")
        .digest(s"t:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, i)).take(3).toSet
    assert(out.filter(_._2 == "hostA").map(_._1).toSet === expectA)
    // ranks are 1..k dense per source
    assert(out.filter(_._2 == "hostA").map(_._3).sorted === Seq(1, 2, 3))
    // layout-invariant: same survivors from a different input layout
    val out2 = SourceCuration.curate(
      docs.reverse.toDF("doc_id", "source").repartition(7),
      "source", "doc_id", cap = 3, bl, "t:")
      .as[(Long, String, Int)].collect().toSeq
    assert(out2.toSet === out.toSet)
  }

  test("curate: the cap filter plans as WindowGroupLimit (map-side top-k, not a full window)") {
    val docs = (1L to 50L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val plan = SourceCuration.curate(docs, "source", "doc_id", cap = 3,
      Seq("none").toDF("source"), "t:")
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"expected WindowGroupLimit in:\n$plan")
  }

  test("curate: empty blocklist keeps every source; cap above input is a no-op") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val out = SourceCuration.curate(docs, "source", "doc_id", cap = 99,
      spark.emptyDataset[String].toDF("source"), "t:")
      .as[(Long, String, Int)].collect().toSeq
    assert(out.map(_._1).toSet === Set(1L, 2L, 3L))
  }

  test("withShards + manifest: empty input yields an empty manifest with the schema") {
    val empty = spark.emptyDataset[(Long, String, Long)]
      .toDF("doc_id", "lang", "n_chars")
    val m = ShardedExport.manifest(
      ShardedExport.withShards(empty, Seq("lang", "doc_id"), 4L), "n_chars")
    assert(m.columns.toSeq ===
      Seq("shard", "n_docs", "n_bytes", "min_ex_id", "max_ex_id"))
    assert(m.count() === 0)
  }

  test("withShards + manifest: exact shard sizes, byte sums, contiguous id ranges") {
    // 10 docs, shardSize 4 -> shards 0,1 of 4 docs and shard 2 of 2
    val docs = (0L until 10L).map(i => (i, s"l${i % 2}", 100L + i))
      .toDF("doc_id", "lang", "n_chars")
    val sharded = ShardedExport.withShards(docs, Seq("lang", "doc_id"), 4L)
    val m = ShardedExport.manifest(sharded, "n_chars")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    // order: l0 docs 0,2,4,6,8 then l1 docs 1,3,5,7,9
    val ordered = Seq(0L, 2L, 4L, 6L, 8L, 1L, 3L, 5L, 7L, 9L)
    val expect = ordered.zipWithIndex.groupBy(_._2 / 4).toSeq.sortBy(_._1)
      .map { case (sh, rows) =>
        (sh.toLong, rows.size.toLong, rows.map(100L + _._1).sum,
          rows.map(_._2.toLong).min, rows.map(_._2.toLong).max) }
    assert(m === expect)
    // every shard's id range is exactly [shard*size, shard*size+n-1]
    for ((sh, n, _, lo, hi) <- m) {
      assert(lo === sh * 4 && hi === lo + n - 1)
    }
  }

  test("training order (q156 shape): hash-ordered shards are mixture-" +
      "representative; lang-ordered shards are not") {
    // the real corpus slice: 500 docs, 5 languages, en ~39%
    val docs = Tables(spark, sf0001, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val corpus = docs.groupBy("lang").count()
      .as[(String, Long)].collect().toMap
    val total = corpus.values.sum.toDouble
    def shardLangFracs(ordered: org.apache.spark.sql.DataFrame)
        : Map[(Long, String), Double] = {
      val counts = ordered.groupBy("shard", "lang").count()
        .as[(Long, String, Long)].collect()
      val sizes = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
      counts.map { case (sh, l, n) => (sh, l) -> n.toDouble / sizes(sh) }.toMap
    }
    val hashOrdered = ShardedExport.withShards(
      docs.withColumn("h",
        md5(concat(lit("q156:"), col("doc_id").cast("string")))),
      Seq("h", "doc_id"), 64L)
    val hashFracs = shardLangFracs(hashOrdered)
    val shards = hashFracs.keys.map(_._1).toSet
    assert(shards.size === 8) // ceil(500/64)
    // every shard's per-lang fraction within ±0.25 of the corpus' —
    // hash-binomial std at 64 docs is ~0.06, so 0.25 is noise-proof
    // while language-grouped shards (fraction 1.0 vs corpus ≤0.39)
    // blow through it
    for (sh <- shards; (l, c) <- corpus) {
      val f = hashFracs.getOrElse((sh, l), 0.0)
      assert(math.abs(f - c / total) < 0.25,
        s"shard $sh lang $l frac $f vs corpus ${c / total}")
    }
    // the CONTRAST: q154's (lang, doc_id) order ships shards a single
    // language dominates outright
    val langOrdered = ShardedExport.withShards(
      docs, Seq("lang", "doc_id"), 64L)
    val maxFrac = shardLangFracs(langOrdered).values.max
    assert(maxFrac === 1.0, s"expected a single-language shard, got $maxFrac")
  }
}
