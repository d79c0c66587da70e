package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus n-gram language-model statistics and the coverage quality
  * gate built on them — the exactly-replayable core of perplexity
  * filtering (the CCNet/Wenzek-style LM quality signal: documents
  * whose word transitions the corpus LM has rarely seen are likely
  * boilerplate, gibberish, or OCR noise).
  *
  * The gate is deliberately DISCRETE: a bigram occurrence "hits" when
  * the corpus-wide count of that bigram reaches `minCount`, and a doc
  * keeps when `hits * 100 >= total * minPct` — integer counts, integer
  * comparison, bit-identical on any engine, so the whole gate is
  * SQL-oracle-able (unlike log-probability perplexity, whose ln() is
  * not IEEE-pinned across engines; [[perplexityProxy]] provides the
  * continuous score for ranking use, documented engine-specific).
  *
  * Shape at scale: ONE exchange of the corpus's bigram-occurrence
  * stream by gram serves both the corpus count (a windowed count over
  * the partitioned stream — no separate count-table build and
  * join-back, which would shuffle the token stream twice) and the
  * per-occurrence hit flag; per-doc totals then aggregate with
  * map-side partials on the doc id. The token-stream shuffle is the
  * canonical cost of any corpus LM count (sharded counting); nothing
  * here materializes state beyond one count per distinct bigram.
  */
object NgramLm {

  /** Word bigrams WITH duplicates (occurrence stream, not the distinct
    * set [[Dedup.shingles]] returns — LM counts weigh repetition).
    * zip_with pads the shifted side with null; concat propagates it and
    * array_compact drops the tail slot. */
  def bigramsAll(c: Column): Column = {
    val w = graft.functions.TextFunctions.words(c)
    array_compact(zip_with(
      w, slice(w, lit(2), greatest(size(w) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b)))
  }

  /** Corpus bigram counts: (g, cnt) over the occurrence stream. */
  def bigramCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(bigramsAll(col(textCol))).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cnt"))

  /** Per-document LM coverage gate. Returns one row per input row:
    * (idCol, bi_total, bi_hits, keep) where bi_total counts the doc's
    * bigram occurrences, bi_hits those whose corpus count >= minCount,
    * and keep = bi_hits*100 >= bi_total*minPct. Docs under two words
    * have no bigrams: 0/0 keeps (the LM gate abstains — length gates
    * own short docs). */
  def coverageGate(df: DataFrame, idCol: String, textCol: String,
                   minCount: Int = 2, minPct: Int = 60): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(minPct >= 0 && minPct <= 100, s"minPct must be 0..100, got $minPct")
    val occ = df.select(col(idCol).as("__id"),
      explode(bigramsAll(col(textCol))).as("g"))
    // corpus count via a window over the SAME gram exchange the hit
    // flags ride on — the occurrence stream shuffles exactly once
    val counted = occ.repartition(col("g"))
      .withColumn("__cnt", count(lit(1)).over(Window.partitionBy(col("g"))))
    val perDoc = counted.groupBy(col("__id"))
      .agg(count(lit(1)).as("bi_total"),
        sum(when(col("__cnt") >= minCount, 1L).otherwise(0L)).as("bi_hits"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("__id", idCol).hint("shuffle_hash"),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("bi_total"), lit(0L)).as("bi_total"),
        coalesce(col("bi_hits"), lit(0L)).as("bi_hits"))
      .withColumn("keep",
        col("bi_hits") * 100 >= col("bi_total") * minPct)
  }

  /** Continuous add-one-smoothed mean negative log-probability of the
    * doc's bigrams under the corpus counts — the ranking-grade
    * perplexity analog. ln() is not bit-pinned across engines, so this
    * is for Column-API use (thresholding, sorting), not the SQL oracle;
    * [[coverageGate]] is the oracle-checked face of the same signal. */
  def perplexityProxy(countsBc: DataFrame, docs: DataFrame,
                      idCol: String, textCol: String): DataFrame = {
    val v = countsBc.agg(count(lit(1))).first().getLong(0).toDouble
    val tot = countsBc.agg(sum(col("cnt"))).first().getLong(0).toDouble
    docs.select(col(idCol).as("__id"),
      explode(bigramsAll(col(textCol))).as("g"))
      .join(broadcast(countsBc), Seq("g"), "left")
      .select(col("__id"),
        (-log((coalesce(col("cnt"), lit(0L)).cast("double") + 1.0) /
          (tot + v))).as("__nlp"))
      .groupBy(col("__id"))
      .agg(avg(col("__nlp")).as("mean_nlp"))
      .withColumnRenamed("__id", idCol)
  }
}
