package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting and per-document top-term extraction — the
  * classic feature-extraction face of a text corpus (keyword tagging,
  * cluster labeling, near-dup triage lists, BM25-ish retrieval seeds).
  *
  * Mirrors [[NgramLm]]'s two-face design: [[topTerms]] is the DISCRETE
  * oracle-able face — idf enters as the integer quotient
  * `(idfScale * N) div df` so every score is exact BIGINT arithmetic,
  * bit-identical on any engine (floor-division order agrees with the
  * real idf whenever quotients differ; `idfScale` bounds the
  * quantization) — while [[scored]] is the continuous `tf · ln(N/df)`
  * Column face for ranking/thresholding use, documented
  * engine-specific (ln is not IEEE-pinned across engines).
  *
  * Shape at scale: the token stream collapses to (doc, term, tf) with
  * map-side partial counts BEFORE anything wide happens — the widest
  * thing that ever shuffles is the distinct (doc, term) table, not the
  * raw token stream. Document frequency is a windowed count over that
  * reduced table partitioned by term (tf rows are unique per
  * (doc, term), so `count(*)` over the term partition IS df — no
  * second aggregate-and-join-back exchange), and the final per-doc
  * top-k aggregates with O(k) mergeable partials
  * ([[graft.expressions.TopKStrings]]), never a corpus-wide sort.
  * The only driver action is one bounded `count()` of the corpus (N).
  */
object TfIdf {

  /** (idCol, term, tf) — one row per distinct (doc, term), with the
    * in-doc occurrence count. Map-side combined. */
  def termFreqs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), explode(
        graft.functions.TextFunctions.words(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))

  /** Per-document top-k terms by quantized tf-idf. Returns one row per
    * input row: (idCol, top_terms) — the k highest-scoring terms,
    * comma-joined in (score desc, term asc) order; docs with no terms
    * get "". Scores are `tf * ((idfScale * N) div df)` in exact BIGINT
    * arithmetic (caller owns `idfScale * N * max(tf)` staying under
    * 2^63 — at the default scale that is ~9e14 doc-occurrences, beyond
    * any single corpus this engine targets). */
  def topTerms(df: DataFrame, idCol: String, textCol: String,
               k: Int = 5, idfScale: Long = 10000L): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(idfScale >= 1, s"idfScale must be >= 1, got $idfScale")
    // one bounded driver action: corpus size (a single long)
    val n = df.count()
    val tf = termFreqs(df, idCol, textCol).withColumnRenamed(idCol, "__id")
    // df via a window over ONE exchange by term (tf is unique per
    // (doc, term) ⇒ the partition count is the document frequency)
    val scoredTf = tf.repartition(col("term"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .withColumn("__score",
        col("tf") * expr(s"(${idfScale}L * ${n}L) DIV __df"))
    val top = scoredTf.groupBy(col("__id"))
      .agg(array_join(graft.expressions.TopKStrings.topk(
        col("__score"), col("term"), k), ",").as("top_terms"))
    df.select(col(idCol))
      .join(top.withColumnRenamed("__id", idCol).hint("shuffle_hash"),
        Seq(idCol), "left")
      .select(col(idCol), coalesce(col("top_terms"), lit("")).as("top_terms"))
  }

  /** Continuous (idCol, term, tfidf) scores: `tf * ln(N/df)`, natural
    * idf with no smoothing (df >= 1 always holds; terms present in
    * every doc score exactly 0). For Column-API ranking use — ln() is
    * engine-specific at the last bit, so this face is not SQL-oracled;
    * [[topTerms]] is the oracle-checked face of the same weighting. */
  def scored(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val n = df.count()
    termFreqs(df, idCol, textCol).withColumnRenamed(idCol, "__id")
      .repartition(col("term"))
      .withColumn("__df", count(lit(1)).over(Window.partitionBy(col("term"))))
      .select(col("__id").as(idCol), col("term"),
        (col("tf").cast("double") *
          log(lit(n.toDouble) / col("__df").cast("double"))).as("tfidf"))
  }
}
