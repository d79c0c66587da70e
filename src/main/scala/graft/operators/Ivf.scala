package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expressions.VectorExpressions.dotF

/** IVF (inverted-file) approximate nearest neighbor: a k-means coarse
  * quantizer partitions the corpus into `nlist` cells; a query probes
  * only its `nprobe` nearest cells and brute-forces within them.
  *
  * The scale path: cell assignment is a per-row expression (nlist
  * native dot products against broadcast centroid literals — no
  * shuffle), the probe join is an equi-join on cell id, and the
  * per-cell verification touches |corpus|·nprobe/nlist candidates
  * instead of |corpus|. Complements [[Similarity.signBucketPairs]]
  * (LSH): IVF adapts to the data distribution, LSH needs no training.
  *
  * Training uses MLlib KMeans with a fixed seed — deterministic for a
  * given corpus, but engine-specific (not DuckDB-expressible), so IVF
  * is covered by recall tests against the exact baseline rather than a
  * SQL oracle.
  */
object Ivf {

  final case class Model(centroids: Seq[Seq[Float]]) {
    def nlist: Int = centroids.size
  }

  /** Train the coarse quantizer.
    *
    * `sampleFraction` is the scale contract: k-means over the full
    * corpus is a multi-pass job that does NOT amortize at 100 TB — the
    * quantizer only needs the coarse density shape, which a uniform
    * sample of ~100·nlist vectors already captures. Callers at scale
    * must pass a fraction that lands near that count; the default 1.0
    * (full fit) is for small corpora and tests. Sampling is seeded, so
    * fit stays deterministic for a given corpus + seed. */
  def fit(corpus: DataFrame, vecCol: String, nlist: Int,
          seed: Long = 42L, sampleFraction: Double = 1.0): Model = {
    require(sampleFraction > 0.0 && sampleFraction <= 1.0,
      s"sampleFraction must be in (0, 1], got $sampleFraction")
    val src =
      if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, seed)
    val feats = src.select(array_to_vector(col(vecCol)).as("features"))
    val km = new KMeans().setK(nlist).setSeed(seed).setMaxIter(20)
      .setFeaturesCol("features")
    val model = km.fit(feats)
    Model(model.clusterCenters.toSeq.map(_.toArray.toSeq.map(_.toFloat)))
  }

  /** Squared-distance ranking key to centroid i: ||x-c||² = ||x||²
    * - 2x·c + ||c||²; the ||x||² term is constant per row, so
    * `-2·x·c + ||c||²` ranks identically. */
  private def cellScore(vec: Column, centroid: Seq[Float]): Column = {
    val c = array(centroid.map(lit): _*)
    val c2 = centroid.map(x => x.toDouble * x.toDouble).sum
    -lit(2.0) * dotF(vec, c) + lit(c2)
  }

  /** Nearest-cell id per row (deterministic argmin: ties to the lower
    * cell index via struct ordering). */
  def cellOf(vec: Column, model: Model): Column =
    array_min(array(model.centroids.zipWithIndex.map { case (c, i) =>
      struct(cellScore(vec, c).as("d"), lit(i).as("i"))
    }: _*)).getField("i")

  /** The `nprobe` nearest cell ids per row, as an array. */
  def probeCells(vec: Column, model: Model, nprobe: Int): Column =
    slice(transform(
      array_sort(array(model.centroids.zipWithIndex.map { case (c, i) =>
        struct(cellScore(vec, c).as("d"), lit(i).as("i"))
      }: _*)),
      s => s.getField("i")), 1, nprobe)

  /** Approximate cosine top-k: probe-join + windowed rank, same output
    * shape as [[Similarity.bruteForceTopK]]. */
  def topK(corpus: DataFrame, queries: DataFrame, model: Model,
           idCol: String, vecCol: String, k: Int, nprobe: Int): DataFrame = {
    val cells = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("__cv"),
      cellOf(col(vecCol), model).as("__cell"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("__cn"))
    val probes = queries.select(col(idCol).as("query_id"), col(vecCol).as("__qv"),
      sqrt(dotF(col(vecCol), col(vecCol))).as("__qn"),
      explode(probeCells(col(vecCol), model, nprobe)).as("__cell"))
    val scored = cells.join(broadcast(probes), Seq("__cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dotF(col("__qv"), col("__cv")) / (col("__qn") * col("__cn"))).as("__cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("__cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank")
  }
}
