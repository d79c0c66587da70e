package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.expressions.VecSumLong

/** Distributed k-means on an INTEGER grid — the Lloyd iteration with
  * every step exact BIGINT arithmetic, so any engine replays the
  * trajectory bit-identically (the PageRank discipline applied to a
  * clustering algorithm; float k-means diverges across engines at the
  * first rounding difference and can never be oracle-checked).
  *
  *  - input vectors are quantized BIGINT arrays (caller quantizes,
  *    e.g. `floor(x * 1000)` — engine-exact, see q136);
  *  - init: the k points with the smallest ids (deterministic, no RNG;
  *    k-means++ would need engine-replayable randomness for nothing —
  *    the oracle property is about the ITERATION, not the seeding);
  *  - assignment: argmin of exact squared L2 distance, ties to the
  *    smaller centroid id — a PURE MAP: the k centroids ride along as
  *    one collected row (k·dims longs), so assignment shuffles
  *    NOTHING at any corpus size;
  *  - update: one k-group aggregate per iteration — the native
  *    [[VecSumLong]] elementwise-sum keeps the exchange at k arrays
  *    (map-side combined), never n·dims exploded rows; the new
  *    centroid is the truncated mean (BIGINT `div`, toward zero —
  *    mirrored exactly in the oracle); an emptied cluster keeps its
  *    previous centroid (left join + coalesce) instead of going NULL.
  *
  * Scale shape per iteration: one map over the corpus + one k-row
  * aggregate + one k-row join — no corpus shuffle anywhere. The whole
  * fit is a static `iters`-deep plan.
  */
object KMeans {

  private def sqDist(q: Column, c: Column): Column =
    aggregate(zip_with(q, c, (a, b) => (a - b) * (a - b)),
      lit(0L), (acc, x) => acc + x)

  /** One collected row (cents: array<struct<cid,vec>>) from a k-row
    * centroid table — the broadcast-sized carrier for map-side argmin. */
  private def asRow(centroids: DataFrame): DataFrame =
    centroids.agg(collect_list(struct(col("cid"), col("vec"))).as("cents"))

  /** (assigned cid, dist) for each point against the collected
    * centroid row: array_min over struct(dist, cid) — lexicographic
    * struct order = min dist, ties to smaller cid. */
  private def assign(points: DataFrame, centRow: DataFrame): DataFrame =
    points.crossJoin(broadcast(centRow))
      .withColumn("best", array_min(transform(col("cents"),
        c => struct(sqDist(col("q"), c.getField("vec")).as("d"),
          c.getField("cid").as("cid")))))
      .select(col("id"), col("q"),
        col("best.cid").as("cid"), col("best.d").as("d"))

  /** `points`: (id integral, q array<long>). Returns the per-cluster
    * report after the final assignment: one row per non-empty cluster
    * `(cid INT, n_points BIGINT, inertia BIGINT, centroid_sum BIGINT)`
    * — centroid_sum (Σ of the centroid's components) pins the exact
    * centroid trajectory scalar-wise without emitting arrays. */
  def fit(points: DataFrame, idCol: String, vecCol: String,
          k: Int, iters: Int): DataFrame = {
    require(k >= 1 && iters >= 0, s"need k >= 1, iters >= 0; got k=$k iters=$iters")
    val pts = points.select(col(idCol).as("id"), col(vecCol).as("q"))
    // deterministic seeding: the k smallest ids, centroid id = seed rank
    val c0 = pts.orderBy(col("id")).limit(k)
      .select(col("id"), col("q"))
      .withColumn("cid",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("id"))) - 1).cast("int"))
      .select(col("cid"), col("q").as("vec"))
    val cFinal = (1 to iters).foldLeft(c0) { (cents, _) =>
      val agg = assign(pts, asRow(cents))
        .groupBy(col("cid"))
        .agg(VecSumLong.vecSum(col("q")).as("sv"), count(lit(1)).as("n"))
      // truncated integer mean; emptied cluster keeps its old centroid
      cents.select(col("cid"), col("vec").as("prev"))
        .join(agg, Seq("cid"), "left")
        .select(col("cid"),
          // SQL-expr lambda: `div` (integral, toward zero) has no
          // Column operator form
          coalesce(expr("transform(sv, x -> x div n)"), col("prev"))
            .as("vec"))
    }
    assign(pts, asRow(cFinal))
      .groupBy(col("cid"))
      .agg(count(lit(1)).as("n_points"),
        sum(col("d")).cast("bigint").as("inertia"))
      .join(cFinal.select(col("cid"),
        aggregate(col("vec"), lit(0L), (acc, x) => acc + x).as("centroid_sum")),
        "cid")
      .select(col("cid"), col("n_points"), col("inertia"), col("centroid_sum"))
  }
}
