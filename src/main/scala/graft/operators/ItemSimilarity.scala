package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Item–item cosine similarity over co-occurrence baskets — the
  * collaborative-filtering neighbor table ("customers who bought A
  * also bought B, ranked by how alike their buyer sets are"). The
  * reference's BI surface has no recommender primitive; this is part
  * of the large-scale pipeline extension mandate, complementing
  * [[AssocRules]] (directional confidence/lift rules) with the
  * symmetric normalized-similarity ranking recommenders actually
  * serve.
  *
  * For binary (set-membership) baskets, cosine(A, B) =
  * pair_n / sqrt(a_n * b_n). To stay engine-exact we rank by the
  * SQUARED cosine on an integer e6 grid, factored so every step is a
  * positive BIGINT floor division:
  *
  *   score_e6 = (pair_n * 1e6 div a_n) * pair_n div b_n
  *
  * Squaring is monotone on non-negatives, so the ranking is the
  * cosine ranking (up to the documented grid floor). Overflow bound:
  * pair_n <= a_n keeps the first quotient <= 1e6, so the second
  * numerator is <= 1e6 * pair_n — safe to ~9.2e12 co-occurrences,
  * the same margin as [[AssocRules.LiftExpr]] (property-pinned in
  * AnalyticsOpsSpec at that margin).
  *
  * Shape at scale: identical to [[AssocRules.mine]] — ONE basket-key
  * shuffle builds the deduped basket arrays, canonical (i < j) pairs
  * are generated INSIDE each array by the native `array_pairs`
  * expression (bounded C(size, 2) per basket — cap pathological
  * baskets upstream), and the pair aggregate is pruned by `minPair`
  * BEFORE any join. The per-item count table is item-vocabulary-sized
  * and joins the frequent-pair table on the item key; the final
  * top-k is a window over the frequent-pair table partitioned by
  * item. Nothing is ever all-pairs across baskets, and no stage
  * materializes more than (frequent pairs + vocabulary) rows after
  * the one fact-sized exchange.
  *
  * No cache outlives the call: every escaping table is checkpointed
  * and the fact-sized basket cache is unpersisted inside
  * [[Baskets.counts]] — long-lived sessions need no clearCache
  * contract for this operator.
  */
object ItemSimilarity {

  /** The e6-grid squared-cosine, exposed so the overflow property
    * test evaluates the EXACT production expression. */
  private[graft] val ScoreExpr =
    "(pair_n * 1000000L div a_n) * pair_n div b_n"

  /** `baskets`: two columns (basket id, item id). Returns one row per
    * (item, neighbor) whose co-occurrence count reaches `minPair`,
    * ranked per item by (score_e6 desc, pair_n desc, neighbor asc) —
    * a unique-key tie-break, so the rn <= k cut is deterministic on
    * any engine. Columns: item, neighbor, pair_n, a_n, b_n, score_e6,
    * rn. */
  def topNeighbors(baskets: DataFrame, k: Int, minPair: Long): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // shared machinery with AssocRules ([[Baskets.counts]]): ONE
    // basket-key shuffle, in-array pair generation, itemN and the
    // minPair-pruned pairN checkpointed (each is consumed twice below
    // — unmaterialized, each union branch re-ran pair generation over
    // the basket table: measured 33 vs 20.5 s at the 100× decade)
    val (itemN, pairN, _) =
      Baskets.counts(baskets, minPair, withBasketTotal = false)
    // cosine is symmetric: both directions of each frequent pair feed
    // the same per-item ranking
    val both = pairN.select(col("ia").as("item"), col("ib").as("neighbor"), col("pair_n"))
      .unionAll(pairN.select(col("ib").as("item"), col("ia").as("neighbor"), col("pair_n")))
    val w = Window.partitionBy(col("item"))
      .orderBy(col("score_e6").desc, col("pair_n").desc, col("neighbor"))
    both
      .join(itemN.select(col("it").as("item"), col("n").as("a_n")), "item")
      .join(itemN.select(col("it").as("neighbor"), col("n").as("b_n")), "neighbor")
      .select(col("item"), col("neighbor"), col("pair_n"), col("a_n"), col("b_n"),
        expr(ScoreExpr).as("score_e6"))
      .withColumn("rn", row_number().over(w).cast("int"))
      .filter(col("rn") <= k)
  }
}
