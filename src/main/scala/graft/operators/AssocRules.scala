package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) pairs — the classic
  * market-basket "customers who bought A also bought B" operator
  * (Agrawal–Srikant Apriori at the pair level; the reference's BI
  * surface has no mining operator, this is part of the large-scale
  * pipeline extension mandate).
  *
  * Output is one row per ordered rule `A -> B` among item pairs whose
  * co-occurrence count reaches `minSupport`, with exact BIGINT
  * support counts and confidence / lift on an integer e6 grid:
  *
  *   confidence_e6 = (pair_n * 1e6) div a_n
  *   lift_e6       = ((pair_n * 1e6) div a_n) * baskets div b_n
  *
  * Both are floor divisions of BIGINTs in a FIXED order, so any
  * engine replays them bit-identically (the BM25/PageRank discipline).
  * Overflow bound: pair_n <= a_n keeps the first quotient <= 1e6, so
  * the lift numerator is <= 1e6 * baskets — safe to ~9e12 baskets.
  *
  * Shape at scale ([[Baskets.counts]], shared with
  * [[ItemSimilarity]]): ONE basket-key shuffle builds the deduped
  * item arrays, canonical pairs are generated INSIDE each array —
  * Σ C(basket_size, 2) candidates, linear in the data for bounded
  * baskets (TPC-H orders: ≤ 7 lines). The `minSupport` filter runs on
  * the pair aggregate BEFORE the per-item-count joins, so the rule
  * join only sees frequent pairs (tiny); per-item counts join the
  * frequent pairs on the item key. Nothing is ever all-pairs across
  * baskets, and no fact-sized cache outlives the call.
  */
object AssocRules {

  /** The e6-grid rule arithmetic, exposed so the overflow property test
    * (AnalyticsOpsSpec) evaluates the EXACT production expressions at
    * the documented ~9.2e12-basket margin rather than a re-typed copy.
    * `pair_n * 1e6` and `confidence_e6 * baskets` both stay under 2⁶³
    * there (9.2e18 < 9.223e18) — tight, hence the pin. */
  private[graft] val ConfidenceExpr = "pair_n * 1000000L div a_n"
  private[graft] val LiftExpr =
    s"($ConfidenceExpr) * baskets div b_n"

  /** `baskets`: two columns (basket id, item id). Items are deduped
    * within a basket; `minSupport` is the minimum co-occurrence count
    * for a pair to generate its two rules. Basket sizes must be
    * bounded (pair generation is C(size, 2) per basket) — cap or
    * pre-filter pathological baskets upstream. */
  def mine(baskets: DataFrame, minSupport: Long): DataFrame = {
    require(minSupport >= 1, s"minSupport must be >= 1, got $minSupport")
    // ONE basket-key shuffle total ([[Baskets.counts]]): item and
    // basket counts re-derive from the same materialized basket table
    // — a self-join formulation paid that fact-table exchange three
    // times (x side, y side, itemN). itemN is consumed twice (a_n and
    // b_n lookups), pairN twice (the two rule directions): all
    // checkpointed, and the fact-sized cache dies inside the call.
    val (itemN, pairN, basketNOpt) =
      Baskets.counts(baskets, minSupport, withBasketTotal = true)
    val basketN = basketNOpt.get
    // both directions of each frequent pair, then the two item-count
    // lookups and the one-row basket total (broadcast by AQE — the
    // frequent-rule side is small by construction, but the item-count
    // side is keyed, so these are plain key joins either way)
    val rules = pairN.select(col("ia").as("a"), col("ib").as("b"), col("pair_n"))
      .unionAll(pairN.select(col("ib").as("a"), col("ia").as("b"), col("pair_n")))
    rules
      .join(itemN.select(col("it").as("a"), col("n").as("a_n")), "a")
      .join(itemN.select(col("it").as("b"), col("n").as("b_n")), "b")
      .crossJoin(basketN)
      .select(col("a"), col("b"), col("pair_n"), col("a_n"), col("b_n"),
        expr(ConfidenceExpr).as("confidence_e6"),
        expr(LiftExpr).as("lift_e6"))
  }
}
