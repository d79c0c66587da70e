package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hypothesis tests as one-pass aggregates — the A/B-experiment
  * readout layer of an analytics engine (two-proportion z-test,
  * chi-square independence). The reference's BI surface stops at
  * GROUP BY; these are part of the decision-support extension.
  *
  * Determinism discipline: every COUNT is an exact BIGINT, and every
  * floating-point statistic is computed from those exact integers
  * through ONE fixed expression tree of IEEE-754 double ops — both
  * engines run the identical tree on the identical values and +,-,*,/
  * are exactly rounded, so the result is bit-identical (the duckCos
  * precedent from the embedding oracles, applied to test statistics).
  * Where a SUM over floating terms would reintroduce order dependence
  * (chi-square's Σ over cells), the per-cell term is quantized to an
  * integer grid FIRST and the sum is an integer sum — order-invariant
  * by construction.
  */
object StatTests {

  private def d(c: Column): Column = c.cast("double")

  /** Two-proportion z-test (pooled), the standard A/B conversion
    * readout. `df` needs a 2-valued group column and a 0/1 success
    * column; the lexicographically smaller group label is side A.
    * Returns ONE row: exact counts, the z² statistic, and the α=0.05
    * verdict (z² > χ²₁(0.95) = 3.8415).
    *
    * Shape at scale: one conditional aggregate over the fact table —
    * a map-side-combined scalar agg, no shuffle of rows, no
    * per-group sort. The statistic is closed-form over four BIGINTs.
    */
  def twoProportionZ(df: DataFrame, groupCol: String, successCol: String): DataFrame = {
    // exact per-group counts (map-side combined, 2 output rows), then
    // side A/B selected by lexicographic struct min/max — no nested
    // aggregate, no driver-side label lookup
    val byG = df.groupBy(col(groupCol).as("g"))
      .agg(count(lit(1)).as("n"),
        sum(col(successCol)).cast("bigint").as("x"))
    byG.agg(
        min(struct(col("g"), col("n"), col("x"))).as("sa"),
        max(struct(col("g"), col("n"), col("x"))).as("sb"))
      .select(
        col("sa.g").as("grp_a"), col("sb.g").as("grp_b"),
        col("sa.n").as("n_a"), col("sa.x").as("x_a"),
        col("sb.n").as("n_b"), col("sb.x").as("x_b"))
      .withColumn("z2", {
        val p1 = d(col("x_a")) / d(col("n_a"))
        val p2 = d(col("x_b")) / d(col("n_b"))
        val p = (d(col("x_a")) + d(col("x_b"))) / (d(col("n_a")) + d(col("n_b")))
        val diff = p1 - p2
        // degenerate pool (p ∈ {0, 1} ⇒ both groups identical ⇒ the
        // statistic is 0/0): define z² = 0, no evidence either way.
        // The guard compares the exact integer counts, not the double
        // p — and Spark ANSI raises on double÷0 rather than IEEE-Inf,
        // so the guard is correctness, not just taste
        when(col("x_a") + col("x_b") === lit(0L) ||
            col("x_a") + col("x_b") === col("n_a") + col("n_b"), lit(0.0))
          .otherwise((diff * diff) /
            (p * (lit(1.0) - p) * (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b")))))
      })
      .withColumn("significant", col("z2") > lit(3.841458820694124))
  }

  /** Chi-square test of independence between two categorical columns.
    * Returns the contingency diagnostics plus the statistic on an
    * integer e2 grid:
    *
    *   per cell: e_q     = (row_n * col_n) div n        (quantized E)
    *             cell_e2 = ((o - e_q)² * 100) div max(1, e_q)
    *   chi2_e2 = Σ cell_e2     — an INTEGER sum, order-invariant
    *
    * All BIGINT floor divisions in fixed order (the BM25 discipline);
    * overflow bound: |o - e_q| ≤ n keeps the numerator ≤ 100·n²,
    * safe to n ~ 3e8 rows per table.
    *
    * Shape at scale: one groupBy over the fact table produces the
    * cell counts (map-side combined — cells are few); the row/column
    * marginals and the total derive from the CELL table (window sums
    * over a tiny frame), never a second scan of the data.
    */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df.groupBy(col(aCol).as("va"), col(bCol).as("vb"))
      .agg(count(lit(1)).as("o"))
    val withMargins = cells
      .withColumn("row_n", sum(col("o")).over(Window.partitionBy(col("va"))))
      .withColumn("col_n", sum(col("o")).over(Window.partitionBy(col("vb"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    withMargins
      .withColumn("e_q", expr("row_n * col_n div n"))
      .withColumn("cell_e2",
        expr("(o - e_q) * (o - e_q) * 100 div greatest(1L, e_q)"))
      .agg(
        sum(col("cell_e2")).cast("bigint").as("chi2_e2"),
        count(lit(1)).cast("bigint").as("cells"),
        max(col("n")).cast("bigint").as("n"))
  }
}
