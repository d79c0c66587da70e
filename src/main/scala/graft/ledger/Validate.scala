package graft.ledger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.LedgerFunctions.blankToNull

/** Batch validation (reference app/app.py:25-62): a contract check on
  * the column set, then a null audit over the required columns with
  * ''/whitespace treated as null. The reference reports per-row,
  * per-column violations and hard-stops the upload; we return the
  * violations as a DataFrame (distributed — never collected unless the
  * caller asks) and let the caller decide strict vs permissive.
  */
object Validate {

  final case class Result(missingColumns: Seq[String], violations: DataFrame) {
    def ok(): Boolean = missingColumns.isEmpty && violations.isEmpty
  }

  /** Normalize blanks to null on the required columns (app/app.py:34-36).
    * Other columns pass through untouched.
    */
  def normalizeBlanks(df: DataFrame): DataFrame = {
    val present = df.columns.toSet
    Schemas.requiredColumns.filter(present).foldLeft(df)(
      (d, c) => d.withColumn(c, blankToNull(col(c))))
  }

  /** Contract + null audit. `violations` has one row per offending
    * (row, column): (linha BIGINT, coluna STRING) — mirroring the
    * reference's error report shape (app/app.py:53-59). Row numbers are
    * assigned by input file order via a monotonic id over the scan; they
    * identify rows for the report, nothing downstream depends on them.
    */
  def apply(df: DataFrame): Result = {
    val missing = Schemas.requiredColumns.filterNot(df.columns.contains)
    if (missing.nonEmpty)
      return Result(missing, df.sparkSession.emptyDataFrame)
    val normalized = normalizeBlanks(df)
    val withId = normalized.withColumn("__linha", monotonically_increasing_id())
    val perCol = Schemas.requiredColumns.map(c =>
      when(col(c).isNull, lit(c)))
    val violations = withId
      .withColumn("coluna", explode(array_compact(array(perCol: _*))))
      .select(col("__linha").as("linha"), col("coluna"))
    Result(Seq.empty, violations)
  }
}
