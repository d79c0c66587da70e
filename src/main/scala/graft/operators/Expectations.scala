package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectation suite — the contract-check
  * face of the engine (the reference validates its upload with a
  * hand-rolled column check, `app/etl.py:44-50`; a warehouse feeding
  * a training pipeline needs the general form: named rules, one
  * violation report, cheap enough to run on every batch).
  *
  * Evaluation cost is the point: every row-level rule folds into ONE
  * aggregate pass over the table (a `sum(when(violated, 1))` per rule
  * inside a single `agg`, unpivoted to long form afterwards — the
  * q110 one-pass-profile discipline), `Unique` adds one groupBy on
  * its key, and `RefIntegrity` adds one anti-join whose parent side
  * is a distinct key projection (broadcast when small). Nothing
  * scans the table more than once per rule *family*, not per rule.
  */
object Expectations {

  sealed trait Rule { def name: String }

  /** Violated by NULL. */
  final case class NotNull(name: String, column: String) extends Rule

  /** Violated by a non-NULL value outside [lo, hi] (NULLs are
    * `NotNull`'s business). */
  final case class InRange(name: String, column: String, lo: Long, hi: Long) extends Rule

  /** Violated by a non-NULL value outside the allowed set. */
  final case class InSet(name: String, column: String, allowed: Seq[String]) extends Rule

  /** Violated by a non-NULL value not matching the anchored regex. */
  final case class Matches(name: String, column: String, regex: String) extends Rule

  /** Violations = surplus rows beyond the first per key (0 when the
    * key is unique). */
  final case class Unique(name: String, columns: Seq[String]) extends Rule

  /** Violations = child rows whose non-NULL key has no parent row. */
  final case class RefIntegrity(name: String, column: String,
                                parent: DataFrame, parentColumn: String) extends Rule

  /** Evaluate all rules; returns `(rule STRING, violations BIGINT)`,
    * one row per rule. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule required")
    require(rules.map(_.name).distinct.size == rules.size, "rule names must be unique")

    def violated(r: Rule): Option[(String, Column)] = r match {
      case NotNull(n, c) => Some(n -> col(c).isNull)
      case InRange(n, c, lo, hi) =>
        Some(n -> (col(c).isNotNull && (col(c) < lo || col(c) > hi)))
      case InSet(n, c, allowed) =>
        Some(n -> (col(c).isNotNull && !col(c).isin(allowed: _*)))
      case Matches(n, c, re) =>
        Some(n -> (col(c).isNotNull && !col(c).rlike(re)))
      case _ => None
    }

    val rowRules = rules.flatMap(violated)
    val rowPart = if (rowRules.isEmpty) None else {
      val aggs = rowRules.map { case (n, cond) =>
        coalesce(sum(when(cond, 1L).otherwise(0L)), lit(0L)).as(n)
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // unpivot the single wide row to (rule, violations) long form
      val stackArgs = rowRules
        .map { case (n, _) => s"'$n', `$n`" }.mkString(", ")
      Some(one.select(expr(
        s"stack(${rowRules.size}, $stackArgs) AS (rule, violations)")))
    }

    val others = rules.collect {
      case Unique(n, cols0) =>
        df.groupBy(cols0.map(col): _*).agg(count(lit(1)).as("c"))
          .filter(col("c") > 1)
          .agg(coalesce(sum(col("c") - 1), lit(0L)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
      case RefIntegrity(n, c, parent, pc) =>
        df.filter(col(c).isNotNull)
          .join(parent.select(col(pc).as(c)).distinct(), Seq(c), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(n).as("rule"), col("violations"))
    }

    (rowPart.toSeq ++ others).reduce(_.unionAll(_))
  }
}
