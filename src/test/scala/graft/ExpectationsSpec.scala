package graft

import org.apache.spark.sql.functions.col

import graft.operators.Expectations
import graft.operators.Expectations._

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def child = Seq(
    (Some(1L), Some(10L), "A", "ok-1"),
    (Some(2L), Some(10L), "A", "ok-2"),
    (Some(2L), Some(99L), "B", "bad format"), // dup id, orphan parent
    (None, Some(10L), "C", "ok-3"),           // null id, bad status
    (Some(4L), None, "A", "ok-4"),            // null parent: NOT a ref violation
    (Some(5L), Some(11L), "A", "ok-5")
  ).toDF("id", "pid", "status", "note")

  private def parent = Seq(10L, 11L).toDF("k")

  test("all rule kinds count planted violations exactly") {
    val got = Expectations.check(child, Seq(
      NotNull("id_not_null", "id"),
      InRange("id_range", "id", 1L, 4L),
      InSet("status_ok", "status", Seq("A", "B")),
      Matches("note_format", "note", "^ok-[0-9]$"),
      Unique("id_unique", Seq("id")),
      RefIntegrity("pid_ref", "pid", parent, "k")))
      .as[(String, Long)].collect().toMap
    assert(got === Map(
      "id_not_null" -> 1L,  // the None id
      "id_range" -> 1L,     // id 5 (nulls are NotNull's business)
      "status_ok" -> 1L,    // the C row
      "note_format" -> 1L,  // "bad format"
      "id_unique" -> 1L,    // one surplus row for id 2
      "pid_ref" -> 1L))     // pid 99 (null pid not counted)
  }

  test("clean table reports zero for every rule") {
    val got = Expectations.check(child.filter(col("id") <= 1), Seq(
      NotNull("id_not_null", "id"),
      Unique("id_unique", Seq("id")),
      RefIntegrity("pid_ref", "pid", parent, "k")))
      .as[(String, Long)].collect().toMap
    assert(got === Map("id_not_null" -> 0L, "id_unique" -> 0L, "pid_ref" -> 0L))
  }

  test("row-level rules fold into a single aggregate pass") {
    val df = Expectations.check(child, Seq(
      NotNull("a", "id"), InRange("b", "id", 1L, 4L), InSet("c", "status", Seq("A"))))
    // one row per rule, and the row-level part is one plan (no union)
    assert(df.count() === 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Union"), "row-only suite must not union per-rule scans")
  }

  test("duplicate rule names are rejected") {
    intercept[IllegalArgumentException] {
      Expectations.check(child, Seq(NotNull("x", "id"), Unique("x", Seq("id"))))
    }
  }
}
