package graft

import org.scalatest.funsuite.AnyFunSuite

/** Testdata-drift probe: footer signatures vs committed expectation. */
class PreflightSpec extends AnyFunSuite {

  test("current testdata matches the committed expectation (all sf dirs)") {
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val diffs = Preflight.diff(
        Preflight.expected(sf), Preflight.signature(s"/root/testdata/$sf"), sf)
      assert(diffs.isEmpty, s"$sf drifted:\n${diffs.mkString("\n")}")
    }
  }

  test("a physical-type flip is reported by table.field name") {
    val act = Preflight.signature("/root/testdata/sf0.001")
    // replay the round-7→8 incident: expectation says MICROS, data says
    // something else → the diff must NAME events.ts, not just fail
    val exp = act.map { t =>
      if (t.table != "events") t
      else t.copy(fields = t.fields.map(f =>
        if (f.contains(" ts ")) f.replace("MICROS", "NANOS") else f))
    }
    val diffs = Preflight.diff(exp, act, "sf0.001")
    assert(diffs.length == 1, diffs.mkString("\n"))
    assert(diffs.head.startsWith("sf0.001/events.ts: physical type changed"),
      diffs.head)
  }

  test("dropped fields, row-count and digest drift are content-classified") {
    val act = Preflight.signature("/root/testdata/sf0.001")
    val exp = act.map { t =>
      if (t.table == "region") t.copy(fields = t.fields :+
        "optional binary r_comment (STRING)")
      else if (t.table == "nation") t.copy(rows = t.rows + 1)
      else if (t.table == "part") t.copy(digest = "00000000")
      else t
    }
    val diffs = Preflight.diff(exp, act, "sf0.001")
    assert(diffs.exists(_.startsWith("sf0.001/region.r_comment: field DROPPED")),
      diffs.mkString("\n"))
    assert(diffs.exists(d => d.startsWith("sf0.001/nation: row count") &&
      d.contains("oracle compare unaffected")), diffs.mkString("\n"))
    assert(diffs.exists(_.startsWith("sf0.001/part: content digest")),
      diffs.mkString("\n"))
  }

  test("missing tables are named; unknown sf dirs skip") {
    val act = Preflight.signature("/root/testdata/sf0.001")
    val exp = act :+ Preflight.TableSig("vanished", Seq("optional int64 x"), 1L, "ff")
    val diffs = Preflight.diff(exp, act, "sf0.001")
    assert(diffs == Seq("sf0.001/vanished: table MISSING from testdata"))
    assert(Preflight.check("/tmp/no-such-sf-dir-xyz").isEmpty)
  }
}
