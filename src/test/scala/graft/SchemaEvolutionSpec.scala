package graft

import java.nio.file.Files

import graft.ledger.Catalog

/** Add-column schema evolution: metadata-only version bump, initial
  * defaults for pre-evolution commits, post-evolution NULLs preserved,
  * time travel under the schema of its day. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def freshCat() = {
    val dir = Files.createTempDirectory("cat_evolve").toString
    new Catalog(spark, s"$dir/wh")
  }

  test("addColumn backfills old commits with the default, new commits keep their values") {
    val cat = freshCat()
    cat.replace("t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))  // v1
    cat.addColumn("t", "score", "BIGINT", default = Some("0"))      // v2, metadata-only
    // post-evolution append: one real value, one genuine NULL
    cat.appendDelta("t", Seq((3L, "c", Some(7L)), (4L, "d", None))
      .toDF("id", "name", "score"))                                 // v3
    val rows = cat.table("t").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, "a", Some(0L)), // pre-evolution rows: initial default
      (2L, "b", Some(0L)),
      (3L, "c", Some(7L)), // written value
      (4L, "d", None)))    // post-evolution NULL stays NULL — never coalesced
  }

  test("no default: old rows read as NULL") {
    val cat = freshCat()
    cat.replace("t", Seq((1L, "a")).toDF("id", "name"))
    cat.addColumn("t", "tag", "STRING")
    assert(cat.table("t").as[(Long, String, Option[String])].collect()
      .toSeq === Seq((1L, "a", None)))
  }

  test("time travel: pre-evolution versions keep the old shape, later ones the new") {
    val cat = freshCat()
    cat.replace("t", Seq((1L, "a")).toDF("id", "name"))             // v1
    cat.addColumn("t", "score", "BIGINT", default = Some("42"))     // v2
    assert(cat.tableAt("t", 1).columns.toSeq === Seq("id", "name"))
    assert(cat.tableAt("t", 2).columns.toSeq === Seq("id", "name", "score"))
    assert(cat.tableAt("t", 2).selectExpr("score").as[Long].collect().toSeq === Seq(42L))
  }

  test("second evolution carries the first's default forward") {
    val cat = freshCat()
    cat.replace("t", Seq((1L, "a")).toDF("id", "name"))
    cat.addColumn("t", "score", "BIGINT", default = Some("5"))
    cat.addColumn("t", "lang", "STRING", default = Some("'pt'"))
    val r = cat.table("t").as[(Long, String, Long, String)].collect()
    assert(r.toSeq === Seq((1L, "a", 5L, "pt")))
  }

  test("duplicate column and missing table are rejected loudly") {
    val cat = freshCat()
    intercept[IllegalArgumentException] { cat.addColumn("nope", "x", "BIGINT") }
    cat.replace("t", Seq((1L, "a")).toDF("id", "name"))
    intercept[IllegalArgumentException] { cat.addColumn("t", "NAME", "STRING") }
  }

  test("evolution survives a subsequent compact: defaults materialize into the rewrite") {
    val cat = freshCat()
    cat.replace("t", Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    cat.addColumn("t", "score", "BIGINT", default = Some("9"))
    cat.appendDelta("t", Seq((3L, "c", 1L)).toDF("id", "name", "score"))
    cat.compact("t")
    val rows = cat.table("t").as[(Long, String, Option[Long])]
      .collect().sortBy(_._1)
    assert(rows.toSeq === Seq(
      (1L, "a", Some(9L)), (2L, "b", Some(9L)), (3L, "c", Some(1L))))
  }
}
