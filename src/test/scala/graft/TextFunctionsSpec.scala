package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("wsTokenCount handles blanks, nulls, and runs of whitespace") {
    val out = Seq(Some("a  b\tc"), Some("  "), Some(""), None, Some("one"))
      .toDF("t").select(wsTokenCount(col("t"))).as[Int].collect()
    assert(out.toSeq === Seq(3, 0, 0, 0, 1))
  }

  test("langId picks the dominant stopword language, und when none") {
    val out = Seq(
      "the cat sat on the mat and it is fine",
      "der Hund ist nicht mit der Katze und",
      "el perro es un animal que vive en la casa",
      "xyzzy qwerty asdf").toDF("t")
      .select(langId(col("t"))).as[String].collect()
    assert(out.toSeq === Seq("en", "de", "es", "und"))
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val fps = Seq("Hello   World", "hello world", " HELLO WORLD ", "hello worlds")
      .toDF("t").select(fingerprint(col("t"))).as[String].collect()
    assert(fps(0) === fps(1) && fps(1) === fps(2))
    assert(fps(3) !== fps(0))
  }

  test("qualityKeep rejects short docs and punctuation soup") {
    val out = Seq(
      "a good long enough document with words",
      "short one",
      "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))")
      .toDF("t").select(qualityKeep(col("t"))).as[Boolean].collect()
    assert(out.toSeq === Seq(true, false, false))
  }
}
