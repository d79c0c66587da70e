package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ledger.{Ingest, Schemas}
import graft.sources.Xlsx

/** Minimal xlsx source (S2): ZIP+StAX parse, header-by-name mapping,
  * ledger parity with the CSV path. Fixtures are written by
  * [[XlsxSpec.workbook]] with the same part layout openpyxl emits
  * (sharedStrings + sheet1, `r`-attributed cells).
  */
class XlsxSpec extends SparkSpec {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Build an xlsx: `cells` are (ref, xmlFragment) pairs per row, where
    * the fragment is the full `<c .../>` element; `shared` fills
    * xl/sharedStrings.xml. */
  private def workbook(rows: Seq[Seq[String]], shared: Seq[String],
                       extraEntries: Map[String, String] = Map.empty): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook><sheets><sheet name="S" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    if (shared.nonEmpty)
      entry("xl/sharedStrings.xml",
        s"""<?xml version="1.0"?><sst count="${shared.length}" uniqueCount="${shared.length}">""" +
          shared.map(s => s"<si><t>${esc(s)}</t></si>").mkString + "</sst>")
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet><sheetData>""" +
        rows.zipWithIndex.map { case (cells, i) =>
          s"""<row r="${i + 1}">${cells.mkString}</row>"""
        }.mkString + "</sheetData></worksheet>")
    extraEntries.foreach { case (n, b) => entry(n, b) }
    z.close()
    bos.toByteArray
  }

  /** Shared-string cell / inline cell / numeric cell fragments. */
  private def ss(ref: String, i: Int) = s"""<c r="$ref" t="s"><v>$i</v></c>"""
  private def in(ref: String, t: String) =
    s"""<c r="$ref" t="inlineStr"><is><t>${esc(t)}</t></is></c>"""
  private def num(ref: String, v: String) = s"""<c r="$ref"><v>$v</v></c>"""

  test("shared strings, inline strings, numerics, gaps, empty cells") {
    val wb = workbook(
      rows = Seq(
        Seq(ss("A1", 0), ss("B1", 1), ss("C1", 2)),
        Seq(ss("A2", 3), num("B2", "42.5"), in("C2", "inline <&> text")),
        Seq(num("A3", "7"), s"""<c r="C3" t="s"><v>4</v></c>"""), // B3 absent
        Seq(s"""<c r="A4"/>""", num("B4", "0"))),                 // A4 empty, C4 absent
      shared = Seq("name", "amount", "note", "ana", "last"))
    val parsed = Xlsx.parseWorkbook(wb)
    assert(parsed == Seq(
      Seq(Some("name"), Some("amount"), Some("note")),
      Seq(Some("ana"), Some("42.5"), Some("inline <&> text")),
      Seq(Some("7"), None, Some("last")),
      Seq(None, Some("0"), None)))
  }

  test("rich-text shared strings concatenate their runs") {
    val sst =
      """<?xml version="1.0"?><sst><si><r><t>Sal</t></r><r><t>ário</t></r></si></sst>"""
    val wb = workbook(
      rows = Seq(Seq(ss("A1", 0))), shared = Seq.empty,
      extraEntries = Map("xl/sharedStrings.xml" -> sst))
    assert(Xlsx.parseWorkbook(wb) == Seq(Seq(Some("Salário"))))
  }

  test("cells without r attributes advance column-by-column") {
    val wb = workbook(
      rows = Seq(
        Seq("""<c t="inlineStr"><is><t>a</t></is></c>""",
          """<c t="inlineStr"><is><t>b</t></is></c>"""),
        Seq("""<c r="B2"><v>9</v></c>""",
          """<c><v>10</v></c>""")), // successor of B2 → C2
      shared = Seq.empty)
    assert(Xlsx.parseWorkbook(wb) == Seq(
      Seq(Some("a"), Some("b"), None),
      Seq(None, Some("9"), Some("10"))))
  }

  test("column refs decode base-26 (A, Z, AA, AB, AMJ)") {
    assert(Xlsx.colIndex("A1") == 0)
    assert(Xlsx.colIndex("Z9") == 25)
    assert(Xlsx.colIndex("AA3") == 26)
    assert(Xlsx.colIndex("AB12") == 27)
    assert(Xlsx.colIndex("AMJ1") == 1023)
  }

  test("read: header-by-name mapping, extra columns dropped, absent → NULL") {
    val dir = Files.createTempDirectory("xlsx").toString
    val wb = workbook(
      rows = Seq(
        Seq(in("A1", "extra"), in("B1", "k"), in("C1", "v")),
        Seq(in("A2", "zz"), num("B2", "1"), in("C2", "x")),
        Seq(in("A3", "yy"), num("B3", "2"))),
      shared = Seq.empty)
    val out = new FileOutputStream(s"$dir/t.xlsx"); out.write(wb); out.close()
    val schema = StructType(Seq(
      StructField("k", StringType), StructField("v", StringType),
      StructField("absent", StringType)))
    val got = Xlsx.read(spark, dir, schema)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(("1", "x", null), ("2", null, null)))
  }

  test("read: many files union per-file (the distributed unit)") {
    val dir = Files.createTempDirectory("xlsxmany").toString
    for (i <- 1 to 3) {
      val wb = workbook(
        rows = Seq(Seq(in("A1", "k")), Seq(num("A2", i.toString))),
        shared = Seq.empty)
      val out = new FileOutputStream(s"$dir/f$i.xlsx"); out.write(wb); out.close()
    }
    val schema = StructType(Seq(StructField("k", StringType)))
    val got = Xlsx.read(spark, dir, schema).collect().map(_.getString(0)).toSet
    assert(got == Set("1", "2", "3"))
  }

  test("ledger parity: xlsx upload == csv upload (id_hash and all)") {
    // the S2 scenario the reference UI would produce: the same monthly
    // ledger, uploaded as a workbook instead of a CSV — staging output
    // (incl. the raw-bytes MD5 id_hash) must be identical
    val header = Schemas.requiredColumns
    val data = Seq(
      Seq("Salário mensal", "Receita", "Trabalho", "Salário", "Fixo", "01/2025", "12.345,67"),
      Seq("Aluguel escritório", "Despesa", "Moradia", "Aluguel", "Fixo", "01/2025", "2.500,00"),
      Seq("Jantar cliente", "Despesa", "Alimentação", "Restaurante", "Variável", "01/2025", "189,90"))
    val dir = Files.createTempDirectory("xlsxledger").toString
    // csv twin
    val csv = (header.mkString(",") +: data.map(_.map(v =>
      if (v.contains(",")) "\"" + v + "\"" else v).mkString(","))).mkString("\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/l.csv"), csv)
    // xlsx: all strings through sharedStrings, like openpyxl writes
    val shared = (header ++ data.flatten).distinct
    val rows = (header +: data).zipWithIndex.map { case (r, i) =>
      r.zipWithIndex.map { case (v, c) =>
        ss(s"${('A' + c).toChar}${i + 1}", shared.indexOf(v))
      }
    }
    val out = new FileOutputStream(s"$dir/l.xlsx")
    out.write(workbook(rows, shared)); out.close()

    val viaCsv = Ingest.toStaging(Ingest.readCsv(spark, s"$dir/l.csv"))
    val viaXlsx = Ingest.toStaging(Xlsx.read(spark, s"$dir/l.xlsx", Schemas.csvSchema))
    assert(viaCsv.schema == viaXlsx.schema)
    val a = viaCsv.collect().map(_.toSeq).toSet
    val b = viaXlsx.collect().map(_.toSeq).toSet
    assert(a == b && a.size == 3)
  }

  test("rejects non-workbook zips and non-string schemas") {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    z.putNextEntry(new ZipEntry("hello.txt")); z.write("hi".getBytes); z.closeEntry(); z.close()
    intercept[IllegalArgumentException] { Xlsx.parseWorkbook(bos.toByteArray) }
    intercept[IllegalArgumentException] {
      Xlsx.read(spark, "/tmp", StructType(Seq(StructField("n",
        org.apache.spark.sql.types.LongType))))
    }
  }
}
