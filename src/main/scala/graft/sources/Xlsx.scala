package graft.sources

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import scala.collection.mutable.ArrayBuffer

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal `.xlsx` source — the reference's latent Excel ingest (S2).
  *
  * The reference pins openpyxl (reference `app/requirements.txt:6`) but
  * its UI only ever reads CSV (`app/app.py:17`, `type=["csv"]`); this
  * closes the one latent input path with zero new dependencies: an
  * `.xlsx` workbook is a ZIP of XML parts, parsed here with
  * `java.util.zip` + the JDK's StAX. Supported surface — deliberately
  * the subset a pandas/openpyxl- or Excel-written single-sheet ledger
  * workbook uses:
  *
  *   - first worksheet (`xl/worksheets/sheetN.xml`, lowest N),
  *   - shared strings (`t="s"`, incl. rich-text runs concatenated),
  *     inline strings (`t="inlineStr"`), formula-cached strings
  *     (`t="str"`), and raw numeric text,
  *   - sparse rows (missing cells and gap columns → NULL),
  *   - first row = header, matched to the declared schema BY NAME
  *     (extra workbook columns are dropped, absent ones are NULL).
  *
  * All values surface as raw STRINGS, like the CSV reader
  * ([[graft.ledger.Ingest.readCsv]]): the ledger contract hashes
  * pre-normalization bytes, so no numeric/date coercion happens at
  * read. Date-styled numeric cells are NOT converted from Excel serial
  * dates (the ledger `Data` column ships as a string; style-table
  * parsing is out of scope).
  *
  * Scale shape: one workbook is ONE task's work (ZIP is not
  * splittable), so the distributed unit is the FILE — `binaryFile`
  * scan, then a typed flatMap parses each workbook on an executor.
  * Many-file ingest parallelizes per file; a single 100 MB workbook is
  * a single-task parse, which is the format's own bound (same contract
  * as every xlsx reader). The parse is streaming (StAX, one pass, no
  * DOM), so memory is O(row + shared-string table).
  */
object Xlsx {

  /** Read every `*.xlsx` under `path` into one DataFrame with the
    * declared all-string `schema`, header-matched by name. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(schema.fields.forall(_.dataType.typeName == "string"),
      "Xlsx.read surfaces raw strings; declare an all-string schema " +
        "and cast downstream (the ledger hash needs pre-normalization bytes)")
    val names = schema.fieldNames.toSeq
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx").load(path)
      .select("content").as(Encoders.BINARY)
    val rows = bin.flatMap { bytes =>
      val all = parseWorkbook(bytes)
      if (all.isEmpty) Iterator.empty
      else {
        val header = all.head.map(_.orNull)
        val idx = names.map(n => header.indexOf(n))
        all.tail.iterator.map { cells =>
          Row.fromSeq(idx.map(i =>
            if (i >= 0 && i < cells.length) cells(i).orNull else null))
        }
      }
    }(Encoders.row(schema))
    rows.toDF()
  }

  /** Parse one workbook's first sheet: rows of cells by column index,
    * `None` for absent cells. Row 0 is the sheet's first populated row
    * (the header, under the reference's contract). */
  def parseWorkbook(bytes: Array[Byte]): Seq[Seq[Option[String]]] = {
    val parts = zipEntries(bytes)
    val sheetName = parts.keys
      .filter(n => n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml"))
      .minByOption(n => n.stripPrefix("xl/worksheets/sheet").stripSuffix(".xml")
        .toIntOption.getOrElse(Int.MaxValue))
      .getOrElse(throw new IllegalArgumentException(
        "not an xlsx workbook: no xl/worksheets/sheet*.xml entry"))
    val shared = parts.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    parseSheet(parts(sheetName), shared)
  }

  /** Only the parts the parser needs, loaded in one streaming pass —
    * entry order in the ZIP is not guaranteed (sharedStrings can
    * follow the sheet), so random access via a map beats two passes. */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e = zin.getNextEntry
    while (e != null) {
      val n = e.getName
      if (n == "xl/sharedStrings.xml" ||
          (n.startsWith("xl/worksheets/sheet") && n.endsWith(".xml")))
        out += n -> zin.readAllBytes()
      e = zin.getNextEntry
    }
    out.result()
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // workbook XML is data, not a document to resolve: no DTDs, no
    // external entities (XXE hardening for untrusted uploads)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  /** `<si>` entries; rich-text runs (`<r><t>..</t></r>`) concatenate. */
  private def parseSharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val r = xmlReader(bytes)
    val out = IndexedSeq.newBuilder[String]
    var sb: StringBuilder = null
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
            sb = new StringBuilder
          case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" && sb != null =>
            sb.append(r.getElementText)
          case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
            out += sb.toString; sb = null
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  /** "AB" → 27 (0-based: 1*26 + 2 - 1). */
  private[graft] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  private def parseSheet(bytes: Array[Byte],
                         shared: IndexedSeq[String]): Seq[Seq[Option[String]]] = {
    val r = xmlReader(bytes)
    val rows = ArrayBuffer.empty[Seq[Option[String]]]
    var row: ArrayBuffer[Option[String]] = null
    var cellCol = -1          // column of the open <c>, -1 when closed
    var cellType = ""
    var cellValue: Option[String] = None
    def put(col: Int, v: Option[String]): Unit = {
      while (row.length <= col) row += None
      row(col) = v
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = ArrayBuffer.empty
            case "c" if row != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              // no r attribute → next column after the previous cell
              cellCol = ref.map(colIndex).getOrElse(
                row.length max (cellCol + 1))
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              cellValue = None
            case "v" if cellCol >= 0 =>
              val raw = r.getElementText
              cellValue = Some(cellType match {
                case "s" =>
                  val i = raw.trim.toInt
                  if (i >= 0 && i < shared.length) shared(i)
                  else throw new IllegalArgumentException(
                    s"shared-string index $i out of bounds (${shared.length})")
                case _ => raw // n / str / b / e: surface the raw text
              })
            case "t" if cellCol >= 0 && cellType == "inlineStr" =>
              cellValue = Some(cellValue.getOrElse("") + r.getElementText)
            case _ => ()
          }
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "c" if row != null && cellCol >= 0 =>
              if (cellValue.isDefined) put(cellCol, cellValue)
              cellValue = None
              // keep cellCol for the no-r-attribute successor rule
            case "row" if row != null =>
              rows += row.toSeq; row = null; cellCol = -1
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    // normalize ragged rows to the max width so by-index access is safe
    val w = if (rows.isEmpty) 0 else rows.map(_.length).max
    rows.toSeq.map(r => r ++ Seq.fill(w - r.length)(None))
  }
}
