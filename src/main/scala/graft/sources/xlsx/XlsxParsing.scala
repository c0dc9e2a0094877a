package graft.sources.xlsx

import java.io.InputStream
import java.util.zip.ZipFile
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable.ArrayBuffer

/** Streaming (StAX) XLSX parsing over the OOXML zip container — the
  * Spark-side replacement for the reference's whole-workbook-in-memory
  * calamine load (/root/reference/src/main.rs:49-85). Only the shared-
  * strings table is materialized; sheet rows are streamed, so a worker
  * never holds a full sheet in memory.
  */
object XlsxParsing {

  /** One parsed cell value: raw string + whether the cell was numeric. */
  final case class Cell(value: String, numeric: Boolean)

  private def xmlReader(in: InputStream): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(in)
  }

  /** Sheet name → worksheet zip entry, resolving workbook.xml sheet ids
    * through the relationships part. */
  def sheetEntries(zip: ZipFile): Seq[(String, String)] = {
    val rels = {
      val entry = zip.getEntry("xl/_rels/workbook.xml.rels")
      val r = xmlReader(zip.getInputStream(entry))
      val m = scala.collection.mutable.Map[String, String]()
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT &&
            r.getLocalName == "Relationship")
          m(r.getAttributeValue(null, "Id")) =
            r.getAttributeValue(null, "Target")
      }
      r.close(); m.toMap
    }
    val out = ArrayBuffer[(String, String)]()
    val r = xmlReader(zip.getInputStream(zip.getEntry("xl/workbook.xml")))
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        val name = r.getAttributeValue(null, "name")
        val rid = (0 until r.getAttributeCount)
          .find(i => r.getAttributeLocalName(i) == "id")
          .map(r.getAttributeValue).getOrElse("")
        val target = rels.getOrElse(rid, "worksheets/sheet1.xml")
        val path = if (target.startsWith("/")) target.drop(1) else "xl/" + target
        out += name -> path
      }
    }
    r.close()
    out.toSeq
  }

  /** Shared strings table (index → string). */
  def sharedStrings(zip: ZipFile): IndexedSeq[String] = {
    val entry = zip.getEntry("xl/sharedStrings.xml")
    if (entry == null) return IndexedSeq.empty
    val r = xmlReader(zip.getInputStream(entry))
    val out = ArrayBuffer[String]()
    val sb = new StringBuilder
    var inT = false
    var depth = 0
    while (r.hasNext) r.next() match {
      case XMLStreamConstants.START_ELEMENT =>
        r.getLocalName match {
          case "si" => sb.clear(); depth += 1
          case "t"  => inT = true
          case _    =>
        }
      case XMLStreamConstants.CHARACTERS if inT => sb.append(r.getText)
      case XMLStreamConstants.END_ELEMENT =>
        r.getLocalName match {
          case "si" => out += sb.toString
          case "t"  => inT = false
          case _    =>
        }
      case _ =>
    }
    r.close()
    out.toIndexedSeq
  }

  /** "BC7" → zero-based column index 54. */
  def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** Stream rows of one worksheet as sparse (colIdx → Cell) maps.
    * Caller closes over the iterator fully before closing the zip. */
  def rows(zip: ZipFile, sheetPath: String,
           shared: IndexedSeq[String]): Iterator[Map[Int, Cell]] = {
    val r = xmlReader(zip.getInputStream(zip.getEntry(sheetPath)))
    new Iterator[Map[Int, Cell]] {
      private var nextRow: Map[Int, Cell] = _
      private var done = false
      advance()

      private def advance(): Unit = {
        nextRow = null
        var cells = scala.collection.mutable.Map[Int, Cell]()
        var inRow = false
        var cellRef = ""; var cellType = ""; var inV = false; var inIs = false
        val sb = new StringBuilder
        while (nextRow == null && !done) {
          if (!r.hasNext) { done = true; r.close() }
          else r.next() match {
            case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
              case "row" => inRow = true; cells.clear()
              case "c" if inRow =>
                cellRef = Option(r.getAttributeValue(null, "r")).getOrElse("")
                cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              case "v" if inRow => inV = true; sb.clear()
              case "is" if inRow => inIs = true
              case "t" if inIs => inV = true; sb.clear()
              case _ =>
            }
            case XMLStreamConstants.CHARACTERS if inV => sb.append(r.getText)
            case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
              case "row" =>
                inRow = false
                nextRow = cells.toMap
              case "c" if inRow => cellRef = ""; cellType = "n"
              case "v" | "t" if inV =>
                inV = false
                val raw = sb.toString
                val idx = colIndex(cellRef)
                if (idx >= 0) {
                  val cell = cellType match {
                    case "s" =>
                      // tolerate a malformed/empty shared-string index —
                      // one bad cell must not fail the whole partition
                      val v = raw.trim.toIntOption
                        .filter(i => i >= 0 && i < shared.length)
                        .map(shared).getOrElse("")
                      Cell(v, numeric = false)
                    case "str" | "inlineStr" => Cell(raw, numeric = false)
                    case "b" => Cell(if (raw.trim == "1") "true" else "false", numeric = false)
                    case _ => Cell(raw.trim, numeric = true)
                  }
                  cells(idx) = cell
                }
              case "is" => inIs = false
              case _ =>
            }
            case _ =>
          }
        }
      }

      def hasNext: Boolean = nextRow != null
      def next(): Map[Int, Cell] = {
        val out = nextRow; advance(); out
      }
    }
  }
}
