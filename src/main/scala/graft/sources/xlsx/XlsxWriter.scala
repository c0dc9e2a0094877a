package graft.sources.xlsx

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal single-sheet XLSX writer (driver-side utility + test
  * fixture generator). Uses inline strings so no shared-strings table
  * is needed. Not a distributed sink — the engine's scale output paths
  * are parquet/csv/jdbc; xlsx is an interchange format.
  */
object XlsxWriter {

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** Write rows (header + data) to `path` as sheet `sheetName`. Cells
    * that are numbers are written as numeric cells, everything else as
    * inline strings. */
  def write(path: String, sheetName: String, rows: Seq[Seq[Any]]): Unit = {
    val zos = new ZipOutputStream(new FileOutputStream(path))
    def entry(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${esc(sheetName)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)

    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { sb.insert(0, ('A' + (n - 1) % 26).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val body = rows.zipWithIndex.map { case (row, ri) =>
      val cells = row.zipWithIndex.map { case (v, ci) =>
        val ref = s"${colRef(ci)}${ri + 1}"
        v match {
          case n: Int    => s"""<c r="$ref"><v>$n</v></c>"""
          case n: Long   => s"""<c r="$ref"><v>$n</v></c>"""
          case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
          case null      => ""
          case s         => s"""<c r="$ref" t="inlineStr"><is><t>${esc(s.toString)}</t></is></c>"""
        }
      }.mkString
      s"""<row r="${ri + 1}">$cells</row>"""
    }.mkString
    entry("xl/worksheets/sheet1.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData>$body</sheetData>
         |</worksheet>""".stripMargin)
    zos.close()
  }
}
