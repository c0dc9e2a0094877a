package graft

import java.nio.file.Files
import graft.repl.{SqlRepl, TableFormat}

class ReplSpec extends TestSpark {

  test("cell formatting matches the reference display rules") {
    assert(TableFormat.cell(null) === "NULL")
    assert(TableFormat.cell(1234567L) === "1,234,567")
    assert(TableFormat.cell(1234567.25) === "1,234,567.25")
    assert(TableFormat.cell(-9876543) === "-9,876,543")
    assert(TableFormat.cell(Array[Byte](1, 2)) === "BLOB")
    assert(TableFormat.cell("plain") === "plain")
  }

  test("splitExport parses the |out= suffix") {
    assert(SqlRepl.splitExport("select 1") === ("select 1", None))
    assert(SqlRepl.splitExport("select * from t; |out=/tmp/x.csv") ===
      ("select * from t;", Some("/tmp/x.csv")))
  }

  test("loop: renders results, survives bad SQL, honors quit and EOF") {
    import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
    def run(input: String): String = {
      val bos = new ByteArrayOutputStream()
      new SqlRepl(spark, new PrintStream(bos, true, "UTF-8"))
        .loop(new BufferedReader(new StringReader(input)))
      bos.toString("UTF-8")
    }
    val out = run("SELECT 1 AS x\nSELECT * FROM bogus_t\nSELECT 2 AS y\nquit\n")
    assert(out.contains("| x |") && out.contains("| 1 |"))
    assert(out.contains("Error:"))
    assert(out.contains("| y |"))        // loop survived the error
    val eof = run("SELECT 3 AS z\n")     // EOF without quit
    assert(eof.contains("| 3 |"))
  }

  test("runLine renders a query and exports comma-stripped csv") {
    Tables.registerAll(spark, sfDir)
    val out = Files.createTempFile("repl", ".csv").toString
    val repl = new SqlRepl(spark)
    val rendered = repl.runLine(
      "SELECT r_name, count(*) AS cnt FROM region GROUP BY r_name " +
        s"ORDER BY r_name |out=$out")
    assert(rendered.contains("r_name"))
    assert(rendered.startsWith("+"))
    val csv = Files.readString(java.nio.file.Paths.get(out)).trim.split("\n")
    assert(csv.head === "r_name,cnt")
    assert(csv.length === 6) // header + 5 regions
  }

  test("thousands separators render in the table and strip in the export") {
    Tables.registerAll(spark, sfDir)
    val out = Files.createTempFile("repl2", ".csv").toString
    val repl = new SqlRepl(spark)
    val rendered = repl.runLine(
      s"SELECT count(*) AS n FROM lineitem |out=$out")
    assert(rendered.contains(","))  // 6,005-ish formatted
    val body = Files.readString(java.nio.file.Paths.get(out))
    assert(!body.split("\n")(1).contains(","))
  }
}
