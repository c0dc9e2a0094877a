package graft.repl

import java.io.{BufferedReader, InputStreamReader, PrintStream}
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sinks.CsvExport
import graft.{GraftSession, Tables}

/** The reference's interactive surface (/root/reference/src/main.rs:
  * 130-177) on Spark SQL: read a line, execute it as SQL, pretty-print
  * with thousands separators, and honor the `<sql> |out=/path.csv`
  * export suffix (commas stripped from displayed values, like
  * main.rs:273-276).
  *
  * Library-first: `runLine` is pure-ish (returns the rendered table) so
  * the REPL loop is a thin stdin/stdout shell and tests drive runLine
  * directly.
  */
final class SqlRepl(spark: SparkSession, out: PrintStream = System.out,
                    maxRows: Int = 1000) {

  /** Execute one REPL line; returns the rendered table text. */
  def runLine(line: String): String = {
    val (sql, exportPath) = SqlRepl.splitExport(line)
    val df = spark.sql(sql)
    val header = df.columns.toSeq
    val rows = df.take(maxRows).map(r =>
      (0 until r.length).map(i => TableFormat.cell(r.get(i))): Seq[String]).toSeq
    val rendered = TableFormat.renderRows(header, rows)
    exportPath.foreach(p => CsvExport.exportRendered(header, rows, p))
    rendered
  }

  def loop(in: BufferedReader): Unit = {
    var line = ""
    while ({ out.print("[SQL] >> "); out.flush(); line = in.readLine(); line != null }) {
      val trimmed = line.trim
      if (trimmed.nonEmpty && trimmed != "exit" && trimmed != "quit") {
        try out.println(runLine(trimmed))
        catch { case e: Exception => out.println(s"Error: ${e.getMessage}") }
      }
      if (trimmed == "exit" || trimmed == "quit") return
    }
  }
}

object SqlRepl {
  /** `select ... |out=/path.csv` → (sql, Some(path)) — main.rs:148-159. */
  def splitExport(line: String): (String, Option[String]) =
    line.split("\\|out=", 2) match {
      case Array(sql, path) => (sql.trim, Some(path.trim))
      case _                => (line.trim, None)
    }

  /** Entry point: `runMain graft.repl.SqlRepl <dataDir>` registers the
    * standard tables as views and starts the prompt. */
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local()
    Tables.registerAll(spark, dir)
    new SqlRepl(spark).loop(new BufferedReader(new InputStreamReader(System.in)))
    spark.stop()
  }
}
