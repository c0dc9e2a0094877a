package graft.repl

import java.text.NumberFormat
import java.util.Locale
import org.apache.spark.sql.DataFrame

/** Result rendering with the reference's display semantics
  * (/root/reference/src/main.rs:238-262): boxed table, integers and
  * reals with thousands separators, NULL / BLOB placeholders.
  */
object TableFormat {

  private val intFmt = NumberFormat.getIntegerInstance(Locale.US)

  /** Thousands-separated rendering of one value (main.rs:245-251). */
  def cell(v: Any): String = v match {
    case null                   => "NULL"
    case b: Array[Byte]         => "BLOB"
    case n: Long                => intFmt.format(n)
    case n: Int                 => intFmt.format(n.toLong)
    case n: Short               => intFmt.format(n.toLong)
    case d: Double              => real(d)
    case f: Float               => real(f.toDouble)
    case d: java.math.BigDecimal => real(d.doubleValue())
    case other                  => other.toString
  }

  private def real(d: Double): String = {
    val s = d.toString
    val dot = s.indexOf('.')
    if (dot < 0) s
    else {
      val ip = s.substring(0, dot)
      val neg = ip.startsWith("-")
      val digits = if (neg) ip.drop(1) else ip
      val grouped =
        if (digits.forall(_.isDigit)) intFmt.format(BigInt(digits)) else digits
      (if (neg) "-" else "") + grouped + s.substring(dot)
    }
  }

  /** Render up to `maxRows` rows as an ASCII boxed table. */
  def render(df: DataFrame, maxRows: Int = 1000): String = {
    val header = df.columns.toSeq
    val rows = df.take(maxRows).map(r =>
      (0 until r.length).map(i => cell(r.get(i))))
    renderRows(header, rows.toIndexedSeq)
  }

  def renderRows(header: Seq[String], rows: Seq[Seq[String]]): String = {
    val all = header +: rows
    val widths = header.indices.map(i => all.map(_(i).length).max)
    def line(ch: String = "-") =
      widths.map(w => ch * (w + 2)).mkString("+", "+", "+")
    def fmt(r: Seq[String]) =
      r.zip(widths).map { case (c, w) => " " + c.padTo(w, ' ') + " " }
        .mkString("|", "|", "|")
    (Seq(line(), fmt(header), line()) ++ rows.map(fmt) :+ line()).mkString("\n")
  }
}
