package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Bpe
import org.apache.spark.sql.functions.col

/** Offline trainer for the [[graft.operators.Bpe.pretrained]] artifact:
  * prints the merges table (Scala literal form) trained on a corpus.
  *
  * Usage: `TrainBpe [sfDir] [nMerges]` — defaults to the sf0.01
  * documents corpus, 48 merges. Deterministic: same corpus → same
  * table, byte for byte (aggregation order cannot leak into the result
  * because the collected word-frequency table is sorted before the
  * merge loop and ties break lexicographically).
  */
object TrainBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val n = args.drop(1).headOption.map(_.toInt).getOrElse(48)
    val spark = GraftSession.local()
    val merges = Bpe.trainOnCorpus(Tables(spark, dir, "documents"), col("text"), n)
    println(merges.map { case (l, r) => s"""("$l", "$r")""" }
      .grouped(4).map(_.mkString(", ")).mkString(",\n    "))
    spark.stop()
  }
}
