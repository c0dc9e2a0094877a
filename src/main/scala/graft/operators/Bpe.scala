package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer: a deterministic trainer plus a
  * row-local encoder (t14) — the real-tokenizer upgrade over t06's
  * letter/digit/symbol-run approximation.
  *
  * Reference scope: the reference engine (/root/reference/src/main.rs,
  * whole file) has no tokenizer; this is part of the training-data
  * surface the brief adds. Shape follows the classic BPE algorithm
  * (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
  * with Subword Units"), re-expressed for Spark:
  *
  *  - TRAINING is a corpus-wide word-frequency aggregation (map-side
  *    combining `groupBy(word).count` — the only distributed step)
  *    followed by a driver-side merge loop over the aggregated
  *    vocabulary. That split is the honest 100 TB design, not a
  *    shortcut: pair statistics are a function of the word-frequency
  *    table alone, which is vocabulary-sized (≪ corpus-sized), and
  *    every production tokenizer trainer works off exactly this
  *    aggregate.
  *
  *  - APPLICATION is embarrassingly row-local: the merges table rides
  *    into each task as a plan literal (reference object on the
  *    codegen'd expression — [[graft.functions.BpeFunctions.bpeEncode]]),
  *    each word encodes independently with a per-task memo cache, and
  *    the corpus never shuffles. A tokenizer is a versioned artifact:
  *    t14 applies [[Bpe.pretrained]] (trained once, offline, by
  *    `graft.tools.TrainBpe` — deterministic seed-free training on the
  *    sf0.01 corpus) so the same table is a literal in both the Spark
  *    plan and the DuckDB oracle.
  *
  * Merge semantics (identical in trainer, encoder, and the recursive
  * SQL oracle): repeatedly pick the lowest-rank merge whose pair
  * occurs adjacently, then merge ALL its occurrences in one
  * left-to-right non-overlapping pass; stop when no table pair
  * occurs. For a genuinely BPE-trained table any pair involving a
  * merged token ranks after the merges that created it, so this fixed
  * point equals the per-occurrence greedy of the original algorithm.
  */
object Bpe {

  /** Lowercase-word pre-tokenizer shared by trainer, encoder and the
    * oracle SQL: maximal `[a-z]+` runs of `lower(text)`. */
  val WordPattern = "[a-z]+"

  /** One left-to-right non-overlapping merge-all pass of `(l, r)`. */
  private[graft] def mergeAll(toks: Array[String], l: String,
                              r: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](toks.length)
    var i = 0
    while (i < toks.length) {
      if (i < toks.length - 1 && toks(i) == l && toks(i + 1) == r) {
        out += l + r; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toArray
  }

  /** Driver-side BPE training over an aggregated word-frequency table.
    * Deterministic: the next merge is the adjacent pair with the
    * highest frequency-weighted count, ties broken by the
    * lexicographically smallest (left, right). Stops early when no
    * pair repeats (count < 2) — merging a once-seen pair is noise. */
  def train(words: Seq[(String, Long)], nMerges: Int): Seq[(String, String)] = {
    var vocab = words.map { case (w, c) => (w.map(_.toString).toArray, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < nMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (toks, c) =>
        var j = 0
        while (j < toks.length - 1) {
          val p = (toks(j), toks(j + 1))
          counts.update(p, counts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      val best = counts.filter(_._2 >= 2L)
      if (best.isEmpty) continue = false
      else {
        val ((l, r), _) = best.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r))
        vocab = vocab.map { case (toks, c) => (mergeAll(toks, l, r), c) }
      }
    }
    merges.toSeq
  }

  /** The distributed step: corpus → word-frequency table (map-side
    * combining aggregation), pruned to words seen at least `minCount`
    * times BEFORE anything reaches the driver. The prune is what
    * bounds the collected model at 100 TB: corpus vocabulary grows
    * with corpus size and its growth is dominated by the count-1 tail
    * (typos, hashes, serial numbers — heaps'-law singletons), so an
    * unpruned collect is a linear-growth driver object while the
    * `minCount >= 2` table grows orders slower. This is the standard
    * trainer knob (SentencePiece/HF `min_frequency`); the trade is
    * explicit and tiny — a pair occurring only across pruned
    * singleton words can no longer reach a merge, which for
    * `minCount = 2` means pairs whose total weighted count comes
    * entirely from distinct one-off words. */
  def wordCounts(docs: DataFrame, textCol: Column,
                 minCount: Long = 2): DataFrame =
    docs.select(explode(regexp_extract_all(lower(textCol),
        lit(WordPattern), lit(0))).as("w"))
      .groupBy("w").count()
      .filter(col("count") >= minCount)

  /** Train on a corpus: aggregate word frequencies (distributed,
    * `minCount`-pruned), collect the bounded table, run the merge
    * loop on the driver. */
  def trainOnCorpus(docs: DataFrame, textCol: Column,
                    nMerges: Int, minCount: Long = 2): Seq[(String, String)] = {
    val wc = wordCounts(docs, textCol, minCount).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)
    train(wc, nMerges)
  }

  /** Encode one word against a rank table (`"l r"` → rank). */
  private[graft] def encodeWord(
      w: String, ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var toks: Array[String] = {
      val a = new Array[String](w.length)
      var i = 0
      while (i < w.length) { a(i) = String.valueOf(w.charAt(i)); i += 1 }
      a
    }
    var continue = toks.length > 1
    while (continue) {
      var bestRank = Int.MaxValue
      var bi = -1
      var j = 0
      while (j < toks.length - 1) {
        val rk = ranks.get(toks(j) + " " + toks(j + 1))
        if (rk != null && rk < bestRank) { bestRank = rk; bi = j }
        j += 1
      }
      if (bi < 0) continue = false
      else toks = mergeAll(toks, toks(bi), toks(bi + 1))
      if (toks.length < 2) continue = false
    }
    toks
  }

  /** The tokenizer artifact t14 applies: trained offline by
    * `graft.tools.TrainBpe` (deterministic — rerunning prints this
    * exact table) on the sf0.01 documents corpus, 48 merges. Embedded
    * as source so the Spark plan and the DuckDB oracle share one
    * literal table, the way a real pipeline pins a tokenizer version
    * rather than retraining per run. */
  val pretrained: Seq[(String, String)] = Seq(
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"),
    ("s", "t"), ("m", "er"), ("a", "t"), ("l", "u"),
    ("a", "r"), ("p", "ar"), ("j", "o"), ("jo", "in"),
    ("a", "s"), ("as", "h"), ("h", "ash"), ("r", "ow"),
    ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"),
    ("co", "lu"), ("colu", "m"), ("colum", "n"), ("cu", "st"),
    ("cust", "o"), ("custo", "mer"), ("f", "i"), ("fi", "l"),
    ("fil", "t"), ("filt", "er"), ("a", "l"), ("al", "l"),
    ("m", "all"), ("s", "mall"), ("g", "e"), ("l", "ow"),
    ("mer", "ge"), ("s", "low"), ("c", "t"), ("ct", "or"),
    ("d", "er"), ("e", "ctor"), ("or", "der"), ("v", "ector"))

  /** The merges table as SQL `VALUES (rank, left, right), ...` rows —
    * interpolated into t14's DuckDB oracle so both engines read the
    * identical artifact. */
  def mergesSqlValues(merges: Seq[(String, String)]): String =
    merges.zipWithIndex
      .map { case ((l, r), i) => s"(${i + 1}, '$l', '$r')" }
      .mkString(", ")
}
