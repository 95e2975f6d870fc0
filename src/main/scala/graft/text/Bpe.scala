package graft.text

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-trained byte-pair-encoding tokenizer (Sennrich+ ACL'16 —
  * arXiv:1508.07909 — the construction under every modern LLM
  * tokenizer). The training-data pipeline needs it twice: token COUNTS
  * drive packing/budgeting (a char-proxy count drifts by language and
  * noise level), and fertility (tokens per word) is itself a quality
  * signal.
  *
  * Scale shape, exactly how production trainers work: ONE distributed
  * pass builds the word-frequency table (explode pretokens → groupBy →
  * count, partial-aggregatable), capped to the top `maxWords` words by
  * (count, word) — a TakeOrdered, k rows per partition cross the wire.
  * The merge loop then runs DRIVER-SIDE on that KB/MB-scale table
  * (HF/SentencePiece do the same: stream the corpus once for counts,
  * train in memory), so model state follows the centroids/codebooks
  * pattern — fit once per corpus dir, broadcast ranks as ONE codegen
  * reference object, score map-only.
  *
  * Determinism is pinned everywhere the algorithm has a free choice:
  * the word cap orders by (count DESC, word ASC); a merge tie on pair
  * count breaks lexicographically on (left, right); merge application
  * is left-to-right non-overlapping. Training and encoding agree by
  * construction: greedy lowest-rank-first encoding replays the exact
  * merge history of any word seen in training.
  */
object Bpe {

  /** `ranks` maps "left right" (space-joined — a space can never occur
    * inside a pretoken symbol) to merge rank; lower rank = earlier
    * merge = higher priority at encode time.
    */
  final case class Model(ranks: java.util.HashMap[String, Integer],
      merges: Seq[(String, String)], vocab: Set[String])

  private[text] def pairKey(a: String, b: String): String = a + " " + b

  /** Split a pretoken into its initial codepoint symbols. */
  private[text] def symbolsOf(word: String): mutable.ArrayBuffer[String] = {
    val syms = new mutable.ArrayBuffer[String](word.length)
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      val n = Character.charCount(cp)
      syms += word.substring(i, i + n)
      i += n
    }
    syms
  }

  /** Merge every left-to-right non-overlapping (a, b) adjacency in
    * place. Returns true if anything merged.
    */
  private def mergeInPlace(syms: mutable.ArrayBuffer[String],
      a: String, b: String): Boolean = {
    var changed = false
    var i = 0
    var w = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        syms(w) = a + b
        changed = true
        i += 2
      } else {
        syms(w) = syms(i)
        i += 1
      }
      w += 1
    }
    syms.takeInPlace(w)
    changed
  }

  /** Train on a (word, frequency) table: the classic merge loop.
    * Stops early when no pair occurs twice (merging a count-1 pair
    * memorizes one word — every real trainer stops there too).
    */
  def trainOnCounts(wordCounts: Seq[(String, Long)], numMerges: Int): Model = {
    val words = wordCounts.map { case (w, c) => (symbolsOf(w), c) }
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    var done = false
    while (round < numMerges && !done) {
      val pairCounts = new mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          pairCounts.update(k, pairCounts.getOrElse(k, 0L) + c)
          i += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2L)
      if (best.isEmpty) done = true
      else {
        // max count, ties lexicographic on (left, right) — deterministic
        val (pair, _) = best.minBy { case ((a, b), c) => (-c, a, b) }
        merges += pair
        words.foreach { case (syms, _) => mergeInPlace(syms, pair._1, pair._2) }
        round += 1
      }
    }
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      ranks.put(pairKey(a, b), Integer.valueOf(r))
    }
    val vocab = wordCounts.iterator.flatMap(w => symbolsOf(w._1)).toSet ++
      merges.iterator.map { case (a, b) => a + b }
    Model(ranks, merges.toSeq, vocab)
  }

  /** One distributed pass for the word-frequency table, then the
    * driver-side merge loop. `maxWords` caps driver state the way every
    * production trainer caps its word table; the cap keeps the HEAD of
    * the Zipf curve, which is where all the pair mass lives.
    */
  def fit(docs: DataFrame, textCol: String, numMerges: Int = 200,
      maxWords: Int = 50000): Model = {
    val wc = docs
      .select(explode(regexp_extract_all(lower(col(textCol)),
        lit(TextOps.BpePattern), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w"))
      .limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    trainOnCounts(wc, numMerges)
  }

  /** Parse the public `merges.txt` interchange format — one
    * `left right` pair per line, rank = line order, `#...` header
    * lines and blanks skipped (the format Sennrich's reference
    * implementation emits and the GPT-2 / huggingface-tokenizers BPE
    * readers consume). This is the PRODUCTION accounting path: token
    * budgets are priced under the FIXED tokenizer the target model
    * trains with, never a tokenizer re-fit per corpus (a re-fit
    * changes the unit of every budget it feeds). The loaded model
    * drives the same [[encodeSyms]] engine and the same native
    * [[graft.functions.BpeTokenCount]] expression as a trained one —
    * loaded-vs-trained parity on an identical merge list is
    * TextSpec-pinned.
    */
  def loadMerges(lines: Iterator[String]): Model = {
    val merges = lines.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.indexOf(' ')
        require(i > 0 && l.indexOf(' ', i + 1) < 0,
          s"merges.txt line is not 'left right': '$l'")
        (l.substring(0, i), l.substring(i + 1))
      }.toVector
    require(merges.nonEmpty, "merges.txt carries no merge pairs")
    val ranks = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case ((a, b), r) =>
      ranks.put(pairKey(a, b), Integer.valueOf(r))
    }
    val vocab = merges.iterator
      .flatMap { case (a, b) => Iterator(a, b, a + b) }.toSet
    Model(ranks, merges, vocab)
  }

  /** [[loadMerges]] from a classpath resource. */
  def loadMergesResource(path: String): Model = {
    val in = getClass.getResourceAsStream(path)
    require(in != null, s"merges resource not found: $path")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try loadMerges(src.getLines()) finally src.close()
  }

  /** Render a model's merge list back to merges.txt lines (the
    * round-trip half of the interchange format — what a trainer
    * publishes for serving-side loads).
    */
  def renderMerges(model: Model): Seq[String] =
    "#version: 0.2" +: model.merges.map { case (a, b) => s"$a $b" }

  /** Greedy lowest-rank-first encode of one pretoken — the standard
    * BPE apply: repeatedly merge ALL occurrences of the present pair
    * with the smallest training rank. Replays training exactly for
    * training words; unseen words decompose into the longest learned
    * pieces; unseen characters stay single-codepoint tokens.
    */
  def encodeWord(model: Model, word: String): Seq[String] =
    encodeSyms(model.ranks, word).toSeq

  /** The shared encode engine (driver [[encodeWord]] and the native
    * expression both run THIS, so their parity holds by construction).
    */
  def encodeSyms(ranks: java.util.HashMap[String, Integer],
      word: String): mutable.ArrayBuffer[String] = {
    val syms = symbolsOf(word)
    var found = true
    while (found && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bi = -1
      var i = 0
      while (i + 1 < syms.length) {
        val r = ranks.get(pairKey(syms(i), syms(i + 1)))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue(); bi = i
        }
        i += 1
      }
      if (bi < 0) found = false
      else mergeInPlace(syms, syms(bi), syms(bi + 1))
    }
    syms
  }

  /** Per-row BPE token count under a trained model — the native
    * one-pass [[graft.functions.BpeTokenCount]], session-free wrap.
    * The expression lowercases internally (same normalization as fit).
    */
  def tokenCount(text: Column, model: Model): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.functions.BpeTokenCount(
        org.apache.spark.sql.graft.ColumnBridge.expression(text),
        model.ranks))
}
