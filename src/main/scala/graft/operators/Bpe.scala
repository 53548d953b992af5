package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge training — tokenizer induction over a
  * corpus, the step between `vocabTopK`'s frequency table and a usable
  * subword vocabulary.
  *
  * BPE trains on the WORD VOCABULARY (word → corpus frequency), not on
  * the corpus stream: the single corpus-scale pass is the initial word
  * count (one combinable shuffle); after that every merge round runs
  * over the vocab table — millions of rows at web scale, not billions —
  * with pair counts weighted by word frequency. Each round is one
  * combinable (pair → Σ n) aggregation, ONE driver-side argmax row (the
  * chosen merge — a 1-row collect, not a data collect), and a row-local
  * rewrite of the symbol arrays; the vocab snapshots per round
  * (Stage.snap) so plan depth stays O(1) in rounds — the lshComponents
  * discipline applied to an iterative trainer.
  *
  * Determinism: ties on pair count break on (left, right) lexicographic
  * order, so the merge sequence is engine- and partitioning-stable.
  * The end-of-word marker `_` keeps word-final units distinct from
  * word-internal ones (the standard BPE formulation).
  */
object Bpe {

  /** A fixed English-ish merge table for the gated segmenter query
    * (ta_bpe_encode): deterministic input → the oracle can mirror the
    * rank-ordered application exactly. Later merges depend on earlier
    * ones ((th,e_) needs (t,h); (an,d_) needs (a,n)), so the query also
    * exercises rank-order application. */
  val DemoMerges: Seq[(String, String)] = Seq(
    ("t", "h"), ("th", "e_"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("e", "n"), ("a", "t"), ("o", "r"),
    ("e", "s_"), ("an", "d_"))

  /** (symbols, weight) vocab rows after `nMerges` rounds + the merge
    * table collected so far. Internal driver loop state. */
  private case class TrainState(vocab: Dataset[(Seq[String], Long)],
      merges: Seq[(String, String, Long)])

  private def initialVocab(documents: DataFrame): Dataset[(Seq[String], Long)] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
        .as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) =>
        val syms = w.map(_.toString).toSeq
        (syms.init :+ (syms.last + "_"), n)
      }
  }

  private def train(documents: DataFrame, nMerges: Int,
      materialize: Boolean): TrainState = {
    val spark = documents.sparkSession
    import spark.implicits._
    var vocab = Stage.snap(initialVocab(documents).toDF("syms", "n"), materialize)
      .as[(Seq[String], Long)]
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      // weighted adjacent-pair counts over the vocab — combinable agg
      val best = vocab.flatMap { case (syms, n) =>
        syms.iterator.zip(syms.iterator.drop(1)).map(p => (p._1, p._2, n))
      }.toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((l, r, cnt))
        // row-local merge of every adjacent (l, r) occurrence, greedy
        // left-to-right (the standard BPE apply order)
        vocab = Stage.snap(vocab.map { case (syms, n) =>
          (mergePair(syms, l, r), n)
        }.toDF("syms", "n"), materialize).as[(Seq[String], Long)]
      }
      round += 1
    }
    TrainState(vocab, merges.toSeq)
  }

  /** Greedy left-to-right merge of adjacent (l, r) into l+r. */
  private[operators] def mergePair(syms: Seq[String], l: String,
      r: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  /** The learned merge table: (rank, lhs, rhs, merged, weight) in
    * training order — the artifact a tokenizer ships. (`lhs`/`rhs`, not
    * `left`/`right`: those are reserved words in ANSI SQL and would need
    * fragile quoting in every downstream engine.) Deterministic and
    * fully driver-gated: the bounded loop unrolls into a chained-CTE
    * DuckDB oracle ([[graft.catalog.OracleSql.bpeMerges]]). */
  def bpeMerges(documents: DataFrame, nMerges: Int = 20,
      materialize: Boolean = true): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    train(documents, nMerges, materialize).merges.zipWithIndex
      .map { case ((l, r, n), i) => (i + 1, l, r, l + r, n) }
      .toDF("rank", "lhs", "rhs", "merged", "weight")
  }

  /** Tokenize text with a learned merge table: per word, apply every
    * merge in rank order (the standard BPE segmenter). Returns
    * (doc_id, n_words, n_subwords, subwords_preview). Map-only over the
    * corpus with the merge list broadcast via closure. Hot-loop shape:
    * each merge first runs an allocation-free adjacency scan and only
    * rebuilds the symbol array on an actual hit — most merges don't
    * occur in most words, so the common case allocates nothing. */
  def bpeEncode(documents: DataFrame, merges: Seq[(String, String)],
      previewN: Int = 8): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val mergeList = merges.toArray
    documents.select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val wordRe = java.util.regex.Pattern.compile("[a-z]+")
        it.map { case (id, text) =>
          val m = wordRe.matcher(
            (if (text eq null) "" else text).toLowerCase(java.util.Locale.ROOT))
          var nWords = 0L
          var nSub = 0L
          val preview = scala.collection.mutable.ArrayBuffer.empty[String]
          while (m.find()) {
            nWords += 1
            val w = m.group()
            var syms = new Array[String](w.length)
            var c = 0
            while (c < w.length) { syms(c) = String.valueOf(w.charAt(c)); c += 1 }
            syms(w.length - 1) = syms(w.length - 1) + "_"
            var k = 0
            while (k < mergeList.length) {
              val l = mergeList(k)._1; val r = mergeList(k)._2
              var hit = -1
              var i = 0
              while (hit < 0 && i + 1 < syms.length) {
                if (syms(i) == l && syms(i + 1) == r) hit = i
                i += 1
              }
              if (hit >= 0) syms = mergePairArr(syms, l, r, hit)
              k += 1
            }
            nSub += syms.length
            var s = 0
            while (s < syms.length) {
              if (preview.length < previewN) preview += syms(s)
              s += 1
            }
          }
          (id, nWords, nSub, preview.mkString(" "))
        }
      }
      .toDF("doc_id", "n_words", "n_subwords", "subwords_preview")
      .orderBy("doc_id")
  }

  /** Array form of [[mergePair]] for the segmenter hot loop: `from` is
    * the first known hit, so the prefix copies verbatim. Semantics are
    * identical (greedy left-to-right, spec-cross-checked). */
  private def mergePairArr(syms: Array[String], l: String, r: String,
      from: Int): Array[String] = {
    val out = new Array[String](syms.length)
    System.arraycopy(syms, 0, out, 0, from)
    var n = from
    var i = from
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out(n) = l + r; n += 1; i += 2
      } else { out(n) = syms(i); n += 1; i += 1 }
    }
    java.util.Arrays.copyOf(out, n)
  }

  /** Tokenizer fertility per language — subwords-per-word in integer
    * basis points, the standard tokenizer-efficiency metric (a language
    * the merge table serves poorly fragments into more subwords per
    * word, inflating its effective sequence length and training cost).
    * Rides [[bpeEncode]]'s per-doc counts; the language join carries
    * only (doc_id, lang) against (doc_id, counts) narrow rows, then one
    * combinable per-lang sum. Zero-word languages report fertility 0
    * (guarded on both engines) rather than dividing by zero. */
  def tokenizerFertility(documents: DataFrame,
      merges: Seq[(String, String)] = DemoMerges): DataFrame =
    bpeEncode(documents, merges)
      .select("doc_id", "n_words", "n_subwords")
      .join(documents.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .groupBy("lang")
      .agg(sum("n_words").as("n_words"), sum("n_subwords").as("n_subwords"))
      .withColumn("fertility_bps",
        when(col("n_words") === 0L, 0L)
          .otherwise(expr("n_subwords * 10000 div n_words")))
      .orderBy("lang")
}
