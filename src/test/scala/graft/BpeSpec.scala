package graft

import graft.operators.Bpe

/** BPE trainer checked against an INDEPENDENT sequential reference
  * implementation (same algorithm, no shared code): identical merge
  * tables on the same corpus, plus the segmenter's compression
  * monotonicity (more merges never produce more subwords).
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // classic BPE corpus: shared suffixes force informative merges
  private val texts = Seq.fill(5)("low lower lowest") ++
    Seq.fill(3)("new newer newest") ++ Seq.fill(2)("wide wider widest")
  private lazy val docs = texts.zipWithIndex
    .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Sequential reference BPE over (word, count) — written from the
    * algorithm definition, not from the operator under test. */
  private def referenceMerges(texts: Seq[String], k: Int): Seq[(String, String)] = {
    val counts = scala.collection.mutable.Map.empty[Seq[String], Long]
    texts.flatMap(_.toLowerCase.split("[^a-z]+").filter(_.nonEmpty)).foreach { w =>
      val syms = w.map(_.toString).toSeq
      val marked = syms.init :+ (syms.last + "_")
      counts(marked) = counts.getOrElse(marked, 0L) + 1
    }
    var vocab = counts.toMap
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var round = 0
    while (round < k) {
      val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, n) =>
        syms.zip(syms.tail).foreach { p =>
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + n
        }
      }
      if (pairCounts.isEmpty) round = k
      else {
        val best = pairCounts.toSeq
          .sortBy { case ((l, r), n) => (-n, l, r) }.head._1
        out += best
        vocab = vocab.toSeq.map { case (syms, n) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
              merged += (best._1 + best._2); i += 2
            } else { merged += syms(i); i += 1 }
          }
          (merged.toSeq, n)
        }.groupBy(_._1).map { case (s, rows) => s -> rows.map(_._2).sum }
        round += 1
      }
    }
    out.toSeq
  }

  test("distributed merge table equals the sequential reference, in order") {
    val dist = Bpe.bpeMerges(docs, nMerges = 12).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val ref = referenceMerges(texts, 12)
    assert(dist == ref, s"\ndistributed: $dist\nreference:   $ref")
  }

  test("the first merge is the corpus's dominant weighted pair") {
    val first = Bpe.bpeMerges(docs, nMerges = 1).collect().head
    // every word ends in ...est_/..._ families; the exact winner comes
    // from the reference — just assert the weight really is the max
    val ref = referenceMerges(texts, 1).head
    assert((first.getString(1), first.getString(2)) == ref)
    assert(first.getLong(4) > 0)
  }

  test("segmenter compression is monotone in the number of merges") {
    val m20 = Bpe.bpeMerges(docs, nMerges = 20).collect()
      .sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    def totalSub(k: Int): Long =
      Bpe.bpeEncode(docs, m20.take(k)).agg(org.apache.spark.sql.functions
        .sum("n_subwords")).collect().head.getLong(0)
    val counts = Seq(0, 5, 10, 20).map(totalSub)
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
      s"subword totals not monotone: $counts")
    // with zero merges every word is its characters (+ marker fusion)
    val nChars = Bpe.bpeEncode(docs, Nil).agg(org.apache.spark.sql.functions
      .sum("n_subwords")).collect().head.getLong(0)
    assert(nChars == counts.head)
  }

  test("fertility: per-lang sums match the segmenter; a served language beats an unseen one") {
    import org.apache.spark.sql.functions._
    // "low" lang uses words the DemoMerges table was drawn from; "zz"
    // uses alien words the merges never fire on; "empty" has no words
    val d = Seq(
      (1L, "low lower lowest low", "low"), (2L, "low lowest", "low"),
      (3L, "quartz jigsaw phlegm", "zz"),
      (4L, "", "empty")
    ).toDF("doc_id", "text", "lang")
    val f = Bpe.tokenizerFertility(d, Bpe.DemoMerges).collect()
      .map(r => r.getString(0) -> r).toMap
    // cross-check per-lang sums against the per-doc segmenter output
    val enc = Bpe.bpeEncode(d, Bpe.DemoMerges)
      .join(d.select("doc_id", "lang"), "doc_id")
      .groupBy("lang").agg(sum("n_words").as("w"), sum("n_subwords").as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    f.foreach { case (lang, r) =>
      assert((r.getLong(1), r.getLong(2)) == enc(lang), s"sums differ for $lang")
    }
    // every word is at least one subword -> fertility >= 10000 bps
    assert(f("low").getLong(3) >= 10000 && f("zz").getLong(3) >= 10000)
    // merges fire on the served language, not the alien one
    assert(f("low").getLong(3) < f("zz").getLong(3),
      s"served lang should segment tighter: ${f("low")} vs ${f("zz")}")
    // zero-word lang: guarded fertility 0, no divide-by-zero
    assert(f("empty").getLong(1) == 0L && f("empty").getLong(3) == 0L)
  }
}
