package graft

import graft.operators.Dedup

/** [[Dedup.suffixArraySpans]] — the ExactSubstr refinement pass — checked
  * against an independent brute-force reference (per position, the
  * longest token run that occurs anywhere else in the sample by direct
  * comparison), plus the containment property linking it to the fixed-l
  * gram approximation it refines.
  */
class SuffixSpansSpec extends SparkSpec {
  import spark.implicits._

  // Fixture: doc 1/2 share an 8-token boilerplate block (cross-doc dup →
  // both get sampled); doc 1 additionally repeats a 4-token run WITHIN
  // itself; doc 3 repeats a phrase within itself but shares nothing
  // cross-doc (stays OUT of the dup_frac sample — documented sampling
  // semantics); doc 4 is unique filler.
  private val boiler = "terms of service apply to all users here"
  private val texts = Seq(
    1L -> s"alpha beta gamma $boiler delta one two three four x one two three four",
    2L -> s"totally different intro $boiler and a unique tail section",
    3L -> "self repeat self repeat self repeat without any shared text",
    4L -> "nothing duplicated in this document at all truly")
  private def docs = texts.toDF("doc_id", "text")

  /** Brute force: rep(d, p) = longest common prefix of d's tokens from p
    * with ANY other (doc, position) — including overlapping
    * self-occurrences; coverage = union of [p, p+rep-1] where
    * rep >= minLen, merged into maximal islands (1-based inclusive). */
  private def bruteSpans(sample: Seq[(Long, Seq[String])],
      minLen: Int): Seq[(Long, Int, Int, Int)] = {
    def common(a: Seq[String], i: Int, b: Seq[String], j: Int): Int = {
      var k = 0
      while (i + k < a.length && j + k < b.length && a(i + k) == b(j + k)) k += 1
      k
    }
    sample.flatMap { case (d, ts) =>
      val rep = ts.indices.map { p =>
        sample.flatMap { case (d2, ts2) =>
          ts2.indices.collect { case q if (d2, q) != ((d, p)) =>
            common(ts, p, ts2, q)
          }
        }.maxOption.getOrElse(0)
      }
      val covered = rep.indices.filter(rep(_) >= minLen)
        .flatMap(p => p until (p + rep(p))).distinct.sorted
      // merge into islands
      val islands = covered.foldLeft(List.empty[(Int, Int)]) {
        case ((s, e) :: rest, p) if p <= e + 1 => (s, math.max(e, p)) :: rest
        case (acc, p) => (p, p) :: acc
      }.reverse
      islands.map { case (s, e) => (d, s + 1, e + 1, e - s + 1) }
    }.sortBy(t => (t._1, t._2))
  }

  test("maximal spans match the brute-force ExactSubstr reference") {
    val got = Dedup.suffixArraySpans(docs, l = 3, topK = 10, minLen = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .toSeq
    // the sample is the cross-doc-flagged docs only (1 and 2)
    val sample = texts.filter(t => t._1 == 1L || t._1 == 2L)
      .map { case (d, t) => (d, t.toLowerCase.split("\\s+").toSeq) }
    assert(got == bruteSpans(sample, minLen = 3), s"\ngot: $got")
  }

  test("within-doc repeats in sampled docs are found; unsampled docs are not scanned") {
    val got = Dedup.suffixArraySpans(docs, l = 3, topK = 10, minLen = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    // doc 1's within-doc 'one two three four' repeat: positions 13-16 and
    // 18-21 (after the 8-token boilerplate at 4-11 and 'delta' at 12)
    assert(got.contains((1L, 13, 16)) && got.contains((1L, 18, 21)),
      s"within-doc repeat missing: $got")
    // doc 3 repeats within itself but has no cross-doc dup: it is not in
    // the dup_frac sample, so the refinement pass does not scan it
    assert(!got.exists(_._1 == 3L), s"doc 3 should not be sampled: $got")
    assert(!got.exists(_._1 == 4L))
  }

  test("gram islands are contained in suffix-array coverage (refinement property)") {
    // every fixed-l island is a genuine repeat of length >= l, so the
    // exact pass must cover it (it may extend further — that is the point)
    val grams = Dedup.duplicateSpans(docs, l = 3)
      .where($"n_spans" > 0)
      .select($"doc_id", $"covered_tokens").collect()
      .map(r => r.getLong(0)).toSet
    val spans = Dedup.suffixArraySpans(docs, l = 3, topK = 10, minLen = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val islands = Dedup.duplicateSpansApply(docs, l = 3)
      .where($"n_cut_tokens" > 0).collect().map(_.getLong(0)).toSet
    assert(grams.subsetOf(spans.map(_._1).toSet),
      s"gram-flagged docs $grams missing from SA spans ${spans.toSeq}")
    assert(islands.subsetOf(spans.map(_._1).toSet))
  }

  test("randomized cross-check: operator equals brute force on 30 seeded corpora") {
    // small vocab forces repeats; caps set so the sample is EXACTLY the
    // docs with a cross-doc duplicated l-gram (offenders = all flagged;
    // any gram-sharing partner is itself flagged), which the reference
    // can compute independently
    val l = 3
    (1 to 30).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f")
      val corpus = (1L to 8L).map { d =>
        val len = 5 + rnd.nextInt(26)
        d -> Seq.fill(len)(vocab(rnd.nextInt(vocab.length)))
      }
      val df = corpus.map { case (d, ts) => (d, ts.mkString(" ")) }
        .toDF("doc_id", "text")
      val got = Dedup.suffixArraySpans(df, l = l, topK = 100, minLen = l,
          maxPartners = 100)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
        .toSeq
      // independent sample rule: doc has some l-gram occurring in ANOTHER doc
      val grams = corpus.map { case (d, ts) =>
        d -> ts.sliding(l).filter(_.length == l).map(_.mkString(" ")).toSet
      }.toMap
      val sampled = corpus.filter { case (d, _) =>
        grams(d).exists(g => corpus.exists { case (d2, _) =>
          d2 != d && grams(d2).contains(g) })
      }
      assert(got == bruteSpans(sampled, minLen = l),
        s"seed $seed mismatch:\ngot:  $got\nwant: ${bruteSpans(sampled, minLen = l)}")
    }
  }

  test("no duplicates / short docs / empty input produce empty output") {
    val unique = Seq((1L, "a b c d e"), (2L, "f g h i j")).toDF("doc_id", "text")
    assert(Dedup.suffixArraySpans(unique, l = 3, topK = 5, minLen = 3).count() == 0)
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.suffixArraySpans(empty, l = 3, topK = 5, minLen = 3).count() == 0)
  }
}
