package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.chunker.Chunker

/** Chunker properties per the reference's own test spec
  * (`development-plan.md:857-866`): determinism, overlap containment,
  * budget bound; fixtures with paragraphs, long sentences, emoji/accents,
  * long words.
  */
class ChunkerSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private def bytes(s: String) = s.getBytes(UTF_8).length

  val sample: String =
    """First sentence here. Second sentence follows! A third one?
      |
      |A new paragraph starts. It has more text. And еще немного unicode—naïve café. 😀 emoji too.
      |""".stripMargin * 10

  test("deterministic: same input/params → identical chunks") {
    val a = Chunker.chunkText(sample, 50, 10)
    val b = Chunker.chunkText(sample, 50, 10)
    assert(a == b)
  }

  test("indices are contiguous from 0") {
    val cs = Chunker.chunkText(sample, 50, 10)
    assert(cs.map(_.index) == cs.indices.toList)
  }

  test("budget bound: every chunk fits the byte budget") {
    for (target <- Seq(20, 50, 100, 800)) {
      val cs = Chunker.chunkText(sample, target, target / 8)
      cs.foreach(c => assert(bytes(c.text) <= target * 4,
        s"chunk ${c.index} has ${bytes(c.text)} bytes > ${target * 4}"))
    }
  }

  test("overlap containment: chunk i's tail prefixes chunk i+1") {
    val cs = Chunker.chunkText(sample, 50, 10)
    assert(cs.size > 1)
    cs.sliding(2).foreach { case Seq(a, b) =>
      val tail = Chunker.overlapTail(a.text, (10 * 4.0).toInt)
      if (tail.nonEmpty) assert(b.text.startsWith(tail),
        s"chunk ${b.index} does not start with the overlap tail of ${a.index}")
    }
  }

  test("chars/approx_tokens are byte-based (SURVEY §1.3)") {
    val cs = Chunker.chunkText("café 😀 test. " * 40, 20, 0)
    cs.foreach { c =>
      assert(c.chars == bytes(c.text))
      assert(c.approxTokens == math.ceil(c.chars / 4.0).toInt)
    }
  }

  test("long words are hard-split within budget") {
    val word = "x" * 1000
    val cs = Chunker.chunkText(s"start $word end", 20, 0)
    cs.foreach(c => assert(bytes(c.text) <= 80))
    assert(cs.map(_.text.replace(" ", "")).mkString.contains("x" * 100))
  }

  test("empty and whitespace-only input → no chunks") {
    assert(Chunker.chunkText("").isEmpty)
    assert(Chunker.chunkText("  \n\n\t  ").isEmpty)
  }

  test("normalization: CRLF, tabs, 3+ newlines") {
    val n = Chunker.normalizeText("a\r\nb\rc\td\n\n\n\ne")
    assert(n == "a\nb\nc d\n\ne")
  }

  test("property: all non-overlap text is preserved in order") {
    val g = Gen.listOf(Gen.oneOf(
      "Short one.", "A slightly longer sentence with words!",
      "Unicode: naïve café 😀.", "tail")).map(_.mkString(" "))
    check(Prop.forAll(g, Gen.choose(10, 200)) { (text, target) =>
      val cs = Chunker.chunkText(text, target, 0) // no overlap → concat == normalized modulo separators
      val joined = cs.map(_.text).mkString(" ")
      val normTokens = Chunker.normalizeText(text)
        .split("\\s+").filter(_.nonEmpty).toSeq
      val joinedTokens = joined.split("\\s+").filter(_.nonEmpty).toSeq
      normTokens == joinedTokens
    })
  }

  test("property: determinism under arbitrary unicode") {
    check(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(5, 100)) { (s, t) =>
      Chunker.chunkText(s, t, t / 4) == Chunker.chunkText(s, t, t / 4)
    })
  }
}
