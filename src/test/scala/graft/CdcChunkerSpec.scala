package graft

import graft.chunker.CdcChunker
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Content-defined chunking properties: lossless, size-bounded, and —
  * the reason CDC exists — edit-LOCAL: an insertion in the middle of a
  * document disturbs only its neighborhood's chunks, where fixed-size
  * chunking shifts every downstream boundary.
  */
class CdcChunkerSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(100), p)
    assert(res.passed, res.status.toString)
  }

  private def sha(s: String) = java.security.MessageDigest.getInstance("SHA-256")
    .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  // deterministic pseudo-text: varied bytes so gear boundaries occur
  private def synth(n: Int, seed: Int): String = {
    val sb = new StringBuilder
    var x = seed.toLong * 2654435761L + 1
    while (sb.length < n) {
      x = x * 6364136223846793005L + 1442695040888963407L
      sb.append(((x >>> 33) % 26 + 'a').toChar)
      if (sb.length % 7 == 0) sb.append(' ')
    }
    sb.toString.take(n)
  }

  test("chunks concatenate losslessly back to the original text") {
    check(Prop.forAll(Gen.choose(0, 5000), Gen.choose(1, 1000)) { (n: Int, seed: Int) =>
      val t = synth(n, seed)
      CdcChunker.chunks(t).mkString == t
    })
  }

  test("every chunk respects [min, max] bounds (final chunk may be short)") {
    val t = synth(20000, 7)
    val cs = CdcChunker.chunks(t, avgSize = 256, minSize = 64, maxSize = 1024)
    cs.init.foreach { c =>
      assert(c.length >= 64 && c.length <= 1024, s"chunk len ${c.length}")
    }
    assert(cs.last.length <= 1024)
    // boundaries actually trigger on content: more than the max-forced
    // minimum number of chunks
    assert(cs.length > t.length / 1024, s"only ${cs.length} chunks — mask never hit")
  }

  test("an insertion disturbs only nearby chunks; fixed-size shifts everything") {
    val original = synth(20000, 42)
    val edited = original.substring(0, 10000) + synth(300, 99) +
      original.substring(10000)
    def cdcShas(t: String) = CdcChunker.chunks(t).map(sha)
    def fixedShas(t: String) = t.grouped(256).map(sha).toSeq
    val (a, b) = (cdcShas(original), cdcShas(edited))
    val cdcShared = a.intersect(b).length.toDouble / a.length
    val (fa, fb) = (fixedShas(original), fixedShas(edited))
    val fixedShared = fa.intersect(fb).length.toDouble / fa.length
    // CDC: everything except the edit neighborhood survives
    assert(cdcShared > 0.8, s"CDC shared fraction $cdcShared")
    // fixed-size: at most the prefix before the edit survives (~50%)
    assert(fixedShared < 0.6, s"fixed-size shared fraction $fixedShared")
    assert(cdcShared > fixedShared + 0.2,
      s"CDC ($cdcShared) must beat fixed-size ($fixedShared) on edit locality")
  }

  test("explodeChunks emits one identity row per chunk, reconstructible lengths") {
    val spark = SparkSpec.session
    import spark.implicits._
    val t1 = synth(5000, 1); val t2 = synth(3000, 2)
    val docs = Seq((1L, t1), (2L, t2)).toDF("doc_id", "text")
    val rows = CdcChunker.explodeChunks(docs).collect()
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).map(_._4).sum == t1.getBytes("UTF-8").length)
    assert(byDoc(2L).map(_._4).sum == t2.getBytes("UTF-8").length)
    // indexes are dense 0..n-1 and shas match a local re-chunk
    val local = CdcChunker.chunks(t1).map(sha)
    val dist = byDoc(1L).sortBy(_._2).map(_._3).toSeq
    assert(dist == local)
  }
}
