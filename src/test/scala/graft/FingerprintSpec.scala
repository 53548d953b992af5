package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.fingerprint.Fingerprint
import graft.model.Selection

/** Fingerprint invariance per the reference's spec
  * (`development-plan.md:868-871`): identical inputs → same SHA; reordered
  * selection lists → same SHA; changed chunk size or model → different SHA.
  */
class FingerprintSpec extends AnyFunSuite {

  val sel: Selection = Selection(core = Seq("title", "sku", "description"),
    tax = Seq("product_cat", "product_tag"), meta = Map("b" -> "text", "a" -> "json"))

  test("identical inputs → same sha") {
    assert(Fingerprint.shaProduct("t", sel, 3072) == Fingerprint.shaProduct("t", sel, 3072))
  }

  test("selection list order does not matter (canonicalization)") {
    val shuffled = sel.copy(core = Seq("sku", "description", "title"),
      tax = Seq("product_tag", "product_cat"))
    assert(Fingerprint.shaProduct("t", sel, 3072) ==
      Fingerprint.shaProduct("t", shuffled, 3072))
  }

  test("chunk size / overlap / model / dimension / text all change the sha") {
    val base = Fingerprint.shaProduct("t", sel, 3072)
    assert(base != Fingerprint.shaProduct("t", sel.copy(chunkSize = 400), 3072))
    assert(base != Fingerprint.shaProduct("t", sel.copy(chunkOverlap = 50), 3072))
    assert(base != Fingerprint.shaProduct("t", sel.copy(model = "text-embedding-3-large"), 3072))
    assert(base != Fingerprint.shaProduct("t", sel, 1536))
    assert(base != Fingerprint.shaProduct("t2", sel, 3072))
  }

  test("chunk sha binds (product_sha, index, text)") {
    val c = Fingerprint.shaChunk("abc", 0, "x")
    assert(c == Fingerprint.shaChunk("abc", 0, "x"))
    assert(c != Fingerprint.shaChunk("abd", 0, "x"))
    assert(c != Fingerprint.shaChunk("abc", 1, "x"))
    assert(c != Fingerprint.shaChunk("abc", 0, "y"))
  }

  test("vector id format matches reference (`class-indexer.php:147-150`)") {
    assert(Fingerprint.vectorId(1, 42, 3) == "site-1:product-42:chunk-3")
  }
}
