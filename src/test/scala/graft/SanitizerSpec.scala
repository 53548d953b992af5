package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.model.{Selection, Tuning}

/** The reference's config input contract (`class-options.php:368-421`
  * deep sanitization; `:453-460,469-493,552-559,626-646` clamp pairs):
  * out-of-range input is CORRECTED into range, never rejected, and
  * sanitization is idempotent.
  */
class SanitizerSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val anyInt = Gen.chooseNum(Int.MinValue, Int.MaxValue)
  private val messyStr =
    Gen.oneOf(Gen.const(""), Gen.const("  "), Gen.const(" title "),
      Gen.alphaNumStr, Gen.const("pa_color"))

  test("Selection.sanitized: always lands in range, any input") {
    check(Prop.forAll(anyInt, anyInt, Gen.listOf(messyStr),
      Gen.mapOf(Gen.zip(messyStr, Gen.oneOf("json", "text", "xml", "")))) {
      (size, overlap, core, meta) =>
        val s = Selection(core = core, meta = meta,
          chunkSize = size, chunkOverlap = overlap, model = "bogus-model").sanitized
        s.chunkSize >= 1 &&
          s.chunkOverlap >= 0 && s.chunkOverlap < s.chunkSize &&
          s.core.forall(v => v.nonEmpty && v.trim == v) &&
          s.core.distinct == s.core &&
          s.meta.forall { case (k, m) =>
            k.nonEmpty && k.trim == k && (m == "json" || m == "text") } &&
          Selection.modelDims.contains(s.model)
    })
  }

  test("Selection.sanitized: idempotent") {
    check(Prop.forAll(anyInt, anyInt, Gen.listOf(messyStr)) { (size, overlap, core) =>
      val s = Selection(core = core, tax = core, acf = core,
        chunkSize = size, chunkOverlap = overlap).sanitized
      s.sanitized == s
    })
  }

  test("Selection.sanitized: in-range input is untouched") {
    val s = Selection(core = Seq("title", "sku"), tax = Seq("product_cat"),
      meta = Map("_weight" -> "json"), chunkSize = 800, chunkOverlap = 100)
    assert(s.sanitized == s)
  }

  test("Tuning.sanitized: every knob clamps to the reference's range; idempotent") {
    check(Prop.forAll(anyInt, anyInt, anyInt, anyInt, anyInt, anyInt,
      Gen.oneOf("5min", "15min", "hourly", "twicedaily", "daily", "weekly", "")) {
      (b, j, s, r, mv, vc, cad) =>
        val t = Tuning(b, j, s, r, mv, vc, cad).sanitized
        t.batchUpsertSize >= 10 && t.batchUpsertSize <= 500 &&
          t.maxConcurrentJobs >= 1 && t.maxConcurrentJobs <= 10 &&
          t.scanBatchLimit >= 20 && t.scanBatchLimit <= 2000 &&
          t.eventRetentionDays >= 1 && t.eventRetentionDays <= 90 &&
          t.rollupMaxVariations >= 20 && t.rollupMaxVariations <= 5000 &&
          t.rollupValuesCap >= 5 && t.rollupValuesCap <= 200 &&
          Tuning.Cadences(t.schedulerCadence) &&
          t.sanitized == t
    })
  }

  test("Tuning defaults are the reference defaults and already sanitized") {
    val t = Tuning()
    assert(t == t.sanitized)
    assert(t.batchUpsertSize == 100 && t.maxConcurrentJobs == 3 &&
      t.scanBatchLimit == 200 && t.eventRetentionDays == 7 &&
      t.rollupMaxVariations == 500 && t.rollupValuesCap == 20 &&
      t.schedulerCadence == "15min")
  }
}
