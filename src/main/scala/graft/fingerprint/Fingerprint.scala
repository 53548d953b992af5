package graft.fingerprint

import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest

import graft.model.Selection

/** Deterministic fingerprints gating all recomputation (SURVEY §1.3;
  * reference `includes/class-fingerprint.php`).
  *
  * Canonical form (ours, frozen — SURVEY §7.5.2: exact PHP byte-parity is
  * not required, the *invariance properties* are):
  *  - selection lists sorted case-insensitively then case-sensitively,
  *    meta keys sorted (reference `class-fingerprint.php:59-116`);
  *  - product sha binds {text, selection, chunk size/overlap, model,
  *    dimension, version} (`class-fingerprint.php:23-44`);
  *  - chunk sha = sha256(product_sha + "\n" + index + "\n" + chunk_text)
  *    (`class-fingerprint.php:49-53`).
  */
object Fingerprint {

  val Version = "1"

  def sha256Hex(s: String): String = {
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(s.getBytes(UTF_8)).map("%02x".format(_)).mkString
  }

  private def sortList(xs: Seq[String]): Seq[String] =
    xs.sortBy(x => (x.toLowerCase, x))

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Canonical JSON of a selection: key-ordered object, sorted lists —
    * reordering the selection must not change the sha (invariance property,
    * dev-plan `development-plan.md:868-871`). */
  def canonicalSelection(sel: Selection): String = {
    val fields = Seq(
      "acf" -> sortList(sel.acf).map(jstr).mkString("[", ",", "]"),
      "attributes" -> sortList(sel.attributes).map(jstr).mkString("[", ",", "]"),
      "core" -> sortList(sel.core).map(jstr).mkString("[", ",", "]"),
      "meta" -> sel.meta.toSeq.sortBy(_._1)
        .map { case (k, v) => jstr(k) + ":" + jstr(v) }.mkString("{", ",", "}"),
      "show_private_meta" -> sel.showPrivateMeta.toString,
      "tax" -> sortList(sel.tax).map(jstr).mkString("[", ",", "]"))
    fields.map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
  }

  /** Product SHA: binds text + config so any config change forces a rebuild
    * (`class-fingerprint.php:23-44`). */
  def shaProduct(text: String, sel: Selection, dimension: Int): String = {
    val canonical = Seq(
      "chunk_overlap" -> sel.chunkOverlap.toString,
      "chunk_size" -> sel.chunkSize.toString,
      "dimension" -> dimension.toString,
      "model" -> jstr(sel.model),
      "selection" -> canonicalSelection(sel),
      "text" -> jstr(text),
      "version" -> jstr(Version))
      .map { case (k, v) => jstr(k) + ":" + v }.mkString("{", ",", "}")
    sha256Hex(canonical)
  }

  /** Chunk SHA (`class-fingerprint.php:49-53`). */
  def shaChunk(productSha: String, index: Int, chunkText: String): String =
    sha256Hex(productSha + "\n" + index + "\n" + chunkText)

  /** Stable vector id (`class-indexer.php:147-150`). */
  def vectorId(siteId: Int, productId: Long, chunkIndex: Int): String =
    s"site-$siteId:product-$productId:chunk-$chunkIndex"
}
