package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Functions.sha32

/** Deduplication operators for a large-scale training-data pipeline:
  * exact, word-shingle MinHash+LSH, SimHash, and n-gram Jaccard.
  *
  * Scale posture (100 TB): every operator is a shuffle on a *derived small
  * key* (content sha, band signature, simhash) — never on raw text.
  * Shingle explosion is bounded per document; the MinHash agg is a
  * map-side-combinable `min`, and LSH candidate pairs are produced by a
  * self-join on (band, signature), whose per-bucket fan-out is what LSH is
  * designed to keep small. Hashes are sha256-derived so the DuckDB oracle
  * can reproduce them bit-for-bit.
  */
object Dedup {

  /** Lowercase + collapse whitespace — the canonical text for hashing. */
  private def norm(c: org.apache.spark.sql.Column) =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Exact dedup: group by sha256 of normalized text, keep min doc_id. */
  def exact(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), sha2(norm(col("text")), 256).as("h"))
      .groupBy("h")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .select("keep_id", "h", "n")
      .orderBy("h")

  /** Distinct word 3-gram shingles per document. */
  def shingles(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)).as("ts"))
      .where(size(col("ts")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("ts")) - 2),
          i => concat_ws(" ",
            element_at(col("ts"), i),
            element_at(col("ts"), i + 1),
            element_at(col("ts"), i + 2)))).as("g"))
      .distinct()

  /** MinHash signatures: k hash functions H_j(g) = sha32(g + "#" + j);
    * per (doc, j) keep the min. Returns (doc_id, j, mh). */
  def minhash(documents: DataFrame, k: Int = 16): DataFrame =
    shingles(documents)
      .select(col("doc_id"), col("g"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("doc_id"), col("j"),
        sha32(concat(col("g"), lit("#"), col("j"))).as("h"))
      .groupBy("doc_id", "j")
      .agg(min("h").as("mh"))

  /** LSH band signatures: bands of r rows, signature = sha256 of the
    * comma-joined minhashes in j-order. Returns (doc_id, band, sig). */
  def lshBands(mh: DataFrame, r: Int = 4): DataFrame =
    mh.select(col("doc_id"), floor(col("j") / r).as("band"),
        struct(col("j"), col("mh")).as("jm"))
      .groupBy("doc_id", "band")
      .agg(sha2(concat_ws(",",
        transform(array_sort(collect_list(col("jm"))),
          x => x.getField("mh").cast("string"))), 256).as("sig"))

  /** Candidate near-dup pairs: documents sharing any LSH band bucket. */
  def minhashLshPairs(documents: DataFrame, k: Int = 16, r: Int = 4): DataFrame = {
    val bands = lshBands(minhash(documents, k), r)
    val a = bands.select(col("doc_id").as("d1"), col("band"), col("sig"))
    val b = bands.select(col("doc_id").as("d2"), col("band"), col("sig"))
    a.join(b, Seq("band", "sig"))
      .where(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
      .orderBy("d1", "d2")
  }

  /** SimHash (16-bit here; width is a parameter): per bit b, sum (2·bit−1)
    * over distinct tokens' sha32, sign → bit; simhash = Σ bit_b · 2^b. */
  def simhash(documents: DataFrame, bits: Int = 16): DataFrame = {
    val toks = documents
      .select(col("doc_id"),
        explode(array_distinct(
          regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))).as("w"))
      .select(col("doc_id"), sha32(col("w")).as("h"))
    toks
      .select(col("doc_id"), col("h"),
        explode(sequence(lit(0), lit(bits - 1))).as("b"))
      .select(col("doc_id"), col("b"),
        // bit b of h via floor-division (floor, not cast: DuckDB CAST
        // double→BIGINT rounds while Spark truncates — floor agrees in both)
        when(floor(col("h") / pow(lit(2.0), col("b"))) % 2 === 1, 1)
          .otherwise(-1).as("v"))
      .groupBy("doc_id", "b")
      .agg(sum("v").as("score"))
      .groupBy("doc_id")
      .agg(sum(when(col("score") >= 0,
        pow(lit(2.0), col("b")).cast("long")).otherwise(0L)).as("simhash"))
      .orderBy("doc_id")
  }

  /** n-gram (token) Jaccard between consecutive doc ids — the
    * oracle-checkable pairwise variant (the scalable path is MinHash+LSH). */
  def jaccardConsecutive(documents: DataFrame): DataFrame = {
    val tok = documents
      .select(col("doc_id"),
        explode(array_distinct(
          regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))).as("w"))
    val sizes = tok.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val a = tok.select(col("doc_id").as("d1"), col("w"))
    val b = tok.select((col("doc_id") - 1).as("d1"), col("w"),
      col("doc_id").as("d2"))
    val inter = a.join(b, Seq("d1", "w"))
      .groupBy("d1", "d2").agg(count(lit(1)).as("common"))
    inter
      .join(sizes.withColumnRenamed("doc_id", "d1").withColumnRenamed("n", "n1"), "d1")
      .join(sizes.withColumnRenamed("doc_id", "d2").withColumnRenamed("n", "n2"), "d2")
      .select(col("d1"), col("d2"),
        round(col("common") / (col("n1") + col("n2") - col("common")), 4)
          .as("jaccard"))
      .orderBy("d1")
  }
}
