package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Blocked edit-distance (Levenshtein) join — the entity-resolution
  * step of a curation pipeline: resolve an incoming batch of dirty
  * records (typos, dropped characters, OCR noise) against the master
  * table by approximate string match.
  *
  * Never all-pairs: candidates must share a BLOCK (the first
  * `prefixLen` characters of the match text), so the candidate set is
  * an equi-join, and only within-block pairs pay the exact
  * `levenshtein` verification (codegen'd in Spark, mirrored exactly by
  * DuckDB's `levenshtein`). Blocking is part of the operator's
  * CONTRACT, not an approximation to hide: a true match whose edit sits
  * inside the first `prefixLen` characters is missed by construction
  * (FuzzyJoinSpec pins one), the standard blocking trade every ER
  * system documents — callers pick `prefixLen` below their minimum
  * stable prefix, or union several blocking passes.
  *
  * Scale posture: the probe batch is the SMALL side (an ingest slice,
  * not the corpus) and is broadcast, so the master table never
  * shuffles — the join is a map-side block lookup over the master
  * scan, and per-block cost is |probe ∩ block| × |master ∩ block|,
  * bounded by the blocking key's selectivity rather than N².
  */
object FuzzyJoin {

  /** (probe_key, match_key, dist ≤ maxDist) for every within-block
    * candidate pair. `master`/`probe` provide (`keyCol`, `textCol`). */
  def resolve(master: DataFrame, probe: DataFrame, keyCol: String,
      textCol: String, prefixLen: Int = 4, maxDist: Int = 2): DataFrame = {
    val m = master.select(col(keyCol).as("match_key"),
      col(textCol).as("m_text"),
      substring(col(textCol), 1, prefixLen).as("blk"))
    val p = probe.select(col(keyCol).as("probe_key"),
      col(textCol).as("p_text"),
      substring(col(textCol), 1, prefixLen).as("blk"))
    // Two semantics-preserving prunes before the DP: levenshtein ≥
    // |length difference|, so the cheap codegen'd length guard drops
    // most candidates without touching the matrix; the 3-arg
    // (thresholded) levenshtein then runs the banded early-exit DP,
    // returning -1 past maxDist instead of filling the full matrix.
    // Neither changes the result set — the oracle stays the plain form.
    broadcast(p).join(m, "blk")
      .where(abs(length(col("p_text")) - length(col("m_text"))) <= maxDist)
      .withColumn("dist", levenshtein(col("p_text"), col("m_text"), maxDist))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select("probe_key", "match_key", "dist")
  }

  /** Best match per probe row: smallest distance, then smallest master
    * key — the assignment form an ingest dedup actually applies. */
  def resolveBest(master: DataFrame, probe: DataFrame, keyCol: String,
      textCol: String, prefixLen: Int = 4, maxDist: Int = 2): DataFrame =
    resolve(master, probe, keyCol, textCol, prefixLen, maxDist)
      .groupBy("probe_key")
      .agg(min(struct(col("dist"), col("match_key"))).as("best"))
      .select(col("probe_key"), col("best.match_key").as("match_key"),
        col("best.dist").as("dist"))
}
