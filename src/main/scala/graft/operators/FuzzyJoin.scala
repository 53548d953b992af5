package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance (Levenshtein) join — the entity-resolution
  * step of a curation pipeline: resolve an incoming batch of dirty
  * records (typos, dropped characters, OCR noise) against the master
  * table by approximate string match.
  *
  * Never all-pairs: candidates must share a BLOCK (the first
  * `prefixLen` characters of the match text — optionally UNIONED with
  * a last-`prefixLen`-characters suffix block), so the candidate set
  * is an equi-join, and only within-block pairs pay the exact
  * `levenshtein` verification (codegen'd in Spark, mirrored exactly by
  * DuckDB's `levenshtein`). Blocking is part of the operator's
  * CONTRACT, not an approximation to hide: a single-pass prefix block
  * misses any true match whose edit sits inside the first `prefixLen`
  * characters (FuzzyJoinSpec pins one), the standard blocking trade
  * every ER system documents. `dualBlock = true` is what real ER
  * systems run — a UNION of blocking passes: the suffix of a string is
  * untouched by edits before it (insertions shift positions, not the
  * tail's content), so prefix ∪ suffix catches every pair whose edits
  * are confined to one end, and only a pair edited inside BOTH its
  * first and last `prefixLen` characters is still missed. On corpora
  * with long stable heads/tails the second pass also buys a LONGER
  * (more selective) prefix — two sharp blocks verify fewer candidate
  * pairs than one blunt block at equal recall; dd_fuzzy pins the
  * recall side (an in-prefix edit a single pass finds ZERO of).
  *
  * Scale posture: the probe batch is the SMALL side (an ingest slice,
  * not the corpus) and is broadcast, so the master table never
  * shuffles — each pass is a map-side block lookup over the master
  * scan, and per-block cost is |probe ∩ block| × |master ∩ block|,
  * bounded by the blocking key's selectivity rather than N². The two
  * passes union DISJOINTLY (the suffix pass keeps only prefix-unequal
  * pairs — a residual map-side filter), so no pair is verified or
  * emitted twice and no dedup shuffle is needed.
  */
object FuzzyJoin {

  /** (probe_key, match_key, dist ≤ maxDist) for every within-block
    * candidate pair. `master`/`probe` provide (`keyCol`, `textCol`).
    *
    * `verifyDistinctTexts = true` is the duplicated-corpus scale path
    * (result set IDENTICAL — spec-pinned): verification runs once per
    * distinct (probe text, master text) pair and the verdicts expand
    * back to keys by text equi-joins. Why it matters: blocking-key
    * cardinality is a property of the TEXT DISTRIBUTION, not the row
    * count, so on a corpus whose distinct-text count grows slower than
    * its rows the default path's per-row-pair verification goes
    * QUADRATIC in rows while the distinct path stays quadratic only in
    * distinct texts (round-10 scale curve: dd_fuzzy 757 s → 67 s at
    * 10x data, the residue being the inherently 100x output
    * multiset). Cost of the swap: one narrow distinct shuffle per
    * side; on an all-distinct corpus that shuffle buys nothing — hence
    * a parameter, not the default. */
  def resolve(master: DataFrame, probe: DataFrame, keyCol: String,
      textCol: String, prefixLen: Int = 4, maxDist: Int = 2,
      dualBlock: Boolean = false,
      verifyDistinctTexts: Boolean = false): DataFrame = {
    if (verifyDistinctTexts) {
      val pD = probe.select(col(textCol).as("t")).distinct()
      val mD = master.select(col(textCol).as("t")).distinct()
      val verified = resolve(mD, pD, "t", "t", prefixLen, maxDist, dualBlock)
        .select(col("probe_key").as("p_text"), col("match_key").as("m_text"),
          col("dist"))
      // re-expansion keeps the master's full rows OFF the shuffle: the
      // verified pairs broadcast into the (small, by contract) probe,
      // and the expanded probe side broadcasts into the master scan —
      // the only master shuffle on this path is the narrow text
      // distinct above (the documented cost of the swap)
      val expanded = probe
        .select(col(keyCol).as("probe_key"), col(textCol).as("p_text"))
        .join(broadcast(verified), Seq("p_text"))
      return master
        .select(col(keyCol).as("match_key"), col(textCol).as("m_text"))
        .join(broadcast(expanded), Seq("m_text"))
        .select("probe_key", "match_key", "dist")
    }
    def side(df: DataFrame, key: String, txt: String,
        blk: Column => Column): DataFrame =
      df.select(col(keyCol).as(key), col(textCol).as(txt),
        blk(col(textCol)).as("blk"))
    val prefix = (c: Column) => substring(c, 1, prefixLen)
    // suffix block via reverse: equal reversed prefixes == equal
    // suffixes, and substring(reverse(s), 1, L) compares whole short
    // strings the same way on both engines (unlike right(s, L))
    val suffix = (c: Column) => substring(reverse(c), 1, prefixLen)
    val pre = broadcast(side(probe, "probe_key", "p_text", prefix))
      .join(side(master, "match_key", "m_text", prefix), "blk")
    val cand =
      if (!dualBlock) pre
      else pre.select("probe_key", "p_text", "match_key", "m_text")
        .unionByName(
          broadcast(side(probe, "probe_key", "p_text", suffix))
            .join(side(master, "match_key", "m_text", suffix), "blk")
            // disjointness: prefix-equal pairs already came from pass 1
            .where(prefix(col("p_text")) =!= prefix(col("m_text")))
            .select("probe_key", "p_text", "match_key", "m_text"))
    // Two semantics-preserving prunes before the DP: levenshtein ≥
    // |length difference|, so the cheap codegen'd length guard drops
    // most candidates without touching the matrix; the 3-arg
    // (thresholded) levenshtein then runs the banded early-exit DP,
    // returning -1 past maxDist instead of filling the full matrix.
    // Neither changes the result set — the oracle stays the plain form.
    cand
      .where(abs(length(col("p_text")) - length(col("m_text"))) <= maxDist)
      .withColumn("dist", levenshtein(col("p_text"), col("m_text"), maxDist))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
      .select("probe_key", "match_key", "dist")
  }

  /** Best match per probe row: smallest distance, then smallest master
    * key — the assignment form an ingest dedup actually applies.
    *
    * On the distinct-text path the best match resolves at the
    * DISTINCT-TEXT level BEFORE any key expansion (round 12): the
    * min-(dist, match_key) over a probe row's expanded matches equals
    * min dist over its text's verified matches, then the smallest
    * master key among the best-distance texts — three narrow
    * aggregations. The old shape expanded the full (probe_key,
    * match_key) multiset first and windowed it down, which on a
    * duplicate-heavy corpus is output-combinatorial even though the
    * ANSWER is one row per probe row (the sf10 generator carries 2M
    * part rows over 64 distinct names: the expanded multiset is ~10¹¹
    * rows and filled 77 GB of spill before any top-1 ran; the
    * text-level form never materializes more than probe-linear rows). */
  def resolveBest(master: DataFrame, probe: DataFrame, keyCol: String,
      textCol: String, prefixLen: Int = 4, maxDist: Int = 2,
      dualBlock: Boolean = false,
      verifyDistinctTexts: Boolean = false): DataFrame = {
    if (!verifyDistinctTexts)
      return resolve(master, probe, keyCol, textCol, prefixLen, maxDist,
        dualBlock, verifyDistinctTexts)
        .groupBy("probe_key")
        .agg(min(struct(col("dist"), col("match_key"))).as("best"))
        .select(col("probe_key"), col("best.match_key").as("match_key"),
          col("best.dist").as("dist"))
    val pD = probe.select(col(textCol).as("t")).distinct()
    val mD = master.select(col(textCol).as("t")).distinct()
    val verified = resolve(mD, pD, "t", "t", prefixLen, maxDist, dualBlock)
      .select(col("probe_key").as("p_text"), col("match_key").as("m_text"),
        col("dist"))
    // smallest master key per DISTINCT master text (narrow agg over the
    // master scan — no pair multiset), then best per probe text:
    // min dist first, smallest qualifying master key to break ties —
    // exactly min(struct(dist, match_key)) over the expanded multiset.
    // NO broadcast hints here (round-12 review): mKey is one row per
    // distinct MASTER text and bestPerText one per distinct probe text —
    // on a mostly-distinct corpus both are master/probe-sized, and a
    // forced broadcast is a driver OOM at exactly the scale this path
    // exists for. Unhinted, Catalyst broadcasts them when its size
    // estimate clears autoBroadcastJoinThreshold (the duplicate-heavy
    // fixture case) and degrades to a shuffle join past it — the same
    // size gate every join in the engine trusts.
    val mKey = master.groupBy(col(textCol).as("m_text"))
      .agg(min(col(keyCol)).as("m_key"))
    val bestPerText = verified.join(mKey, Seq("m_text"))
      .groupBy("p_text")
      .agg(min(struct(col("dist"), col("m_key"))).as("best"))
      .select(col("p_text"), col("best.m_key").as("match_key"),
        col("best.dist").as("dist"))
    probe.select(col(keyCol).as("probe_key"), col(textCol).as("p_text"))
      .join(bestPerText, Seq("p_text"))
      .select("probe_key", "match_key", "dist")
  }
}
