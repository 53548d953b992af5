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

  private def prefixBlk(prefixLen: Int): Column => Column =
    c => substring(c, 1, prefixLen)
  private def suffixBlk(prefixLen: Int): Column => Column =
    c => substring(reverse(c), 1, prefixLen)

  /** Estimated within-block pair count, Σ over blocks (and passes) of
    * |probe ∩ block| × |master ∩ block| — two narrow (block, count)
    * aggregations and a tiny join; an UPPER bound for the dual-block
    * union (the disjointness filter only removes pairs). Double, not
    * long: the estimate exists to catch 10¹¹-pair blowups, where
    * summation precision is irrelevant and long products could
    * overflow. */
  private def blockedEstimate(master: DataFrame, probe: DataFrame,
      textCol: String, prefixLen: Int, dualBlock: Boolean): Double = {
    val passes =
      if (dualBlock) Seq(prefixBlk(prefixLen) -> 0, suffixBlk(prefixLen) -> 1)
      else Seq(prefixBlk(prefixLen) -> 0)
    def cnts(df: DataFrame) = passes.map { case (blk, pass) =>
      df.select(blk(col(textCol)).as("blk"), lit(pass).as("pass"))
        .groupBy("blk", "pass").agg(count(lit(1)).as("c"))
    }.reduce(_.unionByName(_))
    Option(cnts(probe)
      .join(cnts(master).withColumnRenamed("c", "mc"), Seq("blk", "pass"))
      .agg(sum(col("c").cast("double") * col("mc"))).head().get(0))
      .map(_.asInstanceOf[Double]).getOrElse(0.0)
  }

  /** The loud output-bound guard (`spark.graft.fuzzy.maxPairs`): a
    * duplicate-heavy corpus makes the full pair multiset
    * output-combinatorial even when the ANSWER a pipeline needs is
    * probe-linear (sf10: 2M part rows over 64 distinct names → ~10¹¹
    * verified pairs, 77 GB of spill before one row emitted — the r12
    * DNF). Failing BEFORE the explosion, with the bounded alternatives
    * named, beats filling the disk. */
  private def guardPairs(spark: org.apache.spark.sql.SparkSession,
      est: Double, what: String): Unit = {
    val bound = graft.GraftConf.long(spark, graft.GraftConf.FuzzyMaxPairs)
    if (bound > 0 && est > bound.toDouble)
      throw new IllegalStateException(
        f"FuzzyJoin.resolve: estimated $what ≈ $est%.3g pairs exceeds " +
          s"spark.graft.fuzzy.maxPairs=$bound — the result multiset is " +
          "output-combinatorial on this corpus; use resolveCapped " +
          "(bounded top-N per probe key) or resolveBest (one row per " +
          "probe row), or raise the bound deliberately")
  }

  /** Verified DISTINCT-text match pairs (p_text, m_text, dist) — the
    * text-level core every distinct-text path shares: blocking-key
    * cardinality is a property of the text distribution, so this table
    * is bounded by distinct-text counts regardless of row counts. */
  private def verifiedTexts(master: DataFrame, probe: DataFrame,
      textCol: String, prefixLen: Int, maxDist: Int,
      dualBlock: Boolean): DataFrame = {
    val pD = probe.select(col(textCol).as("t")).distinct()
    val mD = master.select(col(textCol).as("t")).distinct()
    resolveBlocked(mD, pD, "t", "t", prefixLen, maxDist, dualBlock)
      .select(col("probe_key").as("p_text"), col("match_key").as("m_text"),
        col("dist"))
  }

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
      // guard the text-level verification too (huge blocks over mostly
      // distinct texts are a candidate blowup the expansion estimate
      // below can't see)
      guardPairs(master.sparkSession,
        blockedEstimate(
          master.select(col(textCol).as("t")).distinct(),
          probe.select(col(textCol).as("t")).distinct(),
          "t", prefixLen, dualBlock),
        "within-block text candidates")
      // snapped: the output-bound estimate below and the expansion both
      // read the verified text pairs — without a stage boundary the
      // blocked levenshtein verification would run twice
      val verified = Stage.snap(
        verifiedTexts(master, probe, textCol, prefixLen, maxDist, dualBlock),
        materialize = true)
      // OUTPUT estimate before expanding: Σ over verified text pairs of
      // |probe rows with p_text| × |master rows with m_text| — exact,
      // and computable from text-level counts long before any pair
      // materializes (the guard this path exists for: the r12 DNF blew
      // up HERE, not in the text-level verification)
      guardPairs(master.sparkSession,
        Option(verified
          .join(probe.groupBy(col(textCol).as("p_text"))
            .agg(count(lit(1)).as("pc")), Seq("p_text"))
          .join(master.groupBy(col(textCol).as("m_text"))
            .agg(count(lit(1)).as("mc")), Seq("m_text"))
          .agg(sum(col("pc").cast("double") * col("mc"))).head().get(0))
          .map(_.asInstanceOf[Double]).getOrElse(0.0),
        "expanded output")
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
    guardPairs(master.sparkSession,
      blockedEstimate(master, probe, textCol, prefixLen, dualBlock),
      "within-block candidates")
    resolveBlocked(master, probe, keyCol, textCol, prefixLen, maxDist,
      dualBlock)
  }

  /** The unguarded blocked core — [[resolve]] wraps it with the
    * `spark.graft.fuzzy.maxPairs` estimates; [[verifiedTexts]] (the
    * path under [[resolveBest]]/[[resolveCapped]] DEFAULTS, whose
    * outputs are probe-bounded by construction) calls it directly so
    * the guard's own recommendations never trip the guard.
    * (`resolveBest(verifyDistinctTexts = false)` is the one explicit
    * opt-out back into the guarded multiset path.) */
  private def resolveBlocked(master: DataFrame, probe: DataFrame,
      keyCol: String, textCol: String, prefixLen: Int, maxDist: Int,
      dualBlock: Boolean): DataFrame = {
    def side(df: DataFrame, key: String, txt: String,
        blk: Column => Column): DataFrame =
      df.select(col(keyCol).as(key), col(textCol).as(txt),
        blk(col(textCol)).as("blk"))
    val prefix = prefixBlk(prefixLen)
    // suffix block via reverse: equal reversed prefixes == equal
    // suffixes, and substring(reverse(s), 1, L) compares whole short
    // strings the same way on both engines (unlike right(s, L))
    val suffix = suffixBlk(prefixLen)
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
    * text-level form never materializes more than probe-linear rows).
    *
    * The distinct-text path is therefore the DEFAULT here (unlike
    * [[resolve]], whose full multiset output genuinely needs the
    * per-row path on all-distinct corpora): the guard's abort message
    * recommends this method as a bounded alternative, so its default
    * must be the form that cannot itself trip the guard. Passing
    * `verifyDistinctTexts = false` opts back into the guarded
    * multiset-then-aggregate shape (kept for A/B equivalence specs). */
  def resolveBest(master: DataFrame, probe: DataFrame, keyCol: String,
      textCol: String, prefixLen: Int = 4, maxDist: Int = 2,
      dualBlock: Boolean = false,
      verifyDistinctTexts: Boolean = true): DataFrame = {
    if (!verifyDistinctTexts)
      return resolve(master, probe, keyCol, textCol, prefixLen, maxDist,
        dualBlock, verifyDistinctTexts)
        .groupBy("probe_key")
        .agg(min(struct(col("dist"), col("match_key"))).as("best"))
        .select(col("probe_key"), col("best.match_key").as("match_key"),
          col("best.dist").as("dist"))
    val verified =
      verifiedTexts(master, probe, textCol, prefixLen, maxDist, dualBlock)
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

  /** BUDGETED resolve — the round-15 verdict's dd_fuzzy fix: at most
    * `cap` matches per probe row (the (dist, match_key)-smallest, the
    * resolveBest order generalized to top-N), plus a `capped` flag (1
    * when the probe row's FULL match count exceeded the cap), so the
    * output is |probe| × cap-bounded BY CONSTRUCTION and a
    * duplicate-heavy corpus can never make the query
    * output-combinatorial.
    *
    * Always routes through the distinct-text machinery and never
    * materializes the pair multiset: per master TEXT only its `cap`
    * smallest keys survive (for a fixed (p_text, m_text) pair every
    * expanded row shares one dist, so a global top-`cap` by
    * (dist, match_key) can use at most the `cap` smallest keys of any
    * single text — the preselection is lossless), the top-N then
    * resolves per probe TEXT over ≤ |verified texts| × cap rows, and
    * key expansion joins each probe row to exactly its text's ≤ cap
    * winners. The `capped` flag folds from per-text master counts —
    * the full multiset's size without the multiset. Equivalent (and
    * oracle-mirrored) to ROW_NUMBER ≤ cap over the full pair multiset
    * ordered by (dist, match_key) per probe key, given unique master
    * keys. */
  def resolveCapped(master: DataFrame, probe: DataFrame, keyCol: String,
      textCol: String, prefixLen: Int = 4, maxDist: Int = 2,
      dualBlock: Boolean = false, cap: Int = 10): DataFrame = {
    require(cap > 0, s"cap must be positive: $cap")
    val verified = Stage.snap(
      verifiedTexts(master, probe, textCol, prefixLen, maxDist, dualBlock),
      materialize = true)
    val wM = org.apache.spark.sql.expressions.Window
      .partitionBy("m_text").orderBy("m_key")
    val mRows = master.select(col(keyCol).as("m_key"),
      col(textCol).as("m_text"))
    val mTop = mRows.withColumn("rn", row_number().over(wM))
      .where(col("rn") <= cap).drop("rn")
    val mCnt = mRows.groupBy("m_text").agg(count(lit(1)).as("mc"))
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy("p_text").orderBy(col("dist"), col("m_key"))
    val bestN = verified.join(mTop, Seq("m_text"))
      .withColumn("rn", row_number().over(wT))
      .where(col("rn") <= cap)
      .select("p_text", "m_key", "dist")
    val totals = verified.join(mCnt, Seq("m_text"))
      .groupBy("p_text").agg(sum("mc").as("n_matches"))
    probe.select(col(keyCol).as("probe_key"), col(textCol).as("p_text"))
      .join(bestN, Seq("p_text"))
      .join(totals, Seq("p_text"))
      .select(col("probe_key"), col("m_key").as("match_key"), col("dist"),
        (col("n_matches") > cap).cast("int").as("capped"))
  }
}
