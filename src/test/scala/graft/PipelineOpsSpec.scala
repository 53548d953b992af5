package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, TextAnalysis}

/** Properties of the round-6 pipeline additions: deterministic sharding,
  * per-source quota caps, token entropy, and sign random projection.
  * Each operator's oracle row checks exact values at sf0.01; these specs
  * pin the SEMANTIC contracts (losslessness of the two-phase cap,
  * order-independence of the entropy fixed-point, closure-matrix
  * determinism of the projection) that a green hash can't distinguish
  * from luck.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
  private def embs = spark.read.parquet(s"$sfDir/embeddings.parquet")

  // ---- sharding ----

  test("shard: every doc lands in exactly one shard; balance card sums to the corpus") {
    val total = docs.count()
    val totalChars = docs.agg(sum("n_chars")).head.getLong(0)
    val assign = TextAnalysis.shardAssign(docs, nShards = 8)
    assert(assign.count() == total)
    assert(assign.where(col("shard") < 0 || col("shard") >= 8).count() == 0)
    val bal = TextAnalysis.shardBalance(docs, nShards = 8).collect()
    assert(bal.map(_.getLong(1)).sum == total)
    assert(bal.map(_.getLong(2)).sum == totalChars)
  }

  test("shard: assignment is run-deterministic; bumping the seed re-deals") {
    val a = TextAnalysis.shardAssign(docs).orderBy("doc_id").collect()
    val b = TextAnalysis.shardAssign(docs).orderBy("doc_id").collect()
    assert(a.sameElements(b))
    val c = TextAnalysis.shardAssign(docs, seed = "v2").orderBy("doc_id").collect()
    assert(a.zip(c).exists { case (x, y) => x.getInt(3) != y.getInt(3) },
      "a new seed should move at least one document")
  }

  test("shard: partitioned export layout is reproducible and prunable") {
    def export(path: String): Unit =
      docs.join(TextAnalysis.shardAssign(docs, 4).select("doc_id", "shard"),
          Seq("doc_id"))
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    val t1 = java.nio.file.Files.createTempDirectory("graft_exp1").toString
    export(t1)
    val back = spark.read.parquet(t1)
    assert(back.count() == docs.count())
    val dirs = new java.io.File(t1).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("shard=")).sorted
    assert(dirs.sameElements(Array("shard=0", "shard=1", "shard=2", "shard=3")))
    // single-shard read = that shard's assignment, via partition pruning
    val one = back.where(col("shard") === 2).count()
    assert(one ==
      TextAnalysis.shardAssign(docs, 4).where(col("shard") === 2).count())
    // a second export writes the identical (doc_id, shard) layout
    val t2 = java.nio.file.Files.createTempDirectory("graft_exp2").toString
    export(t2)
    val a = spark.read.parquet(t1).select("doc_id", "shard")
      .orderBy("doc_id").collect()
    val b = spark.read.parquet(t2).select("doc_id", "shard")
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  // ---- per-source quota cap ----

  test("cap: at most N per source; an under-quota source keeps every doc") {
    val capped = Dedup.capPerSource(docs, maxPerSource = 3)
    val perSrc = capped.groupBy("source").count().collect()
    assert(perSrc.forall(_.getLong(1) <= 3))
    val srcSizes = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perSrc.foreach { r =>
      val want = math.min(3L, srcSizes(r.getString(0)))
      assert(r.getLong(1) == want, s"source ${r.getString(0)}")
    }
  }

  test("cap: two-phase salted pre-prune is lossless vs the one-window reference") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(graft.functions.Functions.sha32(concat(lit("cap:"), col("doc_id"))),
        col("doc_id"))
    val ref = docs
      .withColumn("rk", row_number().over(w)).where(col("rk") <= 5)
      .select("doc_id", "source", "rk").orderBy("source", "rk").collect()
    for (salts <- Seq(1, 4, 16)) {
      val got = Dedup.capPerSource(docs, maxPerSource = 5, salts = salts).collect()
      assert(got.sameElements(ref), s"salts=$salts diverged from the reference")
    }
  }

  test("budget: per-source kept tokens never exceed the budget; prefix rule holds") {
    val b = 400L
    val kept = Dedup.tokenBudgetPerSource(docs, budgetTokens = b)
    val per = kept.groupBy("source").agg(sum("n_tok").as("t")).collect()
    assert(per.forall(_.getLong(1) <= b))
    // cum_tok is the running total and equals the per-source prefix sums
    kept.collect().groupBy(_.getString(1)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(3))
      var run = 0L
      sorted.foreach { r =>
        run += r.getLong(2)
        assert(r.getLong(3) == run, s"cum_tok mismatch in ${r.getString(1)}")
      }
    }
  }

  test("budget: prior-sum salted pre-prune is lossless vs the one-window reference") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(graft.functions.Functions.sha32(
        concat(lit("budget:v1:"), col("doc_id"))), col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    for (b <- Seq(100L, 800L, 5000L)) {
      val ref = docs.select(col("doc_id"), col("source"),
          size(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
            .cast("long").as("n_tok"))
        .withColumn("cum_tok", sum("n_tok").over(w))
        .where(col("cum_tok") <= b)
        .select("doc_id", "source", "n_tok", "cum_tok")
        .orderBy("source", "cum_tok", "doc_id").collect()
      for (salts <- Seq(1, 4, 16)) {
        val got = Dedup.tokenBudgetPerSource(docs, b, salts).collect()
        assert(got.sameElements(ref), s"budget=$b salts=$salts diverged")
      }
    }
  }

  // ---- cluster-size histogram ----

  test("cluster histogram: doc mass sums to the corpus; sizes match components") {
    val hist = Dedup.clusterSizeHistogram(docs).collect()
    assert(hist.map(_.getLong(2)).sum == docs.count(),
      "every doc belongs to exactly one cluster")
    val sizes = Dedup.lshComponents(docs).groupBy("cluster").count()
      .groupBy("count").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    hist.foreach { r =>
      assert(sizes(r.getLong(0)) == r.getLong(1), s"size ${r.getLong(0)}")
    }
  }

  // ---- token entropy ----

  test("entropy: degenerate docs — empty, single-token-repeated, all-distinct") {
    val d = Seq(
      (1L, ""), (2L, "spam spam spam spam"), (3L, "a b c d")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.tokenEntropy(d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getLong(1) == 0 && r(1L).getLong(4) == 0)
    // one distinct token: p=1, ln(1)=0 — zero entropy, ttr 2500 bps
    assert(r(2L).getLong(4) == 0 && r(2L).getLong(3) == 2500)
    // 4 uniform distinct tokens: 4 * round((1/4)·ln(4)·1e6)
    val term = math.floor(0.25 * math.log(4.0) * 1e6 + 0.5).toLong
    assert(r(3L).getLong(4) == 4 * term && r(3L).getLong(3) == 10000)
  }

  test("entropy: row-local pass equals the explode+agg reference on the corpus") {
    val toks = docs.select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0))).as("t"))
    val tc = toks.groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
    val n = tc.groupBy("doc_id")
      .agg(sum("c").as("n"), count(lit(1)).as("nd"))
    val ref = tc.join(n, "doc_id")
      .groupBy("doc_id")
      .agg(sum(round((col("c") / col("n")) * log(col("n") / col("c")) * 1e6)
        .cast("long")).as("e"))
      .join(n, "doc_id")
      .select(col("doc_id"), col("n"), col("nd"),
        (col("nd") * 10000 / col("n")).cast("long").as("ttr"), col("e"))
      .orderBy("doc_id").collect()
    val got = TextAnalysis.tokenEntropy(docs).collect()
    assert(got.length == ref.length)
    got.zip(ref).foreach { case (g, r) =>
      assert(g.getLong(0) == r.getLong(0) && g.getLong(1) == r.getLong(1) &&
        g.getLong(2) == r.getLong(2) && g.getLong(3) == r.getLong(3) &&
        g.getLong(4) == r.getLong(4), s"doc ${g.getLong(0)}: $g vs $r")
    }
  }

  // ---- release pipeline V2 ----

  test("releaseV2: monotone shrinkage; stages agree with the standalone operators") {
    val card = TextAnalysis.releasePipelineV2(docs, budgetTokens = 400)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val stages = Seq("00_input", "10_classify", "20_exact", "30_near", "40_budget")
    assert(card.keySet == stages.toSet)
    // docs and tokens only ever shrink down the chain
    stages.sliding(2).foreach { case Seq(a, b) =>
      assert(card(b)._1 <= card(a)._1 && card(b)._2 <= card(a)._2, s"$a -> $b grew")
    }
    assert(card("00_input")._1 == docs.count())
    // stage 1 = the standalone classifier's keep count
    assert(card("10_classify")._1 ==
      TextAnalysis.classifyQuality(docs).where(col("keep") === 1).count())
    // final stage respects the per-source token budget
    assert(card("40_budget")._2 <= 400L * docs.select("source").distinct().count())
  }

  // ---- degenerate inputs across the round-6 additions ----

  test("edge: empty / null-text corpus never throws across the new operators") {
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val nulls = Seq((1L, null: String, "en", "src0", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextAnalysis.shardBalance(empty).count() == 0)
    assert(TextAnalysis.tokenEntropy(empty).count() == 0)
    assert(TextAnalysis.classifyQuality(empty).count() == 0)
    assert(Dedup.capPerSource(empty).count() == 0)
    assert(Dedup.tokenBudgetPerSource(empty).count() == 0)
    // null text = zero tokens, not a crash; doc still shards and caps
    assert(TextAnalysis.shardAssign(nulls).count() == 1)
    val e = TextAnalysis.tokenEntropy(nulls).head
    assert(e.getLong(1) == 0 && e.getLong(4) == 0)
    val c = TextAnalysis.classifyQuality(nulls).head
    assert(c.getLong(1) == 0 && c.isNullAt(3))
    assert(Dedup.capPerSource(nulls).count() == 1)
    // null text = zero tokens: fits even a zero budget (nothing precedes it)
    assert(Dedup.tokenBudgetPerSource(nulls, budgetTokens = 0).count() == 1)
    val emptyEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.randomProject(emptyEmb).count() == 0)
    val emptyEv = Seq.empty[(java.sql.Timestamp, String)].toDF("ts", "event_type")
    assert(graft.operators.Temporal.rateAnomaly(emptyEv).count() == 0)
  }

  test("edge: budget 0 keeps a source's zero-token prefix; nShards 1 puts everything in shard 0") {
    // separate sources: prefix semantics within one source would also
    // (correctly) drop a zero-token doc that trails the overflow point
    val d = Seq((1L, "a b c", "en", "s1", 5L), (2L, "", "en", "s2", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = Dedup.tokenBudgetPerSource(d, budgetTokens = 0).collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(2L))
    val sh = TextAnalysis.shardAssign(d, nShards = 1).collect()
    assert(sh.forall(_.getInt(3) == 0))
  }

  // ---- hashing-trick quality classifier ----

  test("classify: matches an independent per-token weight fold; empty doc scores NULL") {
    def sha32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    def w(tok: String): Long = sha32(s"w:v1:${sha32(tok) % 1024}") % 2001 - 1000
    val d = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, "Gamma GAMMA gamma"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.classifyQuality(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    val exp1 = 2 * w("alpha") + w("beta")
    assert(got(1L).getLong(2) == exp1)
    assert(got(1L).getLong(3) == exp1 * 1000 / 3)
    assert(got(1L).getInt(4) == (if (exp1 >= 0) 1 else 0))
    assert(got(2L).getLong(1) == 0 && got(2L).isNullAt(3) && got(2L).getInt(4) == 0)
    // case folding: all three tokens hash identically
    assert(got(3L).getLong(2) == 3 * w("gamma"))
  }

  // ---- sign random projection ----

  test("rp: matches a naive sequential reference on sample vectors") {
    val sample = embs.where(col("vec_id") < 5)
      .select(col("vec_id").cast("long"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val got = Similarity.randomProject(embs.where(col("vec_id") < 5)).collect()
    // independent sign derivation (sha256 via java.security, parity of the
    // first-4-bytes big-endian value) and an explicit quantize-then-sum
    def sha32(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
        .digest(s.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    assert(got.length == 5 * 16)
    got.foreach { r =>
      val (id, k, y) = (r.getLong(0), r.getInt(1), r.getLong(2))
      val x = sample(id)
      val want = x.indices.map { j =>
        val xi = math.floor(math.abs(x(j).toDouble * 1e6) + 0.5).toLong *
          (if (x(j) < 0) -1 else 1)
        if (sha32(s"rp:v1:$j:$k") % 2 == 0) xi else -xi
      }.sum
      assert(y == want, s"vec $id k=$k")
    }
  }

  test("rp: projection preserves cluster structure on a clustered corpus (JL sanity)") {
    // the parquet embeddings are isotropic noise (same-label mean cosine
    // ≈ 0 — nothing to preserve), so JL sanity uses a deterministic
    // clustered corpus: 4 well-separated centroids + small per-point
    // perturbation, the same construction SimilarityQualitySpec uses
    def h(s: String, m: Int): Int = (math.abs(s.hashCode) % m)
    val pts = for (c <- 0 until 4; i <- 0 until 10) yield {
      val base = Array.tabulate(64)(j =>
        if (h(s"c:$c:$j", 2) == 0) 1.0f else -1.0f)
      val noisy = base.zipWithIndex.map { case (v, j) =>
        v + (h(s"n:$c:$i:$j", 100) - 50) / 500.0f }
      ((c * 10 + i).toLong, noisy, c)
    }
    val df = pts.map(p => (p._1, p._2)).toDF("vec_id", "embedding")
    val lab = pts.map(p => p._1 -> p._3).toMap
    val proj = Similarity.randomProject(df).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.sortBy(_.getInt(1)).map(_.getLong(2).toDouble).toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      dot / math.sqrt(na * nb)
    }
    val ids = proj.keys.toArray.sorted
    var (sSum, sN, dSum, dN) = (0.0, 0, 0.0, 0)
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val c = cos(proj(ids(i)), proj(ids(j)))
      if (lab(ids(i)) == lab(ids(j))) { sSum += c; sN += 1 }
      else { dSum += c; dN += 1 }
    }
    assert(sN > 0 && dN > 0)
    assert(sSum / sN > dSum / dN + 0.3,
      s"projection lost cluster structure: same=${sSum / sN} diff=${dSum / dN}")
  }

  // ---- hard-negative mining ----

  test("hardneg: every negative has a different label, ranks contiguous, cos non-increasing") {
    val rows = Similarity.hardNegatives(embs, nQueries = 4, k = 5).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getInt(1) != r.getInt(3)),
      "a hard negative shares its query's label")
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).toSeq == (1 to sorted.length),
        "ranks must be contiguous from 1")
      val cs = sorted.map(_.getDouble(4))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b },
        "cosine must be non-increasing in rank")
    }
  }

  test("hardneg: agrees with the top-k of the label-filtered brute-force ranking") {
    // independent reference: rank ALL different-label candidates per
    // query with bruteForceTopK's k wide open, filter, take 5
    val wide = Similarity.bruteForceTopK(embs.where(col("vec_id") < 200), nQueries = 4, k = 200)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val labels = embs.where(col("vec_id") < 200).select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val expected = wide.groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
      rs.filter(r => labels(r._2) != labels(qid))
        .sortBy(r => (-r._3, r._2)).take(5)
        .zipWithIndex.map { case ((_, cid, cos), i) => (qid, cid, cos, i + 1) }
    }.toSet
    val got = Similarity.hardNegatives(embs.where(col("vec_id") < 200), nQueries = 4, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(4), r.getInt(5)))
      .toSet
    assert(got == expected)
  }

  // ---- cross-split leakage audit ----

  test("split leakage: a planted train/test duplicate is flagged; same-split dups are not") {
    val t = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docsDf = Seq(
      (1L, t, "en", "web", t.length.toLong),
      (2L, t, "en", "web", t.length.toLong), // dup of 1
      (3L, "totally different words nothing shared here at all today friend",
        "en", "web", 60L),
      (4L, t + " lambda", "en", "web", 66L)  // near-dup of 1 (shares shingles)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val splits = Seq((1L, "train"), (2L, "test"), (3L, "test"), (4L, "train"))
      .toDF("doc_id", "split")
    val leaks = Dedup.splitLeakage(docsDf, splits).collect()
    assert(leaks.map(_.getLong(0)).toSeq == Seq(2L),
      s"only the test-side dup of a train doc should be flagged: ${leaks.toSeq}")
    val r = leaks.head
    assert(r.getString(1) == "test" && r.getLong(2) == 2L,
      "doc 2 has TWO train near-dups (1 exact, 4 near)")
    // same-split duplicates are dedup's business, not a leak
    val allTrain = Seq((1L, "train"), (2L, "train"), (3L, "train"), (4L, "train"))
      .toDF("doc_id", "split")
    assert(Dedup.splitLeakage(docsDf, allTrain).count() == 0)

    // APPLY form: exactly the leaked docs are dropped, nothing else
    val kept = Dedup.splitLeakageApply(docsDf, splits).collect()
      .map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L, 4L),
      s"apply must drop only the flagged doc 2: kept $kept")
  }

  // ---- quality tiers ----

  test("quality tiers: equal populations, monotone score bands, mass sums to corpus") {
    val tiers = TextAnalysis.qualityTiers(docs).collect()
    assert(tiers.length == 10)
    val total = docs.count()
    val sizes = tiers.map(_.getLong(1))
    assert(sizes.sum == total)
    assert(sizes.max - sizes.min <= 1, s"NTILE must balance: ${sizes.toSeq}")
    // bands are non-overlapping and increasing with the tier number
    tiers.sortBy(_.getInt(0)).sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getDouble(3) <= hi.getDouble(2) + 1e-9,
          s"tier ${lo.getInt(0)} max_q ${lo.getDouble(3)} above tier ${hi.getInt(0)} min_q ${hi.getDouble(2)}")
      case _ =>
    }
    val totalTokens = TextAnalysis.quality(docs)
      .agg(sum(col("n_tokens").cast("long"))).head.getLong(0)
    assert(tiers.map(_.getLong(4)).sum == totalTokens)
  }

  // ---- dedup method overlap ----

  test("method overlap: planted text-only, semantic-only and both pairs land in their bins") {
    val t1 = "alpha beta gamma delta epsilon zeta eta theta"
    val t2 = "one two three four five six seven eight nine ten"
    val t3 = "completely different words live here in this document today"
    val t4 = "nothing shared with any other text at all anywhere ever"
    val docsDf = Seq(
      (1L, t1), (2L, t1),   // identical text -> text pair
      (3L, t3), (4L, t4),   // different text -> no text pair
      (5L, t2), (6L, t2)    // identical text -> text pair
    ).toDF("doc_id", "text")
    def v(signs: Seq[Int], eps: Float): Array[Float] =
      signs.map(s => s * (1.0f + eps)).toArray
    val embDf = Seq(
      // 1,2: same bucket but orthogonal-ish? same-sign scalars are
      // always cosine 1 — so put them in DIFFERENT buckets (no pair)
      (1L, v(Seq(1, 1, 1, 1, 1, 1, 1, 1), 0f)),
      (2L, v(Seq(-1, 1, 1, 1, 1, 1, 1, 1), 0f)),
      // 3,4: same bucket, near-identical -> semantic pair
      (3L, v(Seq(1, -1, 1, -1, 1, -1, 1, -1), 0f)),
      (4L, v(Seq(1, -1, 1, -1, 1, -1, 1, -1), 0.01f)),
      // 5,6: same bucket, near-identical -> semantic pair (both-bin)
      (5L, v(Seq(-1, -1, 1, 1, -1, -1, 1, 1), 0f)),
      (6L, v(Seq(-1, -1, 1, 1, -1, -1, 1, 1), 0.01f))
    ).toDF("vec_id", "embedding")
    val got = Dedup.dedupMethodOverlap(docsDf, embDf, cosThreshold = 0.99)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("text_only" -> 1L, "semantic_only" -> 1L, "both" -> 1L),
      got.toString)
  }

  // ---- packing efficiency ----

  test("pack stats: utilization matches hand computation, tail overflow included") {
    // capacity 10; "one two three four" = 4 tokens per doc
    val four = "one two three four"
    val d = Seq((1L, four, "xx"), (2L, four, "xx"),
      (3L, four, "xx"), (4L, four, "yy"))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.packStats(d, capacity = 10).collect()
      .map(x => x.getString(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    // xx: offsets 0,4,8 -> all pack 0 -> 1 bin, 12 tokens, 12000 bps
    // (tail doc overflows the bin: streaming-concat semantics)
    assert(r("xx") == ((1L, 12L, 12000L)), r.toString)
    // yy: one 4-token doc in one 10-token bin -> 4000 bps
    assert(r("yy") == ((1L, 4L, 4000L)), r.toString)
    // corpus sanity: bins and mass positive for every lang
    TextAnalysis.packStats(docs).collect().foreach { x =>
      assert(x.getLong(1) > 0 && x.getLong(2) > 0 && x.getLong(3) > 0)
    }
  }

  // ---- temperature mixing ----

  test("mix temperature: T=2 shares are exact sqrt proportions; tails upsample, head downsamples") {
    // 1 / 4 / 16 docs -> sqrt 1 : 2 : 4 -> temp shares 1/7, 2/7, 4/7
    val d = ((1 to 1).map(i => (i.toLong, "a", "aa")) ++
      (2 to 5).map(i => (i.toLong, "b", "bb")) ++
      (6 to 21).map(i => (i.toLong, "c", "cc")))
      .toDF("doc_id", "text", "lang")
    val r = TextAnalysis.mixTemperature(d).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("aa").getDouble(3) == BigDecimal(1.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r("bb").getDouble(3) == BigDecimal(2.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r("cc").getDouble(3) == BigDecimal(4.0 / 7)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // upsample below-average languages, downsample the head
    assert(r("aa").getDouble(4) > 1.0 && r("cc").getDouble(4) < 1.0)
    // shares and temp shares each sum to ~1
    val s = r.values.map(_.getDouble(2)).sum
    val ts = r.values.map(_.getDouble(3)).sum
    assert(math.abs(s - 1.0) < 1e-4 && math.abs(ts - 1.0) < 1e-4)
    // corpus run: every lang present, deterministic across runs
    val c1 = TextAnalysis.mixTemperature(docs).collect()
    val c2 = TextAnalysis.mixTemperature(docs).collect()
    assert(c1.sameElements(c2))
  }

  // ---- feature matrix ----

  test("feature matrix: one row per >=2-token doc; columns equal the standalone signals") {
    val fm = TextAnalysis.featureMatrix(docs).collect()
    val nEligible = docs
      .where(size(split(lower(col("text")), "\\s+")) >= 2).count()
    assert(fm.length.toLong == nEligible,
      s"${fm.length} rows vs $nEligible eligible docs")
    // spot-check: every matrix value equals its standalone-signal source
    val ent = TextAnalysis.tokenEntropy(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    val rep = TextAnalysis.repetitionSignals(docs).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    fm.take(50).foreach { r =>
      assert(r.getLong(3) == ent(r.getLong(0)), s"ttr_bps drift at ${r.getLong(0)}")
      assert(r.getDouble(5) == rep(r.getLong(0)), s"top_word drift at ${r.getLong(0)}")
    }
  }

  // ---- compression-ratio signal ----

  test("compression ratio: repetitive text compresses far below prose; empty guarded; deterministic") {
    val prose = "the quick brown fox jumps over a lazy dog while seven " +
      "wizards brew quartz elixirs beyond the frozen viaduct at midnight"
    val d = Seq(
      (1L, Seq.fill(20)("spam alert").mkString(" ")),
      (2L, prose),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val r = TextAnalysis.compressionRatio(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(r(1L)._3 < r(2L)._3 / 2,
      s"repetitive must compress far below prose: ${r(1L)} vs ${r(2L)}")
    assert(r(3L) == ((0L, 0L, 0L)) && r(4L) == ((0L, 0L, 0L)))
    // bytes accounting: compressed <= 2x raw (buf bound), ratio consistent
    r.filterKeys(Set(1L, 2L)).values.foreach { case (raw, comp, bps) =>
      assert(comp > 0 && comp <= raw * 2 && bps == comp * 10000 / raw)
    }
    // fixed Deflate level -> reproducible across runs
    val again = TextAnalysis.compressionRatio(d).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3))).toMap
    assert(again == r)
    // corpus sanity: every non-empty doc yields a positive ratio
    val corpus = TextAnalysis.compressionRatio(docs)
    assert(corpus.where(col("n_bytes") > 0 && col("ratio_bps") <= 0).count() == 0)
  }

  // ---- kNN label-agreement audit ----

  test("knn classify: a planted mislabeled vector disagrees; clean cluster members agree") {
    // two tight clusters in the same sign bucket region; vector 5 sits
    // in cluster A's position but carries cluster B's label
    def v(base: Double, i: Int) = Seq.tabulate(8)(j =>
      (if (j == 0) base else 0.01 * (j + 1) + 0.001 * i).toFloat)
    val emb = (
      (0 to 2).map(i => (i.toLong, v(1.0, i), 10)) ++      // cluster A
      (3 to 4).map(i => (i.toLong, v(1.0, i) , 10)) ++     // more A
      Seq((5L, v(1.0, 5), 20))                             // planted: A-shaped, B-labeled
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnClassify(emb, bits = 2, k = 3).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val (lbl5, pred5, agree5) = out(5L)
    assert(lbl5 == 20 && pred5 == 10 && agree5 == 0,
      s"planted mislabel must be outvoted by its neighborhood: ${out(5L)}")
    (0L to 4L).foreach { i =>
      assert(out(i)._3 == 1, s"clean member $i flagged: ${out(i)}")
    }
  }
}
