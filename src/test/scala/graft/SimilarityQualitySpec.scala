package graft

import graft.operators.Similarity

/** The ANN operators must APPROXIMATE well, not just run: IVF top-k is
  * graded by its recall against the brute-force baseline on the same
  * corpus (deterministic inputs → exact, reproducible recall numbers).
  * Multi-probe and the k-means refinement must not degrade recall below
  * the single-probe seed quantizer.
  */
class SimilarityQualitySpec extends SparkSpec {

  private lazy val embeddings = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private def resultSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect().toSeq
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap

  private def recall(approx: Map[Long, Set[Long]], exact: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).intersect(truth).size.toDouble / truth.size
    }
    per.sum / per.size
  }

  test("IVF recall vs brute force is real, and multi-probe strictly helps") {
    val exact = resultSet(Similarity.bruteForceTopK(embeddings))
    val ivf1 = recall(resultSet(Similarity.ivfTopK(embeddings)), exact)
    val ivf2 = recall(resultSet(Similarity.ivfTopK(embeddings, nProbes = 2)), exact)
    // single-probe over 8 coarse cells must beat random cell assignment
    // (1/8 ≈ 0.125) by a wide margin, and probing 2 cells can only add
    // candidates — recall must be monotone in nProbes
    assert(ivf1 > 0.3, s"ivf single-probe recall $ivf1")
    assert(ivf2 >= ivf1, s"multi-probe recall $ivf2 < single-probe $ivf1")
  }

  test("knnGraph: in-bucket-exact (top-k of bucket-mates) and honest recall vs brute force") {
    import org.apache.spark.sql.functions._
    val got = Similarity.knnGraph(embeddings, bits = 8, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // independent reference: bucket locally, rank rounded cos per src
    val local = embeddings.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    def bucket(e: Array[Float]) =
      (0 until 8).map(i => if (e(i) >= 0f) '1' else '0').mkString
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byBucket = local.groupBy { case (_, e) => bucket(e) }
    val expected = byBucket.values.toSeq.flatMap { mates =>
      mates.toSeq.flatMap { case (src, es) =>
        mates.toSeq.filter(_._1 != src)
          .map { case (dst, ed) => (src, dst, cos(es, ed)) }
          .sortBy { case (_, dst, c) => (-c, dst) }.take(3)
          .zipWithIndex.map { case ((s, d, c), i) => (s, d, c, i + 1) }
      }
    }.toSet
    assert(got.toSet == expected, "knnGraph must be exactly top-k within each bucket")
    // recall vs global brute force on the query head. At spec scale
    // 8-bit buckets are sparse (256 buckets over a small corpus), so
    // recall is measured at 2 bits — 4 dense buckets; the sign-bucket
    // trade (coarser buckets = more candidates = higher recall) is the
    // operator's tuning knob, and the in-bucket-exactness above holds
    // at every bits setting
    val exact = resultSet(Similarity.bruteForceTopK(embeddings, nQueries = 8, k = 3))
    val coarse = Similarity.knnGraph(embeddings, bits = 2, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val approx = coarse.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      .filter { case (s, _) => exact.contains(s) }
    assert(approx.nonEmpty, "query-head vectors all alone in their 4 buckets?")
    val r = recall(approx.map { case (k2, v) => k2 -> v },
      exact.filter { case (k2, _) => approx.contains(k2) })
    assert(r > 0.3, s"knn-graph recall $r vs brute force at 2-bit buckets")
  }

  test("int8 quantization respects the mathematical error bound") {
    // symmetric rounding quantization: per-dim error <= scale/2, so
    // mse <= scale^2/4 — a hard invariant, not a tuned threshold
    Similarity.quantizeInt8(embeddings).collect().foreach { r =>
      val scale = r.getDouble(1)
      val mse = r.getDouble(3)
      assert(mse <= scale * scale / 4 + 1e-12,
        s"vec ${r.getLong(0)}: mse $mse > bound ${scale * scale / 4}")
      // codes (JSON-serialized for the driver gate) stay in the int8 range
      val codes = r.getString(2).stripPrefix("[").stripSuffix("]")
        .split(",").filter(_.nonEmpty).map(_.trim.toInt)
      assert(codes.forall(c => c >= -127 && c <= 127))
    }
  }

  test("k-means refinement keeps recall at least competitive with the seed quantizer") {
    val exact = resultSet(Similarity.bruteForceTopK(embeddings))
    val seed = recall(resultSet(Similarity.ivfTopK(embeddings)), exact)
    val refined = recall(resultSet(Similarity.ivfKmeansTopK(embeddings)), exact)
    // Lloyd step re-balances cells; on this corpus it must not collapse
    // recall (allow small movement either way — cell boundaries shift)
    assert(refined >= seed - 0.15, s"refined $refined vs seed $seed")
    assert(refined > 0.3, s"refined recall $refined")
  }

  test("pqTopK: ADC recall against exact L2 is far above chance") {
    import org.apache.spark.sql.functions._
    val q = embeddings.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val d2 = aggregate(zip_with(col("qe"), col("ce"), (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, x) => a + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d"), col("cid"))
    val exact = q.crossJoin(c).where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), d2.as("d"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
    val r = recall(resultSet(Similarity.pqTopK(embeddings)), resultSet(exact))
    // 8 codes over 16-centroid blocks on a near-random corpus: measured
    // ≈0.25 recall@5 vs the ≈0.01 random baseline — assert the margin,
    // not the point estimate
    assert(r > 0.15, s"ADC recall $r")
  }

  test("ivfPqTopK: composed cell-pruned ADC search stays above chance, deterministic") {
    import org.apache.spark.sql.functions._
    val q = embeddings.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    val c = embeddings.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val d2 = aggregate(zip_with(col("qe"), col("ce"), (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, x) => a + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d"), col("cid"))
    val exact = q.crossJoin(c).where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), d2.as("d"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
    val r = recall(resultSet(Similarity.ivfPqTopK(embeddings)), resultSet(exact))
    // probing 2 of 8 cells scans ~25% of an unclustered corpus; measured
    // recall@5 ≈0.15 vs ≈0.01 chance — assert the margin
    assert(r > 0.08, s"IVF-PQ recall $r")
    val again = Similarity.ivfPqTopK(embeddings).collect().map(_.toString).toSeq
    assert(again == Similarity.ivfPqTopK(embeddings).collect().map(_.toString).toSeq)
  }

  test("ivfPqTopK on a CLUSTERED corpus: trained coarse + residual ADC finds the cluster") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // same clustered regime as the encode test: 8 separated centers
    // (= the seeds) + 6 members each. Exact L2 top-5 for each center
    // query is its own cluster's members; the composed search (probe 2
    // trained cells, rank by residual ADC) must recover most of them —
    // this is the regime the IVF-PQ composition exists for, vs the
    // ~0.15 recall it gets on the near-random corpus above
    def center(c: Int): Array[Float] =
      Array.tabulate(64)(j => (math.sin(c * 97 + j) * 50).toFloat)
    val vecs = (0 until 8).map(c => (c.toLong, center(c))) ++
      (0 until 48).map { i =>
        val c = i % 8
        val p = center(c).zipWithIndex.map { case (v, j) =>
          v + (math.cos(i * 31 + j) * 0.5).toFloat
        }
        ((8 + i).toLong, p)
      }
    val df = vecs.toDF("vec_id", "embedding")
    val qe = df.select(col("vec_id").as("qid"), col("embedding").as("q"))
      .where(col("qid") < 8)
    val c = df.select(col("vec_id").as("cid"), col("embedding").as("ce"))
    val d2 = aggregate(zip_with(col("q"), col("ce"), (x, y) =>
      (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
      lit(0.0), (a, x) => a + x)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("d"), col("cid"))
    val exact = resultSet(qe.crossJoin(c).where(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), d2.as("d"))
      .withColumn("rn", row_number().over(w)).where(col("rn") <= 5))
    val r = recall(resultSet(Similarity.ivfPqTopK(df)), exact)
    assert(r > 0.8, s"clustered IVF-PQ recall $r")
  }

  test("ivfPqEncode: residual PQ beats raw PQ on a CLUSTERED corpus") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 8 well-separated cluster centers (= the coarse seeds, vec_id < 8)
    // + 6 members each, perturbed by a small deterministic offset —
    // exactly the regime the residual decomposition exists for
    def center(c: Int): Array[Float] =
      Array.tabulate(64)(j => (math.sin(c * 97 + j) * 50).toFloat)
    val vecs = (0 until 8).map(c => (c.toLong, center(c))) ++
      (0 until 48).map { i =>
        val c = i % 8
        val p = center(c).zipWithIndex.map { case (v, j) =>
          v + (math.cos(i * 31 + j) * 0.5).toFloat
        }
        ((8 + i).toLong, p)
      }
    val df = vecs.toDF("vec_id", "embedding")
    def totalErr(res: org.apache.spark.sql.DataFrame): Long =
      res.agg(sum("err_nano")).collect().head.getLong(0)
    val raw = totalErr(Similarity.pqEncode(df))
    val ivfpq = totalErr(Similarity.ivfPqEncode(df))
    // with the TRAINED coarse quantizer (seeds + one Lloyd round) the
    // residuals concentrate around each cluster mean: measured 3.95×
    // error reduction vs raw PQ on this corpus, against 1.42× with
    // round 5's untrained seeds (raw PQ's 16 per-block centroids already
    // capture 8 clusters well, which bounds the achievable margin) —
    // assert a conservative 2.5×, not the point estimate
    assert(ivfpq * 5 < raw * 2,
      s"residual PQ ($ivfpq) must beat raw PQ ($raw) by >=2.5x on clustered data")
    // every member lands in its own cluster's coarse cell
    val cells = Similarity.ivfPqEncode(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until 48).foreach { i =>
      assert(cells((8 + i).toLong) == (i % 8).toLong,
        s"member ${8 + i} in cell ${cells((8 + i).toLong)}, expected ${i % 8}")
    }
  }

  test("centroidOutliers flags a planted mislabeled vector, in-cluster members pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two tight clusters with OPPOSED directions; one vector carries
    // the wrong label — anti-correlated with its class prototype
    def base(sign: Int): Array[Float] =
      Array.tabulate(16)(j => (sign * (10 + j)).toFloat)
    def member(sign: Int, i: Int): Array[Float] =
      base(sign).zipWithIndex.map { case (v, j) =>
        v + (math.cos(i * 13 + j) * 0.3).toFloat }
    val rows =
      (0 until 6).map(i => (i.toLong, member(+1, i), 0)) ++
      (0 until 6).map(i => ((10 + i).toLong, member(-1, i), 1)) :+
      ((99L, member(-1, 7), 0)) // negative-cluster vector labeled 0
    val df = rows.toDF("vec_id", "embedding", "label")
    val got = graft.operators.Similarity.centroidOutliers(df, threshold = -0.10)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got(99L) == 1, s"planted mislabel not flagged: $got")
    assert(got.filterNot(_._1 == 99L).values.forall(_ == 0),
      s"clean members flagged: $got")
  }

  test("pqEncode: codes are m ints in centroid range; error is nonnegative") {
    Similarity.pqEncode(embeddings).collect().foreach { r =>
      val codes = r.getString(1).stripPrefix("[").stripSuffix("]")
        .split(",").filter(_.nonEmpty).map(_.trim.toInt)
      assert(codes.length == 8, r.toString)
      assert(codes.forall(c => c >= 0 && c < 16), r.toString)
      assert(r.getLong(2) >= 0L, r.toString)
    }
  }

  test("pqEncode reconstructs a <=nCentroids-pattern corpus exactly (err 0)") {
    import spark.implicits._
    // 16 distinct patterns as seeds; vectors 16..19 duplicate patterns —
    // every cluster is internally identical, so the Lloyd centroid IS the
    // pattern and reconstruction error is exactly zero everywhere, and
    // duplicates encode to the same codes as their originals.
    def pattern(p: Int): Array[Float] =
      Array.tabulate(64)(j => (math.sin(p * 64 + j) * 10).toFloat)
    val vecs = (0 until 16).map(p => (p.toLong, pattern(p))) ++
      (16 until 20).map(i => (i.toLong, pattern(i % 4)))
    val df = vecs.toDF("vec_id", "embedding")
    val rows = Similarity.pqEncode(df).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows.values.forall(_._2 == 0L), rows.toString)
    (16 until 20).foreach { i =>
      assert(rows(i.toLong)._1 == rows((i % 4).toLong)._1,
        s"duplicate $i codes differ from original ${i % 4}")
    }
  }

  test("semanticDecontaminate: a planted benchmark copy is flagged; a strict threshold flags nothing else") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // benchmark = every 20th vector; train contains vec 1 PLUS an exact
    // copy of benchmark vec 0 re-keyed as 9999
    val bench = embeddings.where(col("vec_id") % 20 === 0)
    val copy = bench.where(col("vec_id") === 0)
      .withColumn("vec_id", lit(9999L))
    val train = embeddings.where(col("vec_id") % 20 =!= 0).unionByName(copy)

    val strict = Similarity.semanticDecontaminate(train, bench, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(strict.exists { case (v, _, c, b) => v == 9999L && c >= 0.999 && b == 0L },
      s"planted copy not flagged: ${strict.mkString(", ")}")
    // at cosine >= 0.999 only genuine copies flag on this corpus
    assert(strict.forall(_._1 == 9999L), s"false flags: ${strict.mkString(", ")}")

    // disjoint-bucket guard: flags only ever name bucket-mate pairs,
    // and every flagged id is a train id (never a benchmark id)
    val loose = Similarity.semanticDecontaminate(train, bench, threshold = 0.25)
      .collect().map(_.getLong(0)).toSet
    assert(loose.contains(9999L))
    assert(loose.forall(v => v == 9999L || v % 20 != 0))
  }

  test("non-contiguous id space: every topk probes a FULL query head set, shift-equivariant") {
    // round-11 review: `vec_id < nQueries` selected NOTHING on a
    // filtered corpus whose smallest id exceeds nQueries — the exact
    // hazard the rank-based centroid seeding already guards. Heads are
    // now the nQueries SMALLEST ids, so shifting every id by a constant
    // must shift the results and nothing else.
    import org.apache.spark.sql.functions._
    val shift = 1000000L
    val shifted = embeddings.withColumn("vec_id", col("vec_id") + shift)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val cases: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      ("bruteForce", e => Similarity.bruteForceTopK(e, nQueries = 4, k = 3)),
      ("hardNeg", e => Similarity.hardNegatives(e, nQueries = 4, k = 3)
        .select(col("qid"), col("cid"))),
      ("ivf", e => Similarity.ivfTopK(e, nQueries = 4, k = 3)),
      ("ivfKmeans", e => Similarity.ivfKmeansTopK(e, nQueries = 4, k = 3)),
      ("pq", e => Similarity.pqTopK(e, nQueries = 4, k = 3)),
      ("ivfPq", e => Similarity.ivfPqTopK(e, nQueries = 4, k = 3)))
    for ((name, f) <- cases) {
      val base = rows(f(embeddings))
      val got = rows(f(shifted))
      assert(got.nonEmpty, s"$name: empty result on a shifted id space")
      assert(got.map(_._1).distinct.size == 4,
        s"$name: expected 4 query heads, got ${got.map(_._1).distinct}")
      assert(got == base.map { case (q, c) => (q + shift, c + shift) },
        s"$name: shifted results are not the shifted base results")
    }
  }

  test("prototypesPrune drops the most-prototypical floor(frac*n) per cell, cluster-balanced") {
    import org.apache.spark.sql.functions._
    val rows = Similarity.prototypesPrune(embeddings, dropFrac = 0.3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.length == embeddings.count(),
      "pruning must audit every vector, not just survivors")
    // per cell: exactly floor(0.3*n) dropped, and the dropped set is the
    // TOP of the prototypicality ranking (every dropped cosine >= every
    // kept cosine within the cell)
    rows.groupBy(_._2).foreach { case (cell, members) =>
      val dropped = members.filter(!_._6)
      val kept = members.filter(_._6)
      assert(dropped.length == math.floor(0.3 * members.length).toInt,
        s"cell $cell: ${dropped.length} dropped of ${members.length}")
      if (dropped.nonEmpty && kept.nonEmpty)
        assert(dropped.map(_._3).min >= kept.map(_._3).max,
          s"cell $cell: dropped a less-prototypical member than one kept")
      // cluster balance: small cells (n < 4) lose at most one member
      if (members.length < 4) assert(dropped.length <= 1)
    }
    // dropFrac = 0 keeps everything; dropFrac = 1 keeps nothing
    val all = Similarity.prototypesPrune(embeddings, dropFrac = 0.0).collect()
    assert(all.forall(_.getBoolean(5)))
    val none = Similarity.prototypesPrune(embeddings, dropFrac = 1.0).collect()
    assert(none.forall(!_.getBoolean(5)))
  }

  test("prototypesPruneApprox tracks the exact form per cell within quantile slack") {
    import org.apache.spark.sql.functions._
    val exact = Similarity.prototypesPrune(embeddings, dropFrac = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(5)))
    val approx = Similarity.prototypesPruneApprox(embeddings, dropFrac = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(5)))
    assert(approx.length == exact.length)
    val exCells = exact.groupBy(_._2)
    approx.groupBy(_._2).foreach { case (cell, members) =>
      val exDropped = exCells(cell).count(!_._3)
      val apDropped = members.count(!_._3)
      // at accuracy 10000 on fixture-sized cells the t-digest quantile is
      // near-exact; ties at the cut KEEP (the conservative direction), so
      // the approx form may drop slightly fewer — never wildly different
      assert(math.abs(apDropped - exDropped) <= math.max(2, exDropped / 5),
        s"cell $cell: approx dropped $apDropped vs exact $exDropped")
    }
    // the approx prune must still drop the TOP of the ranking: every
    // dropped cosine >= every kept cosine within a cell
    val byId = Similarity.prototypesPruneApprox(embeddings, dropFrac = 0.3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getBoolean(5)))
    byId.groupBy(_._1).foreach { case (cell, ms) =>
      val d = ms.filter(!_._3); val k = ms.filter(_._3)
      if (d.nonEmpty && k.nonEmpty)
        assert(d.map(_._2).min >= k.map(_._2).max, s"cell $cell inverted")
    }
  }

  test("bucketed decontamination flags a SUBSET of the exact baseline, with honest recall") {
    import org.apache.spark.sql.functions._
    val eval = embeddings.orderBy("vec_id").limit(8)
    val train = embeddings.join(eval.select("vec_id"), Seq("vec_id"), "left_anti")
    val threshold = 0.3
    val exact = Similarity
      .semanticDecontaminateExact(train, eval, threshold)
      .where(col("contaminated")).collect().map(_.getLong(0)).toSet
    val lsh = Similarity.semanticDecontaminate(train, eval, threshold = threshold)
      .collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty, "fixture produced no contamination — lower the threshold")
    // all bucketed paths require the same rounded cosine >= threshold;
    // buckets only restrict CANDIDATES, so flags can never exceed exact
    assert(lsh.subsetOf(exact),
      s"LSH flagged non-contaminated vectors: ${(lsh -- exact).take(5)}")
    val banded = Similarity
      .semanticDecontaminateBanded(train, eval, threshold = threshold)
      .collect().map(_.getLong(0)).toSet
    assert(banded.subsetOf(exact),
      s"banded flagged non-contaminated vectors: ${(banded -- exact).take(5)}")
    // the single 8-bit bucket's recall collapses at moderate cosine
    // (p^8; measured ~4% here) — the OR-amplified 8×4 banding is the
    // scale path and must recover a solid share of true contamination
    val lshRecall = lsh.size.toDouble / exact.size
    val bandedRecall = banded.size.toDouble / exact.size
    assert(bandedRecall > 0.5,
      s"banded recall $bandedRecall — banding is not amplifying")
    assert(bandedRecall > lshRecall,
      s"banded ($bandedRecall) must beat single-bucket ($lshRecall)")
  }

  /** Planted near-dups at an exact target cosine: rotate each seed
    * toward a deterministic orthogonalized direction. The plant's
    * cosine to its seed is the target by construction (6-dp rounding
    * verified in-test), so the planted pair set IS the exact truth. */
  private def plantPairs(seedRows: Array[org.apache.spark.sql.Row],
      targets: Seq[Double], idBase: Long): (Seq[(Long, Array[Float])], Set[(Long, Long)]) = {
    val rnd = new scala.util.Random(7)
    val planted = seedRows.zipWithIndex.map { case (r, i) =>
      val id = r.getLong(0)
      val e = r.getSeq[Float](1).toArray.map(_.toDouble)
      val target = targets(i % targets.size)
      val norm = math.sqrt(e.map(x => x * x).sum)
      val unit = e.map(_ / norm)
      // random direction, orthogonalized against the seed, normalized
      val g = Array.fill(e.length)(rnd.nextGaussian())
      val proj = g.zip(unit).map { case (x, u) => x * u }.sum
      val orth = g.zip(unit).map { case (x, u) => x - proj * u }
      val onorm = math.sqrt(orth.map(x => x * x).sum)
      val ang = math.acos(target)
      val w = unit.zip(orth).map { case (u, o) =>
        (math.cos(ang) * u + math.sin(ang) * o / onorm) * norm }
      (id, idBase + i, w.map(_.toFloat))
    }
    (planted.map(p => (p._2, p._3)).toSeq,
      planted.map(p => (p._1, p._2)).toSet)
  }

  test("cell-local near-dup: planted 0.9/0.99-cosine pairs recalled >= 0.9 (the round-11 verdict's #3 gate)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    val seeds = emb.orderBy("vec_id").limit(60).collect()
    val (plantRows, truth) = plantPairs(seeds, Seq(0.99, 0.90), 100000L)
    val corpus = emb.unionByName(
      plantRows.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")))
    // sanity: the plants really sit at the target cosine (>= 0.85 after
    // the 6-dp round), so threshold 0.85 admits every true pair
    val pairs = Similarity.cosineNearDupCells(corpus, threshold = 0.85)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = truth.count(pairs.contains).toDouble / truth.size
    assert(rec >= 0.9, s"cell-local planted-pair recall $rec < 0.9 " +
      s"(${truth.count(pairs.contains)}/${truth.size})")
  }

  test("cell recall AT THE GATED THRESHOLD (0.35) vs exact all-pairs >= the banded scheme it superseded") {
    // the round-11 band audit's stance, applied to the cell scheme: grade
    // recall at the OPERATING point, not only at planted 0.9/0.99 cosine
    // (cell co-membership is much weaker at 0.35, and the oracle mirrors
    // candidates — green is by-construction, so recall needs its own
    // exact baseline). Exact = brute-force all-pairs at the same rounded
    // cosine; both candidate schemes must be SUBSETS of it.
    import org.apache.spark.sql.functions._
    val threshold = 0.35
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val a = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    val exact = a.crossJoin(b).where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(graft.expressions.GraftFunctions.cosineSim(col("e1"), col("e2")), 6)
          .as("cos"))
      .where(col("cos") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val cells = Similarity.cosineNearDupCells(emb, threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val banded = Similarity.cosineNearDup(emb, threshold = threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cells.subsetOf(exact), s"cells found non-pairs: ${(cells -- exact).take(3)}")
    assert(banded.subsetOf(exact), s"banding found non-pairs: ${(banded -- exact).take(3)}")
    val cellsRecall = cells.size.toDouble / exact.size
    val bandedRecall = banded.size.toDouble / exact.size
    info(f"gated-threshold recall vs exact ${exact.size} pairs: " +
      f"cells $cellsRecall%.3f (${cells.size}), banded $bandedRecall%.3f (${banded.size})")
    assert(cellsRecall >= bandedRecall,
      f"cell scheme ($cellsRecall%.3f) must not trail the banding it " +
        f"superseded ($bandedRecall%.3f) at the gated threshold")
    assert(exact.size > 50, s"vacuous baseline: ${exact.size} exact pairs")
  }

  test("probes→recall curve at the gated threshold is monotone, with measured cost (round-13 ask #2)") {
    // the operating-point decision, measured instead of argued: recall
    // vs the exact all-pairs baseline AND candidate volume (threshold
    // −1 admits every candidate, so the pair count IS the cost) at
    // probes = 2/3/4. Recall must be monotone in probes (more cells per
    // vector can only add candidate pairs — same quantizer, superset
    // membership); the numbers land in SCALE.md §Round-14 where the
    // shipped default is justified.
    import org.apache.spark.sql.functions._
    val threshold = 0.35
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    graft.expressions.GraftFunctions.ensureRegistered(spark)
    val a = emb.select(col("vec_id").as("d1"), col("embedding").as("e1"))
    val b = emb.select(col("vec_id").as("d2"), col("embedding").as("e2"))
    val exact = a.crossJoin(b).where(col("d1") < col("d2"))
      .select(col("d1"), col("d2"),
        round(graft.expressions.GraftFunctions.cosineSim(col("e1"), col("e2")), 6)
          .as("cos"))
      .where(col("cos") >= threshold)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val curve = Seq(2, 3, 4).map { p =>
      val found = Similarity
        .cosineNearDupCells(emb, probes = p, threshold = threshold)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(found.subsetOf(exact),
        s"probes=$p found non-pairs: ${(found -- exact).take(3)}")
      val cands = Similarity
        .cosineNearDupCells(emb, probes = p, threshold = -1.0).count()
      (p, found.size.toDouble / exact.size, cands)
    }
    curve.foreach { case (p, r, c) =>
      info(f"probes=$p recall $r%.3f candidates $c") }
    curve.sliding(2).foreach { case Seq((p1, r1, _), (p2, r2, _)) =>
      assert(r2 >= r1, f"recall fell from $r1%.3f (probes=$p1) to " +
        f"$r2%.3f (probes=$p2) — same quantizer must be monotone")
    }
    assert(curve.head._2 > 0.3, "probes=2 recall collapsed — quantizer broken")
  }

  test("quantizer broadcast gate: shuffle-join assignment is row-identical to the broadcast path") {
    // round-12 review #4: the child-centroid broadcast is the flat
    // assignment's memory cliff at extreme c. Forcing the gate (bound 1
    // < c) must change ONLY the physical join strategy — the scored
    // pairs, and hence everything downstream, must be identical.
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select("vec_id", "embedding")
    def pairs() = Similarity.cosineNearDupCells(emb, threshold = 0.35)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val viaBroadcast = pairs()
    spark.conf.set("spark.graft.quantizer.broadcastCells", "1")
    val viaShuffle =
      try pairs()
      finally spark.conf.unset("spark.graft.quantizer.broadcastCells")
    assert(viaBroadcast.nonEmpty)
    assert(viaShuffle == viaBroadcast)
  }

  test("cell-local candidate volume grows LINEARLY with corpus size — the sub-quadratic exponent, measured") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
      .select("vec_id", "embedding")
    // threshold -1 admits every candidate, so the pair count IS the
    // candidate count
    val small = emb.where(col("vec_id") < 500)
    val cSmall = Similarity.cosineNearDupCells(small, threshold = -1.0).count()
    val cBig = Similarity.cosineNearDupCells(emb, threshold = -1.0).count()
    val ratio = cBig.toDouble / cSmall
    // 4x the data: a linear candidate scheme reads ~4x (cell count grows
    // with n, cell size stays ~cellTarget·probes); any fixed bucketing
    // (the superseded banded path included) reads ~16x. Slack to 7 for
    // quantizer-boundary noise; floor 2 keeps the test non-vacuous.
    assert(ratio <= 7.0,
      s"candidate growth $ratio at 4x data — quadratic exponent is back " +
        s"($cSmall -> $cBig)")
    assert(ratio >= 2.0, s"candidate growth $ratio implausibly flat " +
      s"($cSmall -> $cBig) — the measurement is broken")
  }

  test("hybrid ANN leg: fused recall@10 vs the brute hybrid is monotone in nProbes; full probe is exact") {
    // round-16 ask #7: the dedup probe has a probes→recall curve, the
    // hybrid retrieval stack didn't. Baseline = LexIndex.hybrid (brute
    // cosine vector leg); variant = hybridAnn (persisted AnnIndex leg)
    // at probes 1/2/4/8. More probes can only grow the vector pool
    // toward the brute pool, and at probes = nCells the pools are
    // IDENTICAL (same 6-dp rounding, same doc_id tiebreak, same self
    // exclusion), so the fused top-10 must match the baseline exactly.
    import org.apache.spark.sql.functions._
    import graft.operators.{AnnIndex, LexIndex}
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val lexRoot = java.nio.file.Files
      .createTempDirectory("graft_hyq_lex").toString
    val annRoot = java.nio.file.Files
      .createTempDirectory("graft_hyq_ann").toString
    LexIndex.build(spark, docs, lexRoot)
    AnnIndex.build(embeddings, annRoot)
    val terms = Seq("vector", "merge")
    val qids = (0L until 8L).toSeq
    val exact: Map[Long, Set[Long]] = qids.map { q =>
      q -> LexIndex.hybrid(spark, lexRoot, terms, embeddings, q, k = 10)
        .collect().map(_.getLong(0)).toSet
    }.toMap
    val queries = embeddings.where(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    def fusedRecall(nProbes: Int): Double = {
      val got = LexIndex.hybridAnn(spark, lexRoot, terms, annRoot,
        queries, k = 10, nProbes = nProbes)
        .collect().toSeq.groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
      recall(got, exact)
    }
    val byProbes = Seq(1, 2, 4, 8).map(p => p -> fusedRecall(p))
    byProbes.sliding(2).foreach { case Seq((pa, ra), (pb, rb)) =>
      assert(rb >= ra,
        s"fused recall not monotone: probes $pa→$pb gave $ra→$rb " +
          s"(full curve $byProbes)")
    }
    assert(byProbes.head._2 > 0.5,
      s"single-probe fused recall implausibly low: $byProbes")
    assert(byProbes.last._2 == 1.0,
      s"probing every cell must reproduce the brute hybrid: $byProbes")
  }
}
