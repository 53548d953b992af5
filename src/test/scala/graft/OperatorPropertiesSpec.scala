package graft

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

/** Property checks for the round-2 operators against independent
  * reference computations on a seeded random corpus — the operators'
  * optimized dataflows (hashed-set joins, single-pass window loop,
  * iterative label propagation) must agree with the naive definitions,
  * not just with the fixed oracle fixtures.
  */
class OperatorPropertiesSpec extends SparkSpec {

  import spark.implicits._

  private val rnd = new scala.util.Random(42)
  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "iota", "kappa", "lambda", "the", "of", "and")
  private def randomDoc(n: Int): String =
    Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
  private val docs: Seq[(Long, String)] =
    (0L until 80L).map(i => i -> randomDoc(20 + rnd.nextInt(120)))
  private lazy val docsDf = docs.toDF("doc_id", "text")

  private def sha32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes(UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  test("jaccardConsecutive equals the naive token-set jaccard") {
    val expected = docs.sliding(2).collect {
      case Seq((d1, t1), (d2, t2)) if d2 == d1 + 1 =>
        val a = t1.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
        val b = t2.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
        val inter = a.intersect(b).size.toDouble
        (d1, d2) -> BigDecimal(inter / (a.size + b.size - inter))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Dedup.jaccardConsecutive(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - expected(k)) < 1e-9, s"$k: $v vs ${expected(k)}")
    }
  }

  test("winnow equals the naive window/band-min definition") {
    val (w, band) = (8, 4)
    val expected = docs.flatMap { case (id, text) =>
      val hs = text.toLowerCase.split("\\s+").filter(_.nonEmpty).map(sha32)
      if (hs.length < w) Nil
      else {
        val windows = (0 to hs.length - w).map { i =>
          (0 until w).map(d => hs(i + d) * math.pow(7, w - 1 - d).toLong)
            .sum % 4294967296L
        }
        windows.zipWithIndex.groupBy(_._2 / band).toSeq.map {
          case (b, ws) => (id, b.toLong, ws.map(_._1).min)
        }
      }
    }.toSet
    val got = TextAnalysis.winnow(docsDf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("winnow: null text degrades to no rows; w >= 12 is refused loudly (sum would wrap)") {
    import spark.implicits._
    // round-11 review: the null path NPE'd the executor task; and at
    // w = 12 the un-reduced rolling sum can exceed Long.MaxValue, so
    // fingerprints would silently go negative instead of failing
    val withNull = Seq((1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = TextAnalysis.winnow(withNull).collect()
    assert(rows.nonEmpty && rows.forall(_.getLong(0) == 1L),
      "null text must contribute nothing, not kill the job")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.winnow(withNull, w = 12)
    }
    assert(e.getMessage.contains("overflow"), e.getMessage)
  }

  test("scrub is idempotent and masks everything it counts") {
    val withPii = docsDf.select(col("doc_id"),
      concat(col("text"), lit(" a.b@x-mail.org 9876543 https://h.test/q")).as("text"))
    val once = TextAnalysis.scrub(withPii)
    val twice = TextAnalysis.scrub(once.select(col("doc_id"), col("scrubbed").as("text")))
    val joined = once.select(col("doc_id"), col("scrubbed").as("s1"))
      .join(twice.select(col("doc_id"), col("scrubbed").as("s2"),
        col("n_emails"), col("n_urls"), col("n_nums")), Seq("doc_id"))
      .collect()
    joined.foreach { r =>
      assert(r.getAs[String]("s1") == r.getAs[String]("s2"), "scrub not idempotent")
      assert(r.getAs[Int]("n_emails") == 0 && r.getAs[Int]("n_urls") == 0 &&
        r.getAs[Int]("n_nums") == 0, "masked text still counts PII")
    }
  }

  test("split is deterministic with ~90/5/5 fractions") {
    val ids = (0L until 10000L).map(i => i -> "").toDF("doc_id", "text")
    val a = TextAnalysis.split(ids).collect().map(r => r.getLong(0) -> r.getString(2))
    val b = TextAnalysis.split(ids).collect().map(r => r.getLong(0) -> r.getString(2))
    assert(a.toSeq == b.toSeq, "split must be run-deterministic")
    val frac = a.groupBy(_._2).view.mapValues(_.length / 10000.0).toMap
    assert(math.abs(frac("train") - 0.9) < 0.02, frac.toString)
    assert(math.abs(frac("val") - 0.05) < 0.01, frac.toString)
    assert(math.abs(frac("test") - 0.05) < 0.01, frac.toString)
  }

  test("approximate distinct (HLL) tracks the exact token count within tolerance") {
    // the sketch path a 100 TB cardinality estimate would take (exact
    // distinct = full shuffle; approx = mergeable fixed-size sketch)
    val tok = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(regexp_extract_all(lower(col("text")),
        lit("[a-z]+"), lit(0))).as("w"))
    val exact = tok.distinct().count()
    val approx = tok.agg(approx_count_distinct(col("w"), 0.02)).head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("lshComponents converged: an extra propagation round changes nothing") {
    // controlled near-dup chains (diameter <= 2 hops) over a random base
    val base = (0L until 30L).map(i => i -> randomDoc(80 + rnd.nextInt(40)))
    val chain = base.flatMap { case (i, t) =>
      val v1 = t.replaceFirst("alpha", "ALPHAX")
      Seq(i * 10 -> t, i * 10 + 1 -> v1, i * 10 + 2 -> v1.replaceFirst("beta", "BETAX"))
    }.toDF("doc_id", "text")
    val r3 = Dedup.lshComponents(chain, rounds = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r4 = Dedup.lshComponents(chain, rounds = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r3 == r4, "3 rounds must already be converged on small-diameter clusters")
    // the fixpoint (default) form equals the bounded form wherever the
    // bound suffices — the shallow-graph equivalence leg of the round-10
    // convergence change
    val fix = Dedup.lshComponents(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fix == r3, "fixpoint diverged from the converged bounded form")
    // and the chains actually clustered
    assert(r3(1L) == 0L || r3(2L) == r3(1L), r3.take(6).toString)
  }

  test("TopKByScore: merge is associative/commutative and equals brute force on random streams (seeded)") {
    import graft.functions.{Scored, TopKByScore}
    val agg = TopKByScore(5)
    val r = new scala.util.Random(1234)
    (1 to 50).foreach { _ =>
      val xs = Seq.fill(r.nextInt(40))(Scored(r.nextInt(10).toLong, r.nextInt(1000).toLong))
      val ys = Seq.fill(r.nextInt(40))(Scored(r.nextInt(10).toLong, r.nextInt(1000).toLong))
      val zs = Seq.fill(r.nextInt(40))(Scored(r.nextInt(10).toLong, r.nextInt(1000).toLong))
      def buf(v: Seq[Scored]) = v.foldLeft(agg.zero)(agg.reduce)
      val (a, b, c) = (buf(xs), buf(ys), buf(zs))
      // commutative and associative
      assert(agg.merge(a, b) == agg.merge(b, a))
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
      // merged partials equal one sequential fold over the union
      val all = (xs ++ ys ++ zs).sortBy(x => (-x.score, x.id))
        .foldLeft(agg.zero)(agg.reduce)
      assert(agg.merge(agg.merge(a, b), c) == all,
        "merged partials diverged from the sequential fold")
      assert(all.size <= 5)
    }
  }
}
