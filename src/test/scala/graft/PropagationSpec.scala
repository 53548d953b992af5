package graft

import graft.operators.Propagation
import org.apache.spark.sql.functions._

/** The shared propagation core's convergence contract: exact component
  * minima at any chain depth — via the size-gated single-task union-find
  * on small edge sets (round 13), or Borůvka hook-and-contract past the
  * bound (round 14; replaced the pointer-doubling loop) — with the loud
  * backstop still reachable via a tiny maxRounds. Loop-specific tests force
  * the distributed path by zeroing the gate conf. */
class PropagationSpec extends SparkSpec {
  import spark.implicits._

  /** Run `f` with the union-find size gate disabled — every fixpoint
    * call inside takes the distributed round loop. */
  private def withLoopForced[A](f: => A): A = {
    spark.conf.set("spark.graft.components.localEdges", "0")
    try f finally spark.conf.unset("spark.graft.components.localEdges")
  }

  /** Symmetric edge set of a path 0—1—…—(n−1): the worst case for plain
    * one-hop min-label (needs n−1 rounds). */
  private def pathEdges(n: Int) = {
    val dir = (0 until n - 1).map(i => (i.toLong, i.toLong + 1))
    (dir ++ dir.map(_.swap)).toDF("a", "b")
  }

  test("fixpoint loop labels a 60-hop path with its minimum in O(log d) rounds") {
    val r = withLoopForced {
      Propagation.minLabelCounted(pathEdges(60), "doc_id")
    }
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1))
    assert(labels.length == 60)
    assert(labels.forall(_._2 == 0L),
      s"split component: ${labels.filter(_._2 != 0L).take(5).toSeq}")
    // hook-and-contract (round 14): the min-neighbor hook forest on the
    // path compresses to roots inside the round's pointer-jumping inner
    // loop, so the OUTER round count stays O(log) — plain one-hop
    // min-label would need 60 rounds
    assert(r.rounds <= 10,
      s"contraction regressed: ${r.rounds} rounds for a 60-hop path")
  }

  test("hook-and-contract closes a diameter-63 chain under every id ordering in O(log n) rounds") {
    // the round-14 pointer-doubling killer: orderings where ids INCREASE
    // toward the component minimum (reversed, modular wrap) degenerated
    // the old loop to one hop per round. Hooking follows edges, so all
    // three orderings must close fast and label with the global min.
    val n = 64
    val orderings: Seq[(String, Int => Long)] = Seq(
      "monotone" -> (i => i.toLong),
      "reversed" -> (i => (n - 1 - i).toLong),
      "wrapped" -> (i => ((i + 40) % n).toLong)) // min mid-chain
    for ((name, ids) <- orderings) {
      val dir = (0 until n - 1).map(i => (ids(i), ids(i + 1)))
      val edges = (dir ++ dir.map(_.swap)).toDF("a", "b")
      val r = withLoopForced {
        Propagation.minLabelCounted(edges, "doc_id")
      }
      assert(r.rounds <= 10, s"$name ordering took ${r.rounds} rounds")
      val labels = r.labels.collect().map(x => x.getLong(1)).distinct
      assert(labels.toSeq == Seq(0L), s"$name ordering mislabeled: $labels")
    }
  }

  test("small edge sets dispatch to the union-find: one job, same labels") {
    val r = Propagation.minLabelCounted(pathEdges(60), "doc_id")
    assert(r.rounds == 1, s"gate missed: ran ${r.rounds} distributed rounds")
    val labels = r.labels.collect().map(x => x.getLong(0) -> x.getLong(1))
    assert(labels.length == 60 && labels.forall(_._2 == 0L))
  }

  test("union-find and the distributed loop agree across seeded random graphs") {
    // three regimes: sparse (mostly chains/trees), near the phase
    // transition (one giant component), dense (few components) — the
    // shapes where a components bug would hide differently
    for ((seed, nEdges, nVerts) <- Seq((13, 400, 120), (101, 90, 150),
        (7, 1200, 80))) {
      val rnd = new scala.util.Random(seed)
      val dir = (0 until nEdges).map(_ =>
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
        .filter { case (a, b) => a != b }
      val edges = (dir ++ dir.map(_.swap)).toDF("a", "b")
      val uf = Propagation.minLabel(edges, "doc_id")
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val loop = withLoopForced {
        Propagation.minLabel(edges, "doc_id")
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      }
      assert(uf == loop, s"strategies diverged at seed $seed")
    }
  }

  test("contract-then-close ≡ union-find across seeded random grouped graphs") {
    // the generic two-phase core (round 14: shared by the embedding-cell
    // AND lexical-band engines): pairs partitioned into arbitrary groups
    // — including pairs REPEATED across groups and adversarially
    // unbalanced group sizes — must compose to exactly the one-shot
    // union-find's components
    for ((seed, nEdges, nVerts, nGroups) <- Seq((13, 400, 120, 7),
        (101, 90, 150, 1), (7, 1200, 80, 40))) {
      val rnd = new scala.util.Random(seed)
      val dir = (0 until nEdges).map(_ =>
        (rnd.nextInt(nVerts).toLong, rnd.nextInt(nVerts).toLong))
        .filter { case (a, b) => a != b }
      // each pair lands in 1–2 groups (the multi-probe/multi-band shape)
      val grouped = dir.flatMap { case (a, b) =>
        val g1 = rnd.nextInt(nGroups).toLong
        val g2 = rnd.nextInt(nGroups).toLong
        if (rnd.nextBoolean()) Seq((g1, a, b)) else Seq((g1, a, b), (g2, a, b))
      }.toDF("gkey", "d1", "d2")
      val viaContract = withLoopForced {
        Propagation.contractThenClose(grouped, "doc_id",
            materialize = true, maxRounds = Propagation.DefaultMaxRounds)
          .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      }
      val viaUf = Propagation.minLabel(
          (dir ++ dir.map(_.swap)).toDF("a", "b"), "doc_id")
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(viaContract == viaUf, s"two-phase diverged at seed $seed")
    }
  }

  test("lexical components: forced band-contraction path ≡ the union-find gate (round-14 #5)") {
    // the sf0.01 documents corpus at the default MinHash scheme: conf=0
    // pushes lshComponents down the past-bound path (band-local
    // union-find, condensed closure through the loop); default conf
    // resolves the same pair graph through the single-task union-find.
    // Exact components both ways — rows must be identical.
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select("doc_id", "text")
    def run() = graft.operators.Dedup.lshComponents(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val viaUf = run()
    val viaBands = withLoopForced(run())
    assert(viaUf.nonEmpty &&
      viaUf.count(t => t._1 != t._2) > 0, "vacuous fixture: no clusters")
    assert(viaBands == viaUf)
  }

  test("union-find at scale: 60k-vertex permuted path + disjoint cliques, exact against ground truth") {
    // stresses the primitive parent map through several capacity grows
    // and deep path compression — the regimes the small specs never
    // reach. Ground truth is known by construction (no reference
    // implementation to drift against): a PATH over a seeded permutation
    // of [0, 60000) is one component labeled by the global min; 100
    // disjoint 40-cliques over a shifted id space each label by their
    // own min.
    val n = 60000
    val perm = new scala.util.Random(97).shuffle((0 until n).toVector)
      .map(_.toLong + 1000000L) // offset: min is NOT the first insert
    val pathDir = (0 until n - 1).map(i => (perm(i), perm(i + 1)))
    val cliqueDir = for {
      c <- 0 until 100; i <- 0 until 40; j <- 0 until 40 if i < j
    } yield (5000000L + c * 100 + i, 5000000L + c * 100 + j)
    // symmetric for the minLabel contract; the gate dispatches to the
    // union-find (asserted via rounds == 1)
    val dir = pathDir ++ cliqueDir
    val edges = (dir ++ dir.map(_.swap)).toDF("a", "b")
    val r = Propagation.minLabelCounted(edges, "doc_id")
    assert(r.rounds == 1, s"gate missed at 128k edges: ${r.rounds} rounds")
    val labels = r.labels
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(labels.size == n + 4000)
    val pathMin = perm.min
    perm.foreach(v => assert(labels(v) == pathMin, s"path vertex $v"))
    for (c <- 0 until 100; i <- 0 until 40) {
      val v = 5000000L + c * 100 + i
      assert(labels(v) == 5000000L + c * 100, s"clique $c vertex $v")
    }
  }

  test("fixpoint is exact on a multi-component graph of paths, stars and edges") {
    // components: {0..4} path, {10,11,12} star on 11, {20,21} edge
    val dir = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L),
      (11L, 10L), (11L, 12L), (20L, 21L))
    val edges = (dir ++ dir.map(_.swap)).toDF("a", "b")
    val got = Propagation.minLabel(edges, "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val want = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 0L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L)
    assert(got == want)
  }

  test("bounded-unroll form stays pure one-hop (oracle-mirror shape)") {
    // 3 bounded rounds reach exactly 3 hops down the path — no doubling
    val labels = Propagation.minLabel(pathEdges(10), "doc_id", rounds = 3)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    (0 until 10).foreach { v =>
      assert(labels(v.toLong) == math.max(0, v - 3).toLong,
        s"vertex $v: got ${labels(v.toLong)}")
    }
  }

  test("backstop still fails loudly when the cap is genuinely too small") {
    val e = intercept[IllegalStateException] {
      withLoopForced {
        Propagation.minLabelCounted(pathEdges(40), "doc_id", maxRounds = 2)
      }
    }
    assert(e.getMessage.contains("did not converge"))
  }

  test("folded convergence: forced-loop action census is ~1 job per snapshot (round-15)") {
    // ask #6: every snapReset in the hook-and-contract loop is a LAZY
    // checkpoint mark whose convergence/stability count is the job that
    // persists it — the eager-snap + separate-probe form paid one extra
    // job per snapshot (≈2× total actions). AQE/broadcast sub-jobs make
    // raw job ids a noisy census, so both are disabled here: one action
    // = one job exactly. A monotone 60-hop path converges in ONE outer
    // round with ~6 inner compression steps; folded-form jobs = 1 (edge
    // init) + 1 (comp init) + steps + 1 (contract) + 1 (final labels
    // snap) + 1 (collect) ≈ 11–12. The eager form pays 8 + 2·steps ≈ 21
    // on the same fixture. 15 is the regression tripwire.
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sparkContext.setJobGroup("prop-census", "action census")
    val r = try withLoopForced {
      val l = Propagation.minLabelCounted(pathEdges(60), "doc_id")
      l.labels.collect()
      l
    } finally {
      spark.sparkContext.clearJobGroup()
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
    val jobs =
      spark.sparkContext.statusTracker.getJobIdsForGroup("prop-census").length
    assert(r.rounds <= 10)
    assert(jobs <= 15,
      s"action census regressed: $jobs jobs for ${r.rounds} rounds — " +
        "did a snapReset go back to eager, or a probe action reappear?")
  }

  test("loop converges on a dense clique in 2 rounds regardless of size") {
    val n = 12
    val dir = for (i <- 0 until n; j <- 0 until n if i != j)
      yield (i.toLong, j.toLong)
    val r = withLoopForced {
      Propagation.minLabelCounted(dir.toDF("a", "b"), "doc_id")
    }
    assert(r.labels.where(col("label") =!= 0L).count() == 0L)
    assert(r.rounds <= 3, s"clique took ${r.rounds} rounds")
  }
}
