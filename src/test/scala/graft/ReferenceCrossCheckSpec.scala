package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.operators.{Dedup, Temporal}

/** Property cross-checks against INDEPENDENT sequential reference
  * implementations (written from the operator definitions, sharing no
  * code with the distributed versions): on randomized inputs the full
  * output tables must match row for row. This catches partition-order,
  * window-frame and tie-break bugs that fixed examples miss.
  */
class ReferenceCrossCheckSpec extends SparkSpec {

  import spark.implicits._

  private def check(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ---- duplicateSpans reference ----
  private def refSpans(docs: Seq[(Long, String)], l: Int)
      : Map[Long, (Long, Long, Long, Long, Long)] = {
    val toks = docs.map { case (id, t) =>
      id -> "\\S+".r.findAllIn(t.toLowerCase).toVector
    }.toMap
    val gramDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
    toks.foreach { case (id, ts) =>
      if (ts.length >= l)
        (0 to ts.length - l).foreach { i =>
          val g = ts.slice(i, i + l).mkString(" ")
          gramDocs(g) = gramDocs.getOrElse(g, Set.empty) + id
        }
    }
    toks.map { case (id, ts) =>
      val dupPos =
        if (ts.length < l) Seq.empty[Int]
        else (0 to ts.length - l).filter { i =>
          gramDocs(ts.slice(i, i + l).mkString(" ")).size >= 2
        }.map(_ + 1) // 1-based
      // merge [i, i+l-1] intervals
      var spans = List.empty[(Int, Int)]
      dupPos.foreach { i =>
        spans match {
          case (s, e) :: rest if i <= e => spans = (s, math.max(e, i + l - 1)) :: rest
          case _ => spans = (i, i + l - 1) :: spans
        }
      }
      val covered = spans.map { case (s, e) => e - s + 1 }.sum
      id -> ((ts.length.toLong, math.max(ts.length - l + 1, 0).toLong,
        dupPos.length.toLong, spans.length.toLong, covered.toLong))
    }
  }

  test("duplicateSpans matches the sequential reference on random corpora") {
    // small shared vocab + injected shared phrases force cross-doc grams
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val phrase = Gen.listOfN(9, word).map(_.mkString(" "))
    val doc = for {
      pre <- Gen.listOf(word).map(_.take(6))
      ph <- Gen.oneOf(true, false)
      shared <- phrase
      post <- Gen.listOf(word).map(_.take(6))
    } yield (pre ++ (if (ph) Seq(shared) else Nil) ++ post).mkString(" ")
    val corpus = Gen.choose(2, 6).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(corpus) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val got = Dedup.duplicateSpans(df, l = 4).collect().map { r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      }.toMap
      got == refSpans(docs, l = 4)
    })
  }

  // ---- asofAttribution reference ----
  private def refAsof(events: Seq[(Long, Long, Long, String)])
      : Map[Long, (Option[Long], Option[Long])] = {
    events.filter(e => e._4 == "purchase" || e._4 == "click")
      .groupBy(_._2).flatMap { case (_, evs) =>
        var lastClick: Option[(Long, Long)] = None
        evs.sortBy(e => (e._3, e._1)).flatMap { case (id, _, ts, typ) =>
          if (typ == "click") { lastClick = Some((id, ts)); None }
          else Some(id -> ((lastClick.map(_._1), lastClick.map(_._2))))
        }
      }
  }

  test("intervalJoin matches a nested-loop reference on random feeds") {
    val ev = for {
      user <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 5000L)
      typ <- Gen.oneOf("click", "purchase", "view")
    } yield (user, ts, typ)
    val feed = Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, ev))
    check(Prop.forAll(feed) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, ts, typ), i) =>
        (i.toLong, u, ts, typ)
      }
      val df = rows.toDF("event_id", "user_id", "s", "event_type")
        .select(col("event_id"), col("user_id"),
          timestamp_seconds(col("s")).as("ts"), col("event_type"))
      val got = Temporal.intervalJoin(df, horizonMinutes = 30).collect()
        .map(r => (r.getLong(0), r.getLong(3))).toSet
      // reference: literal nested loop over all (purchase, click) pairs
      val ref = (for {
        (pid, pu, pts, pt) <- rows if pt == "purchase"
        (cid, cu, cts, ct) <- rows
        if ct == "click" && cu == pu &&
          cts <= pts && cts >= pts - 1800L
      } yield (pid, cid)).toSet
      got == ref
    })
  }

  test("funnel matches a sequential step-fold reference on random feeds") {
    val ev = for {
      user <- Gen.choose(1L, 4L)
      ts <- Gen.choose(0L, 50L)
      typ <- Gen.oneOf("signup", "click", "purchase", "view")
    } yield (user, ts, typ)
    val feed = Gen.choose(0, 30).flatMap(n => Gen.listOfN(n, ev))
    check(Prop.forAll(feed) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, ts, typ), i) =>
        (i.toLong, u, ts, typ)
      }
      val df = rows.toDF("event_id", "user_id", "s", "event_type")
        .select(col("event_id"), col("user_id"),
          timestamp_seconds(col("s")).as("ts"), col("event_type"))
      val got = Temporal.funnel(df).collect().sortBy(_.getInt(0))
        .map(r => (r.getLong(2), r.getDouble(3))).toSeq
      // reference: per user, fold first-at-or-after times step by step
      // (None = step 1, no floor; Some(m) = user must appear in m)
      val byUser = rows.groupBy(_._2)
      def stepTimes(step: String,
          prev: Option[Map[Long, Long]]): Map[Long, Long] =
        byUser.flatMap { case (u, es) =>
          val floor = prev.map(_.get(u))
          floor match {
            case Some(None) => None // user fell out at an earlier step
            case _ =>
              es.filter(e => e._4 == step &&
                  floor.flatten.forall(e._3 >= _)).map(_._3)
                .minOption.map(u -> _)
          }
        }
      val s1 = stepTimes("signup", None)
      val s2 = stepTimes("click", Some(s1))
      val s3 = stepTimes("purchase", Some(s2))
      val n1 = s1.size.toLong
      def conv(n: Long) =
        if (n1 == 0) 0.0 else math.round(n.toDouble / n1 * 10000).toDouble / 10000
      got == Seq((n1, conv(n1)), (s2.size.toLong, conv(s2.size)),
        (s3.size.toLong, conv(s3.size)))
    }, n = 40)
  }

  test("asofAttribution matches the sequential reference, ties included") {
    // a SMALL timestamp domain forces same-ts ties between clicks and
    // purchases — exactly where window tie-break bugs live
    val ev = for {
      user <- Gen.choose(1L, 3L)
      ts <- Gen.choose(0L, 9L)
      typ <- Gen.oneOf("click", "purchase", "view")
    } yield (user, ts, typ)
    val feed = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n, ev))
    check(Prop.forAll(feed) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, ts, typ), i) =>
        (i.toLong, u, ts, typ)
      }
      val df = rows.toDF("event_id", "user_id", "s", "event_type")
        .select(col("event_id"), col("user_id"),
          timestamp_seconds(col("s")).as("ts"), col("event_type"))
      val got = Temporal.asofAttribution(df).collect().map { r =>
        r.getLong(0) -> ((if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4) / 1000000L)))
      }.toMap
      got == refAsof(rows)
    })
  }

  test("cohortRetention matches a sequential reference on random feeds") {
    val wk = 7L // use a 7-"second" week so random feeds span many cohorts
    val ev = for {
      user <- Gen.choose(1L, 5L)
      ts <- Gen.choose(0L, 40L)
      typ <- Gen.oneOf("signup", "click", "purchase", "view")
    } yield (user, ts, typ)
    val feed = Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, ev))
    check(Prop.forAll(feed) { evs =>
      val rows = evs.zipWithIndex.map { case ((u, ts, typ), i) =>
        (i.toLong, u, ts, typ)
      }
      val df = rows.toDF("event_id", "user_id", "s", "event_type")
        .select(col("event_id"), col("user_id"),
          timestamp_seconds(col("s")).as("ts"), col("event_type"))
      val got = Temporal.cohortRetention(df, weekMicros = wk * 1000000L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
        .toMap
      // reference: per user the min signup time; then distinct
      // (cohort, offset, user) over at-or-after-signup activity
      val signup = rows.filter(_._4 == "signup").groupBy(_._2)
        .view.mapValues(_.map(_._3).min).toMap
      val sizes = signup.groupBy { case (_, es) => es / wk }
        .view.mapValues(_.size.toLong).toMap
      val triangle = rows
        .flatMap { case (_, u, ts, _) =>
          signup.get(u).filter(ts >= _).map(es => (es / wk, (ts - es) / wk, u))
        }.distinct
        .groupBy { case (c, o, _) => (c, o) }
        .view.mapValues(_.size.toLong).toMap
      val want = triangle.map { case ((c, o), n) => (c, o) -> (n, sizes(c)) }
      got == want
    })
  }

  test("bigramSurprisal matches a sequential reference on random corpora") {
    // tiny vocabulary → heavy bigram collisions, plus empty and 1-token
    // docs (the sequence() guard path)
    val word = Gen.oneOf("a", "b", "ab", "ba", "x")
    val doc = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, doc))
    check(Prop.forAll(corpus) { docs =>
      val rows = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val got = graft.operators.TextAnalysis
        .bigramSurprisal(rows.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      val toks = rows.map { case (id, t) =>
        id -> "[a-z]+".r.findAllIn(t.toLowerCase).toSeq
      }.toMap
      val bgs = toks.view.mapValues(ws => ws.zip(ws.drop(1))).toMap
      val cbg = bgs.values.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val cl = bgs.values.flatten.groupBy(_._1).view.mapValues(_.size).toMap
      def micro(bg: (String, String)): Long =
        math.round(math.log(cl(bg._1).toDouble / cbg(bg)) / math.log(2.0) * 1e6)
      val want = toks.map { case (id, _) =>
        id -> (bgs(id).size.toLong, bgs(id).map(micro).sum)
      }
      got == want
    })
  }
}
