package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared min-label propagation over a symmetric edge set — the
  * connected-components core behind BOTH dedup engines
  * ([[Dedup.lshComponents]], lexical MinHash pair graph) and
  * [[Similarity.semanticDedup]] (embedding-cosine pair graph). One loop,
  * one convergence contract, one backstop: convergence work lands once
  * instead of drifting between the two files (the round-10 state — the
  * lexical side was convergence-driven while the semantic side silently
  * kept a fixed 3-round cap, the exact under-clustering defect the
  * fixpoint had just fixed lexically).
  *
  * `rounds <= 0` (the production default) iterates until a round changes
  * no label — exact connected components at ANY chain depth, capped at
  * `maxRounds` as a loud pathological-graph backstop ([[DefaultMaxRounds]]
  * unless the caller raises it for a corpus whose duplicate chains are
  * genuinely deeper; a parameter, not a code change — round-10 advice).
  * A positive `rounds` keeps the bounded-unroll form for oracle mirrors
  * and shallow-graph equivalence specs.
  *
  * Scale posture: each round is one narrow (edge ⋈ label) equi-join over
  * the pair-graph VERTEX set only (isolated docs never enter; callers
  * union them back), checkpointed per round so plan depth stays O(1) in
  * the round count. The convergence test is FOLDED INTO the checkpoint
  * materialization: the round's single action counts changed labels
  * while the lazily-marked checkpoint persists its blocks — round 10
  * paid an eager checkpoint PLUS a separate `isEmpty` per round, and
  * `isEmpty`'s take(1) escalation (scan 1 partition, then 4, then 20…)
  * made the "cheap" test 2–4 scheduler round-trips on an
  * about-to-converge graph. That constant was the real component of
  * dd_near_apply's round-10 bench regression. */
object Propagation {

  /** Backstop for the fixpoint loop: no realistic near-dup cluster has a
    * diameter anywhere near this, so hitting it means the pair graph is
    * pathological (and the run fails loudly rather than silently
    * under-clustering). Callers with measured deeper chains pass a larger
    * `maxRounds` instead of editing this. */
  val DefaultMaxRounds = 64

  /** Labels every vertex of `edges` with the minimum id reachable from it.
    *
    * @param edges symmetric edge set with columns (a, b) — callers snapshot
    *              it first (every round joins it)
    * @param idCol output vertex-id column name ("doc_id" / "vec_id")
    * @param rounds <= 0 → iterate to convergence; positive → exactly that
    *               many bounded rounds (oracle-mirror form)
    * @param materialize false keeps the all-lazy plan (plan inspection /
    *                    equivalence tests); fixpoint mode requires true
    * @return (idCol, label) over the edge vertex set ONLY — isolated docs
    *         are the caller's union */
  def minLabel(edges: DataFrame, idCol: String, rounds: Int = 0,
      materialize: Boolean = true,
      maxRounds: Int = DefaultMaxRounds): DataFrame = {
    val fixpoint = rounds <= 0
    val vertices = edges.select(col("a").as(idCol)).distinct()
    var labels = vertices.select(col(idCol), col(idCol).as("label"))
    val cap = if (fixpoint) maxRounds else rounds
    var round = 0
    var converged = false
    while (!converged && round < cap) {
      val nbrMin = edges.join(labels, edges("b") === labels(idCol))
        .groupBy(col("a")).agg(min("label").as("nl"))
      // the previous round's label rides along so the convergence test is
      // a scan of THIS round's snapshot, not a join back to the old one
      val stepped = labels
        .join(nbrMin, labels(idCol) === nbrMin("a"), "left_outer")
        .select(col(idCol), col("label").as("prev_label"),
          least(col("label"), coalesce(col("nl"), col("label"))).as("label"))
      if (fixpoint) {
        // ONE action: the count's job computes every partition of the
        // lazily-checkpoint-marked frame, persisting the round's snapshot
        // and producing the changed-label count in the same pass. Labels
        // only ever decrease, so "no label changed" IS the global fixpoint.
        // (materialize=false — the all-lazy plan-inspection form — skips
        // the checkpoint and pays the per-round re-derivation; fine on
        // the fixture-sized graphs that form inspects.)
        val snapped = if (materialize) Stage.snapLazy(stepped) else stepped
        converged =
          snapped.where(col("label") =!= col("prev_label")).count() == 0L
        labels = snapped.select(idCol, "label")
      } else {
        labels = Stage.snap(stepped.select(idCol, "label"), materialize)
      }
      round += 1
    }
    if (fixpoint && !converged)
      throw new IllegalStateException(
        s"min-label propagation did not converge in $maxRounds rounds — " +
          "pathological pair graph (diameter beyond any near-dup cluster); " +
          "raise maxRounds only if the chain depth is genuinely real")
    labels
  }
}
