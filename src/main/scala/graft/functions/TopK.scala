package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored row inside a [[TopKByScore]] buffer: ranks by
  * (score DESC, id ASC) — the same deterministic total order the
  * window-rank form `row_number() OVER (ORDER BY score DESC, id)` uses,
  * so the two plans are row-for-row interchangeable. */
case class Scored(score: Long, id: Long)

/** Bounded top-k aggregate: keeps the k best (score DESC, id ASC) rows
  * per group in a size-k sorted buffer, merged associatively.
  *
  * The 100 TB point — this replaces the `row_number() OVER (PARTITION
  * BY g ORDER BY ...) <= k` idiom, whose physical plan shuffles EVERY
  * row of the fact to its group's reducer and sorts the whole group,
  * with a two-phase aggregate: each map task keeps a k-row buffer per
  * group (partial aggregation), so the shuffle carries at most
  * k × groups × partitions rows and the reducer merges k-row lists
  * instead of sorting millions. For k=3 over a billion-row group the
  * window form sorts a billion rows; this form moves ≤ k per map task.
  *
  * Buffer invariant: sorted best-first, length ≤ k. `merge` is a
  * sorted-list merge truncated at k — associative and commutative, so
  * the result is independent of partitioning (spec-pinned by
  * re-running under different repartitions).
  */
case class TopKByScore(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  require(k > 0, s"k must be positive, got $k")

  @inline private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (buf.lengthCompare(k) >= 0 && better(buf.last, x)) buf
    else {
      val (pre, post) = buf.span(better(_, x))
      val merged = (pre :+ x) ++ post
      if (merged.lengthCompare(k) > 0) merged.take(k) else merged
    }

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] = {
    val out = Vector.newBuilder[Scored]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && better(a(i), b(j)))
      if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoder[Seq[Scored]]()
}

object TopK {
  /** `byScore(k)(scoreCol, idCol)` aggregates to `array<struct<score,
    * id>>` — the group's k best rows, best first. Explode with
    * `posexplode` to recover (rank-1, row) pairs. */
  def byScore(k: Int): UserDefinedFunction =
    udaf(TopKByScore(k), Encoders.product[Scored])
}
