package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Last-wins collapse of a CDC micro-batch to ONE row per id — shared
  * by every index upsert path ([[LexIndex]], [[DedupIndex]],
  * [[AnnIndex]], [[AnnIndexPq]]).
  *
  * A micro-batch legitimately carries several versions of the same
  * entity (two edits inside one trigger window), and each upsert's
  * generation algebra assumes ONE row per id: without the collapse the
  * lexical path unioned both versions' tokens and double-counted
  * `n_docs`, the signature path minhashed a chimera of both texts, and
  * the ANN paths landed the vector twice in the live generation — all
  * silent, permanent index corruption (round-11 review).
  *
  * Winner order: by `seqCol` when the feed carries one (a CDC offset /
  * modified-at column), else deterministically by the row's remaining
  * columns (max struct) so replays pick the same winner either way.
  * One narrow groupBy on the BATCH only — never corpus-sized. */
private[graft] object CdcBatch {

  def collapse(batch: DataFrame, idCol: String,
      seqCol: String = ""): DataFrame = {
    val others = batch.columns.filterNot(_ == idCol).toSeq
    if (others.isEmpty) return batch.dropDuplicates(idCol)
    require(seqCol.isEmpty || others.contains(seqCol),
      s"seqCol '$seqCol' is not a column of the upsert batch")
    val ord =
      if (seqCol.nonEmpty) col(seqCol) +: others.filterNot(_ == seqCol).map(col)
      else others.map(col)
    batch.groupBy(col(idCol))
      .agg(max(struct(ord: _*)).as("w"))
      .select(col(idCol) +: others.map(c => col(s"w.$c").as(c)): _*)
  }
}
