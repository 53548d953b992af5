package graft.operators

import org.apache.spark.sql.DataFrame

/** Stage-boundary materialization policy for multi-stage operators
  * (releasePipeline, lshComponents).
  *
  * Round-4 verdict watch item: `localCheckpoint` writes executor-local
  * blocks — correct and cheap on one JVM, but on a real cluster a lost
  * executor loses the snapshot and the lineage it cut is gone. A
  * multi-executor pipeline materializes stages to RELIABLE storage (the
  * stage parquet a release pipeline keeps anyway). This helper makes that
  * an explicit, conf-driven choice instead of a code comment:
  *
  *   spark.graft.checkpoint = local     localCheckpoint (default; single-JVM
  *                                      benches, CI)
  *   spark.graft.checkpoint = reliable  SparkContext checkpoint dir (HDFS/
  *                                      object store on a cluster); requires
  *                                      `sparkContext.setCheckpointDir`
  *
  * Either way the snapshot cuts lineage eagerly and bypasses the
  * CacheManager, so repeated builds never alias each other's cache and a
  * bench's second run cannot silently hit the first run's cache.
  */
object Stage {

  /** Snapshot `df` at a stage boundary per the session's checkpoint mode;
    * identity when `materialize` is false (the all-lazy plan for plan
    * inspection and equivalence tests). */
  def snap(df: DataFrame, materialize: Boolean): DataFrame =
    if (!materialize) df
    else graft.GraftConf.string(df.sparkSession,
        graft.GraftConf.Checkpoint) match {
      case "reliable" =>
        require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "spark.graft.checkpoint=reliable requires sparkContext.setCheckpointDir")
        // eager: same semantics as localCheckpoint(), different storage
        df.checkpoint()
      case _ => df.localCheckpoint()
    }

  /** Snapshot whose materialization is DEFERRED to the caller's next
    * action — for loops that can fold useful work (a convergence count)
    * into the job that persists the snapshot, instead of paying an eager
    * checkpoint action PLUS a probe action per round
    * ([[graft.operators.Propagation]]).
    *
    * Local mode marks a lazy localCheckpoint: the first action computes
    * every partition once, persists the blocks, and truncates lineage.
    * Reliable mode stays EAGER — a non-eager reliable checkpoint re-runs
    * the whole lineage a second time to write the checkpoint files
    * (Spark's classic persist-before-checkpoint gotcha), which is worse
    * than the extra probe action it would save. */
  def snapLazy(df: DataFrame): DataFrame =
    graft.GraftConf.string(df.sparkSession,
        graft.GraftConf.Checkpoint) match {
      case "reliable" =>
        require(df.sparkSession.sparkContext.getCheckpointDir.isDefined,
          "spark.graft.checkpoint=reliable requires sparkContext.setCheckpointDir")
        df.checkpoint()
      case _ => df.localCheckpoint(eager = false)
    }
}
