package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-census profiler for single queries (optimization-round harness):
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.Profile lx_search"
  * Runs each named query once warm (untimed) then once measured, printing
  * one line per Spark JOB (wall ms, stages, tasks, description tail) plus
  * the per-query total and job count — the "where do the seconds go"
  * breakdown the UI would give if it were enabled: a query whose time is
  * many ~100 ms jobs is scheduling-constant-bound (fix: fewer actions);
  * one with a few fat jobs is compute/shuffle-bound (fix: the plan).
  * Master/partitions mirror Bench (local[$SPARK_GRAFT_CPUS]).
  */
object Profile {
  private final case class JobRow(id: Int, start: Long, var end: Long,
    var stages: Int, var tasks: Int, desc: String)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, JobRow]()
    val order = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.put(e.jobId, JobRow(e.jobId, e.time, 0L, 0, 0, d))
        order.add(e.jobId)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        Option(jobs.get(e.jobId)).foreach(_.end = e.time)
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        // charge the stage to the newest unfinished job — good enough for
        // the sequential single-query runs this harness does
        val it = order.iterator()
        var last: JobRow = null
        while (it.hasNext) {
          val r = jobs.get(it.next())
          if (r != null && r.end == 0L) last = r
        }
        if (last != null) {
          last.stages += 1
          last.tasks += e.stageInfo.numTasks
        }
      }
    })
    // same untimed warmup as Bench
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // warm run (codegen/classload), untimed
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case t: Throwable => println(s"WARM FAIL $name: $t") }
      jobs.clear(); order.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200) // let listener events drain
      import scala.jdk.CollectionConverters._
      val rows = order.asScala.flatMap(id => Option(jobs.get(id))).toSeq
      println(f"===== $name: wall=$wall%.2fs jobs=${rows.size} =====")
      for (r <- rows) {
        val ms = if (r.end > 0) r.end - r.start else -1L
        println(f"  job=${r.id}%3d ${ms}%6d ms stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.desc.takeRight(90)}")
      }
      val sumMs = rows.filter(_.end > 0).map(r => r.end - r.start).sum
      println(f"  job-time sum=${sumMs / 1000.0}%.2fs vs wall=$wall%.2fs (gap = driver/plan/commit time)")
    }
    spark.stop()
  }
}
