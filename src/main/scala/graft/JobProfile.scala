package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Local instrumentation main (NOT part of the driver contract): runs the
  * catalog (or an argument subset) with a listener counting Spark jobs,
  * stages and tasks per query, printing one TSV line per query:
  *
  *   name  seconds  jobs  stages  tasks
  *
  * Rationale (VERDICT r21 item 1): ~345 sub-2 s queries are ~60% of the
  * bench total and the lever is per-query ACTION count — this tool ranks
  * the tail by (jobs × latency) so the lazy-checkpoint / fold-the-cache-
  * prime-into-the-first-action pattern is applied where it pays, not
  * blindly. Listener events are async; a short drain sleep after each
  * query is fine at instrumentation precision (±1 job would not change
  * the ranking).
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks)
      }
    })

    val picked =
      if (args.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(args.toSet).toMap
    println("name\tseconds\tjobs\tstages\ttasks")
    picked.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      Thread.sleep(150) // let the listener bus drain the previous query
      jobs.set(0); stages.set(0); tasks.set(0)
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).count(); "" }
      catch { case t: Throwable => "\tERR:" + t.getClass.getSimpleName }
      val dt = (System.nanoTime() - t0) / 1e9
      Thread.sleep(150)
      println(f"$name\t$dt%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}$err")
    }
    spark.stop()
  }
}
