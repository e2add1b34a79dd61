package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}

/** Dev-loop profiler: run NAMED declared queries under the Bench session
  * shape (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus, UTC, noop sink)
  * and report, per query: wall seconds (warm), Spark job count, stage count,
  * task count and summed task time — the "how many sequential jobs does this
  * query launch" number that job-level wall clock alone hides. Optionally
  * writes `.explain("formatted")` of the declared frame to <outDir>/<name>.txt.
  *
  * Usage: runMain graft.tools.ProfileQueries <sfDir> [--explain outDir] [--reps N] <name> [name...]
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    var sfDir: String = null
    var explainDir: Option[String] = None
    var reps = 2
    var perJob = false
    val names = scala.collection.mutable.Buffer[String]()
    var i = 0
    while (i < args.length) {
      args(i) match {
        case "--explain" => explainDir = Some(args(i + 1)); i += 2
        case "--reps" => reps = args(i + 1).toInt; i += 2
        case "--jobs" => perJob = true; i += 1
        case a => if (sfDir == null) sfDir = a else names += a; i += 1
      }
    }
    require(sfDir != null && names.nonEmpty,
      "usage: ProfileQueries <sfDir> [--explain outDir] [--reps N] <name>...")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var tasks = 0
    @volatile var taskNanos = 0L
    val jobLog = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val jobRows = scala.collection.mutable.Buffer[(Double, Int, String)]()
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1
        if (perJob) {
          val desc = Option(j.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(j.properties).flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("?")
          jobLog.put(j.jobId, (System.nanoTime(), desc))
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (perJob) Option(jobLog.remove(e.jobId)).foreach { case (t0, desc) =>
          jobRows.synchronized {
            jobRows += (((System.nanoTime() - t0) / 1e9, e.jobId, desc))
          }
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages += 1
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks += 1
        if (t.taskInfo != null) taskNanos += (t.taskInfo.finishTime - t.taskInfo.launchTime) * 1000000L
      }
    }
    spark.sparkContext.addSparkListener(listener)
    explainDir.foreach(d => new java.io.File(d).mkdirs())

    val all = graft.SparkEntry.queries
    names.foreach { name =>
      val fn = all.getOrElse(name, sys.error(s"unknown query $name"))
      def run(): Unit = fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      try {
        run() // warm: JIT + session-cached fixtures
        val times = (1 to reps).map { _ =>
          jobs = 0; stages = 0; tasks = 0; taskNanos = 0L
          jobRows.synchronized(jobRows.clear())
          val t0 = System.nanoTime()
          run()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[prof] $name%-28s min=${times.min}%7.3f s  jobs=$jobs%3d stages=$stages%3d tasks=$tasks%5d taskSec=${taskNanos / 1e9}%8.2f")
        if (perJob) {
          val (_, phases) = graft.ext.PhaseLog.capture(run())
          if (phases.nonEmpty)
            println("[prof]   phases: " + phases.map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
        }
        if (perJob) jobRows.synchronized {
          jobRows.sortBy(_._2).foreach { case (sec, id, desc) =>
            println(f"[prof]   job $id%4d ${sec}%7.3f s  $desc")
          }
        }
        explainDir.foreach { d =>
          val plan = fn(spark, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new java.io.PrintWriter(s"$d/$name.txt", "UTF-8")
          try w.write(plan) finally w.close()
        }
      } catch { case e: Throwable =>
        System.err.println(s"[prof] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
