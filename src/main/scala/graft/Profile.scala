package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}

/** Dev aid (guide §1): attribute a query's wall-clock to Spark jobs vs
  * driver-side work (planning/codegen/collect assembly). Runs each named
  * query once warm then once timed, printing per-job durations, per-stage
  * task totals, and the wall − Σjobs residual (= driver gap).
  * Usage: runMain graft.Profile <sfDir> <prefix>[,<prefix>...] [repeat]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val prefixes = if (args.length > 1) args(1).split(",").toSeq else Seq("")
    val repeat = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // the shared graft.Sessions builder (tmpfs scratch + join/AQE
    // knobs): a profile attributes the exact session the bench times
    val spark = Sessions.localBuilder(cpus)
      .config("spark.sql.ui.retainedExecutions", "4")
      .config("spark.cleaner.periodicGC.interval", "15s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    case class Job(id: Int, start: Long, var end: Long = 0L,
        var stages: Int = 0, var tasks: Int = 0, var taskMs: Long = 0L)
    case class Stg(name: String, tasks: Int, taskMs: Long)
    val jobs = new scala.collection.mutable.LinkedHashMap[Int, Job]
    val stgs = new scala.collection.mutable.ArrayBuffer[Stg]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized { jobs(e.jobId) = Job(e.jobId, e.time) }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.end = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute stage to the most recent unfinished job
          val info = e.stageInfo
          val name =
            if (!info.name.contains("graft")) {
              info.details.split("\n")
                .find(l => l.contains("graft.") && !l.contains("Profile"))
                .map(_.trim).getOrElse(info.name)
            } else info.name
          stgs += Stg(name, info.numTasks,
            info.taskMetrics.executorRunTime)
          jobs.values.lastOption.foreach { j =>
            j.stages += 1; j.tasks += info.numTasks
            j.taskMs += info.taskMetrics.executorRunTime
          }
        }
    })
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      def go(): Unit = SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      go() // warm
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      (1 to repeat).foreach { it =>
        jobs.synchronized { jobs.clear(); stgs.clear() }
        val t0 = System.nanoTime()
        go()
        val wall = (System.nanoTime() - t0) / 1e9
        val snap = jobs.synchronized { jobs.values.toSeq }
        val jobSum = snap.map(j => (j.end - j.start).max(0L)).sum / 1e3
        println(f"\n===== $name iter $it: wall $wall%.2f s, jobs ${snap.size}, sum(job) $jobSum%.2f s, driver-gap ${wall - jobSum}%.2f s")
        snap.foreach { j =>
          println(f"  job ${j.id}%3d  ${(j.end - j.start).max(0L) / 1e3}%6.2f s  stages=${j.stages}%2d tasks=${j.tasks}%4d taskTime=${j.taskMs / 1e3}%7.2f s")
        }
        val byName = jobs.synchronized { stgs.toSeq }
          .groupBy(_.name).view
          .mapValues(s => (s.size, s.map(_.taskMs).sum)).toSeq
          .sortBy(-_._2._2)
        println("  -- top stages by task time --")
        byName.take(15).foreach { case (name, (n, ms)) =>
          println(f"  ${ms / 1e3}%7.2f s  x$n%-3d $name")
        }
        spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      }
    }
    spark.stop()
  }
}
