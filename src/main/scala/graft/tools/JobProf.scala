package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-JOB wall-clock breakdown of one registered query (dev tool, not
  * part of the library surface) — the measurement the optimization
  * guide's §1 empirical loop needs when the UI is disabled: which of a
  * query's actions (driver-side collects, eager checkpoints, the final
  * noop write) actually costs the wall-clock.
  *
  * Usage: runMain graft.tools.JobProf <query> [sfDir] [--cold]
  *
  * Warm-runs once at sf0.001 (codegen/class-load; skipped with
  * --cold), then runs the noop write once at `sfDir` with a listener
  * attached and prints one line per job: duration, #stages, #tasks,
  * and the job group/description if set.
  */
object JobProf {
  private final case class J(id: Int, var desc: String, var t0: Long,
      var t1: Long, var stages: Int, var tasks: Int)

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: JobProf <query> [sfDir] [--cold]"))
    val dir = args.drop(1).filterNot(_.startsWith("--")).headOption
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]"), cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val q = graft.SparkEntry.queries(name)
    def noop(d: String): Unit =
      q(spark, d).write.format("noop").mode("overwrite").save()
    if (!args.contains("--cold")) noop("/root/testdata/sf0.001")

    val jobs = mutable.LinkedHashMap.empty[Int, J]
    // Stage-level task-metric totals: CPU time and shuffle BYTES are
    // far less host-noise-sensitive than wall-clock (external load
    // inflates neither the bytes a plan shuffles nor, much, the CPU a
    // task burns), so config A/Bs (e.g. io codec) compare these.
    var runMs, cpuNs, swBytes, srBytes, inBytes, spillMem, spillDisk = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs(e.jobId) = J(e.jobId,
            Option(e.properties)
              .flatMap(p => Option(p.getProperty("spark.job.description")))
              .getOrElse(""),
            e.time, e.time, e.stageIds.size, 0)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized { jobs.get(e.jobId).foreach(_.t1 = e.time) }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          // attribute the stage's tasks to the most recent open job
          jobs.values.lastOption.foreach(_.tasks += e.stageInfo.numTasks)
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            runMs += m.executorRunTime
            cpuNs += m.executorCpuTime
            swBytes += m.shuffleWriteMetrics.bytesWritten
            srBytes += m.shuffleReadMetrics.totalBytesRead
            inBytes += m.inputMetrics.bytesRead
            spillMem += m.memoryBytesSpilled
            spillDisk += m.diskBytesSpilled
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    noop(dir)
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let the listener bus drain
    spark.sparkContext.removeSparkListener(listener)
    println(f"[jobprof] $name wall=$wall%.3f s, jobs=${jobs.size}")
    var covered = 0L
    jobs.values.foreach { j =>
      val d = (j.t1 - j.t0) / 1e3
      covered += j.t1 - j.t0
      println(f"  job ${j.id}%3d ${d}%7.3f s stages=${j.stages}%2d tasks=${j.tasks}%4d ${j.desc.take(90)}")
    }
    println(f"[jobprof] sum(job)=${covered / 1e3}%.3f s, gaps (driver/plan)=${wall - covered / 1e3}%.3f s")
    println(f"[jobprof] totals: taskRun=${runMs / 1e3}%.1f s cpu=${cpuNs / 1e9}%.1f s " +
      f"shufWrite=${swBytes / 1e6}%.1f MB shufRead=${srBytes / 1e6}%.1f MB " +
      f"input=${inBytes / 1e6}%.1f MB spillMem=${spillMem / 1e6}%.1f MB spillDisk=${spillDisk / 1e6}%.1f MB")
    spark.stop()
  }
}
