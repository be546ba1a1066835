package graft

import scala.collection.mutable
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart, SparkListenerStageCompleted}

/** Optimization-round diagnostic: run named registry queries once (after
  * one warmup) and attribute wall-clock between Spark job time and
  * driver-side gaps (planning, analysis, driver loops). The r14
  * optimization round needs to know, per expensive query, whether the
  * time is data (stage task time), scheduling (many tiny jobs), or the
  * driver (gaps between jobs) — guide §1 "measure first", §7.3. Prints
  * one line per job plus a summary; measurement tooling only, never
  * registered in SparkEntry.
  */
object OptDiag {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.builder(cpus, shuffle).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val verbose = sys.env.get("GRAFT_DIAG_VERBOSE").contains("1")
    if (sys.env.get("GRAFT_DIAG_NOAQE").contains("1"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    final case class Job(id: Int, t0: Long, var t1: Long = -1L,
      var desc: String = "")
    val jobs = mutable.ArrayBuffer[Job]()
    val stages = mutable.Map[String, (Int, Long, Int)]()
    var taskTimeMs = 0L
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val cs = Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short")))
            .getOrElse("")
          jobs += Job(e.jobId, e.time, desc = cs)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.find(_.id == e.jobId).foreach(_.t1 = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          taskTimeMs += e.stageInfo.taskMetrics.executorRunTime
          val key = e.stageInfo.name.takeWhile(_ != '+').trim
          val dur = (for {
            t0 <- e.stageInfo.submissionTime
            t1 <- e.stageInfo.completionTime
          } yield t1 - t0).getOrElse(0L)
          val prev = stages.getOrElse(key, (0, 0L, 0))
          stages(key) =
            (prev._1 + 1, prev._2 + dur, prev._3 + e.stageInfo.numTasks)
        }
    }

    for (name <- args) {
      val fn = SparkEntry.queries(name)
      // warmup (JIT + codegen), not measured
      fn(spark, d).count()
      spark.catalog.clearCache(); System.gc()
      jobs.synchronized { jobs.clear(); stages.clear(); taskTimeMs = 0L }
      spark.sparkContext.addSparkListener(listener)
      val w0 = System.nanoTime()
      val df = fn(spark, d)
      val tConstruct = (System.nanoTime() - w0) / 1e9
      df.count()
      val wall = (System.nanoTime() - w0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      val (n, jobMs, tasks) = jobs.synchronized {
        val done = jobs.filter(_.t1 > 0)
        (done.size, done.map(j => j.t1 - j.t0).sum, taskTimeMs)
      }
      println(f"DIAG $name wall=$wall%.2f construct=$tConstruct%.2f " +
        f"jobs=$n jobTime=${jobMs / 1e3}%.2f taskTime=${tasks / 1e3}%.2f " +
        f"gaps=${wall - jobMs / 1e3}%.2f")
      if (verbose) jobs.synchronized {
        stages.toSeq.sortBy(-_._2._2).foreach {
          case (nm, (cnt, ms, tasks)) =>
            println(f"  STAGEGRP n=$cnt%3d total=${ms / 1e3}%6.2f s " +
              f"tasks=$tasks%4d  $nm")
        }
      }
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
