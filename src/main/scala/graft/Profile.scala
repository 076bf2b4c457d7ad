package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-side measurement harness (guide §1: measure first): run ONE
  * registered query with a listener that attributes wall-clock to the
  * Spark jobs it submits — job wall, task time, shuffle bytes, callsite
  * — plus the gaps BETWEEN jobs (driver-side planning / eager
  * non-Spark work), which per-query bench numbers can't separate.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt 'runMain graft.Profile <sfDir> <query> [runs]'
  * Not part of the driver contract; diagnostics only.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val qname = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(qname)

    final case class Job(id: Int, start: Long) {
      var end: Long = -1L; var site: String = ""
      var stages: Int = 0; var taskMs: Long = 0L
      var shufRead: Long = 0L; var shufWrite: Long = 0L
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Job]()
    val stageToJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val j = new Job(e.jobId, e.time)
        j.site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        jobs.put(e.jobId, j); order.add(j)
        e.stageIds.foreach(sid => stageToJob.put(sid, e.jobId): Unit)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId); if (j != null) j.end = e.time
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val jid = stageToJob.getOrDefault(e.stageInfo.stageId, -1)
        val j = jobs.get(jid)
        if (j != null) {
          val m = e.stageInfo.taskMetrics
          j.stages += 1
          j.taskMs += m.executorRunTime
          j.shufRead += m.shuffleReadMetrics.totalBytesRead
          j.shufWrite += m.shuffleWriteMetrics.bytesWritten
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // warm up: one full untimed pass (JIT, codegen, fitCached artifacts)
    try { fn(spark, sfDir).queryExecution.toRdd.count() }
    catch { case e: Throwable => println(s"warmup failed: $e") }
    graft.ops.Staged.releaseAll()
    Thread.sleep(500)
    jobs.clear(); order.clear()

    (1 to runs).foreach { r =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).queryExecution.toRdd.count()
      val wall = (System.nanoTime() - t0) / 1e9
      graft.ops.Staged.releaseAll()
      println(f"run $r: wall $wall%.3f s")
    }

    Thread.sleep(300)
    import scala.jdk.CollectionConverters._
    val js = order.asScala.toSeq.sortBy(_.start)
    var prevEnd = js.headOption.map(_.start).getOrElse(0L)
    var jobWall = 0L; var gapSum = 0L
    println(f"${"job"}%4s ${"wall_ms"}%8s ${"gap_ms"}%7s ${"stages"}%6s ${"task_ms"}%8s ${"shRd_kB"}%8s ${"shWr_kB"}%8s  site")
    js.foreach { j =>
      val gap = math.max(0L, j.start - prevEnd)
      val wall = if (j.end > 0) j.end - j.start else -1L
      if (wall > 0) jobWall += wall
      gapSum += gap
      println(f"${j.id}%4d $wall%8d $gap%7d ${j.stages}%6d ${j.taskMs}%8d ${j.shufRead / 1024}%8d ${j.shufWrite / 1024}%8d  ${j.site}")
      prevEnd = math.max(prevEnd, if (j.end > 0) j.end else j.start)
    }
    println(f"jobs: ${js.size}, job wall sum $jobWall ms, inter-job gaps $gapSum ms")
    spark.stop()
  }
}
