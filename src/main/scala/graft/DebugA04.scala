package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Diagnostic harness for the a04 warm-sweep-floor investigation
  * (VERDICT r11 "What's wrong #2"): times the a04 probe warm in
  * isolation, then replays a sweep-like session context (every
  * registered query once, as the full bench does), then re-times a04 —
  * with per-Spark-job wall times from a listener and the physical plan
  * dumped in both states. The hypothesis space is "something about
  * session state accumulated by the sweep doubles the probe's constant"
  * vs "a04 itself regressed"; per-job deltas tell the two apart in one
  * run where two rounds of timing rituals could not.
  */
object DebugA04 {

  private final class JobTimer extends SparkListener {
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    val log = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
    override def onJobStart(js: SparkListenerJobStart): Unit =
      starts.put(js.jobId, System.nanoTime()): Unit
    override def onJobEnd(je: SparkListenerJobEnd): Unit = {
      val t0 = starts.remove(je.jobId)
      if (t0 != 0L) log.add((je.jobId, System.nanoTime() - t0)): Unit
    }
    def drain(): Seq[(Int, Double)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
      while (!log.isEmpty) { val (id, ns) = log.poll(); out += ((id, ns / 1e9)) }
      out.sortBy(_._1).toSeq
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("order")) {
      SparkEntry.queries.keys.zipWithIndex.foreach { case (n, i) =>
        println(f"$i%3d $n")
      }
      return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val timer = new JobTimer
    spark.sparkContext.addSparkListener(timer)

    val fn = SparkEntry.queries("a04_sim_ivf_topk")
    def run1(): Unit = fn(spark, sfDir).queryExecution.toRdd.count()

    def timeRuns(label: String, n: Int): Unit = {
      run1() // warm
      timer.drain(): Unit
      (1 to n).foreach { i =>
        val t0 = System.nanoTime()
        run1()
        val t = (System.nanoTime() - t0) / 1e9
        val jobs = timer.drain()
        println(f"[$label] run $i: $t%.4f s; jobs: " +
          jobs.map { case (id, s) => f"j$id=$s%.4f" }.mkString(" "))
      }
    }

    println("=== PHASE 1: a04 warm, fresh session ===")
    timeRuns("fresh", 5)
    println(fn(spark, sfDir).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))

    if (args.headOption.contains("ctx")) {
      println("=== PHASE 2: sweep context (every registered query once) ===")
      SparkEntry.queries.foreach { case (name, f) =>
        if (name != "a04_sim_ivf_topk") {
          try f(spark, sfDir).queryExecution.toRdd.count()
          catch { case e: Throwable => println(s"ctx $name: ${e.getMessage}") }
          graft.ops.Staged.releaseAll()
        }
      }
      println("=== PHASE 3: a04 warm again, post-context ===")
      timeRuns("post-ctx", 5)
      println(fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
