package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.AsOfJoin
import graft.sources.Tables

/** Scratch profiler for the as-of join formulations (VERDICT r2 item 4):
  * times the custom Catalyst exec vs the union+window form on the same
  * t03 shape. Not part of the driver contract.
  */
object ProfileAsOf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .config("spark.sql.session.timeZone", "UTC")
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val ev = Tables(spark, sfDir, "events")
    def errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id".as("err_id"))
    def lhs = ev.select($"event_id", $"user_id", $"ts")

    def time(name: String, runs: Int)(f: => Long): Unit = {
      f // warm-up
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-22s best=${ts.min}%.3f  med=${ts.sorted.apply(runs / 2)}%.3f")
    }

    // .count() lets Catalyst prune the whole Window away (count needs no
    // columns) — toRdd.count() forces the FULL physical plan for both
    time("custom (full)", 7) {
      AsOfJoin.sortMerge(lhs, errors, "ts", Seq("user_id"), Seq("err_id"))
        .select($"event_id", $"user_id", $"ts", $"asof_err_id")
        .queryExecution.toRdd.count()
    }
    time("window (full)", 7) {
      AsOfJoin(lhs, errors, "ts", Seq("user_id"), Seq("err_id"))
        .select($"event_id", $"user_id", $"ts", $"asof_err_id")
        .queryExecution.toRdd.count()
    }
    // split planning from execution: build once, execute repeatedly
    val builtCustom = AsOfJoin.sortMerge(lhs, errors, "ts", Seq("user_id"), Seq("err_id"))
      .select($"event_id", $"user_id", $"ts", $"asof_err_id")
    time("custom exec-only", 7) { builtCustom.count() }
    val builtWindow = AsOfJoin(lhs, errors, "ts", Seq("user_id"), Seq("err_id"))
      .select($"event_id", $"user_id", $"ts", $"asof_err_id")
    time("window exec-only", 7) { builtWindow.count() }
    // planning-only: how much does constructing + analyzing cost?
    time("custom plan-only", 7) {
      AsOfJoin.sortMerge(lhs, errors, "ts", Seq("user_id"), Seq("err_id"))
        .queryExecution.executedPlan; 0L
    }
    time("window plan-only", 7) {
      AsOfJoin(lhs, errors, "ts", Seq("user_id"), Seq("err_id"))
        .queryExecution.executedPlan; 0L
    }
    // stage-level timing: run each once under a listener that records
    // per-stage wall time and task counts
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    import scala.collection.mutable.ArrayBuffer
    val stages = ArrayBuffer[String]()
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {s <- si.submissionTime; c <- si.completionTime} yield c - s
        val m = si.taskMetrics
        stages += f"wall=${ms.getOrElse(-1L)}%4dms tasks=${si.numTasks}%2d " +
          f"run=${m.executorRunTime}%4dms deser=${m.executorDeserializeTime}%4dms " +
          f"cpu=${m.executorCpuTime / 1000000}%4dms gc=${m.jvmGCTime}%3dms " +
          f"shufW=${m.shuffleWriteMetrics.recordsWritten}%7d shufR=${m.shuffleReadMetrics.recordsRead}%7d"
      }
    }
    spark.sparkContext.addSparkListener(listener)
    stages.clear(); builtCustom.count()
    Thread.sleep(500) // let the listener bus drain
    println("== custom stages =="); stages.foreach(s => println("  " + s))
    stages.clear(); builtWindow.count()
    Thread.sleep(500) // let the listener bus drain
    println("== window stages =="); stages.foreach(s => println("  " + s))
    spark.stop()
  }
}
