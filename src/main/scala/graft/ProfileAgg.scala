package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.Tables

/** Scratch profiler for the decimal-sum aggregation family (q01/q27):
  * separates scan cost from decimal vs double aggregation cost.
  */
object ProfileAgg {
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

    val li = Tables(spark, sfDir, "lineitem")
    def dsum(c: org.apache.spark.sql.Column, s: Int = 2) =
      sum(c.cast(DecimalType(18, s))).cast(DoubleType)

    def time(name: String, runs: Int = 5)(f: => Unit): Unit = {
      f
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-28s best=${ts.min}%.3f")
    }

    time("scan 3 cols count") {
      li.select($"l_returnflag", $"l_quantity", $"l_extendedprice")
        .queryExecution.toRdd.count(): Unit
    }
    time("1 double sum") {
      li.groupBy($"l_returnflag").agg(sum($"l_quantity"))
        .queryExecution.toRdd.count(): Unit
    }
    time("6 double sums") {
      li.groupBy($"l_returnflag").agg(count(lit(1)),
        sum($"l_quantity"), sum($"l_quantity" * $"l_quantity"),
        sum($"l_extendedprice"), sum($"l_extendedprice" * $"l_extendedprice"),
        sum($"l_quantity" * $"l_extendedprice"))
        .queryExecution.toRdd.count(): Unit
    }
    time("1 decimal sum") {
      li.groupBy($"l_returnflag").agg(dsum($"l_quantity"))
        .queryExecution.toRdd.count(): Unit
    }
    time("6 decimal sums (q27 core)") {
      li.groupBy($"l_returnflag").agg(count(lit(1)),
        dsum($"l_quantity"), dsum($"l_quantity" * $"l_quantity", 4),
        dsum($"l_extendedprice"), dsum($"l_extendedprice" * $"l_extendedprice", 4),
        dsum($"l_quantity" * $"l_extendedprice", 4))
        .queryExecution.toRdd.count(): Unit
    }
    time("q27 registered") {
      SparkEntry.queries("q27_stat_moments")(spark, sfDir)
        .queryExecution.toRdd.count(): Unit
    }
    time("q01 registered") {
      SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
        .queryExecution.toRdd.count(): Unit
    }
    spark.stop()
  }
}
