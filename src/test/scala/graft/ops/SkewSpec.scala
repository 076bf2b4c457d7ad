package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Skew handling at the two layers the engine relies on:
  * deliberate salting (ops/Skew.scala, q22) and AQE's runtime skew-join
  * split — this spec proves the latter actually engages, i.e. a
  * pathological key doesn't funnel a 100 TB join through one task.
  */
class SkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("AQE splits a skewed sort-merge join partition at runtime") {
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force SMJ
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "16384")
    val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries half of all left rows (~200k × ~40B ≫ the 64 KB
      // skew threshold; every other key holds ~400 rows)
      val left = spark.range(400000).select(
        when($"id" % 2 =!= 0, $"id" % 1000).otherwise(0L).as("k"),
        concat(lit("left_payload_padding_padding_"), $"id").as("lv"))
      val right = spark.range(20000).select(($"id" % 1000).as("k"),
        concat(lit("right_payload_"), $"id").as("rv"))
      // global (non-keyed) consumer: a keyed groupBy downstream would
      // legitimately veto the split (it needs the join's partitioning)
      val joined = left.join(right, "k")
        .agg(sum(length($"lv")).as("bytes"))
      joined.collect() // finalize the adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
