package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew handling at the two layers the engine relies on: AQE's runtime
  * skew-join split, and deliberate salting (ops/Skew.scala, q22) for
  * the case AQE legitimately refuses — a downstream operator that
  * needs the join's partitioning. This spec proves both halves: the
  * split engages for a free-standing join, and the keyed-consumer veto
  * is real (which is exactly why salting exists).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits a skewed join; a keyed consumer vetoes the split") {
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

      // the veto: a groupBy on the join key needs the join's hash
      // partitioning, so AQE must NOT split (splitting would scatter a
      // key); this is the case explicit salting covers
      val keyed = left.join(right, "k").groupBy($"k")
        .agg(count(lit(1)).as("n"))
      keyed.collect()
      val keyedPlan = keyed.queryExecution.executedPlan.toString
      assert(!keyedPlan.contains("skew=true"),
        s"keyed consumer must veto the skew split:\n$keyedPlan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
