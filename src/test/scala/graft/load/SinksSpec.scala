package graft.load

import graft.SparkSpec
import graft.sources.Tables
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** File-format sinks/scans beyond parquet, and bucketed co-located joins
  * (the storage-layout piece of the 100 TB story).
  */
class SinksSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val events = Tables(spark, sf, "events")
    .select($"event_id", $"user_id", $"event_type", $"value")

  test("csv round-trip preserves content") {
    val dir = Files.createTempDirectory("graft-csv").toString + "/out"
    events.write.option("header", "true").csv(dir)
    val back = spark.read.option("header", "true")
      .schema(events.schema).csv(dir)
    assert(Consistency.verify(events, back))
  }

  test("json round-trip preserves content") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    events.write.json(dir)
    val back = spark.read.schema(events.schema).json(dir)
    assert(Consistency.verify(events, back))
  }

  test("orc round-trip preserves content, with pushdown + pruning at the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/out"
    val n = FormatSink(dir, "orc").write(events)
    assert(n == events.count())
    val back = spark.read.orc(dir)
    assert(Consistency.verify(events, back))
    // the columnar contract: filters and projection reach the ORC scan
    // exactly as the parquet plan specs assert
    val plan = back.where($"value" > 0.5).select($"event_id", $"value")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(value), GreaterThan(value,0.5)]"),
      s"ORC scan must take pushed filters:\n$plan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(readSchema.contains("event_id") && !readSchema.contains("user_id"),
      s"ORC scan must prune to the projected columns: $readSchema")
  }

  test("FormatSink appends like ParquetSink (same collection contract)") {
    val dir = Files.createTempDirectory("graft-orc-append").toString + "/out"
    val sink = FormatSink(dir, "orc")
    sink.write(events.limit(10))
    sink.write(events.limit(5))
    assert(spark.read.orc(dir).count() == 15)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val s2 = graft.GraftSession.builder("graft-bucketing")
      .master("local[4]")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
      .getOrCreate()
    try {
      Tables(s2, sf, "orders").write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("orders_b")
      Tables(s2, sf, "lineitem").write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
      val joined = s2.table("lineitem_b")
        .join(s2.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      joined.collect() // materialize so AQE finalizes the plan
      val shuffles = collect(joined.queryExecution.executedPlan) {
        case e: ShuffleExchangeExec => e
      }
      // the bucketed join itself must be shuffle-free; the only allowed
      // exchange is the final 3-group aggregation
      assert(shuffles.size <= 1,
        s"expected co-located bucket join, got ${shuffles.size} shuffles")
      // cross-check the result against the plain join
      val plain = Tables(s2, sf, "lineitem")
        .join(Tables(s2, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val bucketed = joined.as[(String, Long)].collect().toMap
      assert(plain == bucketed)
    } finally {
      s2.sql("DROP TABLE IF EXISTS orders_b")
      s2.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
