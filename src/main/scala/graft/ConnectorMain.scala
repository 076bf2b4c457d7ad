package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.etl.{ConnectorConfig, ConnectorRunner, Sanitize, Transforms}
import graft.load.{Consistency, ParquetSink}
import graft.sources.http.{HttpPagedSource, MockTransport}

/** Runnable connector entry point — the reference's `etl_connector.py`
  * equivalent (README.md:75, :83): extract (paginated HTTP) → transform
  * (parse/sanitize/validate/stamp) → load (collection sink) → verify.
  *
  * Usage: runMain graft.ConnectorMain [url] [outDir]
  * With no args, runs offline against the deterministic mock transport.
  */
object ConnectorMain {

  private val pageSchema = StructType(Seq(
    StructField("data", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("user.name", StringType),
      StructField("$meta", StructType(Seq(StructField("k", LongType)))),
      StructField("value", LongType))))),
    StructField("next_offset", LongType)))

  def main(args: Array[String]): Unit = {
    val streaming = args.contains("--stream")
    val rest = args.filterNot(_ == "--stream")
    val url = rest.lift(0).getOrElse("http://mock.local/api?mock_total=500")
    val outDir = rest.lift(1).getOrElse(
      java.nio.file.Files.createTempDirectory("graft-connector").toString)
    if (streaming) { runStreaming(url, outDir); return }
    val transport =
      if (url.startsWith("http://mock.local")) classOf[MockTransport].getName
      else classOf[graft.sources.http.JdkHttpTransport].getName

    val spark = GraftSession.local("graft-connector")
    import spark.implicits._

    val cfg = ConnectorConfig(
      name = "demo_connector",
      source = s => s.read.format(classOf[HttpPagedSource].getName)
        .option("url", url)
        .option("pageSize", "50")
        .option("totalRecords", "500")
        .option("transport", transport)
        .option("ratePerSec", "200")
        .load()
        .withColumn("parsed", from_json($"body", pageSchema))
        .select(explode($"parsed.data").as("rec"))
        .select($"rec.*"),
      stages = Seq(
        Transforms.sanitizeFields,
        Transforms.requireNonNull("id"),
        Transforms.validate($"value" >= 0),
        Transforms.addIngestionTimestamp()),
      sink = ParquetSink(s"$outDir/demo_connector_raw", SaveMode.Overwrite))

    val result = ConnectorRunner.run(spark, cfg)
    val back = spark.read.parquet(s"$outDir/demo_connector_raw")
    val check = Consistency.of(back.drop("ingested_at"))
    println(s"""{"connector":"${result.name}","rows":${result.rowsWritten},""" +
      s""""checksum":${check.xor},"sink":"$outDir/demo_connector_raw"}""")
    spark.stop()
  }

  /** Streaming mode: micro-batch extraction (admission-controlled page
    * offsets) → per-batch transform → idempotent upsert sink — the
    * reference's polling loop as a Structured Streaming query.
    */
  private def runStreaming(url: String, outDir: String): Unit = {
    val spark = GraftSession.local("graft-connector-stream")
    import spark.implicits._
    val sink = graft.load.UpsertParquetSink(s"$outDir/demo_stream_raw", Seq("id"))
    val stream = spark.readStream.format(classOf[HttpPagedSource].getName)
      .option("url", url)
      .option("pageSize", "50")
      .option("totalRecords", "500")
      .option("transport", classOf[MockTransport].getName)
      .option("ratePerSec", "200")
      .option("maxPagesPerTrigger", "3")
      .load()
      .withColumn("parsed", from_json($"body", pageSchema))
      .select(explode($"parsed.data").as("rec"))
      .select($"rec.*")
    val sanitized = Sanitize(stream)
      .filter($"value" >= 0)
      .withColumn("ingested_at", current_timestamp())
    val q = graft.streaming.Streams.sinkStream(
      sanitized, sink, s"$outDir/ckpt")
    q.awaitTermination()
    val back = spark.read.parquet(s"$outDir/demo_stream_raw")
    val check = Consistency.of(back.drop("ingested_at"))
    println(s"""{"connector":"demo_stream","rows":${back.count()},""" +
      s""""checksum":${check.xor},"sink":"$outDir/demo_stream_raw"}""")
    spark.stop()
  }
}
