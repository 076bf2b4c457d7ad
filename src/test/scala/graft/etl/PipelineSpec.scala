package graft.etl

import graft.SparkSpec
import graft.load.{Consistency, ParquetSink, UpsertParquetSink}
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import java.nio.file.Files

class PipelineSpec extends SparkSpec {

  test("ETL pipeline: parse → sanitize → validate → stamp over events") {
    val out = graft.queries.EtlQueries.pipeline(spark, sf)
    assert(out.count() > 0)
    assert(out.columns.contains("ingested_at"))
    assert(out.columns.contains("props_k"))
    // sanitation guarantee: every column BSON-legal
    assert(out.columns.forall(c => !c.contains(".") && !c.startsWith("$")))
  }

  test("empty-payload short-circuit (README.md:33)") {
    import spark.implicits._
    val cfg = ConnectorConfig(
      name = "empty",
      source = s => { import s.implicits._; Seq.empty[(Long, String)].toDF("id", "v") },
      stages = Seq(Transforms.requireNonNull("id")),
      sink = ParquetSink(Files.createTempDirectory("graft-empty").toString + "/c", SaveMode.Overwrite))
    val res = ConnectorRunner.run(spark, cfg)
    assert(res.rowsWritten == 0 && res.consistent)
  }

  test("upsert sink is idempotent (L2)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-upsert").toString + "/coll"
    val sink = UpsertParquetSink(dir, Seq("id"))
    val batch1 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    assert(sink.write(batch1) == 2)
    // re-load of the same batch must not duplicate
    assert(sink.write(batch1) == 2)
    // new batch updates key 2, inserts key 3
    val batch2 = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    assert(sink.write(batch2) == 3)
    val got = spark.read.parquet(dir).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("consistency check matches across partitionings (V2)") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val c1 = Consistency.of(df.repartition(7))
    val c2 = Consistency.of(df.repartition(3))
    assert(c1 == c2 && c1.rows == 1000)
    val tampered = df.withColumn("v", when(col("id") === 500, "X").otherwise(col("v")))
    assert(Consistency.of(tampered) != c1)
  }

  test("connector secrets resolve from env only") {
    assert(ConnectorRunner.secret("GRAFT_NO_SUCH_VAR").isEmpty)
    intercept[IllegalArgumentException] {
      ConnectorRunner.run(spark, ConnectorConfig(
        "needs-env", s => s.range(1).toDF(), Nil,
        ParquetSink("/tmp/never", SaveMode.Overwrite),
        requiredEnv = Seq("GRAFT_NO_SUCH_VAR")))
    }
  }

  test("quarantine splits invalid rows with a reason instead of dropping") {
    import spark.implicits._
    val df = Seq((1L, 5.0), (2L, -1.0), (3L, 10.0)).toDF("id", "value")
    val (ok, bad) = Transforms.quarantine(df, $"value" >= 0, "negative value")
    assert(ok.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    val rejects = bad.select("id", "reject_reason").as[(Long, String)].collect()
    assert(rejects.toSeq == Seq((2L, "negative value")))
    assert(ok.count() + bad.count() == df.count())
  }
}
