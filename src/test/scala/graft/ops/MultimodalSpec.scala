package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "fake png bytes here".getBytes("UTF-8")),
    (2L, "another payload with more bytes inside it".getBytes("UTF-8")),
    (3L, Array.empty[Byte])
  ).toDF("doc_id", "media")

  test("decode: schema, byte counts, deterministic stub metadata") {
    val out = Multimodal.decode(spark, media, "doc_id", "media")
    val rows = out.collect().sortBy(_.id)
    assert(rows.map(_.id).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).nBytes == 19 && rows(2).nBytes == 0)
    // deterministic: same input → same metadata
    val again = Multimodal.decode(spark, media.repartition(3), "doc_id", "media")
      .collect().sortBy(_.id)
    assert(rows.map(_.meta).toSeq == again.map(_.meta).toSeq)
    assert(rows.forall(r => r.meta.width >= 16 && r.meta.height >= 16))
  }

  test("frame sampling yields per-frame rows that reassemble the payload") {
    val frames = Multimodal.sampleFrames(spark, media.filter($"doc_id" === 2L),
      "doc_id", "media", framesPerDoc = 4)
    val collected = frames.orderBy("frame_idx")
      .select("frame").as[Array[Byte]].collect()
    assert(collected.length == 4)
    assert(collected.flatten.toSeq ==
      "another payload with more bytes inside it".getBytes("UTF-8").toSeq)
  }

  test("metadata struct is columnar-filterable without touching bytes") {
    val out = Multimodal.decode(spark, media, "doc_id", "media").toDF()
    val wide = out.filter($"meta.width" > 16).select("id", "meta.format")
    assert(wide.columns.toSeq == Seq("id", "format"))
    wide.collect() // must execute
  }
}
