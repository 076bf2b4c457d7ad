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

  test("frame features: coverage, exact byte means, NULL on empty media") {
    val out = Multimodal.frameFeatures(spark, media, "doc_id", "media",
      framesPerDoc = 4)
    // coverage: the frames of doc 2 reassemble its payload exactly
    val frames2 = out.filter($"id" === 2L).orderBy("frame_idx")
      .select("frame").as[Array[Byte]].collect()
    assert(frames2.length == 4)
    val payload = "another payload with more bytes inside it".getBytes("UTF-8")
    assert(frames2.flatten.toSeq == payload.toSeq)
    // the feature really is the mean unsigned byte of the frame's slice
    val means2 = out.filter($"id" === 2L).orderBy("frame_idx")
      .select("mean_byte").as[Double].collect()
    val expect = (0 until 4).map { i =>
      val s = i * payload.length / 4
      val e = (i + 1) * payload.length / 4
      payload.slice(s, e).map(_ & 0xff).sum.toDouble / (e - s)
    }
    assert(means2.toSeq == expect, s"got ${means2.toSeq}, want $expect")
    // empty media: one clamped frame, NULL feature (not a fake zero)
    val empty = out.filter($"id" === 3L)
      .select($"frame_idx", length($"frame"), $"mean_byte".isNull)
      .as[(Int, Int, Boolean)].collect().toSeq
    assert(empty == Seq((0, 0, true)), s"got $empty")
  }

  test("resize: nearest-neighbor index rule, upsample repeats, empty stays empty") {
    val out = Multimodal.resizeStub(spark, media, "doc_id", "media",
      targetBytes = 8)
      .select($"id", $"n_in", $"n_out", $"resized")
      .as[(Long, Int, Int, Array[Byte])].collect()
      .map(r => r._1 -> r).toMap
    // downsample: out(i) = in(floor(i*len/8)), exactly
    val p1 = "fake png bytes here".getBytes("UTF-8")
    assert(out(1L)._4.toSeq ==
      (0 until 8).map(i => p1(i * p1.length / 8)).toSeq)
    assert(out(1L)._2 == 19 && out(1L)._3 == 8)
    // upsample: shorter-than-target payloads repeat samples
    val tiny = Seq((9L, "abc".getBytes("UTF-8"))).toDF("doc_id", "media")
    val up = Multimodal.resizeStub(spark, tiny, "doc_id", "media", 8)
      .select($"resized").as[Array[Byte]].head()
    assert(up.toSeq == (0 until 8).map(i => "abc".getBytes("UTF-8")(i * 3 / 8)).toSeq)
    assert(up.length == 8)
    // empty payload resizes to empty, not to invented bytes
    assert(out(3L)._3 == 0 && out(3L)._4.isEmpty)
  }

  test("metadata struct is columnar-filterable without touching bytes") {
    val out = Multimodal.decode(spark, media, "doc_id", "media").toDF()
    val wide = out.filter($"meta.width" > 16).select("id", "meta.format")
    assert(wide.columns.toSeq == Seq("id", "format"))
    wide.collect() // must execute
  }

  test("phash64: resample + integer mean threshold, hand-checked") {
    // 128 bytes: 64 zeros then 64 0xFF. Resample out(i)=in(2i) → 32
    // zeros, 32 xFF; mean splits them → exactly bits 32..63 set.
    val payload = Array.fill[Byte](64)(0) ++ Array.fill[Byte](64)(0xff.toByte)
    val df = Seq((1L, payload), (2L, Array.empty[Byte]))
      .toDF("doc_id", "media")
    val out = Multimodal.phash64(spark, df, "doc_id", "media").collect()
    assert(out.map(_.id).toSeq == Seq(1L), "empty payload must get no row")
    assert(out.head.sim == 0xFFFFFFFF00000000L)
  }

  test("phash near-dup: blocked join equals the all-pairs comparison") {
    val docs = graft.sources.Tables(spark, sf, "documents")
      .select($"doc_id", $"text".cast("binary").as("media"))
    val blocked = Multimodal.phashNearDup(spark, docs, "doc_id", "media",
      maxHamming = 9)
      .as[(Long, Long, Int)].collect().toSet
    val hashes = Multimodal.phash64(spark, docs, "doc_id", "media").toDF()
    val brute = hashes.as("a").join(hashes.as("b"), $"a.id" < $"b.id")
      .select($"a.id", $"b.id",
        bit_count($"a.sim".bitwiseXOR($"b.sim")))
      .as[(Long, Long, Int)].collect()
      .filter(_._3 <= 9).toSet
    assert(brute.nonEmpty, "fixture must contain near pairs at this bound")
    assert(blocked == brute, "pigeonhole recall must be exactly 1.0")
  }
}
