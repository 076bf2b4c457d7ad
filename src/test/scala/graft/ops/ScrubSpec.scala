package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScrubSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "contact alice.smith+work@example.co.uk or visit https://example.com/a?b=c now"),
    (2L, "call 5551234567 or 12345678901 twice"),
    (3L, "short numbers 123 456-789 stay; code A1B2 stays"),
    (4L, "mixed: bob@corp.io then http://x.io/p#f and id 99887766554")
  ).toDF("doc_id", "text")

  test("counts find planted emails, urls, and long digit runs") {
    val rows = Scrub.scrub(docs, "doc_id", "text")
      .as[(Long, Int, Int, Int, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(rows(1L) == ((1, 1, 0)))
    assert(rows(2L) == ((0, 0, 2)))
    assert(rows(3L) == ((0, 0, 0)), "short digit runs are not PII")
    assert(rows(4L) == ((1, 1, 1)))
  }

  test("redaction replaces every hit and nothing else") {
    val red = Scrub.scrub(docs, "doc_id", "text")
      .select($"doc_id", $"redacted").as[(Long, String)].collect().toMap
    assert(red(1L) == "contact [EMAIL] or visit [URL] now")
    assert(red(2L) == "call [NUM] or [NUM] twice")
    assert(red(3L) == "short numbers 123 456-789 stay; code A1B2 stays")
    assert(red(4L) == "mixed: [EMAIL] then [URL] and id [NUM]")
    // no residual PII survives a second scrub
    val again = Scrub.scrub(
      docs.select($"doc_id", Scrub.redact($"text").as("text")), "doc_id", "text")
      .agg(sum($"n_emails" + $"n_urls" + $"n_long_nums")).as[Long].head()
    assert(again == 0L)
  }

  test("boilerplate: source-wide banner stripped, rare shared passage kept") {
    val s1 = (1 to 5).map(i =>
      (i.toLong, "s1", s"cookie banner text unique content w$i"))
    val s2 = Seq((11L, "s2", "shared twice only here fine now"),
      (12L, "s2", "shared twice only other words here"))
    val bannerOnly = Seq((6L, "s1", "cookie banner text"))
    val out = Scrub.removeBoilerplate(
      (s1 ++ s2 ++ bannerOnly).toDF("doc_id", "source", "text"),
      "doc_id", "source", "text", window = 3, minFrac = 0.5, minDocs = 3)
      .as[(Long, String, String, Int, Int)].collect()
      .map(r => r._1 -> (r._3, r._4, r._5)).toMap
    // banner appears in 6/6 s1 docs -> boilerplate; unique tails survive
    (1 to 5).foreach { i =>
      assert(out(i.toLong) == ((s"unique content w$i", 1, 1)),
        s"doc $i: ${out(i.toLong)}")
    }
    // all-boilerplate doc surfaces with empty clean_text, not a drop
    assert(out(6L) == (("", 0, 1)))
    // 'shared twice only' is in 2/2 s2 docs but misses minDocs=3
    assert(out(11L)._2 == 2 && out(12L)._2 == 2,
      "sub-minDocs passages must be kept")
  }
}
