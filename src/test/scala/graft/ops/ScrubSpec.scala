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
}
