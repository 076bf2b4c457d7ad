package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("as-of join picks the most recent right row at-or-before") {
    val trades = Seq(
      (1L, "A", ts(1)), (2L, "A", ts(5)), (3L, "A", ts(9)),
      (4L, "B", ts(3)), (5L, "B", ts(4))
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts(0), 100L), ("A", ts(5), 105L), ("A", ts(8), 108L),
      ("B", ts(4), 200L)
    ).toDF("sym", "ts", "px")

    val out = AsOfJoin(trades, quotes, "ts", Seq("sym"), Seq("px"))
      .select($"trade_id", $"asof_px").as[(Long, Option[Long])]
      .collect().toMap

    assert(out(1L).contains(100L)) // only the ts(0) quote precedes
    assert(out(2L).contains(105L)) // equal timestamp matches
    assert(out(3L).contains(108L))
    assert(out(4L).isEmpty)        // no quote at-or-before ts(3)
    assert(out(5L).contains(200L))
  }

  test("as-of join preserves left row count (no multiplication)") {
    val ev = graft.sources.Tables(spark, sf, "events")
    val errors = ev.filter($"event_type" === "error")
      .select($"user_id", $"ts", $"event_id".as("err_id"))
    val out = AsOfJoin(ev.select($"event_id", $"user_id", $"ts"), errors,
      "ts", Seq("user_id"), Seq("err_id"))
    assert(out.count() == ev.count())
  }

  test("SQL extension functions resolve via GraftExtensions") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    try {
      val r = s2.sql(
        "SELECT jaccard_sorted(array(1L,2L,3L), array(2L,3L,4L)) AS j," +
        " simhash64(array(7L)) AS s").head()
      assert(r.getDouble(0) == 0.5)
      assert(r.getLong(1) == 7L)
    } finally () // shared-JVM session: leave teardown to the suite
  }
}
