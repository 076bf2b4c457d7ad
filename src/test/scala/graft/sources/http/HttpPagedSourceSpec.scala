package graft.sources.http

import graft.SparkSpec
import graft.etl.{Sanitize, Transforms}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class HttpPagedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def read(url: String, extra: Map[String, String] = Map.empty): DataFrame = {
    val base = spark.read.format(classOf[HttpPagedSource].getName)
      .option("url", url)
      .option("pageSize", "25")
      .option("totalRecords", "250")
      .option("transport", classOf[MockTransport].getName)
      .option("ratePerSec", "10000")
    extra.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  private val recordSchema = StructType(Seq(
    StructField("data", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("user.name", StringType),
      StructField("$meta", StructType(Seq(StructField("k", LongType)))),
      StructField("value", LongType))))),
    StructField("next_offset", LongType)))

  test("E1/E3: paginated scan yields every page exactly once, in parallel") {
    MockTransport.reset()
    val pages = read("http://mock.local/api?mock_total=250")
    assert(pages.rdd.getNumPartitions > 1, "offset pagination must parallelize")
    val collected = pages.select("page").as[Int].collect().sorted
    assert(collected.toSeq == (0 until 10))
  }

  test("T1+T4+T5: pages parse, explode, and sanitize into BSON-legal records") {
    val records = Sanitize(
      read("http://mock.local/api?mock_total=250")
        .withColumn("parsed", from_json($"body", recordSchema))
        .select(explode($"parsed.data").as("rec"))
        .select($"rec.*"))
    assert(records.columns.toSeq == Seq("id", "user_name", "_meta", "value"))
    assert(records.count() == 250)
    assert(records.agg(countDistinct($"id")).as[Long].head() == 250)
    val r7 = records.filter($"id" === 7L).head()
    assert(r7.getString(1) == "user_7")
    assert(r7.getStruct(2).getLong(0) == 0L) // 7 % 7
  }

  test("E4: transient 429s are retried and the read still completes") {
    MockTransport.reset()
    // touch `body` so column pruning doesn't elide the fetch
    val n = read("http://mock.local/api?mock_total=250&mock_fail_every=3")
      .where(length($"body") > 0).count()
    assert(n == 10)
    // at least one retried URL: more requests than pages
    assert(MockTransport.requests.size > 10)
  }

  test("E2: auth token resolves from env into a Bearer header, never options") {
    MockTransport.reset()
    val (envKey, envVal) = sys.env.head
    read("http://mock.local/api?mock_total=250", Map("authEnv" -> envKey))
      .where(length($"body") > 0).count()
    val auths = MockTransport.requests.map(_._2.get("Authorization")).distinct
    assert(auths == List(Some(s"Bearer $envVal")))
  }

  test("cursor pagination plans a single sequential partition") {
    MockTransport.reset()
    val pages = read("http://mock.local/api?mock_total=250", Map("pagination.cursor" -> "true"))
    assert(pages.rdd.getNumPartitions == 1)
    assert(pages.count() == 10)
  }

  test("rate limiter paces requests") {
    MockTransport.reset()
    val t0 = System.nanoTime()
    // 10 pages, 1 partition, 20 rps, burst 20 → no wait; at 5 rps burst 5
    // the last 5 pages must wait ~1s total
    read("http://mock.local/api?mock_total=250",
      Map("pagination.cursor" -> "true", "ratePerSec" -> "5")).count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(elapsed >= 0.8, s"expected pacing, took ${elapsed}s")
  }

  private def confOf(opts: Map[String, String]): HttpConf = {
    val m = new java.util.HashMap[String, String]()
    opts.foreach { case (k, v) => m.put(k, v) }
    HttpConf(new org.apache.spark.sql.util.CaseInsensitiveStringMap(m))
  }

  test("global rate budget: quota divides across planned partitions") {
    val base = Map(
      "url" -> "http://mock.local/api?mock_total=250",
      "pageSize" -> "25", "totalRecords" -> "250",
      "transport" -> classOf[MockTransport].getName,
      "globalRatePerSec" -> "20")
    // 10 pages / 8 per partition => 2 partitions => 10 rps each
    val parts = new HttpPagedScan(confOf(base)).planInputPartitions()
      .map(_.asInstanceOf[HttpPartition])
    assert(parts.length == 2)
    assert(parts.forall(_.ratePerSec.contains(10.0)), parts.toSeq)
    // a pushed upper bound shrinks the plan to ONE partition, whose
    // share is then the whole quota — the adaptation a static
    // quota/maxReaders division cannot make
    val b = new HttpScanBuilder(confOf(base))
    b.pushFilters(Array(org.apache.spark.sql.sources.LessThan("page", 8)))
    val bounded = b.build().asInstanceOf[HttpPagedScan].planInputPartitions()
      .map(_.asInstanceOf[HttpPartition])
    assert(bounded.length == 1)
    assert(bounded.head.ratePerSec.contains(20.0), bounded.toSeq)
    // cursor mode: the single sequential walker owns the full quota
    val cur = new HttpPagedScan(confOf(base + ("pagination.cursor" -> "true")))
      .planInputPartitions().map(_.asInstanceOf[HttpPartition])
    assert(cur.length == 1 && cur.head.ratePerSec.contains(20.0), cur.toSeq)
    // without the option, partitions carry no share (static per-reader
    // ratePerSec applies unchanged)
    val off = new HttpPagedScan(confOf(base - "globalRatePerSec"))
      .planInputPartitions().map(_.asInstanceOf[HttpPartition])
    assert(off.forall(_.ratePerSec.isEmpty))
  }

  test("global rate budget: aggregate pacing tracks the connector quota") {
    MockTransport.reset()
    val t0 = System.nanoTime()
    // 10 pages over 2 partitions at a 10 rps connector quota => 5 rps
    // and burst 5 per reader; the 8-page partition must wait at least
    // (8-5)/5 = 0.6 s. globalRatePerSec also overrides the static
    // ratePerSec=10000 the `read` helper sets — plan-time share wins.
    read("http://mock.local/api?mock_total=250",
      Map("globalRatePerSec" -> "10")).where(length($"body") > 0).count()
    val elapsed = (System.nanoTime() - t0) / 1e9
    assert(MockTransport.requests.size == 10)
    assert(elapsed >= 0.5, s"expected aggregate pacing, took ${elapsed}s")
  }

  test("duplicate attempt (retry/speculation) halves its rate share") {
    // the pure rule, SPECULATION ON: attempt 0 keeps the share, each
    // further attempt halves it (worst-case aggregate with one live
    // duplicate = 1.5x)
    assert(HttpPartitionReader.attemptAdjustedRate(10.0, 0, speculation = true) === 10.0)
    assert(HttpPartitionReader.attemptAdjustedRate(10.0, 1, speculation = true) === 5.0)
    assert(HttpPartitionReader.attemptAdjustedRate(10.0, 2, speculation = true) === 2.5)
    assert(HttpPartitionReader.attemptAdjustedRate(10.0, -1, speculation = true) === 10.0)
    // SPECULATION OFF: attempt > 0 is a plain retry whose original is
    // already dead — no overlap to bound, full share, no crawl
    assert(HttpPartitionReader.attemptAdjustedRate(10.0, 1, speculation = false) === 10.0)
    assert(HttpPartitionReader.attemptAdjustedRate(10.0, 3, speculation = false) === 10.0)
    // the reader picks the flag up from the live Spark conf: a forced
    // attempt-1 reader paces at half the planned share only when
    // spark.speculation is on, observable as doubled wall time for the
    // same page walk (burst = rate/2 = 2, so 6 pages wait >= (6-2)/2 =
    // 2s; an attempt-0 reader at rate 4 with burst 4 waits >= 0.5s)
    val env = org.apache.spark.SparkEnv.get
    env.conf.set("spark.speculation", "true")
    try {
      MockTransport.reset()
      val conf = confOf(Map(
        "url" -> "http://mock.local/api?mock_total=150",
        "pageSize" -> "25", "totalRecords" -> "150",
        "transport" -> classOf[MockTransport].getName))
      val part = HttpPartition(0, 6, ratePerSec = Some(4.0))
      val r = new HttpPartitionReader(conf, part, attemptNumber = 1)
      assert(r.rate === 2.0)
      val t0 = System.nanoTime()
      var n = 0
      while (r.next()) n += 1
      val elapsed = (System.nanoTime() - t0) / 1e9
      assert(n == 6)
      assert(elapsed >= 1.9, s"attempt-1 reader must pace at half share: ${elapsed}s")
      // same attempt-1 reader with speculation off: full share
      env.conf.set("spark.speculation", "false")
      val r2 = new HttpPartitionReader(conf, part, attemptNumber = 1)
      assert(r2.rate === 4.0)
    } finally env.conf.set("spark.speculation", "false")
  }

  test("full connector: extract → transform → load → consistency (E2E)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-http-e2e").toString + "/coll"
    val pipeline = Transforms.pipeline(
      Transforms.validate($"value" >= 0),
      Transforms.addIngestionTimestamp())
    val records = Sanitize(
      read("http://mock.local/api?mock_total=250")
        .withColumn("parsed", from_json($"body", recordSchema))
        .select(explode($"parsed.data").as("rec"))
        .select($"rec.*"))
    val out = pipeline(records)
    val sink = graft.load.ParquetSink(dir, org.apache.spark.sql.SaveMode.Overwrite)
    assert(sink.write(out) == 250)
    val back = spark.read.parquet(dir)
    assert(graft.load.Consistency.verify(
      out.drop("ingested_at"), back.drop("ingested_at")))
  }

  test("streaming: micro-batches advance page offsets under maxPagesPerTrigger") {
    MockTransport.reset()
    val stream = spark.readStream.format(classOf[HttpPagedSource].getName)
      .option("url", "http://mock.local/api?mock_total=250")
      .option("pageSize", "25")
      .option("totalRecords", "250")
      .option("transport", classOf[MockTransport].getName)
      .option("ratePerSec", "10000")
      .option("maxPagesPerTrigger", "3")
      .load()
    val ckpt = java.nio.file.Files.createTempDirectory("graft-http-stream").toString
    val q = stream.writeStream.format("memory").queryName("http_pages")
      .option("checkpointLocation", ckpt + "/ckpt").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val pages = spark.table("http_pages").select("page").as[Int].collect().sorted
    assert(pages.toSeq == (0 until 10), s"got ${pages.toSeq}")
    // 10 pages / 3-per-trigger => at least 4 micro-batches committed
    assert(spark.table("http_pages").count() == 10)
  }

  test("pushdown: page predicates shrink the HTTP page range fetched") {
    MockTransport.reset()
    val got = read("http://mock.local/api?mock_total=250")
      .where($"page" >= 3 && $"page" < 7)
      .select($"page", length($"body").as("len"))
      .collect()
    assert(got.map(_.getInt(0)).sorted.toSeq == Seq(3, 4, 5, 6))
    // only the 4 in-bound pages were requested, not all 10
    assert(MockTransport.requests.size == 4,
      s"expected 4 fetches, saw ${MockTransport.requests.size}")
  }

  test("pushdown: IN-list and equality narrow to [min, max] page bounds") {
    MockTransport.reset()
    val got = read("http://mock.local/api?mock_total=250")
      .where($"page".isin(2, 5))
      .select($"page", length($"body").as("len"))
      .collect()
    assert(got.map(_.getInt(0)).sorted.toSeq == Seq(2, 5))
    // bounds narrow to pages [2,6); the residual filter drops 3 and 4
    assert(MockTransport.requests.size == 4)
  }

  test("pushdown: Int.MaxValue bounds don't overflow into an empty scan") {
    // page <= Int.MaxValue is a tautology; a naive v+1 would wrap
    // negative and plan zero partitions
    val n = read("http://mock.local/api?mock_total=250")
      .where($"page" <= Int.MaxValue && $"page" === Int.MaxValue - 1 || $"page" >= 0)
      .count()
    assert(n == 10)
    assert(read("http://mock.local/api?mock_total=250")
      .where($"page" <= Int.MaxValue).count() == 10)
    assert(read("http://mock.local/api?mock_total=250")
      .where($"page" === Int.MaxValue).count() == 0)
  }

  test("pruning: metadata-only scans (count/select page) skip the fetch") {
    MockTransport.reset()
    assert(read("http://mock.local/api?mock_total=250").count() == 10)
    assert(MockTransport.requests.isEmpty,
      "offset-mode count(*) must not touch the network")
    // cursor mode cannot skip: page existence is server-driven
    MockTransport.reset()
    assert(read("http://mock.local/api?mock_total=250",
      Map("pagination.cursor" -> "true")).count() == 10)
    assert(MockTransport.requests.nonEmpty)
  }

  test("pushdown: cursor mode stops early on a pushed page upper bound") {
    MockTransport.reset()
    // a cursor chain can't be entered mid-way (no lower-bound skip), but
    // a pushed upper bound caps the walk: pages [0, 4) fetched, not 10
    val got = read("http://mock.local/api?mock_total=250",
      Map("pagination.cursor" -> "true"))
      .where($"page" < 4)
      .select($"page", length($"body").as("len"))
      .collect()
    assert(got.map(_.getInt(0)).sorted.toSeq == Seq(0, 1, 2, 3))
    assert(MockTransport.requests.size == 4,
      s"cursor walk must stop at the pushed bound, saw ${MockTransport.requests.size} fetches")
    // lower bound alone cannot shrink the cursor walk: all 10 fetched,
    // residual filter trims the output
    MockTransport.reset()
    val lower = read("http://mock.local/api?mock_total=250",
      Map("pagination.cursor" -> "true"))
      .where($"page" >= 7)
      .select($"page", length($"body").as("len"))
      .collect()
    assert(lower.map(_.getInt(0)).sorted.toSeq == Seq(7, 8, 9))
    assert(MockTransport.requests.size == 10,
      "cursor mode cannot skip ahead; the chain must be walked from 0")
  }

  test("cursor pagination follows next_offset and stops at server end") {
    MockTransport.reset()
    // server has only 120 records; the planner budgets 10 pages, but the
    // cursor reader must stop when next_offset comes back null
    val pages = read("http://mock.local/api?mock_total=120",
      Map("pagination.cursor" -> "true"))
    assert(pages.count() == 5, "120 records / 25 per page = 5 pages, then stop")
    // offset mode keeps requesting its planned budget (empty pages)
    MockTransport.reset()
    assert(read("http://mock.local/api?mock_total=120").count() == 10)
  }
}
