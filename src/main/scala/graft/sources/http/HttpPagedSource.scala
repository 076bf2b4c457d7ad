package graft.sources.http

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 implementation of the reference's Extract stage
  * (README.md:12-13, :22): authenticated, paginated, rate-limited HTTP
  * collection of JSON pages.
  *
  * Usage:
  * {{{
  * spark.read.format("graft.sources.http.HttpPagedSource")
  *   .option("url", "https://api.example.com/items")
  *   .option("totalRecords", "1000")      // offset pagination extent
  *   .option("pageSize", "100")
  *   .option("authEnv", "API_TOKEN")      // env var, injected as Bearer
  *   .option("ratePerSec", "50")          // per-reader token bucket
  *   .load()                              // => (page INT, body STRING)
  * }}}
  *
  * Design decisions:
  *  - The source yields RAW PAGES (`page`, `body`), not parsed records:
  *    JSON decoding belongs to Catalyst (`from_json` + explode are
  *    codegen'd and schema-checked), keeping the reader trivial and the
  *    parse plan-visible. Predicate pushdown into API query params can
  *    then be layered as options.
  *  - Offset pagination parallelizes: one `InputPartition` per page
  *    range, sized so every task respects the provider quota.
  *  - Auth (README.md:16-18): token resolved from the environment inside
  *    the reader — never in plan, options dump, or logs.
  *  - Rate limiting + retry (README.md:13, :33): a token bucket per
  *    reader and exponential backoff on 429/5xx/transport errors.
  *    `ratePerSec` is a static PER-READER rate; `globalRatePerSec` is
  *    the per-CONNECTOR provider quota, divided across the planned
  *    partitions at plan time — the aggregate request rate then tracks
  *    the quota whatever parallelism the planner picks (page range,
  *    pushed bounds, and `pagesPerPartition` all change the partition
  *    count; a static division would silently over- or under-shoot).
  *  - Cursor-style pagination is inherently sequential → planned as a
  *    single partition (`pagination=cursor`), still rate-limited.
  */
class HttpPagedSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HttpPagedSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HttpPagedTable(new CaseInsensitiveStringMap(properties))
}

object HttpPagedSource {
  val schema: StructType = StructType(Seq(
    StructField("page", IntegerType, nullable = false),
    StructField("body", StringType, nullable = false)))
}

final class HttpPagedTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"http_paged(${options.get("url")})"
  override def schema(): StructType = HttpPagedSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    new HttpScanBuilder(HttpConf(opts))
}

/** Pushdown-aware scan builder — the API-source form of predicate
  * pushdown (SURVEY §4): a `page` predicate shrinks the page range we
  * request over HTTP, and column pruning lets a metadata-only scan
  * (`count(*)`, `select(page)`) skip the body fetch entirely in offset
  * mode. Pushed filters are also left in the post-scan Filter
  * (returned as residuals) so correctness never depends on the
  * source's bound math; `In`/equality still narrow to [min, max].
  */
final class HttpScanBuilder(conf: HttpConf) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import org.apache.spark.sql.sources._

  private var lo = 0
  private var hi = Int.MaxValue
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = HttpPagedSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (recognized, residual) = filters.partition(pagesBound)
    recognized.foreach(applyBound)
    pushed = recognized
    // conservative: Spark re-applies everything post-scan
    residual ++ recognized.filterNot(_.isInstanceOf[IsNotNull])
  }

  private def pagesBound(f: Filter): Boolean = f match {
    case EqualTo("page", _: Int) | GreaterThan("page", _: Int) |
        GreaterThanOrEqual("page", _: Int) | LessThan("page", _: Int) |
        LessThanOrEqual("page", _: Int) | IsNotNull("page") => true
    case In("page", vs) => vs.nonEmpty && vs.forall(_.isInstanceOf[Int])
    case _ => false
  }

  // exclusive upper bounds compute in Long: v+1 on Int.MaxValue would
  // wrap negative and silently plan an empty scan
  private def clampHi(v: Long): Int = math.min(hi.toLong, v).max(0L).toInt

  private def applyBound(f: Filter): Unit = f match {
    case EqualTo("page", v: Int) => lo = math.max(lo, v); hi = clampHi(v.toLong + 1)
    case GreaterThan("page", v: Int) => lo = math.max(lo, math.min(v.toLong + 1, Int.MaxValue.toLong).toInt)
    case GreaterThanOrEqual("page", v: Int) => lo = math.max(lo, v)
    case LessThan("page", v: Int) => hi = clampHi(v.toLong)
    case LessThanOrEqual("page", v: Int) => hi = clampHi(v.toLong + 1)
    case In("page", vs) =>
      val ints = vs.collect { case i: Int => i }
      lo = math.max(lo, ints.min); hi = clampHi(ints.max.toLong + 1)
    case _ => () // IsNotNull: page is never null, nothing to narrow
  }

  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new HttpPagedScan(conf, lo, hi, required)
}

/** Immutable, serializable reader configuration. Secrets stay OUT of
  * this class — only the env var NAME ships to executors.
  */
final case class HttpConf(
    url: String,
    pageSize: Int,
    totalRecords: Long,
    authEnv: Option[String],
    ratePerSec: Double,
    globalRatePerSec: Option[Double],
    maxRetries: Int,
    pagesPerPartition: Int,
    cursor: Boolean,
    transportClass: String,
    extraParams: String,
    maxPagesPerTrigger: Int,
    cursorField: String)

object HttpConf {
  def apply(o: CaseInsensitiveStringMap): HttpConf = HttpConf(
    url = Option(o.get("url")).getOrElse(
      throw new IllegalArgumentException("http-paged source requires 'url'")),
    pageSize = o.getInt("pageSize", 100),
    totalRecords = o.getLong("totalRecords", 1000L),
    authEnv = Option(o.get("authEnv")),
    ratePerSec = Option(o.get("ratePerSec")).map(_.toDouble).getOrElse(100.0),
    globalRatePerSec = Option(o.get("globalRatePerSec")).map(_.toDouble),
    maxRetries = o.getInt("maxRetries", 4),
    pagesPerPartition = o.getInt("pagesPerPartition", 8),
    cursor = o.getBoolean("pagination.cursor", false),
    transportClass = Option(o.get("transport"))
      .getOrElse(classOf[JdkHttpTransport].getName),
    extraParams = Option(o.get("extraParams")).getOrElse(""),
    maxPagesPerTrigger = o.getInt("maxPagesPerTrigger", 4),
    cursorField = Option(o.get("cursorField")).getOrElse("next_offset"))
}

final class HttpPagedScan(conf: HttpConf, minPage: Int = 0,
    maxPageEx: Int = Int.MaxValue,
    prunedSchema: StructType = HttpPagedSource.schema) extends Scan with Batch {
  override def readSchema(): StructType = prunedSchema
  override def description(): String = {
    val bounds = if (minPage > 0 || maxPageEx < Int.MaxValue)
      s", pages=[$minPage,${math.min(maxPageEx, nPages)})" else ""
    s"HttpPagedScan(${conf.url}$bounds, cols=${prunedSchema.fieldNames.mkString(",")})"
  }
  override def toBatch: Batch = this

  private[http] def nPages: Int = math.max(1L,
    (conf.totalRecords + conf.pageSize - 1) / conf.pageSize).toInt

  private[http] def partitionRange(start: Int, end: Int): Array[InputPartition] = {
    val parts =
      if (conf.cursor) {
        // sequential cursor walk: one partition owns all pages
        Array(HttpPartition(start, end))
      } else {
        (start until end by conf.pagesPerPartition).map { s =>
          HttpPartition(s, math.min(s + conf.pagesPerPartition, end))
        }.toArray
      }
    // plan-time global rate budget (README.md:13, :33): the provider
    // quota is per CONNECTOR, not per task — divide it across exactly
    // the partitions this plan will run concurrently, here, where the
    // count is known. A static per-reader rate goes stale the moment
    // pushed bounds or pagesPerPartition change the partition count.
    conf.globalRatePerSec match {
      case Some(quota) if parts.nonEmpty =>
        val each = quota / parts.length
        parts.map(p => p.copy(ratePerSec = Some(each)): InputPartition)
      case _ => parts.map(p => p: InputPartition)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    // pushed page bounds intersected with the configured extent; cursor
    // mode still starts at 0 (the cursor chain can't be entered mid-way)
    val start = if (conf.cursor) 0 else math.max(0, math.min(minPage, nPages))
    val end = math.min(maxPageEx, nPages)
    if (end <= start) Array.empty
    else partitionRange(start, end)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    HttpReaderFactory(conf,
      needPage = prunedSchema.fieldNames.contains("page"),
      needBody = prunedSchema.fieldNames.contains("body"))

  /** Streaming view of the same pagination: offsets are page numbers —
    * the reference's rate-limited polling loop (README.md:13) as a
    * MicroBatchStream. Each trigger advances by at most
    * `maxPagesPerTrigger`; a growing remote collection surfaces as a
    * growing page count (the mock keeps it static).
    */
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new HttpMicroBatchStream(conf, nPages)
}

final case class HttpOffset(page: Int) extends Offset {
  override def json(): String = page.toString
}

final class HttpMicroBatchStream(conf: HttpConf, totalPages: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  override def initialOffset(): Offset = HttpOffset(0)

  // Trigger.AvailableNow: snapshot the page count; the wrapper then
  // loops admission-limited batches until the snapshot is reached.
  override def prepareForTriggerAvailableNow(): Unit = ()

  /** Admission-controlled advancement: each trigger takes at most
    * maxPagesPerTrigger pages past the batch's start offset. (The
    * plain latestOffset() would have to report everything available.)
    */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    HttpOffset(math.min(totalPages,
      start.asInstanceOf[HttpOffset].page + conf.maxPagesPerTrigger))

  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(conf.maxPagesPerTrigger.toLong)

  override def reportLatestOffset(): Offset = HttpOffset(totalPages)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[HttpOffset].page
    val e = end.asInstanceOf[HttpOffset].page
    new HttpPagedScan(conf).partitionRange(s, e)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    HttpReaderFactory(conf, needPage = true, needBody = true)
  override def deserializeOffset(json: String): Offset = HttpOffset(json.trim.toInt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** Explicit factory class (not a SAM lambda) — must serialize to executors. */
final case class HttpReaderFactory(conf: HttpConf, needPage: Boolean,
    needBody: Boolean) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HttpPartitionReader(conf, partition.asInstanceOf[HttpPartition],
      needPage, needBody)
}

/** `ratePerSec`, when set, is this partition's share of the
  * connector's `globalRatePerSec` quota, computed at plan time.
  */
final case class HttpPartition(startPage: Int, endPage: Int,
    ratePerSec: Option[Double] = None) extends InputPartition

/** Fetches [startPage, endPage) with auth, a token bucket, and
  * exponential backoff. One transport per reader.
  *
  * Column pruning: when the scan doesn't need `body` and pagination is
  * offset-style (page existence is determined by config, not by
  * responses), the HTTP fetch is skipped entirely — a pruned
  * `count(*)`/`select(page)` costs zero network calls and zero quota.
  * Cursor mode must still fetch: exhaustion is server-driven.
  *
  * Deliberate consequence: a body-less count() no longer probes the
  * endpoint, so it cannot detect a dead server or bad credentials —
  * health checks must read `body` (as the auth/retry specs do). That
  * is the correct trade at quota-bound scale: monitoring shouldn't
  * spend quota implicitly.
  */
final class HttpPartitionReader(conf: HttpConf, part: HttpPartition,
    needPage: Boolean = true, needBody: Boolean = true,
    attemptNumber: Int = HttpPartitionReader.currentAttempt())
    extends PartitionReader[InternalRow] {

  private val mustFetch = needBody || conf.cursor

  private val transport = Class.forName(conf.transportClass)
    .getDeclaredConstructor().newInstance().asInstanceOf[PageTransport]
  // README.md:16-18: the secret is resolved here, on the executor, from
  // the env — the plan and options only carry the variable's name.
  private val headers: Map[String, String] =
    conf.authEnv.flatMap(v => sys.env.get(v))
      .map(tok => Map("Authorization" -> s"Bearer $tok"))
      .getOrElse(Map.empty) + ("Accept" -> "application/json")

  // plan-time budget share wins over the static per-reader rate; when
  // SPECULATION is enabled, a duplicate attempt (attemptNumber > 0)
  // takes HALF its share — the library can't stop the scheduler from
  // running two copies of a task, but it can bound the worst-case
  // aggregate at quota x 1.5 instead of 2x (the residual: both copies
  // overlapping for the duplicate's whole lifetime still exceeds the
  // quota by the halved share; true enforcement needs an external
  // limiter service). With speculation OFF, attempt > 0 is a plain
  // retry whose original is dead — full share, no crawl.
  private[http] val rate =
    HttpPartitionReader.attemptAdjustedRate(
      part.ratePerSec.getOrElse(conf.ratePerSec), attemptNumber,
      HttpPartitionReader.speculationEnabled)
  private val bucket = new TokenBucket(rate, burst = math.max(1.0, rate))
  private var page = part.startPage
  private var current: InternalRow = _
  // cursor mode: the next request's offset comes from the PREVIOUS
  // response's cursor field, not from the page counter
  private var cursorOffset: Long = part.startPage.toLong * conf.pageSize
  private var exhausted = false
  private val cursorRe =
    ("\"" + java.util.regex.Pattern.quote(conf.cursorField) +
      "\"\\s*:\\s*(null|\"?[-0-9]+\"?)").r

  override def next(): Boolean = {
    if (page >= part.endPage || exhausted) return false
    val body = if (mustFetch) {
      val offset = if (conf.cursor) cursorOffset else page.toLong * conf.pageSize
      val sep = if (conf.url.contains("?")) "&" else "?"
      val extra = if (conf.extraParams.nonEmpty) "&" + conf.extraParams else ""
      val url = s"${conf.url}${sep}offset=$offset&limit=${conf.pageSize}$extra"
      fetchWithRetry(url)
    } else ""
    if (conf.cursor) {
      // follow the server-provided cursor (numeric contract; the field
      // name is configurable via `cursorField`, default next_offset)
      cursorRe.findFirstMatchIn(body).map(_.group(1)) match {
        case Some("null") | None => exhausted = true
        case Some(tok) => cursorOffset = tok.replace("\"", "").toLong
      }
    }
    current = (needPage, needBody) match {
      case (true, true) => InternalRow(page, UTF8String.fromString(body))
      case (true, false) => InternalRow(page)
      case (false, true) => InternalRow(UTF8String.fromString(body))
      case (false, false) => InternalRow.empty
    }
    page += 1
    true
  }

  private def fetchWithRetry(url: String): String = {
    var attempt = 0
    while (true) {
      bucket.acquire()
      val resp =
        try transport.fetch(url, headers)
        catch { case e: java.io.IOException => PageResponse(-1, e.getMessage) }
      resp.status match {
        case 200 => return resp.body
        case s if (s == 429 || s >= 500 || s < 0) && attempt < conf.maxRetries =>
          // exponential backoff with jitterless doubling (deterministic)
          Thread.sleep(math.min(100L << attempt, 5000L))
          attempt += 1
        case s =>
          throw new java.io.IOException(
            s"http-paged: giving up on $url after $attempt retries (status $s)")
      }
    }
    throw new IllegalStateException("unreachable")
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}

object HttpPartitionReader {
  /** The running task's attempt number, 0 when constructed outside a
    * task (driver-side tests).
    */
  private[http] def currentAttempt(): Int =
    Option(org.apache.spark.TaskContext.get()).map(_.attemptNumber()).getOrElse(0)

  /** A duplicate attempt (task retry or speculative copy) halves its
    * rate share: while the original and the duplicate overlap, the
    * aggregate is bounded at share x 1.5 instead of 2x. Attempt > 1
    * keeps halving — pathological retry storms decay geometrically
    * instead of stacking.
    *
    * The halving only applies when SPECULATION is on: without it, an
    * attemptNumber > 0 means the original attempt is already DEAD (a
    * plain task retry — far more common than speculation), so there is
    * no overlap to bound and halving would just crawl the retried
    * partition at half (then quarter…) of its planned share for zero
    * quota benefit.
    */
  private[http] def attemptAdjustedRate(base: Double, attempt: Int,
      speculation: Boolean): Double =
    if (!speculation) base
    else base / (1L << math.min(math.max(attempt, 0), 30))

  /** Whether the running application has speculative execution enabled
    * (executor-side readable; false when no SparkEnv, e.g. unit tests).
    */
  private[http] def speculationEnabled: Boolean =
    Option(org.apache.spark.SparkEnv.get)
      .exists(_.conf.get("spark.speculation", "false").toBoolean)
}

/** Minimal token bucket: `ratePerSec` sustained, `burst` capacity.
  * Per-reader; the `globalRatePerSec` option divides the connector
  * quota across planned partitions so each reader's bucket is its
  * share. Duplicate ATTEMPTS of a partition (retry/speculation) take a
  * geometrically-halved share (see
  * [[HttpPartitionReader.attemptAdjustedRate]]), bounding the
  * worst-case aggregate at quota x 1.5 — full cross-executor
  * enforcement would need an external limiter service, out of scope
  * for a library.
  */
final class TokenBucket(ratePerSec: Double, burst: Double) {
  private var tokens = burst
  private var last = System.nanoTime()

  def acquire(): Unit = synchronized {
    while (true) {
      val now = System.nanoTime()
      tokens = math.min(burst, tokens + (now - last) / 1e9 * ratePerSec)
      last = now
      if (tokens >= 1.0) { tokens -= 1.0; return }
      val waitMs = ((1.0 - tokens) / ratePerSec * 1000).toLong + 1
      Thread.sleep(waitMs)
    }
  }
}
