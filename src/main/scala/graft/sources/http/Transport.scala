package graft.sources.http

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** One fetched page. */
final case class PageResponse(status: Int, body: String)

/** Pluggable page fetcher. Implementations must have a no-arg
  * constructor (instantiated by class name on executors) and be
  * stateless or executor-local — a transport instance lives for one
  * `PartitionReader`.
  */
trait PageTransport {
  def fetch(url: String, headers: Map[String, String]): PageResponse
}

/** Production transport over java.net.http (JDK built-in, no deps). */
final class JdkHttpTransport extends PageTransport {
  private lazy val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10)).build()

  def fetch(url: String, headers: Map[String, String]): PageResponse = {
    val b = HttpRequest.newBuilder(URI.create(url)).GET()
      .timeout(Duration.ofSeconds(30))
    headers.foreach { case (k, v) => b.header(k, v) }
    val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
    PageResponse(resp.statusCode(), resp.body())
  }
}

/** Deterministic offline transport for tests and the zero-egress
  * environment: synthesizes JSON pages from the requested offset, and
  * injects failures on demand.
  *
  * Recognized URL query params (set by the source from its options):
  *   - `offset`, `limit` — pagination window
  *   - behavior comes from the option-provided knobs below via
  *     [[MockTransport.configure]] (executor-local; single-JVM tests).
  */
final class MockTransport extends PageTransport {
  def fetch(url: String, headers: Map[String, String]): PageResponse = {
    val params = url.split('?').lift(1).getOrElse("").split('&')
      .filter(_.contains("=")).map { kv =>
        val Array(k, v) = kv.split("=", 2); k -> v
      }.toMap
    val offset = params.getOrElse("offset", "0").toInt
    val limit = params.getOrElse("limit", "10").toInt
    val total = params.getOrElse("mock_total", "100").toInt
    val failEvery = params.getOrElse("mock_fail_every", "0").toInt

    MockTransport.recordRequest(url, headers)
    // transient failure injection: first attempt at an unlucky offset 429s
    if (failEvery > 0 && (offset / limit) % failEvery == failEvery - 1 &&
        MockTransport.firstAttempt(url)) {
      return PageResponse(429, """{"error": "rate limited"}""")
    }
    val n = math.max(0, math.min(limit, total - offset))
    val records = (0 until n).map { i =>
      val id = offset + i
      s"""{"id": $id, "user.name": "user_$id", "$$meta": {"k": ${id % 7}}, "value": ${id * 10 % 97}}"""
    }
    PageResponse(200, s"""{"data": [${records.mkString(",")}], "next_offset": ${
      if (offset + n < total) (offset + n).toString else "null"}}""")
  }
}

object MockTransport {
  /** Test observability: requests seen + per-URL attempt counts
    * (single-JVM local mode only — fine for local[n] tests).
    */
  private val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
  @volatile private var log: List[(String, Map[String, String])] = Nil

  private[http] def recordRequest(url: String, headers: Map[String, String]): Unit =
    synchronized { log = (url, headers) :: log }

  private[http] def firstAttempt(url: String): Boolean =
    attempts.merge(url, 1, (a, b) => a + b) == 1

  def requests: List[(String, Map[String, String])] = log
  def reset(): Unit = { attempts.clear(); synchronized { log = Nil } }
}
