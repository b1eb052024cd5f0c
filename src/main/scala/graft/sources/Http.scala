package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** EXECUTABLE live-source plumbing (SURVEY §2.1 S1–S11 control flow).
  *
  * The fetch-layer contract the fixture-replay sources stand in for is
  * itself control-flow logic — pageKey pagination resumption
  * (helpers.py:264-472), batched RPC multicall (helpers.py:848-935), and
  * semaphore-bounded async fan-out (helpers.py:968-1379, semaphore 20) —
  * and that logic is testable against a localhost fixture server with no
  * network egress. This file is that logic as real code under test:
  * SourcesSpec drives every path (pagination resume, 429 retry, fatal
  * 400, bounded concurrency, batch splitting) against an in-spec JDK
  * HttpServer and asserts byte-identical frames vs the fixture data.
  *
  * Everything here is DRIVER-SIDE by design: these calls produce small
  * dimension/price/config frames (the reference's per-day fetches are
  * thousands of rows, not billions). Bulk data never flows through HTTP
  * loops — it lands in object storage and is read by the S5/S12/S-ext
  * scan sources where pushdown and partition pruning apply.
  */
final case class HttpStatusException(status: Int, body: String)
  extends RuntimeException(s"HTTP $status: ${body.take(200)}")

/** Thin JDK-HttpClient wrapper: one shared client, JSON in/out, status
  * surfaced as [[HttpStatusException]] for the retry policy to classify. */
class HttpFetch(timeout: Duration = Duration.ofSeconds(300)) {
  private val client = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(30)).build()

  def post(url: String, jsonBody: String): String =
    send(HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
      .header("accept", "application/json")
      .header("content-type", "application/json")
      .POST(HttpRequest.BodyPublishers.ofString(jsonBody)).build())

  def get(url: String): String =
    send(HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
      .header("accept", "application/json").GET().build())

  private def send(req: HttpRequest): String = {
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    if (resp.statusCode() != 200)
      throw HttpStatusException(resp.statusCode(), resp.body())
    resp.body()
  }
}

object Http {
  val mapper = new ObjectMapper()

  /** The reference's retry classification (helpers.py:1003-1010): any
    * transport error or 5xx/429 retries with backoff; a 400 is a caller
    * bug — fail immediately, retrying cannot fix the request. */
  def retryableHttp(e: Throwable): Boolean = e match {
    case HttpStatusException(400, _) => false
    case _ => true
  }

  /** PAGINATED JSON fetch with `pageKey` resumption — the exact loop of
    * helpers.py:305-345: POST the payload, collect `resultField.
    * recordsField[]`, and while the response carries `resultField.
    * pageKeyField` re-POST with the key injected into `params[0]`
    * (falling back to the payload root when there is no params array).
    * EVERY page request is independently wrapped in the backoff policy,
    * so a 429 mid-pagination retries THAT page with the SAME key — the
    * resumption property SourcesSpec pins byte-identically.
    * Returns the records as raw JSON strings (order: page order, record
    * order within page) — feed [[jsonRecordsToDf]] for a typed frame. */
  def fetchPaged(http: HttpFetch, url: String, payload: String,
                 resultField: String = "result",
                 recordsField: String = "transfers",
                 pageKeyField: String = "pageKey",
                 maxRetries: Int = 10,
                 initialDelayMs: Long = 10): Seq[String] = {
    val root = mapper.readTree(payload).asInstanceOf[ObjectNode]
    val out = Seq.newBuilder[String]
    var pageKey: Option[String] = None
    var done = false
    while (!done) {
      pageKey.foreach { k =>
        val target = root.path("params") match {
          case arr if arr.isArray && arr.size() > 0 =>
            arr.get(0).asInstanceOf[ObjectNode]
          case _ => root
        }
        target.put(pageKeyField, k)
      }
      val body = Retry.withBackoff(maxRetries, initialDelayMs,
        retryable = retryableHttp) {
        http.post(url, mapper.writeValueAsString(root))
      }
      val result = mapper.readTree(body).path(resultField)
      val recs = result.path(recordsField)
      require(recs.isArray, s"fetchPaged: $resultField.$recordsField is not an array")
      recs.forEach((n: JsonNode) => out += mapper.writeValueAsString(n))
      val nk = result.path(pageKeyField)
      if (nk.isMissingNode || nk.isNull) done = true
      else pageKey = Some(nk.asText())
    }
    out.result()
  }

  /** Raw JSON records (one object per string) → typed DataFrame under an
    * EXPLICIT schema — the declared-schema discipline of every S-family
    * source (no inference pass, unknown fields dropped, missing → null). */
  def jsonRecordsToDf(spark: SparkSession, records: Seq[String],
                      schema: StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(records.toDS())
  }

  /** BATCHED JSON-RPC multicall — the control-flow twin of the
    * reference's `Multicall` (helpers.py:848-935): many logical calls,
    * few HTTP round-trips. Calls are split into `batchSize` groups; each
    * group POSTs ONE JSON-RPC batch array `[{id, method, params}…]` and
    * the whole batch retries as a unit on transient failure (the
    * reference retries `multi()` the same way). Results return in CALL
    * ORDER, re-associated by response `id` (the JSON-RPC contract allows
    * out-of-order responses within a batch). */
  def multicall(http: HttpFetch, url: String,
                calls: Seq[(String, Seq[String])],
                batchSize: Int = 50,
                maxRetries: Int = 10,
                initialDelayMs: Long = 10): Seq[JsonNode] = {
    require(batchSize > 0, "batchSize must be positive")
    calls.zipWithIndex.grouped(batchSize).flatMap { group =>
      val batch = mapper.createArrayNode()
      group.foreach { case ((method, params), id) =>
        val call = batch.addObject()
        call.put("jsonrpc", "2.0").put("id", id).put("method", method)
        val p = call.putArray("params")
        params.foreach(p.add)
      }
      val body = Retry.withBackoff(maxRetries, initialDelayMs,
        retryable = retryableHttp) {
        http.post(url, mapper.writeValueAsString(batch))
      }
      val resp = mapper.readTree(body)
      require(resp.isArray && resp.size() == group.size,
        s"multicall: expected ${group.size} results, got ${if (resp.isArray) resp.size() else body.take(100)}")
      val byId = (0 until resp.size()).map { i =>
        resp.get(i).path("id").asInt() -> resp.get(i).path("result")
      }.toMap
      group.map { case (_, id) =>
        byId.getOrElse(id, sys.error(s"multicall: no result for call id $id"))
      }
    }.toSeq
  }

  /** SEMAPHORE-BOUNDED fan-out — the driver-side twin of the reference's
    * `asyncio.Semaphore(CONCURRENT_REQUESTS=20)` + `gather` sweep
    * (protocol_data_lake.py:855,926): run `fetch` over `items` with at
    * most `concurrency` in flight, results in ITEM ORDER, first failure
    * propagated after the in-flight drain. Per-item retry policy is the
    * caller's (wrap `fetch` in [[Retry.withBackoff]]), matching the
    * reference where the backoff loop lives inside each async call. */
  def boundedFanout[A, B](items: Seq[A], concurrency: Int = 20)
                         (fetch: A => B): Seq[B] = {
    require(concurrency > 0, "concurrency must be positive")
    if (items.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(concurrency, items.size))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = items.map { a =>
        new java.util.concurrent.Callable[B] { def call(): B = fetch(a) }
      }
      // invokeAll preserves order; a fixed pool of `concurrency` threads
      // IS the semaphore (never more than `concurrency` fetches running)
      pool.invokeAll(tasks.asJava).asScala.toSeq.map(_.get())
    } catch {
      case e: java.util.concurrent.ExecutionException => throw e.getCause
    } finally pool.shutdown()
  }
}
