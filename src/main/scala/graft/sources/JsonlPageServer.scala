package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** In-memory reference implementation of the [[RestPagesSource]] endpoint
  * contract — `GET <path>?offset=X&limit=N` over an append-only record
  * sequence, JSONL body, short page = end of data, empty page past the end.
  * The ONE implementation serves both the declared s3 query's live fixture
  * and the connector specs, so the contract cannot drift between what the
  * oracle exercises and what the tests assert. `records` is re-read per
  * request, so a fixture can grow its sequence mid-test (the append-only
  * upstream the streaming tail consumes).
  *
  * Test hooks: `requests` counts every hit (probe-cost assertions);
  * `failNext` answers the next N requests with 503 (retry-path assertions).
  * Handler threads are daemon; the dispatcher thread is not — callers stop
  * the server explicitly (`close`, or a Spark application-end listener).
  */
final class JsonlPageServer(
    records: () => IndexedSeq[String],
    contextPath: String = "/data",
    offsetParam: String = "offset",
    sizeParam: String = "limit") extends AutoCloseable {

  val requests = new AtomicLong(0)
  val failNext = new AtomicInteger(0)

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext(contextPath, (ex: HttpExchange) => {
    requests.incrementAndGet()
    if (failNext.getAndUpdate(n => math.max(0, n - 1)) > 0) {
      ex.sendResponseHeaders(503, -1); ex.close()
    } else {
      val params = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2); k -> v
        }.toMap
      val rs = records()
      val off = math.max(0L, params.getOrElse(offsetParam, "0").toLong)
      val lim = math.max(0, params.getOrElse(sizeParam, "1000").toInt)
      val from = math.min(off, rs.length.toLong).toInt
      val until = math.min(off + lim, rs.length.toLong).toInt
      val body = rs.slice(from, until).mkString("\n").getBytes(UTF_8)
      ex.sendResponseHeaders(200, if (body.isEmpty) -1 else body.length.toLong)
      if (body.nonEmpty) ex.getResponseBody.write(body)
      ex.close()
    }
  })
  server.setExecutor(Executors.newFixedThreadPool(4, r => {
    val t = new Thread(r, "jsonl-page-server"); t.setDaemon(true); t
  }))
  server.start()

  val url = s"http://127.0.0.1:${server.getAddress.getPort}$contextPath"

  def stop(): Unit = server.stop(0)
  override def close(): Unit = stop()
}
