package graft.alto

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import graft.SparkSpec

/** The production HTTP fetcher against an in-process stub server (the
  * SinksSpec recording-proxy discipline applied to the fetch path:
  * this environment has no egress, so the server is loopback-local).
  * Pins the full reference dataflow — N URLs → fetched + parsed +
  * simplified rows — under both FetchPolicy arms, plus the retry /
  * permanent-failure / timeout semantics of the client itself. */
class HttpFetcherSpec extends SparkSpec {
  import spark.implicits._

  // tiny but namespace-valid ALTO v2 doc: one token "HELLO"
  private val altoXml =
    s"""<alto xmlns="${Alto.NsV2}"><Layout><Page WIDTH="10" HEIGHT="20">
       |<PrintSpace><TextBlock><TextLine>
       |<String CONTENT="HELLO" HPOS="1" VPOS="2" WIDTH="3" HEIGHT="4"/>
       |</TextLine></TextBlock></PrintSpace></Page></Layout></alto>""".stripMargin

  /** Start a stub server; routes: /ok/<n> → altoXml, /flaky → fails
    * twice with 503 then serves, /notfound → 404, /slow → sleeps past
    * the client's request timeout. */
  private def withServer[A](f: (String, AtomicInteger) => A): A = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val flakyHits = new AtomicInteger(0)
    def respond(ex: com.sun.net.httpserver.HttpExchange, code: Int, body: String): Unit = {
      val b = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, b.length.toLong)
      ex.getResponseBody.write(b)
      ex.close()
    }
    server.createContext("/ok", ex => respond(ex, 200, altoXml))
    server.createContext("/flaky", ex =>
      if (flakyHits.incrementAndGet() <= 2) respond(ex, 503, "busy")
      else respond(ex, 200, altoXml))
    server.createContext("/notfound", ex => respond(ex, 404, "gone"))
    server.createContext("/slow", ex => { Thread.sleep(2000); respond(ex, 200, altoXml) })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try f(base, flakyHits) finally server.stop(0)
  }

  test("N URLs fetch + parse + simplify end-to-end with the default HTTP fetcher") {
    withServer { (base, _) =>
      val urls = (1L to 5L).map(i => (i, s"$base/ok/$i")).toDF("representation_id", "url")
      val out = Alto.pipeline(Alto.fetchXml(urls,
          HttpFetcher.fetcher(HttpFetcher.Config(maxAttempts = 1))))
        .select("representation_id", "transcript")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(out == (1L to 5L).map(_ -> "HELLO").toMap)
    }
  }

  test("transient 5xx is retried with backoff until it succeeds") {
    withServer { (base, flakyHits) =>
      val body = HttpFetcher.fetcher(
        HttpFetcher.Config(maxAttempts = 3, initialBackoffMs = 10))(s"$base/flaky")
      assert(body == altoXml)
      assert(flakyHits.get() == 3) // 2 failures + 1 success
    }
  }

  test("FailFast: a URL that exhausts its attempts fails the job (reference raise)") {
    withServer { (base, _) =>
      val urls = Seq((1L, s"$base/ok/1"), (2L, s"$base/flaky"))
        .toDF("representation_id", "url")
      // only 2 attempts but /flaky needs 3 → exhausts and throws
      val ex = intercept[Exception] {
        Alto.fetchXml(urls, HttpFetcher.fetcher(
          HttpFetcher.Config(maxAttempts = 2, initialBackoffMs = 10))).collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(ex).exists(_.contains("failed after 2 attempts")))
    }
  }

  test("permanent 4xx fails immediately without retries; Tolerant nulls + counts it") {
    withServer { (base, _) =>
      val urls = Seq((1L, s"$base/ok/1"), (2L, s"$base/notfound"), (3L, s"$base/ok/3"))
        .toDF("representation_id", "url")
      val df = Alto.fetchXml(urls,
        HttpFetcher.fetcher(HttpFetcher.Config(maxAttempts = 3, initialBackoffMs = 10)),
        policy = Alto.FetchPolicy.NullOnError)
      val rows = df.collect()
        .map(r => r.getLong(0) -> Option(r.getAs[String]("xml"))).toMap
      assert(rows(1L).contains(altoXml) && rows(3L).contains(altoXml))
      assert(rows(2L).isEmpty)
      val m = df.queryExecution.observedMetrics("fetch_xml")
      assert(m.getAs[Long]("urls") == 3L)
      assert(m.getAs[Long]("failed_fetches") == 1L)
      // the poison doc still flows through the pipeline as a skipped row
      val piped = Alto.pipeline(df).select("representation_id", "transcript")
        .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("transcript"))).toMap
      assert(piped(1L).contains("HELLO") && piped(2L).isEmpty)
    }
  }

  test("request timeout is honored and surfaces as a FetchFailed after retries") {
    withServer { (base, _) =>
      val t0 = System.nanoTime()
      val ex = intercept[HttpFetcher.FetchFailed] {
        HttpFetcher.fetcher(HttpFetcher.Config(
          requestTimeoutMs = 200, maxAttempts = 2, initialBackoffMs = 10))(s"$base/slow")
      }
      assert(ex.getMessage.contains("failed after 2 attempts"))
      // 2 × 200 ms timeouts + 10 ms backoff ≪ the 2 s the handler sleeps
      assert((System.nanoTime() - t0) / 1e9 < 1.9)
    }
  }
}
