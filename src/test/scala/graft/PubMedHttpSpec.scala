package graft

import java.net.InetSocketAddress
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.functions._

import graft.sources.PubMedHttp

/** The HTTP ingest contract (reference job_pubmed_submit.py:31-56)
  * proven end-to-end against an in-process server that injects the
  * NCBI failure signatures: transient 5xx, 429 rate-limit, and the
  * 200-with-<ERROR>-body overload response. The file-backed fetcher
  * the harness uses is untouched — both transports share one
  * Retry.withBackoff loop.
  */
class PubMedHttpSpec extends SparkSpec {

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status, if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  private def withServer(handler: (String, HttpExchange) => Unit)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) =>
      try handler(ex.getRequestURI.getPath, ex) finally ex.close())
    // a pool, not the default single dispatcher thread: the slow-header
    // tests stall one exchange while the client's retry must be served
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("transient 5xx: success after retry, exponential backoff schedule") {
    val hits = new AtomicInteger
    val sleeps = collection.mutable.ArrayBuffer.empty[Long]
    withServer((_, ex) =>
      if (hits.incrementAndGet() <= 2) respond(ex, 500, "boom")
      else respond(ex, 200, "page-ok")) { base =>
      val out = PubMedHttp.fetchPage(s"$base/1999_1_num_0",
        maxAttempts = 4, initialDelayMs = 100, sleep = sleeps += _)
      assert(out == "page-ok")
      assert(hits.get == 3, "two failures + one success")
      assert(sleeps.toSeq == Seq(100L, 200L),
        "one doubling sleep per transient failure")
    }
  }

  test("permanent 429 rate limit: typed exhaustion after maxAttempts") {
    val hits = new AtomicInteger
    withServer((_, ex) => {
      hits.incrementAndGet(); respond(ex, 429, "slow down")
    }) { base =>
      val e = intercept[PubMedHttp.FetchExhausted] {
        PubMedHttp.fetchPage(s"$base/p", maxAttempts = 3, sleep = _ => ())
      }
      assert(hits.get == 3, "exactly maxAttempts tries, bounded")
      assert(e.attempts == 3)
      assert(e.getCause.isInstanceOf[PubMedHttp.HttpTransient])
    }
  }

  test("NCBI 200-with-<ERROR> body is transient, never returned as data") {
    val hits = new AtomicInteger
    withServer((_, ex) =>
      if (hits.incrementAndGet() == 1)
        respond(ex, 200, "<eFetchResult><ERROR>Unable to obtain query #1</ERROR></eFetchResult>")
      else respond(ex, 200, "real page")) { base =>
      val out = PubMedHttp.fetchPage(s"$base/p", sleep = _ => ())
      assert(out == "real page")
      assert(hits.get == 2)
    }
  }

  test("404 is terminal end-of-pages: exactly one request, no retries") {
    val hits = new AtomicInteger
    withServer((_, ex) => {
      hits.incrementAndGet(); respond(ex, 404, "")
    }) { base =>
      intercept[PubMedHttp.PageMissing] {
        PubMedHttp.fetchPage(s"$base/p", sleep = _ => ())
      }
      assert(hits.get == 1, "a missing page must not burn retry budget")
    }
  }

  test("301/302 redirects are followed (reference requests.* default)") {
    val hits = new AtomicInteger
    withServer({ (path, ex) =>
      path match {
        case "/old" =>
          hits.incrementAndGet()
          ex.getResponseHeaders.add("Location", "/hop")
          respond(ex, 301, "")
        case "/hop" =>
          hits.incrementAndGet()
          ex.getResponseHeaders.add("Location", "/final")
          respond(ex, 302, "")
        case "/final" =>
          hits.incrementAndGet()
          respond(ex, 200, "moved-page")
        case _ => respond(ex, 404, "")
      }
    }) { base =>
      val out = PubMedHttp.fetchPage(s"$base/old", sleep = _ => ())
      assert(out == "moved-page")
      assert(hits.get == 3, "301 then 302 then 200, one request each")
    }
  }

  test("connection reset mid-body is transient: retried, then succeeds") {
    val hits = new AtomicInteger
    withServer((_, ex) =>
      if (hits.incrementAndGet() == 1) {
        // advertise more bytes than we send, then slam the socket:
        // the client sees an IOException mid-body, not a status code
        ex.sendResponseHeaders(200, 1000L)
        ex.getResponseBody.write("partial".getBytes("UTF-8"))
        ex.getResponseBody.flush()
        ex.close()
      } else respond(ex, 200, "whole-page")) { base =>
      val sleeps = collection.mutable.ArrayBuffer.empty[Long]
      val out = PubMedHttp.fetchPage(s"$base/p", initialDelayMs = 50,
        sleep = sleeps += _)
      assert(out == "whole-page")
      assert(hits.get == 2)
      assert(sleeps.toSeq == Seq(50L), "exactly one backoff sleep")
    }
  }

  test("slow-header hang hits the request timeout and is retried") {
    val hits = new AtomicInteger
    withServer((_, ex) =>
      if (hits.incrementAndGet() == 1) {
        Thread.sleep(2000) // stall past the 300ms request timeout
        respond(ex, 200, "too-late")
      } else respond(ex, 200, "fast-page")) { base =>
      val out = PubMedHttp.fetchPage(s"$base/p", timeoutMs = 300,
        initialDelayMs = 10, sleep = _ => ())
      assert(out == "fast-page")
      assert(hits.get >= 2, "the stalled attempt must be retried")
    }
  }

  test("a stalled server with no retry budget left is typed exhaustion") {
    withServer((_, ex) => {
      Thread.sleep(1500)
      respond(ex, 200, "too-late")
    }) { base =>
      val e = intercept[PubMedHttp.FetchExhausted] {
        PubMedHttp.fetchPage(s"$base/p", maxAttempts = 2, timeoutMs = 200,
          initialDelayMs = 10, sleep = _ => ())
      }
      assert(e.attempts == 2)
      assert(e.getCause.isInstanceOf[java.io.IOException])
    }
  }

  test("DSv2 read over http: retstart paging + injected fault recovery") {
    val faultInjected = new AtomicBoolean(false)
    val re = raw"/(\d+)_(\d+)_num_(\d+)".r
    withServer({ (path, ex) =>
      path match {
        case re(y, m, r) if y.toInt == 1999 =>
          val (mi, ri) = (m.toInt, r.toLong)
          if (mi == 1 && ri == 5 && !faultInjected.getAndSet(true))
            respond(ex, 503, "hiccup") // transient mid-month fault
          else if (mi == 1 && Set(0L, 5L, 10L)(ri))
            respond(ex, 200, s"content-$y-$m-$r")
          else if (mi == 2 && ri == 0L)
            respond(ex, 200, s"content-$y-$m-$r")
          else respond(ex, 404, "")
        case _ => respond(ex, 404, "")
      }
    }) { base =>
      val rows = spark.read.format("pubmed")
        .option("path", base)
        .option("beginYear", 1999).option("endYear", 2000)
        .option("pageSize", 5)
        .load()
        .select("year", "month", "retstart", "content")
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getString(3)))
        .toSet
      assert(rows == Set(
        (1999, 1, 0L, "content-1999-1-0"),
        (1999, 1, 5L, "content-1999-1-5"),
        (1999, 1, 10L, "content-1999-1-10"),
        (1999, 2, 0L, "content-1999-2-0")),
        s"got $rows")
      assert(faultInjected.get, "the 503 path must have been exercised")
    }
  }
}
