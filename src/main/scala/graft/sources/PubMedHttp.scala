package graft.sources

import java.io.IOException
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** Bounded-retry machinery shared by every page fetcher (reference
  * contract: spark-pubmed/job_pubmed_submit.py:31-56 — the reference
  * loops `while True: sleep(3)` on ANY failure; D6 replaces that with
  * bounded exponential backoff and a typed terminal failure).
  */
object Retry {

  /** Runs `op` with bounded exponential backoff. A failure passing
    * `shouldRetry` sleeps and retries up to maxAttempts total tries;
    * one failing it propagates immediately (terminal conditions like
    * 404 must NOT burn retry budget); exhaustion throws `wrap(last)`.
    * `sleep` is injectable so specs assert the backoff schedule
    * without wall-clock waits.
    */
  def withBackoff[A](maxAttempts: Int = 4, initialDelayMs: Long = 250,
      sleep: Long => Unit = Thread.sleep,
      shouldRetry: Throwable => Boolean = _.isInstanceOf[IOException],
      wrap: Throwable => Throwable = identity)(op: () => A): A = {
    var attempt = 0
    var delayMs = initialDelayMs
    while (true) {
      try return op()
      catch {
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (!shouldRetry(e)) throw e
          if (attempt >= maxAttempts) throw wrap(e)
          sleep(delayMs)
          delayMs *= 2
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** HTTP page fetcher with the NCBI E-utilities failure taxonomy
  * (public API contract, https://www.ncbi.nlm.nih.gov/books/NBK25497):
  *
  *  - HTTP 429 (rate limit) and 5xx        -> transient, retried;
  *  - HTTP 200 whose BODY carries an error -> transient, retried
  *    (E-utilities reports overload as 200 + `{"error": ...}` JSON or
  *    an `<ERROR>` element, so status alone is not trustworthy);
  *  - HTTP 404                             -> [[PageMissing]], terminal,
  *    never retried (it is the end-of-pages signal for the pager);
  *  - other 4xx                            -> terminal IOException;
  *  - retry exhaustion                     -> [[FetchExhausted]] with
  *    the last failure as cause.
  *
  * The zero-egress harness never calls this against the real service —
  * `PubMedHttpSpec` drives it against an in-process HTTP server that
  * injects each signature.
  */
object PubMedHttp {

  /** Terminal: the page does not exist (end of a month's pages). */
  final class PageMissing(val url: String)
    extends IOException(s"no such page: $url")

  /** Transient failure worth a retry (rate limit / 5xx / error body). */
  final class HttpTransient(val url: String, detail: String)
    extends IOException(s"$detail: $url")

  /** Terminal: retry budget exhausted; cause = last transient. */
  final class FetchExhausted(val url: String, val attempts: Int,
      cause: Throwable)
    extends IOException(
      s"fetch exhausted after $attempts attempts: $url", cause)

  /** Terminal: a non-retryable HTTP status (4xx other than 404/429). */
  final class TerminalHttp(val url: String, val status: Int)
    extends IOException(s"HTTP $status (terminal): $url")

  // E-utilities 200-with-error signatures (public markers)
  private val bodyErrorSignatures =
    Seq("API rate limit exceeded", "<ERROR>", "\"error\":")

  private lazy val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    // the reference's client (requests.post) follows redirects by
    // default, and E-utilities 301s http->https; NORMAL follows all
    // redirects except https->http downgrades
    .followRedirects(HttpClient.Redirect.NORMAL)
    .build()

  /** One raw GET, no retry: (status, body). */
  private def get(url: String, timeoutMs: Long): (Int, String) = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .timeout(Duration.ofMillis(timeoutMs)).GET().build()
    val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
    (resp.statusCode(), resp.body())
  }

  /** GET with the bounded-backoff loop and the taxonomy above. */
  def fetchPage(url: String, maxAttempts: Int = 4,
      initialDelayMs: Long = 250, sleep: Long => Unit = Thread.sleep,
      timeoutMs: Long = 10000): String =
    Retry.withBackoff(maxAttempts, initialDelayMs, sleep,
      shouldRetry = {
        case _: PageMissing | _: FetchExhausted | _: TerminalHttp => false
        case _: IOException => true // HttpTransient + connect/timeout IO
        case _ => false
      },
      wrap = e => new FetchExhausted(url, maxAttempts, e)) { () =>
      val (status, body) = get(url, timeoutMs)
      if (status == 404) throw new PageMissing(url)
      if (status == 429 || status >= 500)
        throw new HttpTransient(url, s"HTTP $status")
      if (status != 200) throw new TerminalHttp(url, status)
      bodyErrorSignatures.find(body.contains) match {
        case Some(sig) => throw new HttpTransient(url, s"error body ($sig)")
        case None => body
      }
    }
}
