package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Smoke test for the live-endpoint dry-run main ([[graft.Ingest]],
  * VERDICT r13 task 7): the exact `run` the deployment command invokes,
  * driven against the same in-process HTTP server shape PubMedHttpSpec
  * uses — paged months, a transient 503 mid-month, 404 as the
  * end-of-pages signal — plus the egress gate (`--live` required for
  * http urls, never set by the harness).
  */
class IngestSpec extends SparkSpec {

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes("UTF-8")
    ex.sendResponseHeaders(status,
      if (bytes.isEmpty) -1 else bytes.length.toLong)
    if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
  }

  private def withServer(handler: (String, HttpExchange) => Unit)(
      body: String => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) =>
      try handler(ex.getRequestURI.getPath, ex) finally ex.close())
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}")
    finally server.stop(0)
  }

  test("dry run lands every page through the retrying source") {
    val faultInjected = new java.util.concurrent.atomic.AtomicBoolean
    withServer { (path, ex) =>
      path.stripPrefix("/").split("_num_") match {
        case Array(ym, r) =>
          val Array(y, m) = ym.split("_")
          val (mi, ri) = (m.toInt, r.toLong)
          if (y.toInt != 1999) respond(ex, 404, "")
          else if (mi == 1 && ri == 5 && !faultInjected.getAndSet(true))
            respond(ex, 503, "hiccup") // transient: the retry must win
          else if (mi == 1 && Set(0L, 5L)(ri))
            respond(ex, 200, s"content-$y-$m-$r")
          else if (mi == 2 && ri == 0L)
            respond(ex, 200, s"content-$y-$m-$r")
          else respond(ex, 404, "")
        case _ => respond(ex, 404, "")
      }
    } { base =>
      val out = java.nio.file.Files
        .createTempDirectory("ingest-smoke").toString
      val n = Ingest.run(spark, base, 1999, 2000, out,
        format = "pubmed", pageSize = 5)
      assert(n == 3, s"expected 3 pages, got $n")
      // reference object naming on the landed blobs
      val names = new java.io.File(out).listFiles().map(_.getName).toSet
      assert(names == Set("1999_1_num_0", "1999_1_num_5", "1999_2_num_0"),
        names.mkString(","))
    }
  }

  test("parquet landing partitions by (year, month) for pruning") {
    withServer { (path, ex) =>
      path.stripPrefix("/") match {
        case "1999_1_num_0" => respond(ex, 200, "only-page")
        case _ => respond(ex, 404, "")
      }
    } { base =>
      val out = java.nio.file.Files
        .createTempDirectory("ingest-parquet").toString
      val n = Ingest.run(spark, base, 1999, 2000, out, pageSize = 5)
      assert(n == 1)
      assert(new java.io.File(s"$out/year=1999/month=1").isDirectory,
        "parquet landing must be hive-partitioned by (year, month)")
      assert(spark.read.parquet(out)
        .where("year = 1999 AND month = 1")
        .select("content").collect().map(_.getString(0)).toSeq ==
        Seq("only-page"))
    }
  }

  test("egress gate: http url without --live fails fast, file url runs") {
    val e = intercept[IllegalArgumentException] {
      Ingest.main(Array("--url", "https://example.invalid/eutils",
        "--beginYear", "1999", "--endYear", "2000", "--out", "/tmp/x"))
    }
    assert(e.getMessage.contains("--live"), e.getMessage)
    // the offline page-blob transport needs no flag: the rehearsal
    // vector (run() directly — main() would stop the shared session)
    val dir = java.nio.file.Files
      .createTempDirectory("ingest-file").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "1999_1_num_0"),
      "file-page".getBytes("UTF-8"))
    val out = java.nio.file.Files
      .createTempDirectory("ingest-file-out").toString
    assert(Ingest.run(spark, dir, 1999, 2000, out) == 1L)
  }
}
