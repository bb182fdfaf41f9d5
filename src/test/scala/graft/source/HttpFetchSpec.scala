package graft.source

import java.io.IOException
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.CopyOnWriteArrayList
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkTestBase
import graft.source.v2.{HttpEndpoint, HttpFetch, JsonPagesSource}
import graft.source.v2.PagedFetch.PageRequest

/** Integration tests for the LIVE fetch path: a real in-process HTTP
  * server (JDK httpserver, loopback socket) behind the DataSourceV2
  * `url` mode — the engine's version of the reference's API client
  * (/root/reference/fetch_youtube_data.py:53-57, :87-93, :115-119) is
  * exercised through an actual GET request/response cycle, including
  * the token loop, id chunking, query-param fidelity, and retry on 5xx.
  */
class HttpFetchSpec extends SparkTestBase {

  /** Start a server, run the test body, stop it. Handlers get the parsed
    * query params; every request's raw query is recorded for assertions. */
  private def withServer(
      handler: Map[String, String] => (Int, String))(
      body: (String, CopyOnWriteArrayList[String]) => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val seen = new CopyOnWriteArrayList[String]()
    server.createContext("/api", (ex: HttpExchange) => {
      val raw = Option(ex.getRequestURI.getRawQuery).getOrElse("")
      seen.add(raw)
      val params = raw.split("&").filter(_.nonEmpty).map { kv =>
        val Array(k, v) = kv.split("=", 2)
        k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
      }.toMap
      val (status, resp) = handler(params)
      val bytes = resp.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try body(s"http://127.0.0.1:${server.getAddress.getPort}/api", seen)
    finally server.stop(0)
  }

  test("requestUrl: static query passes verbatim; token and ids are " +
      "URL-encoded dynamically") {
    val ep = HttpEndpoint("http://h/api", "part=snippet&maxResults=50&key=k")
    assert(ep.requestUrl(PageRequest(None, Nil)) ==
      "http://h/api?part=snippet&maxResults=50&key=k")
    assert(ep.requestUrl(PageRequest(Some("a b&c"), Nil)) ==
      "http://h/api?part=snippet&maxResults=50&key=k&pageToken=a+b%26c")
    assert(ep.requestUrl(PageRequest(None, Seq("v1", "v2"))) ==
      "http://h/api?part=snippet&maxResults=50&key=k&id=v1%2Cv2")
  }

  test("pages mode over a real socket: the reader follows nextPageToken " +
      "and the static params reach the server on every request") {
    withServer { params =>
      params.get("pageToken") match {
        case None => (200, """{"nextPageToken":"t2","items":[1]}""")
        case Some("t2") => (200, """{"nextPageToken":"t3","items":[2]}""")
        case Some("t3") => (200, """{"items":[3]}""")
        case Some(other) => (400, s"""{"err":"bad token $other"}""")
      }
    } { (url, seen) =>
      val pages = spark.read.format(JsonPagesSource.Name)
        .option("url", url)
        .option("params", "part=snippet&key=secret")
        .option("mode", "pages")
        .load().collect().map(_.getString(0))
      assert(pages.length == 3)
      assert(pages(0).contains("\"t2\"") && pages(2).contains("[3]"))
      assert(seen.size() == 3)
      assert(seen.asScala.forall(q =>
        q.contains("part=snippet") && q.contains("key=secret")),
        s"static params must reach the server: $seen")
    }
  }

  test("chunks mode over a real socket: one request per 50-id chunk " +
      "(here 2), ids comma-joined in the configured param") {
    withServer { params =>
      (200, s"""{"got":"${params.getOrElse("id", "")}"}""")
    } { (url, seen) =>
      val rows = spark.read.format(JsonPagesSource.Name)
        .option("url", url)
        .option("params", "part=statistics&key=k")
        .option("mode", "chunks")
        .option("ids", "a,b,c,d,e")
        .option("chunkSize", "2")
        .load().collect().map(_.getString(0)).sorted
      assert(rows.toSeq ==
        Seq("""{"got":"a,b"}""", """{"got":"c,d"}""", """{"got":"e"}"""))
      assert(seen.size() == 3, "one HTTP request per chunk")
    }
  }

  test("a 5xx response throws (IOException) and the source's retry " +
      "recovers when the server comes back") {
    val calls = new AtomicInteger(0)
    withServer { _ =>
      if (calls.incrementAndGet() == 1) (503, """{"err":"quota"}""")
      else (200, """{"ok":true}""")
    } { (url, seen) =>
      val rows = spark.read.format(JsonPagesSource.Name)
        .option("url", url)
        .option("mode", "pages")
        .option("retries", "3")
        .option("backoffMs", "1")
        .load().collect()
      assert(rows.length == 1 && rows(0).getString(0) == """{"ok":true}""")
      assert(seen.size() == 2, "failed attempt + successful retry")
    }
  }

  test("a persistent 4xx propagates as IOException carrying the status " +
      "and server body") {
    withServer { _ => (403, """{"error":"keyInvalid"}""") } { (url, _) =>
      val ep = HttpEndpoint(url)
      val e = intercept[IOException] {
        HttpFetch(ep)(PageRequest(None, Nil))
      }
      assert(e.getMessage.contains("403") &&
        e.getMessage.contains("keyInvalid"))
    }
  }
}
