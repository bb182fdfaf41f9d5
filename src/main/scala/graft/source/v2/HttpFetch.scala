package graft.source.v2

import java.io.IOException
import java.net.{HttpURLConnection, URI, URLEncoder}
import java.nio.charset.StandardCharsets

import graft.source.v2.PagedFetch.{Fetch, PageRequest}

/** The live HTTP implementation of the [[PagedFetch.Fetch]] seam — the
  * engine-side counterpart of the reference's API client
  * (/root/reference/fetch_youtube_data.py:53-57 `channels().list`,
  * :87-93 `playlistItems().list` + `pageToken`, :115-119 chunked
  * `videos().list`).
  *
  * [[HttpEndpoint]] is a small SERIALIZABLE value: it ships inside
  * DataSourceV2 InputPartitions and the connection is opened lazily on
  * the executor that runs the partition — no driver-side client object,
  * no closure capture, which is what makes the fetch distributable. The
  * static query string travels pre-encoded (DSv2 option keys are
  * case-folded by Spark, so individual param options would mangle
  * case-sensitive API params like `maxResults`; a single opaque `params`
  * string survives verbatim). Only the dynamic parts — the page token
  * and the id chunk — are appended (URL-encoded) per request.
  *
  * Error contract: any non-2xx status or transport failure throws
  * IOException, which [[PagedFetch.withRetry]] turns into bounded
  * exponential-backoff retries — the engine's version of the quota /
  * transient-failure handling the reference leaves to the client lib.
  */
final case class HttpEndpoint(
    url: String,
    staticQuery: String = "",
    tokenParam: String = "pageToken",
    idsParam: String = "id",
    connectTimeoutMs: Int = 10000,
    readTimeoutMs: Int = 30000) {

  /** Full request URL for one page/chunk request. */
  def requestUrl(req: PageRequest): String = {
    def enc(s: String) = URLEncoder.encode(s, StandardCharsets.UTF_8)
    val dynamic =
      req.pageToken.map(t => s"$tokenParam=${enc(t)}").toSeq ++
        (if (req.ids.nonEmpty) Seq(s"$idsParam=${enc(req.ids.mkString(","))}")
         else Nil)
    val qs = (Option(staticQuery).filter(_.nonEmpty).toSeq ++ dynamic)
      .mkString("&")
    if (qs.isEmpty) url else s"$url?$qs"
  }
}

object HttpFetch {

  /** Build the Fetch: one GET per request, body decoded as UTF-8.
    * Non-2xx → IOException with status + (truncated) body so retry and
    * error logs carry the server's reason. */
  def apply(endpoint: HttpEndpoint): Fetch = { req: PageRequest =>
    val conn = new URI(endpoint.requestUrl(req)).toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(endpoint.connectTimeoutMs)
    conn.setReadTimeout(endpoint.readTimeoutMs)
    conn.setRequestMethod("GET")
    conn.setRequestProperty("Accept", "application/json")
    try {
      val status = conn.getResponseCode
      val stream =
        if (status >= 200 && status < 300) conn.getInputStream
        else conn.getErrorStream
      val body =
        if (stream == null) ""
        else try new String(stream.readAllBytes(), StandardCharsets.UTF_8)
        finally stream.close()
      if (status >= 200 && status < 300) body
      else throw new IOException(
        s"HTTP $status from ${endpoint.url}: ${body.take(200)}")
    } finally conn.disconnect()
  }
}
