package graft.source.v2

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper

/** The reference's live-fetch control flow, engine-side (SURVEY.md §2.1
  * O3/O10 — /root/reference/fetch_youtube_data.py:83-100 `nextPageToken`
  * loop, :113-119 50-id chunking), written against an INJECTABLE fetch
  * function so the logic is unit-testable offline and swappable for a real
  * HTTP client in production.
  *
  * Shape at scale:
  *  - token-following is inherently sequential (each token comes from the
  *    previous response), so one pagination stream = one InputPartition;
  *    parallelism comes from running many independent streams (one per
  *    playlist/channel) as sibling partitions;
  *  - id-chunking is embarrassingly parallel: each 50-id chunk is its own
  *    InputPartition, fetched executor-side.
  */
object PagedFetch {

  /** One API request: either a page-token step of a pagination stream, or
    * a batched id-chunk lookup. */
  final case class PageRequest(pageToken: Option[String], ids: Seq[String])

  /** The injectable seam: request → raw JSON response document. Offline:
    * fixtures/fakes; live: the HTTP call (built executor-side from
    * serializable config — endpoint, key — never shipped as a closure). */
  type Fetch = PageRequest => String

  private val mapper = new ObjectMapper()

  /** `nextPageToken` from a response document, if present and non-empty
    * (reference :98-100: loop ends when the field is absent). */
  def nextPageToken(responseJson: String): Option[String] = {
    val node = mapper.readTree(responseJson).get("nextPageToken")
    if (node == null || node.isNull) None
    else Option(node.asText()).filter(_.nonEmpty)
  }

  /** The pagination loop: fetch page 1 with no token, follow
    * `nextPageToken` until absent (or `maxPages`, a runaway guard against
    * a server echoing the same token forever). Lazy — pages are fetched as
    * the iterator is consumed, so a downstream limit stops the calls. */
  def followPages(fetch: Fetch, maxPages: Int = 10000): Iterator[String] =
    new Iterator[String] {
      private var token: Option[String] = None
      private var first = true
      private var pages = 0
      override def hasNext: Boolean = (first || token.nonEmpty) &&
        pages < maxPages
      override def next(): String = {
        val page = fetch(PageRequest(token, Nil))
        first = false
        pages += 1
        token = nextPageToken(page)
        page
      }
    }

  /** The reference's 50-id batching (:113-117): ids → chunks of
    * `chunkSize`, each one request. */
  def chunks(ids: Seq[String], chunkSize: Int = 50): Seq[Seq[String]] = {
    require(chunkSize > 0, s"chunkSize must be positive, got $chunkSize")
    ids.grouped(chunkSize).toSeq
  }

  /** Bounded-retry wrapper with exponential backoff: transient fetch
    * failures (rate limits, resets) retry up to `attempts` total tries;
    * the last failure propagates. `sleep` is injectable so tests run
    * without wall-clock delay. */
  def withRetry(fetch: Fetch, attempts: Int = 3, backoffMs: Long = 500,
      sleep: Long => Unit = Thread.sleep): Fetch = { req =>
    require(attempts >= 1, s"attempts must be >= 1, got $attempts")
    var tries = 0
    var result: Option[String] = None
    var lastErr: Throwable = null
    while (result.isEmpty && tries < attempts) {
      try result = Some(fetch(req))
      catch {
        case e: Exception =>
          lastErr = e
          tries += 1
          if (tries < attempts) sleep(backoffMs << (tries - 1))
      }
    }
    result.getOrElse(throw lastErr)
  }

  /** Named-fetcher registry: DataSourceV2 options are strings, so a test
    * (or a local run) registers a Fetch under a name and the source
    * resolves it by the `fetcher` option. Executor-side code resolves from
    * the same JVM-local registry — correct in local mode; in cluster mode
    * a production fetcher is instead CONSTRUCTED in the reader from
    * serializable options (url/key), which is the same seam. */
  object Fetchers {
    private val registry = mutable.Map.empty[String, Fetch]
    def register(name: String, fetch: Fetch): Unit =
      registry.synchronized { registry(name) = fetch }
    def apply(name: String): Fetch = registry.synchronized {
      registry.getOrElse(name,
        throw new IllegalArgumentException(s"unknown fetcher: $name"))
    }
  }
}
