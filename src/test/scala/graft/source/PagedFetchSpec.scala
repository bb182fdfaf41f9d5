package graft.source

import java.util.concurrent.atomic.AtomicInteger

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.source.v2.PagedFetch
import graft.source.v2.PagedFetch.PageRequest

/** The live-fetch control flow against fake fetchers: token-following,
  * chunk boundaries, and the retry path — the reference's :83-100/:113-119
  * logic, minus the network. */
class PagedFetchSpec extends AnyFunSuite {

  /** Three-page fake: None → "p2" → "p3" → done. */
  private def threePages: PagedFetch.Fetch = {
    case PageRequest(None, Nil) =>
      """{"items": ["a1"], "nextPageToken": "p2"}"""
    case PageRequest(Some("p2"), Nil) =>
      """{"items": ["a2"], "nextPageToken": "p3"}"""
    case PageRequest(Some("p3"), Nil) =>
      """{"items": ["a3"]}"""
    case other => fail(s"unexpected request: $other")
  }

  test("followPages follows nextPageToken until absent, in order") {
    val pages = PagedFetch.followPages(threePages).toSeq
    assert(pages.size == 3)
    assert(pages.map(p => PagedFetch.nextPageToken(p)) ==
      Seq(Some("p2"), Some("p3"), None))
  }

  test("followPages is lazy: a downstream take() stops the fetching") {
    val calls = new AtomicInteger(0)
    val counted: PagedFetch.Fetch =
      req => { calls.incrementAndGet(); threePages(req) }
    assert(PagedFetch.followPages(counted).take(1).toSeq.size == 1)
    assert(calls.get() == 1, "only the consumed page may be fetched")
  }

  test("followPages maxPages guards against a token loop") {
    val echo: PagedFetch.Fetch =
      _ => """{"items": [], "nextPageToken": "again"}"""
    assert(PagedFetch.followPages(echo, maxPages = 7).size == 7)
  }

  test("nextPageToken: absent, null, and empty all end the loop") {
    assert(PagedFetch.nextPageToken("""{"items": []}""").isEmpty)
    assert(PagedFetch.nextPageToken("""{"nextPageToken": null}""").isEmpty)
    assert(PagedFetch.nextPageToken("""{"nextPageToken": ""}""").isEmpty)
    assert(PagedFetch.nextPageToken("""{"nextPageToken": "t"}""")
      .contains("t"))
  }

  test("chunks: 120 ids -> 50/50/20, order preserved") {
    val ids = (1 to 120).map(i => s"v$i")
    val cs = PagedFetch.chunks(ids)
    assert(cs.map(_.size) == Seq(50, 50, 20))
    assert(cs.flatten == ids)
    assert(PagedFetch.chunks(Nil).isEmpty)
    assert(PagedFetch.chunks(Seq("x"), 50) == Seq(Seq("x")))
  }

  test("withRetry: two failures then success; backoff doubles") {
    val attempts = new AtomicInteger(0)
    val sleeps = mutable.Buffer.empty[Long]
    val flaky: PagedFetch.Fetch = req =>
      if (attempts.incrementAndGet() < 3)
        throw new RuntimeException("rate limited")
      else s"""{"ok": ${req.ids.size}}"""
    val got = PagedFetch.withRetry(flaky, attempts = 3, backoffMs = 100,
      sleep = sleeps += _)(PageRequest(None, Seq("a", "b")))
    assert(got == """{"ok": 2}""")
    assert(attempts.get() == 3)
    assert(sleeps.toSeq == Seq(100L, 200L))
  }

  test("withRetry: persistent failure propagates the last error") {
    val dead: PagedFetch.Fetch = _ => throw new RuntimeException("boom")
    val e = intercept[RuntimeException] {
      PagedFetch.withRetry(dead, attempts = 2, sleep = _ => ())(
        PageRequest(None, Nil))
    }
    assert(e.getMessage == "boom")
  }
}
