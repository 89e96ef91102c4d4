package graft

import graft.cache.{Retry, TtlCache}
import org.scalatest.funsuite.AnyFunSuite

import java.util.concurrent.atomic.AtomicInteger

/** Port of the reference's cache-behavior layer (reference:
  * test/glue-table-cache.test.ts:20-67, 266-298): TTL expiry,
  * invalidation rules, single-flight, retry counts, 4xx bail.
  */
class CacheSpec extends AnyFunSuite {

  test("TTL expiry reloads (reference 100ms-TTL test)") {
    val cache = new TtlCache[String](10, ttlMs = 100)
    val loads = new AtomicInteger(0)
    def get() = cache.get("k") { loads.incrementAndGet(); "v" }
    get(); get()
    assert(loads.get() == 1)
    Thread.sleep(150)
    get()
    assert(loads.get() == 2)
  }

  test("invalidateMatching drops only keys containing the substring") {
    val cache = new TtlCache[String](10, 60000)
    cache.get("db_tbl_v0")("a"); cache.get("db_other_v0")("b")
    cache.invalidateMatching("db_tbl")
    assert(cache.getIfPresent("db_tbl_v0").isEmpty)
    assert(cache.getIfPresent("db_other_v0").contains("b"))
  }

  test("single-flight: concurrent gets load once") {
    val cache = new TtlCache[String](10, 60000)
    val loads = new AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => cache.get("k") { Thread.sleep(50); loads.incrementAndGet(); "v" })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(loads.get() == 1)
  }

  test("retry: 3 retries then propagate (4 calls total, reference policy)") {
    val calls = new AtomicInteger(0)
    val e = intercept[RuntimeException] {
      Retry.withRetry(retries = 3, minDelayMs = 1, maxDelayMs = 2) {
        calls.incrementAndGet(); throw new RuntimeException("boom")
      }
    }
    assert(e.getMessage == "boom")
    assert(calls.get() == 4)
  }

  test("retry: bail immediately on 4xx-style errors (reference bail on 'HTTP 40')") {
    val calls = new AtomicInteger(0)
    intercept[RuntimeException] {
      Retry.withRetry(retries = 3, minDelayMs = 1, maxDelayMs = 2) {
        calls.incrementAndGet(); throw new RuntimeException("HTTP 403 Forbidden")
      }
    }
    assert(calls.get() == 1)
  }

  test("retry: succeeds after transient failures") {
    val calls = new AtomicInteger(0)
    val out = Retry.withRetry(retries = 3, minDelayMs = 1, maxDelayMs = 2) {
      if (calls.incrementAndGet() < 3) throw new RuntimeException("flaky") else "ok"
    }
    assert(out == "ok" && calls.get() == 3)
  }
}
