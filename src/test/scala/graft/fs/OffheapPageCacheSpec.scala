package graft.fs

import org.scalatest.funsuite.AnyFunSuite

/** Off-heap memory tier (pooled direct segments): bit-exact storage,
  * bounded allocation via pool reuse, and mode-independent cache
  * behavior (same budgets/LRU → same hit pattern as heap mode). */
class OffheapPageCacheSpec extends AnyFunSuite {

  private val PageSz = 16 * 1024

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_offheap_$tag").toString

  private def page(seed: Int, len: Int = PageSz): Array[Byte] =
    Array.tabulate(len)(i => ((i * 31 + seed * 7) % 251).toByte)

  test("offheap put/get round-trips bit-exact, including short tail pages") {
    val c = new PageCache(4L * PageSz, 0, tmp("rt"), new Statistics,
      PageSz.toLong, offheap = true)
    val full = page(1)
    val tail = page(2, 1000)
    c.put(PageKey("f1", 0), full)
    c.put(PageKey("f1", PageSz.toLong), tail)
    assert(c.get(PageKey("f1", 0)).get.sameElements(full))
    assert(c.get(PageKey("f1", PageSz.toLong)).get.sameElements(tail))
    // a second read must not be corrupted by the first copy-out
    assert(c.get(PageKey("f1", 0)).get.sameElements(full))
  }

  test("eviction to the disk victim tier preserves bytes written from direct segments") {
    val c = new PageCache(4L * PageSz, 64L * PageSz, tmp("ev"), new Statistics,
      PageSz.toLong, offheap = true)
    val pages = (0 until 16).map(i => PageKey("g", i.toLong * PageSz) -> page(i))
    pages.foreach { case (k, d) => c.put(k, d) }
    // budget holds 4 pages; the other 12 must have spilled, not vanished
    pages.foreach { case (k, d) =>
      assert(c.get(k).exists(_.sameElements(d)), s"lost $k")
    }
  }

  test("segment pool bounds allocation: churn reuses released segments") {
    val c = new PageCache(4L * PageSz, 0, tmp("pool"), new Statistics,
      PageSz.toLong, offheap = true)
    (0 until 200).foreach(i => c.put(PageKey("h", i.toLong * PageSz), page(i)))
    // no disk tier: every eviction releases its segment back to the pool,
    // so total allocations stay ~budget-sized, not workload-sized
    assert(c.pool.allocatedSegments.get() <= 8,
      s"pool not reusing: ${c.pool.allocatedSegments.get()} segments for 200 puts")
    c.clear()
  }

  test("heap and offheap modes agree on contents and eviction pattern") {
    val sh = new Statistics
    val so = new Statistics
    val heap = new PageCache(6L * PageSz, 32L * PageSz, tmp("mh"), sh,
      PageSz.toLong, offheap = false)
    val off = new PageCache(6L * PageSz, 32L * PageSz, tmp("mo"), so,
      PageSz.toLong, offheap = true)
    val keys = (0 until 24).map(i => PageKey("m", i.toLong * PageSz))
    keys.zipWithIndex.foreach { case (k, i) =>
      heap.put(k, page(i)); off.put(k, page(i))
    }
    // interleaved re-reads exercise promote-on-hit in both modes
    keys.reverse.zipWithIndex.foreach { case (k, ri) =>
      val i = keys.length - 1 - ri
      val a = heap.get(k); val b = off.get(k)
      assert(a.isDefined == b.isDefined, s"presence diverged at $k")
      assert(a.get.sameElements(b.get), s"bytes diverged at $k")
      assert(a.get.sameElements(page(i)))
    }
    assert(sh.pagesPut.get() == so.pagesPut.get())
    assert(sh.pagesEvictedToDisk.get() == so.pagesEvictedToDisk.get())
    assert(heap.memoryBytes == off.memoryBytes)
    assert(heap.pageCount == off.pageCount)
  }
}
