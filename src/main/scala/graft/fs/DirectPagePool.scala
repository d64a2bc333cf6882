package graft.fs

import java.nio.ByteBuffer
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

/** Pool of fixed-size direct `ByteBuffer` segments backing the page
  * cache's off-heap memory tier (reference default tiers are offheap and
  * hybrid offheap→file, SidecarDataCacheType.java:20-48).
  *
  * Why pooled: a multi-GB page cache allocating/freeing one direct
  * buffer per page churns through `Bits.reserveMemory` and leaves
  * deallocation to `Cleaner` GC pressure — the classic direct-memory
  * failure mode. Here every segment is `pageSize` bytes, acquired on
  * page admission and returned on eviction/invalidation, so steady state
  * allocates nothing and total direct memory is bounded by the byte
  * budget (+ one in-flight segment per shard).
  *
  * Oversize requests (a page larger than the configured page size can
  * only happen if a caller bypasses the page-aligned read path) fall
  * back to a dedicated unpooled buffer that is dropped to GC on release
  * rather than poisoning the free list with odd capacities.
  */
final class DirectPagePool(segmentSize: Int, maxFreeSegments: Int) {

  private val free = new ConcurrentLinkedQueue[ByteBuffer]()
  private val freeCount = new AtomicLong(0)
  /** Total segments ever allocated (tests assert pooling actually reuses). */
  val allocatedSegments = new AtomicLong(0)

  def acquire(len: Int): ByteBuffer = {
    if (len > segmentSize) ByteBuffer.allocateDirect(len)
    else {
      val b = free.poll()
      if (b != null) { freeCount.decrementAndGet(); b.clear(); b }
      else {
        allocatedSegments.incrementAndGet()
        ByteBuffer.allocateDirect(segmentSize)
      }
    }
  }

  def release(b: ByteBuffer): Unit = {
    // odd-capacity (oversize) buffers and overflow beyond the cap are
    // left to GC; the cap keeps a burst-then-idle workload from pinning
    // direct memory above the configured budget forever
    if (b.capacity() == segmentSize && freeCount.get() < maxFreeSegments) {
      freeCount.incrementAndGet()
      free.offer(b)
    }
  }
}

/** A cached page's storage: heap array (heap mode) or a pooled direct
  * segment (offheap mode). `bytes` always returns a heap copy the caller
  * may keep; `release` must be called exactly once, under the owning
  * shard's lock, when the page leaves the memory tier. */
private[fs] sealed trait PageRef {
  def length: Int
  def bytes: Array[Byte]
  def release(): Unit
}

private[fs] final class HeapPageRef(a: Array[Byte]) extends PageRef {
  def length: Int = a.length
  // heap mode hands back the stored array itself (callers never mutate
  // pages); zero-copy keeps heap-mode hits identical to the pre-offheap
  // implementation
  def bytes: Array[Byte] = a
  def release(): Unit = ()
}

private[fs] final class DirectPageRef(
    buf: ByteBuffer, len: Int, pool: DirectPagePool) extends PageRef {
  def length: Int = len
  def bytes: Array[Byte] = {
    val a = new Array[Byte](len)
    // duplicate: position/limit stay thread-confined even if two shard
    // operations race on the same ref (they can't today — shard lock —
    // but a view costs nothing and removes the trap)
    val d = buf.duplicate()
    d.position(0).limit(len)
    d.get(a)
    a
  }
  def release(): Unit = pool.release(buf)
}

private[fs] object PageRef {
  /** Copy `data` into the mode's storage. */
  def store(data: Array[Byte], pool: DirectPagePool): PageRef =
    if (pool == null) new HeapPageRef(data)
    else {
      val b = pool.acquire(data.length)
      b.put(data, 0, data.length)
      new DirectPageRef(b, data.length, pool)
    }
}
