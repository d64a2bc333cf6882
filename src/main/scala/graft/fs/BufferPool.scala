package graft.fs

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

/** Bounded I/O buffer pool (reference parity: the ObjectPool of I/O and
  * page buffers with io.pool.size=32, SidecarCachingInputStream.java:69-82).
  *
  * Streams churn under a 32-thread parquet scan — every open allocates a
  * prefetch span buffer (4 MiB default) that dies with the stream. The
  * pool recycles them per exact size class; at most `maxPerSize` free
  * buffers are retained per class, anything beyond goes to GC. Buffers
  * are NOT zeroed on release — callers must track valid lengths (the
  * caching stream already does via bufLen).
  */
final class BufferPool(maxPerSize: Int = 32) {
  private val pools =
    new ConcurrentHashMap[Integer, ConcurrentLinkedQueue[Array[Byte]]]()
  private val free = new ConcurrentHashMap[Integer, AtomicInteger]()

  def acquire(size: Int): Array[Byte] = {
    val q = pools.get(Integer.valueOf(size))
    if (q != null) {
      val b = q.poll()
      if (b != null) {
        free.get(Integer.valueOf(size)).decrementAndGet()
        return b
      }
    }
    new Array[Byte](size)
  }

  def release(b: Array[Byte]): Unit = {
    if (b == null || b.length == 0) return
    val size = Integer.valueOf(b.length)
    val c = free.computeIfAbsent(size, _ => new AtomicInteger)
    if (c.incrementAndGet() <= maxPerSize) {
      pools.computeIfAbsent(size, _ => new ConcurrentLinkedQueue[Array[Byte]]())
        .offer(b)
    } else c.decrementAndGet()
  }

  private[fs] def pooledCount(size: Int): Int =
    Option(free.get(Integer.valueOf(size))).map(_.get).getOrElse(0)
}

object BufferPool {
  /** Process-wide pool shared by every caching stream. */
  val shared = new BufferPool()
}
