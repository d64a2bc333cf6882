package graft.fs

import java.io.OutputStream
import org.apache.hadoop.fs.FSDataOutputStream

/** Teeing write stream (SidecarCachingOutputStream.java:181-223): every
  * byte goes to the write-cache copy first, then the remote stream. An
  * I/O error on the caching side silently drops the cached copy (the
  * remote write is the source of truth); an error on the remote side
  * propagates.
  *
  * Close is split like the reference's `closingRemote` listener:
  * `onCloseLocal(bytes)` runs immediately (meta save + file-list entry
  * — enables read-your-writes from the write cache), while the remote
  * close plus `onCloseRemote(bytes)` (moniker delete, eviction check)
  * run through `closer` — inline in SYNC mode, on the shared async
  * executor in ASYNC mode, where the caller returns before the remote
  * upload finishes.
  */
final class CachingOutputStream(
    remote: FSDataOutputStream,
    cacheInit: Option[OutputStream],
    onCacheError: () => Unit,
    onCloseLocal: Long => Unit,
    onCloseRemote: Long => Unit,
    closer: Runnable => Unit)
  extends OutputStream {

  private var cache: OutputStream = cacheInit.orNull
  private var count = 0L
  private var closed = false

  private def teeWrite(body: OutputStream => Unit): Unit = {
    if (cache != null) {
      try body(cache)
      catch {
        case _: java.io.IOException =>
          try cache.close() catch { case _: Throwable => }
          cache = null
          onCacheError()
      }
    }
  }

  override def write(b: Int): Unit = {
    teeWrite(_.write(b))
    remote.write(b)
    count += 1
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    teeWrite(_.write(b, off, len))
    remote.write(b, off, len)
    count += len
  }

  override def flush(): Unit = {
    teeWrite(_.flush())
    remote.flush()
  }

  override def close(): Unit = {
    if (!closed) {
      closed = true
      if (cache != null) cache.close()
      onCloseLocal(count)
      closer(() => { remote.close(); onCloseRemote(count) })
    }
  }

  def bytesWritten: Long = count
  def cachingActive: Boolean = cache != null
}
