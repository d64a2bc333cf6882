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
    closer: Runnable => Unit,
    onRemoteError: () => Unit = () => (),
    localFirst: Boolean = true)
  extends OutputStream {

  private var cache: OutputStream = cacheInit.orNull
  private var count = 0L
  private var closed = false
  private var remoteError: Throwable = null

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

  /** A remote-side failure is fatal to the cached copy: the bytes the
    * remote never accepted must not be served from the write-cache tier
    * later. Cleanup, then propagate (the remote is the source of truth,
    * so its error is the caller's error). */
  private def remoteOp(body: => Unit): Unit =
    try body
    catch {
      case e: Throwable =>
        remoteError = e
        try { if (cache != null) cache.close() } catch { case _: Throwable => }
        cache = null
        onRemoteError()
        throw e
    }

  override def write(b: Int): Unit = {
    teeWrite(_.write(b))
    remoteOp(remote.write(b))
    count += 1
  }

  override def write(b: Array[Byte], off: Int, len: Int): Unit = {
    teeWrite(_.write(b, off, len))
    remoteOp(remote.write(b, off, len))
    count += len
  }

  override def flush(): Unit = {
    teeWrite(_.flush())
    remoteOp(remote.flush())
  }

  override def close(): Unit = {
    if (!closed) {
      closed = true
      if (remoteError != null) {
        // the remote already failed mid-write and onRemoteError dropped
        // every local claim; recording local facts now would resurrect a
        // phantom meta/file-list entry nothing could ever clean up.
        // Release the remote handle, then rethrow (ADVICE r3): a caller
        // that suppressed the write-path exception and relies on close()
        // to signal commit failure must not observe success while the
        // remote holds a truncated file.
        try remote.close() catch { case _: Throwable => }
        throw new java.io.IOException(
          "stream already failed remotely; nothing was committed",
          remoteError)
      }
      // a close-time failure of the CACHE side must not abort the remote
      // close (that would leak the remote stream and pin the moniker
      // forever) — same degrade-to-remote-only treatment as teeWrite
      if (cache != null) {
        // NonFatal, not just IOException: cache FS wrappers surface
        // closed-channel/illegal-state failures as RuntimeExceptions,
        // and ANY of them aborting close() here would leak the remote
        // stream and pin the moniker forever
        try cache.close()
        catch {
          case scala.util.control.NonFatal(_) => cache = null; onCacheError()
        }
      }
      val remoteClose: Runnable =
        () => { remoteOp(remote.close()); onCloseRemote(count) }
      if (localFirst) {
        // create path: local facts first so read-your-writes works
        // before (ASYNC: possibly long before) the upload completes
        onCloseLocal(count)
        closer(remoteClose)
      } else {
        // append path (always SYNC): only record the settled copy after
        // the remote close succeeded — a failed close must not leave
        // the copy registered at a length the remote never reached
        closer(remoteClose)
        onCloseLocal(count)
      }
    }
  }

  def bytesWritten: Long = count
  def cachingActive: Boolean = cache != null
}
