package graft.fs

import java.io.IOException
import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.scalatest.funsuite.AnyFunSuite

object FlakyRemoteState {
  /** When set, the next remote append stream fails on its first write. */
  val failNextAppendWrite = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** When set, the next remote create stream throws AFTER its underlying
    * close (data durable remotely, but the caller sees a failure). */
  val failNextCreateClose = new java.util.concurrent.atomic.AtomicBoolean(false)
  /** When set, the next remote create stream fails on its first write
    * (nothing reaches the remote). */
  val failNextCreateWrite = new java.util.concurrent.atomic.AtomicBoolean(false)
}

/** A "remote" with injectable failures on the append write path and the
  * create close path. */
class FlakyRemoteFileSystem extends RawLocalFileSystem {
  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream = {
    val inner = super.append(f, bufferSize, progress)
    new FSDataOutputStream(new java.io.OutputStream {
      override def write(b: Int): Unit = {
        if (FlakyRemoteState.failNextAppendWrite.getAndSet(false)) {
          try inner.close() catch { case _: Throwable => }
          throw new IOException("injected remote append failure")
        }
        inner.write(b)
      }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        if (FlakyRemoteState.failNextAppendWrite.getAndSet(false)) {
          try inner.close() catch { case _: Throwable => }
          throw new IOException("injected remote append failure")
        }
        inner.write(b, off, len)
      }
      override def flush(): Unit = inner.flush()
      override def close(): Unit = inner.close()
    }, null)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val inner = super.create(f, permission, overwrite, bufferSize,
      replication, blockSize, progress)
    new FSDataOutputStream(new java.io.FilterOutputStream(inner) {
      // both overloads carry the injection (ADVICE r3): FilterOutputStream
      // forwards write(int) straight to the inner stream, so covering only
      // the array overload would silently bypass the fault for
      // single-byte writers
      override def write(b: Int): Unit = {
        if (FlakyRemoteState.failNextCreateWrite.getAndSet(false)) {
          try inner.close() catch { case _: Throwable => }
          throw new IOException("injected remote create-write failure")
        }
        inner.write(b)
      }
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        if (FlakyRemoteState.failNextCreateWrite.getAndSet(false)) {
          try inner.close() catch { case _: Throwable => }
          throw new IOException("injected remote create-write failure")
        }
        inner.write(b, off, len)
      }
      override def close(): Unit = {
        super.close()
        if (FlakyRemoteState.failNextCreateClose.getAndSet(false))
          throw new IOException("injected remote close failure")
      }
    }, null)
  }
}

/** Remote-side failures must be fatal to the write-cache copy (ADVICE
  * round 2): a diverged copy + orphan moniker would otherwise survive a
  * failed append forever and serve a tail the remote never committed. */
class RemoteFailureSpec extends AnyFunSuite {

  private val root = java.nio.file.Files.createTempDirectory("graft_flaky")

  private def newFs(tag: String): GraftCachingFileSystem = {
    val c = new Configuration(false)
    c.setLong("graft.fs.data.page.size", 16 * 1024)
    c.set("graft.fs.disk.cache.dir", root.resolve(s"pages_$tag").toString)
    c.set("graft.fs.write.cache.dir", root.resolve(s"wc_$tag").toString)
    c.set("graft.fs.remote.impl", classOf[FlakyRemoteFileSystem].getName)
    val fs = new GraftCachingFileSystem
    fs.initialize(URI.create(s"graft://flaky$tag/"), c)
    fs
  }

  test("failed remote append drops the diverged copy and its moniker; retry serves remote truth") {
    val fs = newFs("a")
    val p = new Path(s"graft://flakya${root.toString}/wal.bin")
    val d1 = Array.tabulate(20000)(i => (i % 251).toByte)
    val d2 = Array.tabulate(8000)(i => ((i * 7) % 251).toByte)

    val out0 = fs.create(p, true)
    out0.write(d1); out0.close()
    val wc = fs.writeCacheRef.get
    val cp = wc.toCachePath(p)
    assert(wc.cacheFs.exists(cp), "settled copy missing after create")

    // the tee writes the cache copy FIRST, so by the time the remote
    // write throws, the copy already holds d2 bytes the remote rejected
    FlakyRemoteState.failNextAppendWrite.set(true)
    val out1 = fs.append(p)
    intercept[IOException] { out1.write(d2); out1.close() }
    FlakyRemoteState.failNextAppendWrite.set(false)

    assert(!wc.cacheFs.exists(cp), "diverged copy survived a failed append")
    assert(!wc.cacheFs.exists(wc.monikerPath(cp)), "orphan moniker left behind")

    // the remote still has exactly d1; reads must agree
    assert(fs.getFileStatus(p).getLen == d1.length.toLong)
    val in = fs.open(p)
    val buf = new Array[Byte](d1.length)
    in.readFully(0, buf); in.close()
    assert(buf.sameElements(d1))

    // a retried append is no longer blocked by a stale moniker
    val out2 = fs.append(p)
    out2.write(d2); out2.close()
    assert(fs.getFileStatus(p).getLen == (d1.length + d2.length).toLong)
    val in2 = fs.open(p)
    val all = new Array[Byte](d1.length + d2.length)
    in2.readFully(0, all); in2.close()
    assert(all.sameElements(d1 ++ d2))
  }

  test("async create: failed remote write, then caller's close(), leaves no phantom meta") {
    val fs = {
      val c = new Configuration(false)
      c.setLong("graft.fs.data.page.size", 16 * 1024)
      c.set("graft.fs.disk.cache.dir", root.resolve("pages_c").toString)
      c.set("graft.fs.write.cache.dir", root.resolve("wc_c").toString)
      c.set("graft.fs.remote.impl", classOf[FlakyRemoteFileSystem].getName)
      c.setBoolean("graft.fs.write.cache.async.close", true)
      val f = new GraftCachingFileSystem
      f.initialize(URI.create("graft://flakyc/"), c)
      f
    }
    val p = new Path(s"graft://flakyc${root.toString}/phantom.bin")
    val d = Array.tabulate(30000)(i => (i % 251).toByte)

    FlakyRemoteState.failNextCreateWrite.set(true)
    val out = fs.create(p, true)
    intercept[IOException] { out.write(d) }
    // the caller's finally-close after the failure must ALSO fail (a
    // caller that suppresses write-path errors and trusts close() to
    // signal the commit must not see success on a truncated remote),
    // and the original remote failure must be attached as the cause
    val closeErr = intercept[IOException] { out.close() }
    assert(closeErr.getCause != null &&
      closeErr.getCause.getMessage.contains("injected remote create-write"),
      s"close() did not carry the original remote failure: $closeErr")

    val wc = fs.writeCacheRef.get
    val cp = wc.toCachePath(p)
    assert(!wc.cacheFs.exists(cp), "copy survived the failed create")
    assert(!wc.cacheFs.exists(wc.monikerPath(cp)), "moniker survived")
    // getFileStatus must reflect the REMOTE truth (an empty file here —
    // the injector closed it before any byte landed), not a phantom
    // 30000-byte record resurrected by close()'s local bookkeeping
    assert(fs.getFileStatus(p).getLen == 0L,
      "phantom meta record served a length the remote never reached")
  }

  test("sync create whose remote close throws drops this generation's copy and meta") {
    val fs = newFs("b")
    val p = new Path(s"graft://flakyb${root.toString}/part.bin")
    val d = Array.tabulate(20000)(i => ((i * 3) % 251).toByte)

    FlakyRemoteState.failNextCreateClose.set(true)
    val out = fs.create(p, true)
    out.write(d)
    intercept[IOException] { out.close() }

    val wc = fs.writeCacheRef.get
    val cp = wc.toCachePath(p)
    assert(!wc.cacheFs.exists(cp), "copy survived a failed sync close")
    assert(!wc.cacheFs.exists(wc.monikerPath(cp)), "moniker survived a failed sync close")

    // remote truth (the underlying close DID land the bytes here) is
    // still readable — just not from the write cache
    val before = fs.stats.bytesFromWriteCache.get
    val in = fs.open(p)
    val buf = new Array[Byte](d.length)
    in.readFully(0, buf); in.close()
    assert(buf.sameElements(d))
    assert(fs.stats.bytesFromWriteCache.get == before,
      "read served from a copy that should have been dropped")
  }
}
