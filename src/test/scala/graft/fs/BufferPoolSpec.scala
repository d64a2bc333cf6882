package graft.fs

import org.scalatest.funsuite.AnyFunSuite

class BufferPoolSpec extends AnyFunSuite {

  test("acquire/release recycles buffers per size class, bounded") {
    val pool = new BufferPool(maxPerSize = 2)
    val a = pool.acquire(1024)
    val b = pool.acquire(1024)
    val c = pool.acquire(1024)
    assert(a.length == 1024 && (a ne b) && (b ne c))
    pool.release(a); pool.release(b); pool.release(c) // c over the cap
    assert(pool.pooledCount(1024) == 2)
    val a2 = pool.acquire(1024)
    val b2 = pool.acquire(1024)
    // identity reuse: pooled buffers come back instead of fresh arrays
    assert(Set(a2, b2).map(System.identityHashCode) ==
      Set(a, b).map(System.identityHashCode))
    // pool drained -> fresh allocation again
    val d = pool.acquire(1024)
    assert((d ne a2) && (d ne b2))
    // other size classes unaffected
    assert(pool.pooledCount(2048) == 0)
  }

  test("caching streams return their span buffer to the shared pool on close") {
    val root = java.nio.file.Files.createTempDirectory("graft_pool")
    val remoteDir = root.resolve("remote")
    java.nio.file.Files.createDirectories(remoteDir)
    val conf = new org.apache.hadoop.conf.Configuration(false)
    val ioSz = 128 * 1024
    conf.setLong("graft.fs.data.page.size", 64 * 1024)
    conf.setLong("graft.fs.io.buffer.size", ioSz)
    conf.set("graft.fs.disk.cache.dir", root.resolve("pages").toString)
    conf.set("graft.fs.write.cache.dir", root.resolve("wc").toString)
    val fs = new GraftCachingFileSystem
    fs.initialize(java.net.URI.create("graft://pool/"), conf)

    val p = new org.apache.hadoop.fs.Path(s"graft://pool$remoteDir/f.bin")
    val out = fs.create(p, true)
    out.write(new Array[Byte](ioSz))
    out.close()

    val before = BufferPool.shared.pooledCount(ioSz)
    val in = fs.open(p)
    in.readFully(0, new Array[Byte](1024))
    in.close()
    assert(BufferPool.shared.pooledCount(ioSz) >= before,
      "span buffer not returned to the pool")
    // a second stream reuses instead of growing the pool beyond one
    val in2 = fs.open(p)
    in2.readFully(0, new Array[Byte](1024))
    in2.close()
    assert(BufferPool.shared.pooledCount(ioSz) <= before + 1)
  }
}
