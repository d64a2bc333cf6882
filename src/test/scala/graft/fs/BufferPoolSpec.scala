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

  test("striped page cache is consistent under concurrent mixed load") {
    // 64 MiB memory budget => full 16-shard striping (the adaptive shard
    // count collapses to 1 in the other concurrency specs' tiny budgets)
    val root = java.nio.file.Files.createTempDirectory("graft_stripe")
    val stats = new Statistics
    val cache = new PageCache(64L << 20, 32L << 20, root.toString, stats)
    val pageSz = 4096
    val nKeys = 2048
    val errs = new java.util.concurrent.atomic.AtomicInteger
    val threads = (0 until 8).map { t =>
      new Thread(() => {
        val rnd = new scala.util.Random(t)
        (1 to 4000).foreach { _ =>
          val id = rnd.nextInt(nKeys)
          val k = PageKey(f"base$id%04d", id.toLong * pageSz)
          if (rnd.nextBoolean()) {
            // page content is a function of the key — any get must agree
            cache.put(k, Array.fill(pageSz)((id % 251).toByte))
          } else {
            cache.get(k).foreach { page =>
              if (page.length != pageSz || page(0) != (id % 251).toByte)
                errs.incrementAndGet()
            }
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.get == 0, s"${errs.get} corrupted reads")
    assert(cache.pageCount > 0)
    assert(cache.memoryBytes <= (64L << 20))
    cache.clear()
    assert(cache.pageCount == 0 && cache.memoryBytes == 0)
  }

  test("pages of one file spread across shards at the default page size") {
    // regression: offsets are multiples of pageSize (1 MiB default), so a
    // plain shift-based route kept every page of a file in ONE shard
    val root = java.nio.file.Files.createTempDirectory("graft_shardmix")
    val cache = new PageCache(256L << 20, 0, root.toString, new Statistics)
    val pageSz = 1L << 20
    val hit = (0 until 64)
      .map(i => cache.shardIndex(PageKey("samebase", i * pageSz)))
      .toSet
    assert(hit.size >= 8, s"64 consecutive 1MiB pages landed in only " +
      s"${hit.size} of 16 shards")
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
