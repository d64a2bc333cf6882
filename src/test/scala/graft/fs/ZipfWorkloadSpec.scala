package graft.fs

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Zipf-distributed page workload against an under-provisioned memory
  * tier (reference: TestSidecarCachingInputStreamBase.java:375-418,
  * zipfAlpha=0.9): the hot head of the distribution must stay cached,
  * so the overall cache-hit byte ratio stays high even though the file
  * is larger than the memory tier.
  */
class ZipfWorkloadSpec extends AnyFunSuite {

  private val root = java.nio.file.Files.createTempDirectory("graft_zipf")
  private val PageSz = 16 * 1024
  private val NPages = 64

  /** Zipf(alpha) over 0..n-1 via inverse-CDF on precomputed weights. */
  private final class Zipf(n: Int, alpha: Double, rnd: Random) {
    private val cdf = {
      val w = Array.tabulate(n)(i => 1.0 / math.pow(i + 1, alpha))
      val total = w.sum
      var acc = 0.0
      w.map { x => acc += x / total; acc }
    }
    def next(): Int = {
      val u = rnd.nextDouble()
      val i = java.util.Arrays.binarySearch(cdf, u)
      if (i >= 0) i else math.min(-i - 1, n - 1)
    }
  }

  test("hot pages of a zipf workload stay cached (alpha=0.9)") {
    val c = new Configuration(false)
    c.setLong("graft.fs.data.page.size", PageSz)
    c.setLong("graft.fs.io.buffer.size", PageSz) // no prefetch amplification
    c.setLong("graft.fs.memory.cache.size", (NPages / 4) * PageSz.toLong)
    c.setLong("graft.fs.disk.cache.size", 0) // memory tier only
    c.set("graft.fs.disk.cache.dir", root.resolve("pages").toString)
    c.set("graft.fs.write.cache.enabled", "false")
    val fs = new GraftCachingFileSystem
    fs.initialize(URI.create("graft://zipf/"), c)

    val p = new Path(s"graft://zipf${root.toString}/zipf.bin")
    val out = fs.create(p, true)
    out.write(Array.tabulate(NPages * PageSz)(i => (i % 251).toByte))
    out.close()

    val rnd = new Random(42)
    val zipf = new Zipf(NPages, 0.9, rnd)
    val in = fs.open(p)
    val buf = new Array[Byte](512)
    (1 to 20000).foreach { _ =>
      val page = zipf.next()
      val off = page.toLong * PageSz + rnd.nextInt(PageSz - buf.length)
      in.readFully(off, buf)
    }
    in.close()

    val s = fs.stats
    val hitBytes = s.bytesFromPageCache.get + s.bytesFromPrefetch.get
    val ratio = hitBytes.toDouble / s.bytesRead.get
    // 16 of 64 pages fit; zipf(0.9) mass on the top-16 is ~60%, and LRU
    // keeps the head resident — demand a clear majority of hit bytes
    assert(ratio > 0.5, s"hit ratio $ratio, stats=$s")
    // the cold tail must also be real (not everything fits)
    assert(s.bytesFromRemote.get > 0)
  }

  test("offheap direct allocation stays <= 2x the memory budget under zipf churn") {
    // end-to-end bound on the DirectPagePool claim (PageCache pool cap
    // math): the under-provisioned memory tier cycles pages constantly
    // (evictions) and file rewrites invalidate whole key ranges, yet
    // total direct segments EVER allocated must stay within live budget
    // + free-list cap = 2x the byte budget — i.e. churn recycles
    // segments instead of allocating fresh ones
    val budget = (NPages / 4) * PageSz.toLong
    val c = new Configuration(false)
    c.setLong("graft.fs.data.page.size", PageSz)
    c.setLong("graft.fs.io.buffer.size", PageSz)
    c.setLong("graft.fs.memory.cache.size", budget)
    c.setLong("graft.fs.disk.cache.size", 0)
    c.set("graft.fs.disk.cache.dir", root.resolve("churn_pages").toString)
    c.set("graft.fs.write.cache.enabled", "false")
    c.set("graft.fs.data.cache.type", "OFFHEAP")
    val fs = new GraftCachingFileSystem
    fs.initialize(URI.create("graft://zipfchurn/"), c)

    val p = new Path(s"graft://zipfchurn${root.toString}/churn.bin")
    val rnd = new Random(7)
    val zipf = new Zipf(NPages, 0.9, rnd)
    val buf = new Array[Byte](512)
    val out0 = fs.create(p, true)
    out0.write(Array.tabulate(NPages * PageSz)(i => (i % 251).toByte))
    out0.close()
    (0 until 4).foreach { gen =>
      // read churn: 4x over-subscription keeps the LRU evicting (each
      // eviction must release its segment back to the pool)
      val in = fs.open(p)
      (1 to 5000).foreach { _ =>
        val page = zipf.next()
        val off = page.toLong * PageSz + rnd.nextInt(PageSz - buf.length)
        in.readFully(off, buf)
      }
      in.close()
      // invalidation churn: append drops EVERY cached page of the file
      // (all segments release at once), and the next generation's reads
      // repopulate the tier under new page keys
      val app = fs.append(p)
      app.write(Array.fill(PageSz)(gen.toByte))
      app.close()
    }

    val pc = fs.pageCacheRef
    assert(pc.pool != null, "offheap mode did not build a segment pool")
    val allocated = pc.pool.allocatedSegments.get * PageSz.toLong
    // sanity: the workload really exercised the tier (filled the budget)
    assert(allocated >= budget, s"tier never filled: $allocated of $budget")
    assert(allocated <= 2 * budget,
      s"direct allocation $allocated exceeds 2x budget $budget " +
        s"(segments=${pc.pool.allocatedSegments.get}, stats=${fs.stats})")
  }
}
