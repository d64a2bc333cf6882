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
}
