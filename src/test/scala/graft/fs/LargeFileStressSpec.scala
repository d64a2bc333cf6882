package graft.fs

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Scaled port of the reference's stress suite
  * (TestSidecarCachingInputStreamStress.java: 2 GB file, Zipf reads):
  * a 256 MiB file through production-sized pages (1 MiB page, 4 MiB
  * I/O buffer), mixed sequential scan + random reads, strict content
  * verification and tier-byte conservation.
  */
class LargeFileStressSpec extends AnyFunSuite {

  private val root = java.nio.file.Files.createTempDirectory("graft_stress")
  private val FileMiB = 256
  private val FileLen = FileMiB.toLong << 20

  private def contentAt(pos: Long): Byte = ((pos * 31 + pos / 7919) % 256).toByte

  test(s"$FileMiB MiB file: sequential scan + random reads verify, tiers conserve") {
    val c = new Configuration(false)
    // production defaults: 1 MiB pages, 4 MiB buffer, 64 MiB memory tier
    c.setLong("graft.fs.memory.cache.size", 64L << 20)
    c.setLong("graft.fs.disk.cache.size", 128L << 20)
    c.set("graft.fs.disk.cache.dir", root.resolve("pages").toString)
    c.set("graft.fs.write.cache.enabled", "false")
    val fs = new GraftCachingFileSystem
    fs.initialize(URI.create("graft://stress/"), c)

    val p = new Path(s"graft://stress${root.toString}/big.bin")
    val out = fs.create(p, true)
    val chunk = new Array[Byte](1 << 20)
    var written = 0L
    while (written < FileLen) {
      var i = 0
      while (i < chunk.length) { chunk(i) = contentAt(written + i); i += 1 }
      out.write(chunk)
      written += chunk.length
    }
    out.close()

    val in = fs.open(p)
    // full sequential scan (prefetch-amplified, scan-detected)
    val seqBuf = new Array[Byte](4 << 20)
    var pos = 0L
    while (pos < FileLen) {
      val n = math.min(seqBuf.length.toLong, FileLen - pos).toInt
      in.readFully(pos, seqBuf, 0, n)
      // spot-verify boundaries of each 4 MiB span
      assert(seqBuf(0) == contentAt(pos))
      assert(seqBuf(n - 1) == contentAt(pos + n - 1))
      pos += n
    }
    // random positioned reads across the whole file
    val rnd = new Random(7)
    val buf = new Array[Byte](8192)
    (1 to 500).foreach { _ =>
      val off = (rnd.nextDouble() * (FileLen - buf.length)).toLong
      in.readFully(off, buf, 0, buf.length)
      var i = 0
      while (i < buf.length) {
        if (buf(i) != contentAt(off + i))
          fail(s"corruption at ${off + i}")
        i += 1
      }
    }
    in.close()

    val s = fs.stats
    assert(s.bytesRead.get == s.bytesFromPageCache.get +
      s.bytesFromPrefetch.get + s.bytesFromWriteCache.get +
      s.bytesFromRemote.get)
    // the sequential scan must have tripped the scan detector
    assert(s.pagesRejectedScan.get > 0)
    info(s"stats: $s")
  }
}
