package graft.fs

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Concurrency port of the reference's multithreaded suite
  * (TestCachingFileSystemMultithreadedBase.java:164-282): parallel
  * readers with strict data verification while a writer churns
  * create/delete on separate files, against one shared cache.
  */
class MultithreadedFsSpec extends AnyFunSuite {

  private val root = java.nio.file.Files.createTempDirectory("graft_fs_mt")
  private val PageSz = 32 * 1024

  private val fs: GraftCachingFileSystem = {
    val c = new Configuration(false)
    c.setLong("graft.fs.data.page.size", PageSz)
    c.setLong("graft.fs.io.buffer.size", 4L * PageSz)
    c.setLong("graft.fs.memory.cache.size", 16L * PageSz)
    c.set("graft.fs.disk.cache.dir", root.resolve("pages").toString)
    c.set("graft.fs.write.cache.dir", root.resolve("wc").toString)
    val f = new GraftCachingFileSystem
    f.initialize(URI.create("graft://mt/"), c)
    f
  }

  private def p(name: String) = new Path(s"graft://mt${root.toString}/$name")

  private def writeDeterministic(path: Path, len: Int, seed: Int): Unit = {
    val out = fs.create(path, true)
    out.write(Array.tabulate(len)(i => ((i + seed) % 256).toByte))
    out.close()
  }

  test("readers verify bytes while a writer churns other files") {
    val len = 8 * PageSz
    (0 until 4).foreach(i => writeDeterministic(p(s"stable$i.bin"), len, i))
    val errors = new AtomicInteger
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)

    val readers = (0 until 4).map { t =>
      new Thread(() => {
        val rnd = new Random(t)
        val in = fs.open(p(s"stable$t.bin"))
        while (!stop.get()) {
          val off = rnd.nextInt(len)
          val n = math.min(rnd.nextInt(2 * PageSz) + 1, len - off)
          val buf = new Array[Byte](n)
          in.readFully(off.toLong, buf, 0, n)
          var i = 0
          while (i < n) {
            if (buf(i) != ((off + i + t) % 256).toByte) errors.incrementAndGet()
            i += 1
          }
        }
        in.close()
      })
    }
    val churner = new Thread(() => {
      var k = 0
      while (!stop.get()) {
        val f = p(s"churn$k.bin")
        writeDeterministic(f, PageSz, k)
        fs.delete(f, false)
        k += 1
      }
    })
    (readers :+ churner).foreach(_.start())
    Thread.sleep(3000)
    stop.set(true)
    (readers :+ churner).foreach(_.join())
    assert(errors.get == 0)
    assert(fs.stats.readRequests.get > 0)
  }
}
