package graft.fs

import java.net.URI
import java.nio.ByteBuffer
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileRange, Path}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Hadoop 3.4 vectored-read contract through the caching FS — the entry
  * point Spark's parquet reader uses with vectored I/O enabled. Checks
  * bit-exact range contents (unsorted + gapped + adjacent ranges), warm
  * reads served entirely cache-local, and the documented failure mode
  * (past-EOF rejected up front).
  */
class VectoredReadSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val root = java.nio.file.Files.createTempDirectory("graft_vec_test")
  private val remoteDir = root.resolve("remote")
  private val PageSz = 64 * 1024
  private val FileSz = 4 * PageSz

  private def newFs(tag: String): GraftCachingFileSystem = {
    val c = new Configuration(false)
    c.setLong("graft.fs.data.page.size", PageSz)
    c.setLong("graft.fs.io.buffer.size", 4L * PageSz)
    c.set("graft.fs.disk.cache.dir", root.resolve(s"pages_$tag").toString)
    c.set("graft.fs.write.cache.dir", root.resolve(s"wc_$tag").toString)
    val fs = new GraftCachingFileSystem
    fs.initialize(URI.create("graft://test/"), c)
    fs
  }

  private def expectedByte(pos: Long): Byte = ((pos + 7) % 256).toByte

  private def writeFile(fs: GraftCachingFileSystem, p: Path, len: Int): Unit = {
    val out = fs.create(p, true)
    out.write(Array.tabulate(len)(i => expectedByte(i.toLong)))
    out.close()
  }

  private def graftPath(name: String): Path =
    new Path(s"graft://test${remoteDir.toString}/$name")

  override def beforeAll(): Unit =
    java.nio.file.Files.createDirectories(remoteDir)

  private def check(r: FileRange): Unit = {
    val bb = r.getData.get()
    assert(bb.remaining() == r.getLength, s"range @${r.getOffset} length")
    var i = 0
    while (i < r.getLength) {
      assert(bb.get(bb.position() + i) == expectedByte(r.getOffset + i),
        s"byte ${r.getOffset + i}")
      i += 1
    }
  }

  test("vectored read returns exact bytes for unsorted, gapped, adjacent ranges") {
    val fs = newFs("v1")
    val p = graftPath("vec1.bin")
    writeFile(fs, p, FileSz)

    val ranges = List(
      FileRange.createFileRange(3 * PageSz + 11, 1000), // out of order
      FileRange.createFileRange(0, 100),                // file head
      FileRange.createFileRange(100, 50),               // adjacent to head
      FileRange.createFileRange(PageSz - 10, 20),       // page-straddling
      FileRange.createFileRange(2 * PageSz + 5, 1))     // single byte
    val in = fs.open(p)
    in.readVectored(ranges.asJava, (n: Int) => ByteBuffer.allocate(n))
    ranges.foreach(check)
    in.close()
    fs.close()
  }

  test("warm vectored read is served with zero remote bytes") {
    val fs = newFs("v2")
    val p = graftPath("vec2.bin")
    writeFile(fs, p, FileSz)

    // populate the page cache
    val warm = fs.open(p)
    val all = new Array[Byte](FileSz)
    warm.readFully(0, all)
    warm.close()

    val remoteBefore = fs.stats.bytesFromRemote.get
    val ranges = (0 until 8).map(i =>
      FileRange.createFileRange(i.toLong * FileSz / 8 + 3, 512)).toList
    val in = fs.open(p)
    in.readVectored(ranges.asJava, (n: Int) => ByteBuffer.allocate(n))
    ranges.foreach(check)
    in.close()
    assert(fs.stats.bytesFromRemote.get == remoteBefore,
      "warm vectored read touched the remote tier")
    fs.close()
  }

  test("concurrent vectored reads on one stream are safe and exact") {
    // PositionedReadable allows concurrent positioned reads on a single
    // stream (async parquet I/O does this); vectored reads must uphold
    // the same contract through the synchronized tier cascade
    val fs = newFs("v4")
    val p = graftPath("vec4.bin")
    writeFile(fs, p, FileSz)
    val in = fs.open(p)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val tasks = (0 until 16).map { t =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          override def call(): Unit = {
            val ranges = (0 until 8).map(i =>
              FileRange.createFileRange(
                ((t * 31 + i * 17) % 200) * 1024L + t, 700)).toList
            in.readVectored(ranges.asJava,
              (n: Int) => ByteBuffer.allocate(n))
            ranges.foreach(check)
          }
        })
      }
      tasks.foreach(_.get())
    } finally {
      pool.shutdownNow()
      in.close()
      fs.close()
    }
  }

  test("vectored read rejects past-EOF and overlapping ranges") {
    val fs = newFs("v3")
    val p = graftPath("vec3.bin")
    writeFile(fs, p, FileSz)
    val in = fs.open(p)
    intercept[java.io.EOFException] {
      in.readVectored(
        List(FileRange.createFileRange(FileSz - 10, 100)).asJava,
        (n: Int) => ByteBuffer.allocate(n))
    }
    intercept[IllegalArgumentException] {
      in.readVectored(
        List(FileRange.createFileRange(0, 100),
          FileRange.createFileRange(50, 100)).asJava,
        (n: Int) => ByteBuffer.allocate(n))
    }
    // Hadoop VectoredReadUtils contract: malformed length is
    // IllegalArgumentException, offset problems are EOFException
    intercept[IllegalArgumentException] {
      in.readVectored(List(FileRange.createFileRange(0, -1)).asJava,
        (n: Int) => ByteBuffer.allocate(n))
    }
    intercept[java.io.EOFException] {
      in.readVectored(List(FileRange.createFileRange(-5, 10)).asJava,
        (n: Int) => ByteBuffer.allocate(n))
    }
    // offset + length Long-overflow must still be past-EOF, not a pass
    intercept[java.io.EOFException] {
      in.readVectored(
        List(FileRange.createFileRange(Long.MaxValue - 50, 100)).asJava,
        (n: Int) => ByteBuffer.allocate(n))
    }
    in.close()
    fs.close()
  }
}
