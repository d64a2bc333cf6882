package graft.fs

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

/** Page-cache admission control: DataCacheMode (ALL / MINSIZE /
  * NOT_IN_WRITE_CACHE) and the exclude-regex list — reference
  * isCacheableFile + DataCacheMode semantics. */
class AdmissionSpec extends AnyFunSuite {

  private val root = java.nio.file.Files.createTempDirectory("graft_adm")
  private val PageSz = 16 * 1024

  private def newFs(tag: String, extra: (String, String)*): GraftCachingFileSystem = {
    val c = new Configuration(false)
    c.setLong("graft.fs.data.page.size", PageSz)
    c.setLong("graft.fs.io.buffer.size", 2L * PageSz)
    c.set("graft.fs.disk.cache.dir", root.resolve(s"pages_$tag").toString)
    c.set("graft.fs.write.cache.dir", root.resolve(s"wc_$tag").toString)
    extra.foreach { case (k, v) => c.set(k, v) }
    val f = new GraftCachingFileSystem
    f.initialize(URI.create("graft://adm/"), c)
    f
  }

  private def p(name: String) = new Path(s"graft://adm${root.toString}/$name")

  private def write(fs: GraftCachingFileSystem, path: Path, len: Int): Unit = {
    val out = fs.create(path, true)
    out.write(new Array[Byte](len))
    out.close()
  }

  private def readAll(fs: GraftCachingFileSystem, path: Path, len: Int): Unit = {
    val in = fs.open(path)
    in.readFully(0, new Array[Byte](len))
    in.close()
  }

  test("MINSIZE mode only caches files at or above the threshold") {
    val fs = newFs("minsize",
      "graft.fs.data.cache.mode" -> "MINSIZE",
      "graft.fs.cache.minsize.threshold" -> (4 * PageSz).toString)
    write(fs, p("small.bin"), PageSz)        // below threshold
    write(fs, p("big.bin"), 4 * PageSz)      // at threshold
    readAll(fs, p("small.bin"), PageSz)
    assert(fs.stats.pagesPut.get == 0, "small file was admitted")
    readAll(fs, p("big.bin"), 4 * PageSz)
    assert(fs.stats.pagesPut.get == 4, "big file not admitted")
  }

  test("NOT_IN_WRITE_CACHE mode skips files already served by the write cache") {
    val fs = newFs("niwc", "graft.fs.data.cache.mode" -> "NOT_IN_WRITE_CACHE")
    write(fs, p("cached.bin"), PageSz)       // lands in the write cache
    readAll(fs, p("cached.bin"), PageSz)
    assert(fs.stats.pagesPut.get == 0)
    assert(fs.stats.bytesFromWriteCache.get == PageSz)
    // a file NOT in the write cache (written directly to the remote)
    val direct = new java.io.File(s"$root/direct.bin")
    val os = new java.io.FileOutputStream(direct)
    os.write(new Array[Byte](PageSz)); os.close()
    readAll(fs, p("direct.bin"), PageSz)
    assert(fs.stats.pagesPut.get == 1)
  }

  test("exclude list blocks page caching by pattern") {
    val fs = newFs("excl",
      "graft.fs.data.cache.exclude.list" -> ".*\\.tmp,.*/staging/.*")
    write(fs, p("keep.bin"), PageSz)
    write(fs, p("skip.tmp"), PageSz)
    readAll(fs, p("keep.bin"), PageSz)
    readAll(fs, p("skip.tmp"), PageSz)
    assert(fs.stats.pagesPut.get == 1, s"puts=${fs.stats.pagesPut.get}")
  }

  test("write-cache exclude list keeps matching files out of the write cache") {
    val fs = newFs("wcexcl",
      "graft.fs.write.cache.exclude.list" -> ".*/archive/.*")
    write(fs, p("archive/old.bin"), PageSz)
    val wc = fs.writeCacheRef.get
    assert(!wc.cacheFs.exists(wc.toCachePath(p("archive/old.bin"))))
    write(fs, p("fresh.bin"), PageSz)
    assert(wc.cacheFs.exists(wc.toCachePath(p("fresh.bin"))))
  }
}
