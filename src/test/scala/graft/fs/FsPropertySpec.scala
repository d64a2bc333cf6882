package graft.fs

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based differential testing of the caching read path,
  * mirroring the reference's randomized workloads
  * (TestSidecarCachingInputStreamBase.java:375-418): any (offset,
  * length) positioned read through the tier cascade must equal the
  * deterministic generator, including reads crossing page and prefetch
  * boundaries.
  */
class FsPropertySpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val root = java.nio.file.Files.createTempDirectory("graft_fs_prop")
  private val PageSz = 16 * 1024
  private val FileLen = 11 * PageSz + 7777 // non-aligned on purpose

  private val fs: GraftCachingFileSystem = {
    val c = new Configuration(false)
    c.setLong("graft.fs.data.page.size", PageSz)
    c.setLong("graft.fs.io.buffer.size", 3L * PageSz) // non-power-of-2 span
    c.setLong("graft.fs.memory.cache.size", 4L * PageSz) // force disk spill
    c.setLong("graft.fs.disk.cache.size", 6L * PageSz)   // force disk evict
    c.set("graft.fs.disk.cache.dir", root.resolve("pages").toString)
    c.set("graft.fs.write.cache.dir", root.resolve("wc").toString)
    val f = new GraftCachingFileSystem
    f.initialize(URI.create("graft://prop/"), c)
    f
  }

  private val path = new Path(s"graft://prop${root.toString}/prop.bin")

  {
    val out = fs.create(path, true)
    out.write(Array.tabulate(FileLen)(i => ((i * 31 + 7) % 256).toByte))
    out.close()
  }

  test("every positioned read equals the generator (tiny caches, spill + evict active)") {
    val in = fs.open(path)
    val gen = for {
      off <- Gen.chooseNum(0, FileLen - 1)
      len <- Gen.chooseNum(1, math.min(4 * PageSz, FileLen - off))
    } yield (off, len)
    check(Prop.forAll(gen) { case (off, len) =>
      val buf = new Array[Byte](len)
      in.readFully(off.toLong, buf, 0, len)
      (0 until len).forall(i => buf(i) == (((off + i) * 31 + 7) % 256).toByte)
    })
    in.close()
    // under-provisioned tiers must actually have spilled/evicted
    assert(fs.stats.pagesEvictedToDisk.get > 0)
  }

  test("random create/append sequences: reads always equal the writes (property)") {
    // the append tee's state machine (settled tee / divergent fallback /
    // length bookkeeping) must hold for ANY sequence of create + appends
    val gen = for {
      nChunks <- Gen.chooseNum(1, 5)
      sizes <- Gen.listOfN(nChunks, Gen.chooseNum(1, 2 * PageSz))
      seed <- Gen.chooseNum(0, 255)
    } yield (sizes, seed)
    var id = 0
    check(Prop.forAll(gen) { case (sizes, seed) =>
      id += 1
      val p = new Path(s"graft://prop${root.toString}/app_$id.bin")
      def byteAt(pos: Int): Byte = ((pos * 17 + seed) % 256).toByte
      // create with the first chunk, append the rest
      var written = 0
      val out0 = fs.create(p, true)
      out0.write(Array.tabulate(sizes.head)(i => byteAt(i)))
      out0.close()
      written = sizes.head
      sizes.tail.foreach { n =>
        val out = fs.append(p)
        out.write(Array.tabulate(n)(i => byteAt(written + i)))
        out.close()
        written += n
      }
      val st = fs.getFileStatus(p)
      val buf = new Array[Byte](written)
      val in = fs.open(p)
      in.readFully(0, buf)
      in.close()
      fs.delete(p, false)
      st.getLen == written &&
        (0 until written).forall(i => buf(i) == byteAt(i))
    })
  }

  test("dround matches BigDecimal HALF_UP on the scaled double (property)") {
    // Det.dround contract: round(x*100)/100 under IEEE == DuckDB ROUND
    check(Prop.forAll(Gen.chooseNum(-1e7, 1e7)) { (x: Double) =>
      val scaled = x * 100.0
      val expected = math.round(scaled) / 100.0 // std::round for |x|<2^52
      val viaBd = BigDecimal(java.lang.Double.toString(scaled))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble / 100.0
      // the identity Spark's round() relies on: shortest-repr HALF_UP ==
      // half-away-from-zero on the scaled binary double
      expected == viaBd
    })
  }
}
