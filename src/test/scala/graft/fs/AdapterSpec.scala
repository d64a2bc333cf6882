package graft.fs

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, Path}
import org.scalatest.funsuite.AnyFunSuite
import graft.fs.adapters._

/** Scheme adapters + AbstractFileSystem shim, exercised against the
  * local remote (the only remote available in this sandbox — the vendor
  * impls resolve reflectively at deploy time, reference parity with
  * fs/s3a/SidecarS3AFileSystem.java:50-188 and SidecarS3A.java:42-52).
  */
class AdapterSpec extends AnyFunSuite {

  private val root = java.nio.file.Files.createTempDirectory("graft_adapter")

  private def conf(tag: String): Configuration = {
    val c = new Configuration(false)
    c.set("graft.fs.disk.cache.dir", root.resolve(s"pages_$tag").toString)
    c.set("graft.fs.write.cache.dir", root.resolve(s"wc_$tag").toString)
    c
  }

  test("adapter exposes the vendor scheme and injects the vendor remote default") {
    val fs = new GraftS3AFileSystem
    assert(fs.getScheme == "s3a")
    // without an explicit remote override the adapter would reflectively
    // load the aws impl (not on this classpath) — the injected default is
    // the documented deployment contract
    val c = conf("probe")
    val err = intercept[Exception] {
      fs.initialize(URI.create("s3a://bucket/"), c)
    }
    assert(err.toString.contains("s3a") || err.isInstanceOf[ClassNotFoundException] ||
      err.getCause != null, s"unexpected: $err")
  }

  test("adapter caches on top of an explicitly configured local remote") {
    val remoteDir = root.resolve("remote_s3a")
    java.nio.file.Files.createDirectories(remoteDir)
    val c = conf("t1")
    // explicit remote config wins over the injected vendor default —
    // the same mechanism a deployment uses to point at a test endpoint
    c.set("graft.fs.remote.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    c.set("graft.fs.remote.uri", "file:///")
    val fs = new GraftS3AFileSystem
    fs.initialize(URI.create("s3a://bucket/"), c)
    assert(fs.getUri.getScheme == "s3a")

    val p = new Path(s"s3a://bucket$remoteDir/obj.bin")
    val data = Array.tabulate(8192)(i => (i % 251).toByte)
    val out = fs.create(p, true)
    out.write(data)
    out.close()
    // the write-through landed on the "object store" (local remote)
    assert(java.nio.file.Files.size(remoteDir.resolve("obj.bin")) == 8192)

    val in = fs.open(p)
    val buf = new Array[Byte](8192)
    in.readFully(0, buf)
    in.close()
    assert(buf.sameElements(data))
    // caching layer engaged: the read came from the write cache
    assert(fs.stats.bytesFromWriteCache.get == 8192)
    assert(fs.stats.bytesFromRemote.get == 0)
  }

  test("every shipped adapter declares its scheme") {
    val expected = Map(
      new GraftS3AFileSystem -> "s3a", new GraftHdfsFileSystem -> "hdfs",
      new GraftGoogleFileSystem -> "gs", new GraftAbfsFileSystem -> "abfs",
      new GraftSecureAbfsFileSystem -> "abfss",
      new GraftWasbFileSystem -> "wasb", new GraftAdlFileSystem -> "adl",
      new GraftOssFileSystem -> "oss", new GraftSwiftFileSystem -> "swift",
      new GraftLocalFileSystem -> "file")
    expected.foreach { case (fs, scheme) => assert(fs.getScheme == scheme) }
  }

  test("AbstractFileSystem shim mounts graft:// through the FileContext API") {
    val remoteDir = root.resolve("remote_fc")
    java.nio.file.Files.createDirectories(remoteDir)
    val c = conf("t2")
    c.set("fs.AbstractFileSystem.graft.impl", classOf[GraftFs].getName)
    val fc = FileContext.getFileContext(URI.create("graft://test/"), c)

    val p = new Path(s"graft://test$remoteDir/fc.bin")
    val data = Array.tabulate(4096)(i => (i % 127).toByte)
    val out = fc.create(p,
      java.util.EnumSet.of(org.apache.hadoop.fs.CreateFlag.CREATE,
        org.apache.hadoop.fs.CreateFlag.OVERWRITE))
    out.write(data)
    out.close()
    assert(java.nio.file.Files.size(remoteDir.resolve("fc.bin")) == 4096)

    val in = fc.open(p)
    val buf = new Array[Byte](4096)
    in.readFully(0, buf)
    in.close()
    assert(buf.sameElements(data))
  }
}
