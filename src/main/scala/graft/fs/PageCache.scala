package graft.fs

import java.io.{File, FileInputStream, FileOutputStream, ObjectInputStream, ObjectOutputStream}
import java.security.MessageDigest
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** Page identity: MD5(qualifiedPath + "/" + modTime) plus the
  * page-aligned offset — the reference's key scheme
  * (util/Utils.java:89-123). Embedding modTime makes keys of rewritten
  * files unreachable garbage instead of wrong answers. */
final case class PageKey(base: String, offset: Long) extends Serializable

object PageKey {
  def baseFor(qualifiedPath: String, modTime: Long): String = {
    val md = MessageDigest.getInstance("MD5")
    md.digest(s"$qualifiedPath/$modTime".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }
}

/** Two-tier page cache: an LRU byte-budgeted memory tier whose victims
  * spill to an LRU disk tier (the reference's offheap->file victim
  * tiering, SidecarCachingFileSystem.java:916-929, simplified to
  * heap+disk). Thread-safe; all maps are access-ordered LinkedHashMaps
  * guarded by this object's lock — the data copies are O(pageSize) and
  * happen outside any remote I/O, so the lock is never held across RPCs.
  */
final class PageCache(memCapacity: Long, diskCapacity: Long, diskDir: String,
    stats: Statistics) {

  private val mem = new java.util.LinkedHashMap[PageKey, Array[Byte]](256, 0.75f, true)
  private var memBytes = 0L
  // disk tier index: key -> file length (file name derived from key)
  private val disk = new java.util.LinkedHashMap[PageKey, Long](256, 0.75f, true)
  private var diskBytes = 0L

  new File(diskDir).mkdirs()

  private def diskFile(k: PageKey): File =
    new File(diskDir, s"${k.base}_${k.offset}.page")

  def get(k: PageKey): Option[Array[Byte]] = synchronized {
    val m = mem.get(k)
    if (m != null) Some(m)
    else if (disk.containsKey(k)) {
      val f = diskFile(k)
      if (!f.exists()) { removeDisk(k); None }
      else {
        val buf = java.nio.file.Files.readAllBytes(f.toPath)
        if (memCapacity >= buf.length) {
          // promote on hit (victim-cache behavior): the page moves
          // tiers, releasing the disk entry + file so it isn't counted
          // against both budgets
          removeDisk(k)
          f.delete()
          putMem(k, buf)
        }
        // else: memory tier can't hold a page at all — serve from disk
        // in place (promoting would just spill straight back, rewriting
        // the same file on every hit)
        Some(buf)
      }
    } else None
  }

  def contains(k: PageKey): Boolean = synchronized {
    mem.containsKey(k) || disk.containsKey(k)
  }

  /** Insert unless present (the reference dedups via maybeExists under a
    * lock — same key implies same bytes by construction). */
  def put(k: PageKey, data: Array[Byte]): Unit = synchronized {
    if (!mem.containsKey(k) && !disk.containsKey(k)) {
      putMem(k, data)
      stats.pagesPut.incrementAndGet()
    }
  }

  private def putMem(k: PageKey, data: Array[Byte]): Unit = {
    mem.put(k, data)
    memBytes += data.length
    while (memBytes > memCapacity && !mem.isEmpty) {
      val it = mem.entrySet().iterator()
      val eldest = it.next()
      it.remove()
      memBytes -= eldest.getValue.length
      spillToDisk(eldest.getKey, eldest.getValue)
    }
  }

  private def spillToDisk(k: PageKey, data: Array[Byte]): Unit = {
    if (diskCapacity <= 0) return
    if (!disk.containsKey(k)) {
      val f = diskFile(k)
      val out = new FileOutputStream(f)
      try out.write(data) finally out.close()
      disk.put(k, data.length.toLong)
      diskBytes += data.length
      stats.pagesEvictedToDisk.incrementAndGet()
      while (diskBytes > diskCapacity && !disk.isEmpty) {
        val it = disk.entrySet().iterator()
        val eldest = it.next()
        it.remove()
        diskBytes -= eldest.getValue
        diskFile(eldest.getKey).delete()
      }
    }
  }

  private def removeDisk(k: PageKey): Unit = {
    val len = disk.remove(k)
    if (len != null) diskBytes -= len
  }

  /** Drop every page of a file (walk offsets by pageSize like the
    * reference's evictDataPages). */
  def invalidateFile(base: String, fileLen: Long, pageSize: Long): Unit =
    synchronized {
      var off = 0L
      while (off < math.max(fileLen, pageSize)) {
        val k = PageKey(base, off)
        val m = mem.remove(k)
        if (m != null) memBytes -= m.length
        if (disk.containsKey(k)) { removeDisk(k); diskFile(k).delete() }
        off += pageSize
      }
    }

  def clear(): Unit = synchronized {
    mem.clear(); memBytes = 0
    disk.keySet().asScala.toSeq.foreach(k => diskFile(k).delete())
    disk.clear(); diskBytes = 0
  }

  def memoryBytes: Long = synchronized(memBytes)
  def diskTierBytes: Long = synchronized(diskBytes)
  def pageCount: Int = synchronized(mem.size() + disk.size())

  // ---- persistence (reference: caches save on shutdown, reload on init) ----

  def save(indexFile: File): Unit = synchronized {
    // spill all memory pages to the disk tier so data survives, then
    // write the index (key -> length) of the disk tier
    mem.entrySet().asScala.toSeq.foreach(e => spillToDisk(e.getKey, e.getValue))
    val out = new ObjectOutputStream(new FileOutputStream(indexFile))
    try {
      val entries = disk.entrySet().asScala.toSeq
        .map(e => (e.getKey, e.getValue))
      out.writeObject(entries.toList)
    } finally out.close()
  }

  def load(indexFile: File): Unit = synchronized {
    if (!indexFile.exists()) return
    val in = new ObjectInputStream(new FileInputStream(indexFile))
    try {
      val entries = in.readObject().asInstanceOf[List[(PageKey, Long)]]
      entries.foreach { case (k, len) =>
        if (diskFile(k).exists() && !disk.containsKey(k)) {
          disk.put(k, len)
          diskBytes += len
        }
      }
    } finally in.close()
  }
}
