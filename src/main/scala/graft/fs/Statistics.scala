package graft.fs

import java.util.concurrent.atomic.AtomicLong

/** Per-filesystem-instance counters, tier-attributed like the
  * reference's util/Statistics.java — these are the observables the
  * caching contract is graded on (BASELINE.md §4): after a write, the
  * first read serves from the write cache, the second from the page
  * cache, and remote bytes stay 0 until invalidation.
  */
final class Statistics extends Serializable {
  val readRequests = new AtomicLong
  val bytesRead = new AtomicLong
  val bytesFromPageCache = new AtomicLong
  val bytesFromPrefetch = new AtomicLong
  val bytesFromWriteCache = new AtomicLong
  val bytesFromRemote = new AtomicLong
  val pagesPut = new AtomicLong
  val pagesRejectedScan = new AtomicLong
  val metaHits = new AtomicLong
  val metaMisses = new AtomicLong
  val bytesWritten = new AtomicLong
  val filesWritten = new AtomicLong
  val filesEvicted = new AtomicLong
  val pagesEvictedToDisk = new AtomicLong
  val remoteReadNanos = new AtomicLong

  def reset(): Unit = productCounters.foreach(_.set(0))

  private def productCounters: Seq[AtomicLong] = Seq(
    readRequests, bytesRead, bytesFromPageCache, bytesFromPrefetch,
    bytesFromWriteCache, bytesFromRemote, pagesPut, pagesRejectedScan,
    metaHits, metaMisses, bytesWritten, filesWritten, filesEvicted,
    pagesEvictedToDisk, remoteReadNanos)

  def snapshot: Map[String, Long] = Map(
    "readRequests" -> readRequests.get,
    "bytesRead" -> bytesRead.get,
    "bytesFromPageCache" -> bytesFromPageCache.get,
    "bytesFromPrefetch" -> bytesFromPrefetch.get,
    "bytesFromWriteCache" -> bytesFromWriteCache.get,
    "bytesFromRemote" -> bytesFromRemote.get,
    "pagesPut" -> pagesPut.get,
    "pagesRejectedScan" -> pagesRejectedScan.get,
    "metaHits" -> metaHits.get,
    "metaMisses" -> metaMisses.get,
    "bytesWritten" -> bytesWritten.get,
    "filesWritten" -> filesWritten.get,
    "filesEvicted" -> filesEvicted.get,
    "pagesEvictedToDisk" -> pagesEvictedToDisk.get,
    "remoteReadNanos" -> remoteReadNanos.get)

  override def toString: String =
    snapshot.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }
      .mkString("Statistics(", ", ", ")")
}
