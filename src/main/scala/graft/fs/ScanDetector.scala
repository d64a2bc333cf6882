package graft.fs

/** Scan-resistant admission control, ported from the reference's
  * util/ScanDetector.java:18-70: a ring buffer of the last K page
  * offsets; when K consecutive offsets are exactly one page apart the
  * stream is declared a scan and page-cache inserts stop (large
  * sequential scans — compactions, full-table exports — would otherwise
  * flush the hot working set).
  */
final class ScanDetector(val threshold: Int, val pageSize: Long) {
  private val ring = new Array[Long](math.max(threshold, 2))
  private var n = 0
  private var idx = 0

  private var last = Long.MinValue

  /** Record a page-aligned offset; returns true while the stream looks
    * like a scan (>= threshold consecutive sequential pages). Repeated
    * accesses to the same page (sub-page reads) are collapsed so they
    * neither extend nor break a run. */
  def record(pageOffset: Long): Boolean = synchronized {
    if (pageOffset != last) {
      last = pageOffset
      ring(idx) = pageOffset
      idx = (idx + 1) % ring.length
      if (n < ring.length) n += 1
    }
    isScan
  }

  def isScan: Boolean = synchronized {
    if (n < ring.length) false
    else {
      // oldest -> newest must each step by exactly pageSize
      var i = 0
      var ok = true
      while (ok && i < ring.length - 1) {
        val a = ring((idx + i) % ring.length)
        val b = ring((idx + i + 1) % ring.length)
        if (b - a != pageSize) ok = false
        i += 1
      }
      ok
    }
  }

  def reset(): Unit = synchronized { n = 0; idx = 0; last = Long.MinValue }
}
