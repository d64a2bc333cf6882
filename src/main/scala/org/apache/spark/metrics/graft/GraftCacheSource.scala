package org.apache.spark.metrics.graft

import com.codahale.metrics.{Gauge, MetricRegistry}
import org.apache.spark.SparkEnv
import org.apache.spark.metrics.source.Source
import graft.fs.Statistics

/** Spark metrics `Source` for the caching filesystem's tier counters —
  * JMX/monitoring parity with the reference's MBean sink
  * (jmx/SidecarJMXSink.java:24-209), re-expressed through Spark's own
  * metrics system: once registered, every configured sink (JMX, console,
  * Prometheus servlet, Graphite) sees `graft.fs.cache.<counter>` gauges
  * with zero extra plumbing.
  *
  * Lives under `org.apache.spark` because the `Source` trait is
  * `private[spark]` — same bridging pattern as GraftSqlBridge.
  */
class GraftCacheSource(suffix: String, val stats: Statistics) extends Source {
  // one source PER filesystem instance: a deployment caching two buckets
  // has two instances with independent counters, and last-wins
  // registration would silently zero the first bucket's metrics
  override val sourceName: String =
    if (suffix.isEmpty) "graft.fs.cache" else s"graft.fs.cache.$suffix"
  override val metricRegistry: MetricRegistry = new MetricRegistry

  stats.counters.foreach { case (name, counter) =>
    metricRegistry.register(name, new Gauge[Long] {
      override def getValue: Long = counter.get
    })
  }
}

object GraftCacheSource {
  // keyed by the RAW uri (sanitizing is lossy — graft://a-b and
  // graft://a_b must not silently replace each other's source); the
  // sanitized form plus a uri-hash suffix keeps sourceNames unique too
  private val registered =
    new java.util.concurrent.ConcurrentHashMap[String, GraftCacheSource]()

  private def suffixFor(uri: String): String = {
    val base = uri.replaceAll("[^A-Za-z0-9]+", "_").replaceAll("^_+|_+$", "")
    f"${base}_${uri.hashCode & 0xffff}%04x"
  }

  /** Register the instance's stats with the active SparkEnv's metrics
    * system (no-op outside a Spark runtime — plain Hadoop clients use
    * the FS without one). Keyed by filesystem URI: re-initializing the
    * same URI replaces that source; distinct URIs coexist. */
  def register(uri: String, stats: Statistics): Boolean = synchronized {
    val env = SparkEnv.get
    if (env == null) false
    else {
      Option(registered.get(uri)).foreach(env.metricsSystem.removeSource)
      val src = new GraftCacheSource(suffixFor(uri), stats)
      env.metricsSystem.registerSource(src)
      registered.put(uri, src)
      true
    }
  }

  /** Drop a closed filesystem's source so the registry (and the metrics
    * system) don't accumulate gauges over dead Statistics. Identity-
    * guarded: if a newer instance re-registered the same URI (Hadoop FS
    * cache bypassed), closing the OLD instance must not tear down the
    * live one's source. */
  def unregister(uri: String, stats: Statistics): Unit = synchronized {
    Option(registered.get(uri)).filter(_.stats eq stats).foreach { src =>
      registered.remove(uri)
      val env = SparkEnv.get
      if (env != null) {
        try env.metricsSystem.removeSource(src)
        catch { case _: Throwable => /* metrics system already stopped */ }
      }
    }
  }

  /** Test hook: the gauges registered for a filesystem URI. */
  def registeredGauges(uri: String): Map[String, Long] =
    Option(registered.get(uri)) match {
      case Some(src) =>
        import scala.jdk.CollectionConverters._
        src.metricRegistry.getGauges.asScala.toMap.map { case (k, g) =>
          k -> g.getValue.asInstanceOf[Long]
        }
      case None => Map.empty
    }
}
