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
class GraftCacheSource(stats: Statistics) extends Source {
  override val sourceName: String = "graft.fs.cache"
  override val metricRegistry: MetricRegistry = new MetricRegistry

  stats.counters.foreach { case (name, counter) =>
    metricRegistry.register(name, new Gauge[Long] {
      override def getValue: Long = counter.get
    })
  }
}

object GraftCacheSource {
  @volatile private var current: Option[GraftCacheSource] = None

  /** Register the instance's stats with the active SparkEnv's metrics
    * system (no-op outside a Spark runtime — plain Hadoop clients use
    * the FS without one). Re-initializing replaces the prior source so
    * the gauges always reflect the live filesystem instance. */
  def register(stats: Statistics): Boolean = synchronized {
    val env = SparkEnv.get
    if (env == null) false
    else {
      current.foreach(env.metricsSystem.removeSource)
      val src = new GraftCacheSource(stats)
      env.metricsSystem.registerSource(src)
      current = Some(src)
      true
    }
  }

  /** Test hook: the gauges of the currently registered source. */
  def registeredGauges: Map[String, Long] = current match {
    case Some(src) =>
      import scala.jdk.CollectionConverters._
      src.metricRegistry.getGauges.asScala.toMap.map { case (k, g) =>
        k -> g.getValue.asInstanceOf[Long]
      }
    case None => Map.empty
  }
}
