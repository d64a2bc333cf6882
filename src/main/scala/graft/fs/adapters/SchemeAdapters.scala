package graft.fs.adapters

import java.net.URI
import org.apache.hadoop.conf.Configuration
import graft.fs.{GraftCachingFileSystem, GraftFsConf}

/** Concrete per-scheme adapters — the drop-in deployment classes
  * (reference parity: fs/s3a/SidecarS3AFileSystem.java:50-188 and its
  * nine siblings, one subclass per vendor scheme).
  *
  * The reference subclasses each vendor FileSystem and routes every call
  * through the sidecar core. Our core inverts that relationship — it
  * EMBEDS the remote FS behind `graft.fs.remote.impl`/`remote.uri` — so
  * an adapter is just the scheme name plus the vendor implementation
  * class injected as the remote default. Deployment is one config line,
  * exactly like the reference:
  *
  * {{{
  *   spark.hadoop.fs.s3a.impl = graft.fs.adapters.GraftS3AFileSystem
  *   spark.read.parquet("s3a://bucket/path")   // cached transparently
  * }}}
  *
  * The vendor class is resolved reflectively at initialize time, so the
  * adapters compile (and the non-vendor logic is testable) without any
  * vendor jar on the classpath; at deploy time the same jars the plain
  * scheme needs are the ones the adapter needs. An explicit
  * `graft.fs.remote.impl` always wins over the injected default — which
  * is also how the local-remote test instantiation works.
  */
abstract class GraftSchemeAdapter(schemeName: String, remoteImpl: String)
  extends GraftCachingFileSystem {

  override def getScheme: String = schemeName

  override def initialize(name: URI, conf: Configuration): Unit = {
    val c = new Configuration(conf)
    if (c.get(s"${GraftFsConf.Prefix}remote.impl", "").isEmpty)
      c.set(s"${GraftFsConf.Prefix}remote.impl", remoteImpl)
    if (c.get(s"${GraftFsConf.Prefix}remote.uri", "").isEmpty)
      c.set(s"${GraftFsConf.Prefix}remote.uri", name.toString)
    super.initialize(name, c)
  }
}

/** fs.s3a.impl — Amazon S3 (hadoop-aws). */
class GraftS3AFileSystem extends GraftSchemeAdapter(
  "s3a", "org.apache.hadoop.fs.s3a.S3AFileSystem")

/** fs.hdfs.impl — HDFS. */
class GraftHdfsFileSystem extends GraftSchemeAdapter(
  "hdfs", "org.apache.hadoop.hdfs.DistributedFileSystem")

/** fs.gs.impl — Google Cloud Storage (gcs-connector). */
class GraftGoogleFileSystem extends GraftSchemeAdapter(
  "gs", "com.google.cloud.hadoop.fs.gcs.GoogleHadoopFileSystem")

/** fs.abfs.impl — Azure Data Lake Gen2 (hadoop-azure). */
class GraftAbfsFileSystem extends GraftSchemeAdapter(
  "abfs", "org.apache.hadoop.fs.azurebfs.AzureBlobFileSystem")

/** fs.abfss.impl — Azure Data Lake Gen2, TLS. */
class GraftSecureAbfsFileSystem extends GraftSchemeAdapter(
  "abfss", "org.apache.hadoop.fs.azurebfs.SecureAzureBlobFileSystem")

/** fs.wasb.impl — Azure Blob Storage, legacy driver (hadoop-azure). */
class GraftWasbFileSystem extends GraftSchemeAdapter(
  "wasb", "org.apache.hadoop.fs.azure.NativeAzureFileSystem")

/** fs.adl.impl — Azure Data Lake Gen1 (hadoop-azure-datalake). */
class GraftAdlFileSystem extends GraftSchemeAdapter(
  "adl", "org.apache.hadoop.fs.adl.AdlFileSystem")

/** fs.oss.impl — Alibaba OSS (hadoop-aliyun). */
class GraftOssFileSystem extends GraftSchemeAdapter(
  "oss", "org.apache.hadoop.fs.aliyun.oss.AliyunOSSFileSystem")

/** fs.swift.impl — OpenStack Swift (hadoop-openstack). */
class GraftSwiftFileSystem extends GraftSchemeAdapter(
  "swift", "org.apache.hadoop.fs.swift.snative.SwiftNativeFileSystem")

/** fs.file.impl — local FS behind the cache (integration testing /
  * NFS-style mounts; reference: fs/file/SidecarLocalFileSystem.java). */
class GraftLocalFileSystem extends GraftSchemeAdapter(
  "file", "org.apache.hadoop.fs.RawLocalFileSystem")
