package graft.fs.adapters

import java.net.URI
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.DelegateToFileSystem
import graft.fs.GraftCachingFileSystem

/** `AbstractFileSystem` shims for the FileContext API (reference parity:
  * the eight DelegateToFileSystem shims, fs/s3a/SidecarS3A.java:42-52 et
  * al.). YARN log aggregation and anything else built on FileContext
  * resolves filesystems through `fs.AbstractFileSystem.<scheme>.impl`,
  * NOT `fs.<scheme>.impl` — without a shim, a YARN-managed Spark cannot
  * mount a cached scheme at all.
  *
  * {{{
  *   fs.AbstractFileSystem.graft.impl = graft.fs.adapters.GraftFs
  *   fs.AbstractFileSystem.s3a.impl   = graft.fs.adapters.GraftS3A
  * }}}
  *
  * `authorityNeeded = false`: graft URIs carry an authority when the
  * remote does (s3a://bucket) and none for the local remote — the
  * delegate accepts both.
  */
class GraftFs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftCachingFileSystem, conf,
    "graft", false)

class GraftS3A(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftS3AFileSystem, conf,
    "s3a", false)

class GraftHdfs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftHdfsFileSystem, conf,
    "hdfs", false)

class GraftAbfs(uri: URI, conf: Configuration)
  extends DelegateToFileSystem(uri, new GraftAbfsFileSystem, conf,
    "abfs", false)
