package org.apache.spark.sql.connector.catalog

/** Bridge into Spark's `private[sql]` [[V2TableWithV1Fallback]] — the
  * public-behavior hook `DataStreamReader.table` / `DataStreamWriter
  * .toTable` resolution uses to stream a DSv2 catalog table through a
  * v1 source/sink (the shape Delta's `DeltaTableV2` rides): a table
  * extending this exposes a synthetic [[org.apache.spark.sql.catalyst
  * .catalog.CatalogTable]] whose provider names the v1
  * StreamSourceProvider/StreamSinkProvider to fall back to. The trait
  * is visibility-gated rather than Evolving-annotated, so extension
  * libraries need this one-line hop (same pattern as
  * [[org.apache.spark.sql.GraftSqlBridge]]).
  */
trait GraftV1StreamFallback extends V2TableWithV1Fallback
