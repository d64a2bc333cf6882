package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (matches the driver's
  * Verify/Bench session config: UTC, small shuffle partition count,
  * and — like those surfaces and the production deployment — the
  * GraftExtensions installed, so SQL DML (UPDATE/MERGE) plans; suites
  * that specifically test the extensions-FREE fallback build their own
  * bare session). */
trait TestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = TestBase.session

  val sfDir = "/root/testdata/sf0.001"
}

object TestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
