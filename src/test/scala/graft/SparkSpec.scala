package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs.
  *
  * Suites that MUTATE session confs (parity suites toggling codegen/
  * AQE/spill knobs, plan suites toggling join thresholds) must mix in
  * [[IsolatedSession]]: sbt runs suites in parallel, and a conf toggle
  * on the shared session would race every concurrently-running suite. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf: String = "/root/testdata/sf0.001"
}

/** A private SQLConf over the shared SparkContext: `newSession()` shares
  * the context, catalog, and cached data but isolates runtime conf and
  * temp views — conf churn here cannot leak into parallel suites. */
trait IsolatedSession extends SparkSpec {
  override lazy val spark: SparkSession = SparkSpec.session.newSession()
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .appName("graft-test")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
