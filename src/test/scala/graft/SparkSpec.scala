package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base for all engine specs: one shared local session across suites (sbt
  * forks a single test JVM; getOrCreate dedups), UTC, AQE on — identical
  * configs to Verify/Bench via [[GraftSession]].
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  /** Smallest driver-generated dataset; specs that read real tables use it. */
  val sfDir = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local(4)
}
