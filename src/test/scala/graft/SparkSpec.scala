package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared-session base for engine specs (one JVM-wide session, same config
  * as the driver-facing mains). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
  val sfDir01 = "/root/testdata/sf0.01"
}

object SparkSpec {
  lazy val session: SparkSession = graft.engine.Sessions.build("graft-test")
}
