package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session + testdata locations for all specs. Sessions must be
  * created through GraftSession so correctness-critical configs hold
  * (GraftSession.local asserts them on reuse). */
trait GraftSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local("4")
  val sf: String = "/root/testdata/sf0.001"
}
