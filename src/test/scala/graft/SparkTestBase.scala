package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared session per JVM (suites run sequentially in the forked
  * test JVM); built through GraftSession so tests see the same pinned
  * semantics as the graded entry points. */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.GraftSession.get("4")
  lazy val sf: String = "/root/testdata/sf0.001"
}
