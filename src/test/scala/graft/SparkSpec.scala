package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** One shared session for the whole suite (suites run sequentially in the
  * forked test JVM); same config as Verify/Bench via core.Sessions so test
  * semantics match the driver's execution paths. */
object SharedSpark {
  lazy val spark: SparkSession = graft.core.Sessions.local("4", "graft-test")
}

trait SparkSpec extends AnyFunSuite with Matchers {
  // stable identifier so `import spark.implicits._` works in suites
  lazy val spark: SparkSession = SharedSpark.spark
}
