package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for test suites (one per suite JVM-wide would
  * be nicer but scalatest runs suites sequentially in one forked JVM, and
  * getOrCreate reuses the session anyway). */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = {
    // session is shared across suites — do not stop it here
    super.afterAll()
  }
}

object SparkSpec {
  lazy val session: SparkSession = GraftSession.local("graft-test", 4)
}
