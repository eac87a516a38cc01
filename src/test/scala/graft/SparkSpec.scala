package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session + testdata paths for all specs. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = GraftSession.local(cpus = 4)
  val sf: String = "/root/testdata/sf0.001"
  // The driver's correctness scale; a few tests need its corpus-level
  // statistics (e.g. a ≥5-doc trigram), which sf0.001 is too small for.
  val sfMid: String = "/root/testdata/sf0.01"

  override def afterAll(): Unit = {
    // keep the session alive across suites in one JVM; stop happens at exit
    super.afterAll()
  }
}
