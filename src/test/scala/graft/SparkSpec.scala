package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared SparkSession fixture: one session per suite, local[2], UTC,
  * few shuffle partitions so tiny-frame tests don't pay 32-task overhead.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    // the deployment registration path for graft_dot/graft_cosine —
    // exercised by every suite (VectorExpressionsSpec asserts it).
    // NOTE: read from the SparkContext conf at first-session build, so it
    // must be on the builder that creates the shared context.
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = {
    // session is shared across suites in one forked JVM; don't stop it
    super.afterAll()
  }
}
