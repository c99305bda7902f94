package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (small core count: test data is
  * tiny and many-partition shuffles just add latency).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .appName(getClass.getSimpleName)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // like GraftSession, NO session-wide range-join bin: queries scope
    // it via Registry.withRangeBucket, so plan-shape tests see exactly
    // the rewrites the mains get (RangeJoinRuleSpec sets it locally)
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session for other suites in the same JVM
    super.afterAll()
  }

  def fixtureDir: String = new java.io.File("src/test/resources/af3").getAbsolutePath
}
