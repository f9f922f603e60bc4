package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole forked test JVM. */
object SparkTestBase {
  lazy val spark: SparkSession = graft.core.GraftSession.local(4, "graft-test")
  val Sf0001 = "/root/testdata/sf0.001"
}

trait SparkTestBase extends AnyFunSuite {
  def spark: SparkSession = SparkTestBase.spark
  def sfDir: String = SparkTestBase.Sf0001

  /** `import testImplicits._` in subclasses for toDF/toDS on Seqs. */
  protected val testImplicits: org.apache.spark.sql.SQLImplicits =
    SparkTestBase.spark.implicits
}
