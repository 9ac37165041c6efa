package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites; functions pre-registered. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkTestBase.session

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark // force init
  }

  def sql(q: String): org.apache.spark.sql.DataFrame = spark.sql(q)

  /** Render a binary result like DuckDB's `\xNN` test notation for golden
    * byte comparisons against the reference corpus. */
  def duckHex(bytes: Array[Byte]): String = bytes.map { b =>
    val c = b & 0xFF
    if (c >= 0x20 && c <= 0x7E && c != 0x5C) c.toChar.toString
    else f"\\x$c%02X"
  }.mkString
}

object SparkTestBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    Registration.register(s)
    s
  }
}
