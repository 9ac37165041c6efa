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

  /** Normalize the events `ts` column to a timestamp regardless of how the
    * testdata generation wrote it: older corpora store TIMESTAMP(NANOS)
    * read back as nano-longs (under `nanosAsLong`), newer ones native
    * timestamp[us]. Mirrors the schema-conditional view prep in
    * `SparkEntry.prep`. */
  def normalizeEventTs(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(CAST(ts / 1000 AS BIGINT))"))
    else df

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
