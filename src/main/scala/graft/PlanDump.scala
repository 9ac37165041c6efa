package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Measurement tool (optimization rounds): dump `.explain("formatted")`
  * for named catalog queries to files, so plan-shape claims in
  * OPTIMIZATION_r*.md are checkable without running Spark.
  *
  *   sbt "runMain graft.PlanDump <sfDir> <outDir> <suffix> q112_curate_full,..."
  *
  * Writes `<outDir>/<name>_<suffix>.txt`. Composed pipeline queries run
  * their stage jobs eagerly at construction (the localCheckpoint
  * contract); the dumped plan is the final assembly plan — exactly the
  * plan whose join/exchange shape the optimization notes cite. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, namesCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val names = namesCsv.split(',').map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.benchQueries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    names.foreach { name =>
      val df = SparkEntry.benchQueries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
