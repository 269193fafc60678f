package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Per-query `.explain("formatted")` dumps for the optimization-round
  * evidence trail (plans/r<N>/<query>_{before,after}.txt).
  *
  * Usage: sbt 'runMain graft.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,..>'
  *
  * Each query is EXECUTED first (collect) so the printed AdaptiveSparkPlan is
  * the AQE-final one — Exchange counts, join strategies and AQEShuffleRead
  * nodes as they actually ran, not the pre-execution initial plan.
  * Session configs mirror Bench (same shuffle partitions, UTC, no UI) so the
  * dumped plans are the shapes the bench times.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix) = args.take(3)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val unknown = names.filterNot(SparkEntry.registry.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(",")}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.maxMetadataStringLength", "200")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    new java.io.File(outDir).mkdirs()
    names.foreach { name =>
      val df = SparkEntry.registry(name).run(spark, sfDir)
      df.collect() // finalize AQE
      val s = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/$name$suffix.txt"), s)
      println(s"[explain] wrote $outDir/$name$suffix.txt")
      Checkpoints.releaseScoped()
    }
    graft.queries.TextOps.releaseShingles()
    spark.stop()
  }
}
